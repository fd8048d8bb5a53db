package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm repeat-timing probe for any SparkEntry key: runs the query N
  * times in one JVM so codegen/JVM warmup amortizes and run-to-run
  * variance is visible (single cold runs on this machine swing 2×).
  * Usage: runMain graft.tools.QueryProbe <key> [sfDir] [n]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse(sys.error("usage: QueryProbe <key>"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.VectorExprs.register(spark)
    val fn = graft.SparkEntry.queries(key)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      println(f"$key run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
