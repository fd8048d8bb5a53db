package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling spot-bench: runs the given keys against two SF dirs in ONE
  * JVM (warm codegen, identical session) and prints a markdown table
  * of per-key times plus the ratio — the scaling-exponent check a
  * 10× data step exposes (a linear operator shows ~10×; anything
  * super-linear gets a plan fix or a documented reason).
  *
  * Usage: runMain graft.tools.ScaleProbe <dirA> <dirB> <k1,k2,...>
  *          [runs]
  * Times reported are the MIN of `runs` executions (the
  * least-noise estimator on a shared box; first run per (key, dir)
  * additionally pays cache-cold I/O, which min() also discards).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val keys = args(2).split(",").toSeq
    val runs = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorExprs.register(spark)
    def time(key: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(key)
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    println(s"| key | ${dirA.split('/').last} s | ${dirB.split('/').last} s | ratio |")
    println("| --- | --- | --- | --- |")
    keys.foreach { k =>
      try {
        val a = time(k, dirA)
        val b = time(k, dirB)
        println(f"| `$k` | $a%.2f | $b%.2f | ${b / a}%.1f× |")
      } catch {
        case e: Throwable => println(s"| `$k` | ERROR ${e.getMessage.take(60)} | | |")
      }
    }
    spark.stop()
  }
}
