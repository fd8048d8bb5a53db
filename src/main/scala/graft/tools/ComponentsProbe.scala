package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.dedup.Dedup

/** Stage-timing probe for dedup_components: runs the operator N times
  * in one JVM (warm codegen/shuffle machinery) and prints per-run
  * seconds plus the pair-generation baseline, so iteration changes are
  * measurable above local-machine noise. Not part of the driver
  * surface.
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.VectorExprs.register(spark)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, dir)
    (1 to n).foreach { i =>
      time(s"pairs-only run $i") {
        Dedup.ngramJaccard(docs, 0.9).queryExecution.toRdd.count()
      }
      time(s"components run $i") {
        Dedup.dedupComponents(spark, dir).queryExecution.toRdd.count()
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
