package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Stage timing probe for dedup_components: edges vs iteration cost. */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, sfDir)
    var t0 = System.nanoTime()
    val pairs = Dedup.ngramJaccard(docs, 0.9)
    val pc = pairs.queryExecution.toRdd.count()
    println(f"pairs: $pc rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val lbl = Dedup.components(docs, pairs)
    println(f"components build+converge: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val n = lbl.groupBy("lbl").count().queryExecution.toRdd.count()
    println(f"final agg: $n components, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
