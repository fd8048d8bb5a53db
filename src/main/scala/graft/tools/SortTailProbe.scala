package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the deterministic-output sort tail: global orderBy
  * (range exchange + sample job) vs coalesce(1)+sortWithinPartitions
  * (single-task total order — only sane for dim-bounded outputs).
  * Usage: runMain graft.tools.SortTailProbe [sfDir] [n]
  */
object SortTailProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def agg: DataFrame = graft.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    def time(tag: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to n).foreach { _ =>
      time("orderBy      ", agg.orderBy("l_returnflag", "l_linestatus"))
      time("coalesce+sort",
        agg.coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus"))
    }
    spark.stop()
  }
}
