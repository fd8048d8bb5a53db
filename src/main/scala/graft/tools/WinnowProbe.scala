package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.VectorExprs.register(spark)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("warmup tiny") { spark.range(10).count() }
    val raw = graft.Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_winnow_sel",
          regexp_replace(trim(lower(col("text"))), "\\s+", " "))
          .as("sels"))
      .filter(size(col("sels")) > 0)
    t("expr pass only (sum sizes)") {
      println(raw.select(sum(size(col("sels")))).head)
    }
    t("expr pass again (warm)") {
      println(raw.select(sum(size(col("sels")))).head)
    }
    t("expr no-filter (single eval)") {
      println(graft.Tables.documents(spark, dir)
        .repartition(col("doc_id"))
        .select(call_function("graft_winnow_sel",
          regexp_replace(trim(lower(col("text"))), "\\s+", " "))
          .as("sels"))
        .select(sum(size(col("sels")))).head)
    }
    val sel = t("localCheckpoint") { raw.localCheckpoint() }
    t("fps frame (explode distinct) count") {
      sel.select(col("doc_id"), explode(array_distinct(
        expr("transform(sels, x -> x div 1048576)"))).as("h")).count()
    }
    t("layouts build (writes)") {
      graft.text.TextAnalysis.winnowLayouts(spark, dir)._1.queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
