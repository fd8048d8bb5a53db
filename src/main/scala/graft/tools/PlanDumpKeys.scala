package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `<outDir>/<key>_<suffix>.txt` with the `explain("formatted")`
  * plan of each named key — executed first, so AQE's final plan (the
  * one that actually ran) is what lands in the artifact.
  * Usage: runMain graft.tools.PlanDumpKeys <keys,csv> <outDir> <suffix> [sfDir]
  */
object PlanDumpKeys {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(',').toSeq
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorExprs.register(spark)
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      df.queryExecution.toRdd.count() // finalize AQE
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${key}_$suffix.txt", "UTF-8")
      try w.println(txt) finally w.close()
      println(s"dumped $key")
    }
    spark.stop()
  }
}
