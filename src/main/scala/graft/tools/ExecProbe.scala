package graft
import org.apache.spark.sql.SparkSession
/** Executes one registered query and prints the FINAL adaptive plan —
  * the artifact that shows runtime exchange reuse / AQE choices. */
object ExecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1)
      .getOrElse("/root/testdata/sf0.01"))
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
