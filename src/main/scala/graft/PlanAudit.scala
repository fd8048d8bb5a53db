package graft

import org.apache.spark.sql.SparkSession

/** Executed-plan audit: runs the named `SparkEntry.queries` keys
  * against a sf dir and prints each key's POST-EXECUTION physical
  * plan (AQE-final — the plan that actually ran, not the initial
  * estimate). Usage:
  *
  *   runMain graft.PlanAudit <sfDir> <key1,key2,...>
  *
  * The per-round plan-audit docs (docs/PLANS_r*.md) are built from
  * this output; PlanSpec/R*OpsSpec pin the load-bearing shapes so
  * regressions fail tests, but the full dump is what a human reviews
  * for unpushed filters, corpus-sized windows, or surprise
  * cartesians. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.PlanAudit <sfDir> <key1,key2,...>")
      sys.exit(2)
    }
    val Array(sfDir, keyCsv) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    keyCsv.split(',').foreach { key =>
      val df = qs.getOrElse(key,
        sys.error(s"unknown key '$key' — not in SparkEntry.queries"))(
        spark, sfDir)
      val qe = df.queryExecution
      qe.toRdd.count() // execute so AQE finalizes every stage
      val plan = qe.executedPlan.toString.split("== Initial Plan ==").head
      println(s"==== $key ====")
      println(plan)
    }
    spark.stop()
  }
}
