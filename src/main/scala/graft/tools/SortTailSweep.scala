package graft.tools

import org.apache.spark.sql.SparkSession

/** Report-tail sweep (r13): find keys whose plan still ends in a
  * GLOBAL sort (range exchange + boundary sampling) while their output
  * is dimension-bounded — row count identical at two SFs and under a
  * cap — i.e. candidates for the zero-exchange `reportSort` tail.
  * Usage: runMain graft.tools.SortTailSweep [sfA] [sfB] [cap]
  */
object SortTailSweep {
  def main(args: Array[String]): Unit = {
    val sfA = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val sfB = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cap = args.lift(2).map(_.toLong).getOrElse(4096L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorExprs.register(spark)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val dfA = fn(spark, sfA)
        // top-level GLOBAL sort (not TakeOrdered, not in-partition)
        val hasGlobalSort = dfA.queryExecution.optimizedPlan.collect {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort
              if s.global => s
        }.nonEmpty
        val hasLimit = dfA.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
        }.nonEmpty
        if (hasGlobalSort && !hasLimit) {
          val nA = dfA.count()
          if (nA <= cap) {
            val nB = fn(spark, sfB).count()
            if (nB == nA)
              println(f"CANDIDATE $name%-28s rows=$nA (SF-invariant)")
            else if (nB <= cap)
              println(f"bounded-but-grows $name%-28s $nA -> $nB")
          }
        }
      } catch { case e: Throwable =>
        println(s"ERROR $name: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
