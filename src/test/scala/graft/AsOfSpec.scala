package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoin, AsOfJoinExec}
import graft.streaming.EventStreams

/** The custom as-of plan node: physical-plan shape, exact agreement
  * with the window-based form, and merge edge cases. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("custom exec node plans with clustered+sorted children") {
    AsOfJoin.register(spark)
    val df = EventStreams.strAsofExec(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val all = nodes(plan)
    assert(all.exists(_.isInstanceOf[AsOfJoinExec]),
      s"expected AsOfJoinExec in:\n$plan")
    // EnsureRequirements must have inserted sorts feeding the merge
    val exec = all.collectFirst { case e: AsOfJoinExec => e }.get
    assert(exec.children.forall(c => nodes(c).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec])),
      s"expected sorted children:\n$plan")
  }

  test("custom exec equals the window-based as-of exactly") {
    val viaExec = EventStreams.strAsofExec(spark, sfDir).collect().toSeq
    val viaWindow = EventStreams.strAsof(spark, sfDir).collect().toSeq
    assert(viaExec == viaWindow)
    assert(viaExec.nonEmpty)
  }

  test("merge edges: no-match rows drop, ties take the largest tie-break") {
    AsOfJoin.register(spark)
    val left = Seq((1L, 5L, 10L), (2L, 5L, 1L), (3L, 7L, 10L), (4L, 9L, 10L))
      .toDF("lid", "k", "t")
    val right = Seq(
      (5L, 3L, 101L), (5L, 3L, 102L), // tie on time: 102 must win
      (5L, 8L, 103L),                 // after left t=1 and t=10? 8<=10 only
      (7L, 11L, 104L))                // only entry for k=7 is in the future
      .toDF("k2", "t2", "oid")
    val out = AsOfJoin(left, right, "k" -> "k2", "t" -> "t2", tie = "oid")
      .select("lid", "oid").as[(Long, Long)].collect().toMap
    // lid=1 (k=5,t=10): eligible {101,102,103}, latest time 8 → 103
    // lid=2 (k=5,t=1): none eligible (3>1 false: 3<=1 is false) → drop
    // lid=3 (k=7,t=10): 11>10 → drop; lid=4 (k=9): no key → drop
    assert(out == Map(1L -> 103L))
    // tie-break check in isolation: left time between the tie rows
    val out2 = AsOfJoin(
      Seq((1L, 5L, 3L)).toDF("lid", "k", "t"), right,
      "k" -> "k2", "t" -> "t2", tie = "oid")
      .select("lid", "oid").as[(Long, Long)].collect().toMap
    assert(out2 == Map(1L -> 102L), "equal times must resolve to max tie")
  }

  test("seeded fuzz: custom exec equals the window form on random logs") {
    // 20 random (keys, times, ties) datasets with heavy key/time
    // collisions; the custom merge must equal the declarative window
    // formulation row-for-row every time. Deterministic seed.
    AsOfJoin.register(spark)
    val rnd = new scala.util.Random(1234)
    (1 to 20).foreach { trial =>
      val nl = 30 + rnd.nextInt(120)
      val nr = 30 + rnd.nextInt(120)
      val keySpace = 1 + rnd.nextInt(8) // heavy collisions
      val timeSpace = 1 + rnd.nextInt(12)
      val left = (1 to nl).map(i =>
        (i.toLong, rnd.nextInt(keySpace).toLong, rnd.nextInt(timeSpace).toLong))
        .toDF("lid", "k", "t")
      val right = (1 to nr).map(i =>
        (rnd.nextInt(keySpace).toLong, rnd.nextInt(timeSpace).toLong, i.toLong))
        .toDF("k2", "t2", "oid")
      val viaExec = AsOfJoin(left, right, "k" -> "k2", "t" -> "t2", tie = "oid")
        .select("lid", "oid").as[(Long, Long)].collect().toSeq.sorted
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lid")
        .orderBy(desc("t2"), desc("oid"))
      val viaWindow = left.join(right,
          col("k") === col("k2") && col("t2") <= col("t"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select("lid", "oid").as[(Long, Long)].collect().toSeq.sorted
      assert(viaExec == viaWindow, s"trial $trial diverged")
    }
  }

  test("null keys and times never join") {
    AsOfJoin.register(spark)
    val left = Seq((Some(1L), Some(5L), Some(10L)), (Some(2L), None, Some(10L)),
      (Some(3L), Some(5L), None)).toDF("lid", "k", "t")
    val right = Seq((Some(5L), Some(3L), Some(101L)),
      (Some(5L), None, Some(999L)), (None, Some(1L), Some(998L)))
      .toDF("k2", "t2", "oid")
    val out = AsOfJoin(left, right, "k" -> "k2", "t" -> "t2", tie = "oid")
      .select("lid", "oid").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 101L))
  }
}
