package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The custom codegen expressions must agree exactly with the
  * interpreted builtin formulations they replace. */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is bit-identical to the HOF fold") {
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Array.tabulate(64)(d => math.sin(i * 31 + d).toFloat),
        Array.tabulate(64)(d => math.cos(i * 17 + d).toFloat))
    }.toDF("id", "a", "b")
      .select(col("id"),
        transform(col("a"), x => x.cast("double")).as("a"),
        transform(col("b"), x => x.cast("double")).as("b"))
    val out = rows.select(
      Dedup.dot(col("a"), col("b")).as("hof"),
      Dedup.fastDot(col("a"), col("b")).as("fast"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (h, f) => h == f }) // exact, not approx
  }

  test("graft_intersect_size matches array_intersect on sorted arrays") {
    val rows = (1 to 100).map { i =>
      val a = (1 to 30).map(x => (x * i % 97).toLong).distinct.sorted
      val b = (1 to 30).map(x => (x * (i + 3) % 97).toLong).distinct.sorted
      (a, b)
    }.toDF("a", "b")
    val out = rows.select(
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"),
      call_function(graft.expr.VectorExprs.intersectName,
        col("a"), col("b")).as("fast"))
      .as[(Long, Long)].collect()
    assert(out.forall { case (x, y) => x == y })
  }
}
