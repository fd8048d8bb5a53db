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

  test("every graft function resolves from the SQL surface") {
    // the functions register like builtins (VectorExprs.register /
    // GraftExtensions), so plain spark.sql can use them
    val row = spark.sql(
      """SELECT
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i,
        |  graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS j,
        |  graft_asof_index(array(10L, 20L, 30L), 25L) AS a,
        |  graft_bigrams(array('a', 'b', 'c')) AS b,
        |  graft_normalize(array(3.0d, 4.0d)) AS n,
        |  size(graft_minhash_bands(array(7L, 11L), 32, 4)) AS m
        |""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 2L)
    assert(row.getDouble(2) == 0.5)
    assert(row.getInt(3) == 1)
    assert(row.getSeq[String](4) == Seq("a b", "b c"))
    assert(row.getSeq[Double](5) == Seq(0.6, 0.8))
    assert(row.getInt(6) == 4)
  }

  test("graft_floor_scale is bit-identical to the HOF formulation") {
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("id", "a")
    val out = rows.select(
      expr("transform(cast(a as array<double>), " +
        "x -> cast(floor(x * 64) as double))").as("hof"),
      call_function(graft.expr.VectorExprs.floorScaleName,
        col("a"), lit(64.0)).as("fast"))
      .as[(Seq[Double], Seq[Double])].collect()
    assert(out.forall { case (h, f) => h == f }) // exact, incl. -0.0 vs 0.0
    // negative values floor DOWN (-0.3*64 -> -20), matching SQL FLOOR
    val neg = spark.sql(
      "SELECT graft_floor_scale(array(-0.3d, 0.3d), 64.0d) AS z").head()
    assert(neg.getSeq[Double](0) == Seq(-20.0, 19.0))
  }

  test("graft_jaccard equals the composed intersect formulation exactly") {
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),       // partial overlap
      (Seq(1L, 2L), Seq(1L, 2L)),                // identical
      (Seq(1L), Seq(2L)),                        // disjoint
      (Seq(1L, 5L, 9L, 12L), Seq(5L, 12L)),      // subset
      (Seq.empty[Long], Seq(1L, 2L)))            // one empty
      .toDF("a", "b")
    val i = call_function(graft.expr.VectorExprs.intersectName,
      col("a"), col("b"))
    val out = rows.select(
      call_function(graft.expr.VectorExprs.jaccardName, col("a"), col("b")).as("one"),
      (i.cast("double") /
        (size(col("a")) + size(col("b")) - i).cast("double")).as("two"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (o, t) => o == t || (o.isNaN && t.isNaN) },
      s"mismatches: ${out.toSeq}")
  }

  test("graft_asof_index finds the last element <= probe (edge cases)") {
    val rows = Seq(
      (Seq(10L, 20L, 30L), 25L, 1),   // between elements
      (Seq(10L, 20L, 30L), 30L, 2),   // exact match, last
      (Seq(10L, 20L, 30L), 10L, 0),   // exact match, first
      (Seq(10L, 20L, 30L), 5L, -1),   // all greater
      (Seq(10L, 20L, 30L), 99L, 2),   // all smaller
      (Seq.empty[Long], 5L, -1),      // empty state
      (Seq(7L), 7L, 0))               // single element
      .toDF("arr", "v", "expected")
    val out = rows.select(
      call_function(graft.expr.VectorExprs.asofName, col("arr"), col("v")).as("got"),
      col("expected")).as[(Int, Int)].collect()
    assert(out.forall { case (g, e) => g == e }, s"mismatches: ${out.toSeq}")
  }

  test("graft_bigrams matches the HOF neighbor-concat formulation") {
    val rows = Seq(
      "the quick brown fox", "a b", "single", "", "x y z w v"
    ).toDF("text")
    val w = split(col("text"), "\\s+")
    val hof = when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    val out = rows.select(hof.as("hof"),
      call_function(graft.expr.VectorExprs.bigramsName, w).as("fast"))
      .as[(Seq[String], Seq[String])].collect()
    assert(out.forall { case (h, f) => h == f }, s"mismatches: ${out.toSeq}")
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

  test("NormalizeIdempotence rule collapses nested normalizes bit-exactly") {
    import graft.expr.{GraftRules, NormalizeArray, VectorExprs}
    VectorExprs.register(spark)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ GraftRules.NormalizeIdempotence
    try {
      def normed(n: Int) = {
        var c: org.apache.spark.sql.Column =
          col("embedding").cast("array<double>")
        (1 to n).foreach(_ => c = call_function(VectorExprs.normName, c))
        Tables.embeddings(spark, sfDir).select(c.as("e")).orderBy(col("e"))
      }
      val double = normed(2)
      val nNodes = double.queryExecution.optimizedPlan
        .collect { case p => p.expressions
          .map(_.collect { case x: NormalizeArray => x }.size).sum }
        .sum
      assert(nNodes == 1,
        s"rule must leave exactly one normalize, found $nNodes")
      // the rewritten double-normalize IS the single normalize plan,
      // so the outputs must be bit-identical
      assert(double.collect().map(_.toSeq).toSeq ==
        normed(1).collect().map(_.toSeq).toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }
}
