package graft

import org.apache.spark.sql.functions._

/** Round-12f pins: the integer-PageRank lattice replayed literally
  * (6 supersteps over the collected edge list, same floor divisions)
  * and Cochran–Armitage recomputed with BigInt from raw counts. */
class R12fOpsSpec extends SparkSpec {

  test("knn_pagerank: the distributed supersteps equal a literal " +
      "driver-side replay of the integer lattice, top-10 included") {
    val rows = sim.Knn.knnPagerank(spark, sfDir).collect()
    assert(rows.length === 10)
    val edges = sim.Knn.directedEdges(spark, sfDir)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = Tables.embeddings(spark, sfDir)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val base = 1000000000L / nodes.length
    val outDeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = nodes.map(v => v -> base).toMap
    for (_ <- 1 to 6) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (q, n) =>
        in(n) += r(q) / outDeg(q)
      }
      r = nodes.map(v => v -> (150L * base + 850L * in(v)) / 1000L).toMap
    }
    val inDeg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = nodes.map(v => (v, r(v)))
      .sortBy { case (v, rr) => (-rr, v) }.take(10)
    rows.zip(expected).foreach { case (row, (v, rr)) =>
      assert(row.getAs[Long]("vec_id") === v)
      assert(row.getAs[Long]("r_ppb") === rr)
      assert(row.getAs[Long]("in_deg") === inDeg.getOrElse(v, 0L))
    }
    // teleport floor: no node can fall below the damped base share
    rows.foreach(row =>
      assert(row.getAs[Long]("r_ppb") >= 150L * base / 1000L))
  }

  test("cls_cochran_armitage: the pooled trend statistic recomputes " +
      "with BigInt from the raw (score, n, x) census") {
    val rows = classify.ClassifyQueries.clsCochranArmitage(spark, sfDir)
      .collect()
    assert(rows.length === 5)
    val cs = Tables.orders(spark, sfDir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byS = cs.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val nn = byS.values.map(_._1).sum
    val rr = byS.values.map(_._2).sum
    val sn = byS.map { case (s, (n, _)) => s * n }.sum
    val sx = byS.map { case (s, (_, x)) => s * x }.sum
    val sn2 = byS.map { case (s, (n, _)) => s * s * n }.sum
    val t = BigInt(nn) * sx - BigInt(rr) * sn
    val z2 = t * t * nn * 1000 /
      (BigInt(rr) * (nn - rr) * (BigInt(nn) * sn2 - BigInt(sn) * sn))
    rows.foreach { row =>
      val s = row.getAs[Long]("score")
      val (n, x) = byS(s)
      assert(row.getAs[Long]("n") === n)
      assert(row.getAs[Long]("x") === x)
      assert(row.getAs[Long]("p_pm") === x * 1000 / n)
      assert(row.getAs[Long]("trend_sign") === t.signum.toLong)
      assert(row.getAs[Long]("z2_milli") === z2.toLong)
    }
  }
}
