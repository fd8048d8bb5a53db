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

  test("knn_assortativity: r recomputes with BigInt from the raw " +
      "mutual edge list and sits in [-1000, 1000]") {
    val rows = sim.Knn.knnAssortativity(spark, sfDir).collect()
    assert(rows.length === 1)
    val e = sim.Knn.mutualEdges(spark, sfDir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val ends = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .map { case (x, y) => (deg(x), deg(y)) }
    val m = BigInt(ends.length)
    val sx = ends.map(_._1).map(BigInt(_)).sum
    val sxx = ends.map(d => BigInt(d._1) * d._1).sum
    val sxy = ends.map(d => BigInt(d._1) * d._2).sum
    val num = m * sxy - sx * sx
    val den = m * sxx - sx * sx
    val r = rows.head
    assert(r.getAs[Long]("n_edges") === e.length.toLong)
    if (den == 0) assert(r.isNullAt(r.fieldIndex("r_pm")))
    else {
      val expected = ((num * 1000 + 2000 * den) / den - 2000).toLong
      assert(r.getAs[Long]("r_pm") === expected)
      assert(expected >= -1000 && expected <= 1000)
    }
  }

  test("str_sax_symbols: symbols replay from naive per-type quartile " +
      "breakpoints over the PAA segment means") {
    val rows = streaming.EventStreams.strSaxSymbols(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val paa = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 21600000000"),
        floor(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view
      .mapValues(g => g.map(_._3).sum / g.length).toMap
      .toSeq.map { case ((g, _), m) => (g, m) }
    val byG = paa.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.groupBy(_.getAs[String]("grp")).foreach { case (g, rs) =>
      val ms = byG(g).sorted
      val n = ms.length
      def sel(k: Long): Long = ms((k - 1).toInt)
      val (b25, b50, b75) =
        (sel((n + 1) / 4), sel((n + 1) / 2), sel(3L * (n + 1) / 4))
      val expected = byG(g).map { m =>
        if (m <= b25) "a" else if (m <= b50) "b"
        else if (m <= b75) "c" else "d"
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
      rs.foreach { r =>
        assert(r.getAs[Long]("n_segments") ===
          expected(r.getAs[String]("symbol")))
      }
      assert(rs.map(_.getAs[Long]("n_segments")).sum === n.toLong)
    }
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
