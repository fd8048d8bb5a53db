package graft

import org.apache.spark.sql.functions._

/** Round-12g pins: Simpson's-paradox detection replayed with BigInt
  * moments from the raw (nation, balance, order-count) census. */
class R12gOpsSpec extends SparkSpec {

  test("knn_edge_support: the histogram replays from naive common-" +
      "neighbor counting and covers every mutual edge") {
    val rows = sim.Knn.knnEdgeSupport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val e = sim.Knn.mutualEdges(spark, sfDir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(t => (t._2, t._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hist = e.map { case (a, b) => (adj(a) - b).count(adj(b)) }
      .groupBy(x => x.toLong).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("n_edges")).sum === e.length.toLong)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_edges") ===
        hist(r.getAs[Long]("support")))
    }
    assert(rows.map(_.getAs[Long]("support")).toSet === hist.keySet)
  }

  test("str_running_slope: every prefix slope recomputes with BigInt " +
      "OLS over the daily counts") {
    val rows = streaming.EventStreams.strRunningSlope(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.groupBy(_.getAs[String]("grp")).foreach { case (g, rs) =>
      val days = daily.keys.filter(_._1 == g).map(_._2).toSeq.sorted
      rs.sortBy(_.getAs[Long]("day")).zipWithIndex.foreach {
        case (r, i) =>
          val pre = days.take(i + 1).map(d => (d, daily((g, d))))
          val n = BigInt(pre.length)
          val sd = pre.map(p => BigInt(p._1)).sum
          val sy = pre.map(p => BigInt(p._2)).sum
          val sdy = pre.map(p => BigInt(p._1) * p._2).sum
          val sdd = pre.map(p => BigInt(p._1) * p._1).sum
          val num = n * sdy - sd * sy
          val den = n * sdd - sd * sd
          assert(r.getAs[Long]("day") === days(i))
          assert(r.getAs[Long]("n_days") === (i + 1).toLong)
          if (den == 0) assert(r.isNullAt(r.fieldIndex("slope_micro")))
          else {
            val expected =
              if (num >= 0) (num * 1000000 / den).toLong
              else -((-num) * 1000000 / den).toLong
            assert(r.getAs[Long]("slope_micro") === expected)
          }
      }
    }
  }

  test("pipe_coherent_sample: descent sampling is orphan-free while " +
      "independent sampling orphans ~(1-p) of sampled children") {
    val rows = pipeline.CorpusPipeline.pipeCoherentSample(spark, sfDir)
      .collect().map(r => r.getAs[String]("tbl") -> r).toMap
    assert(rows.size === 3)
    // coherent descent: every sampled child has its parent — the
    // orphan gauge for the INDEPENDENT sample must show the break
    val ord = rows("2_orders")
    val li = rows("3_lineitem")
    assert(ord.getAs[Long]("indep_orphan_pm") > 600L)
    assert(li.getAs[Long]("indep_orphan_pm") > 600L)
    // root table: both samples are the same hash rule
    val cust = rows("1_customer")
    assert(cust.getAs[Long]("n_coh") === cust.getAs[Long]("n_ind"))
    assert(cust.getAs[Long]("indep_orphan_pm") === 0L)
    // rates hover near the 200-per-mille design point
    Seq(cust, ord, li).foreach { r =>
      val pm = r.getAs[Long]("coherent_pm")
      assert(pm > 100 && pm < 320, s"coherent_pm=$pm")
    }
  }

  test("cls_simpsons: per-stratum and pooled trend signs recompute " +
      "with BigInt and the flips verdict is consistent") {
    val rows = classify.ClassifyQueries.clsSimpsons(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val oc = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
    val data = Tables.customer(spark, sfDir)
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey").cast("long"),
        (col("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"),
        coalesce(col("y"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sign(g: Seq[(Long, Long)]): Int = {
      val n = BigInt(g.length)
      val sx = g.map(t => BigInt(t._1)).sum
      val sy = g.map(t => BigInt(t._2)).sum
      val sxy = g.map(t => BigInt(t._1) * t._2).sum
      (n * sxy - sx * sy).signum
    }
    val pooledSign = sign(data.map(t => (t._2, t._3)).toSeq)
    rows.foreach { r =>
      val nk = r.getAs[Long]("nationkey")
      val g =
        if (nk == -1L) data.map(t => (t._2, t._3)).toSeq
        else data.filter(_._1 == nk).map(t => (t._2, t._3)).toSeq
      assert(r.getAs[Long]("n") === g.length.toLong)
      assert(r.getAs[Long]("trend_sign") === sign(g).toLong)
      assert(r.getAs[Long]("pooled_sign") === pooledSign.toLong)
      assert(r.getAs[Boolean]("flips") ===
        (nk != -1L && sign(g) != pooledSign))
    }
  }
}
