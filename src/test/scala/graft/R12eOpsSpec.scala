package graft

import org.apache.spark.sql.functions._

/** Round-12e pins: engine-independent laws for the fifth r12 batch —
  * controlled rounding (additivity + strict-within-base bound +
  * mod-B cleanliness), waterfill budget (exact spend, cap respect,
  * max-min ±1 fairness), syslog PRI packing round-trip, the TwoNN
  * ratio's model-free invariants, and the border detector against
  * the injected letterbox arithmetic. */
class R12eOpsSpec extends SparkSpec {

  test("mask_controlled_round: published counts are multiples of 10, " +
      "sum to the rounded grand total, and stay strictly within base") {
    val rows = graft.mask.MaskQueries.maskControlledRound(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val totTrue = rows.map(_.getAs[Long]("n")).sum
    val totPub = rows.map(_.getAs[Long]("n_pub")).sum
    assert(totPub === (totTrue + 5) / 10 * 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pub") % 10 === 0L)
      val diff = r.getAs[Long]("diff")
      assert(diff > -10 && diff < 10)
      assert(diff === r.getAs[Long]("n_pub") - r.getAs[Long]("n"))
    }
  }

  test("pipe_waterfill_budget: budget spent exactly, caps respected, " +
      "unsaturated allocations max-min fair within one unit") {
    val rows = pipeline.CorpusPipeline.pipeWaterfillBudget(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("cap")).sum
    val t = total * 3 / 5
    assert(rows.map(_.getAs[Long]("alloc")).sum === t)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"))
    }
    val unsat = rows.filter(!_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("alloc"))
    if (unsat.nonEmpty) {
      assert(unsat.max - unsat.min <= 1)
      // every saturated source is smaller than any unsaturated alloc
      // (it was taken whole BECAUSE it sits below the waterline)
      val sat = rows.filter(_.getAs[Boolean]("saturated"))
        .map(_.getAs[Long]("cap"))
      sat.foreach(c => assert(c <= unsat.max))
    }
  }

  test("src_syslog_ingest: PRI packing survives the file round-trip " +
      "— per-severity rollup equals the table-side recompute") {
    val rows = sources.SourceQueries.syslogIngest(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val sev = r.getAs[Long]("severity")
      val g = ev.filter(_._1 % 8 == sev)
      assert(r.getAs[Long]("n_frames") === g.length.toLong)
      assert(r.getAs[Long]("sum_event_id") === g.map(_._1).sum)
      assert(r.getAs[Long]("n_facilities") ===
        g.map(_._2 % 24).distinct.length.toLong)
      assert(r.getAs[Long]("first_ts_s") === g.map(_._3).min)
    }
  }

  test("emb_twonn_ratio: ratios are >= 1000 per-mille by rank order " +
      "and f4_pm is a valid CDF point below the capped median mass") {
    val rows = sim.Knn.embTwonnRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val f4 = r.getAs[Long]("f4_pm")
      assert(n > 0)
      assert(f4 >= 0 && f4 <= 1000)
      // d1 is the TOP cosine, so mu² = (1-c2)/(1-c1) >= 1 — the
      // median of a quantity bounded below by 1000 per-mille
      assert(r.getAs[Long]("mu2_p50_pm") >= 1000L)
      assert(r.getAs[Long]("n_dup") >= 0 && r.getAs[Long]("n_dup") <= n)
    }
  }

  test("mm_image_border: the real-codec border scan recovers exactly " +
      "the injected letterbox arithmetic for every document") {
    val rows = multimodal.BinaryPipeline.mmImageBorder(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (8 + (id % 32).toInt, 8 + ((id * 7) % 32).toInt)
      val (pt, pl) = ((id % 5).toInt, ((id * 3) % 5).toInt)
      assert(r.getAs[Int]("width") === w + 2 * pl)
      assert(r.getAs[Int]("height") === h + 2 * pt)
      assert(r.getAs[Int]("top_rows") === pt)
      assert(r.getAs[Int]("bottom_rows") === pt)
      assert(r.getAs[Int]("left_cols") === pl)
      assert(r.getAs[Int]("right_cols") === pl)
      assert(r.getAs[Long]("content_pm") ===
        w.toLong * h * 1000 / ((w + 2L * pl) * (h + 2 * pt)))
    }
  }
}
