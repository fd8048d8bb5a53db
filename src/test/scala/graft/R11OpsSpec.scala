package graft

import org.apache.spark.sql.functions._

/** Round-11 pins: conservation/bound laws for the new operators —
  * each law is engine-independent (it must hold on ANY input), so a
  * fixture change can't silently hollow the test out. */
class R11OpsSpec extends SparkSpec {

  test("r11 executed-plan pins: dimension-frame windows, keyed " +
      "semantic-dedup join, codegen winnowing") {
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      val qe = df.queryExecution
      qe.toRdd.count()
      qe.executedPlan.toString.split("== Initial Plan ==").head
    }
    // q63 (r12 re-plumb): zero ntile windows — the quintiles are
    // arithmetic on the two-level shard rank, and every window in
    // the plan carries a shard partition spec (the broader
    // no-unpartitioned-window pin lives in PlanSpec "r12 re-plumbs")
    val p63 = plan(ops.Relational.q63(spark, sfDir))
    assert(!p63.contains("ntile"),
      s"q63 must derive quintiles from the shard rank, not ntile:\n$p63")
    assert(p63.contains("windowspecdefinition(_sh0"),
      s"q63 ranks must ride the shard decomposition:\n$p63")
    // dedup_semdedup: pair join keyed by the cell — no cartesian, and
    // the distance rides the codegen dot
    val psd = plan(graft.dedup.Dedup.dedupSemdedup(spark, sfDir))
    assert(psd.contains("graft_dot"))
    assert(!psd.contains("CartesianProduct") &&
      !psd.contains("BroadcastNestedLoop"),
      s"semdedup must block on the cell:\n$psd")
    // winnowing: the layout build is map-only up to the bucketed
    // writes — the per-position explode and per-doc window are gone
    val ptw = plan(text.TextAnalysis.txtWinnowing(spark, sfDir))
    assert(!ptw.contains("Window ["),
      s"winnowing stats must come from the layout, not a window:\n$ptw")
  }

  test("q62_abc_pareto: classes partition the part dimension and " +
      "revenue shares reconcile") {
    val abc = ops.Relational.q62(spark, sfDir).collect()
    val nParts = ops.Relational.q62(spark, sfDir)
      .agg(sum("n_parts")).head.getLong(0)
    val distinctParts = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(nParts === distinctParts, "every part lands in exactly one class")
    val sharePm = abc.map(_.getAs[Long]("class_share_pm")).sum
    assert(sharePm >= 997 && sharePm <= 1000,
      s"per-mille class shares must reconcile to ~1000, got $sharePm")
    // A-class cumulative contract: A alone never exceeds 800‰ + one
    // part's share (the part that crosses the boundary belongs to A)
    val a = abc.find(_.getString(0) == "A").get
    assert(a.getAs[Long]("class_share_pm") <= 800 + a.getAs[Long]("max_part_share_pm"))
  }

  test("q63_rfm_segments: quintile scores partition customers with " +
      "near-equal ntile heights") {
    val seg = ops.Relational.q63(spark, sfDir)
    val total = seg.agg(sum("n_customers")).head.getLong(0)
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(total === nCust)
    // each R quintile (first digit) holds n/5 ± 1 customers
    val byR = seg.groupBy(expr("rfm_segment div 100").as("r"))
      .agg(sum("n_customers").as("n")).collect()
    assert(byR.length === 5)
    byR.foreach { row =>
      val n = row.getAs[Long]("n")
      assert(math.abs(n - nCust / 5) <= 1, s"ntile height off: $n")
    }
  }

  test("q64_hist2d: cells are disjoint, exhaustive, and shares are " +
      "floor-consistent") {
    val h = ops.Relational.q64(spark, sfDir)
    val total = h.agg(sum("n_rows")).head.getLong(0)
    assert(total === Tables.lineitem(spark, sfDir).count())
    val bad = h.filter(col("row_share_pm") < 0 || col("row_share_pm") > 1000)
    assert(bad.count() === 0)
  }

  test("cls_jsd_drift: halves partition the corpus and whole-bit " +
      "ratios are bounded by the mixture law") {
    val j = classify.ClassifyQueries.clsJsdDrift(spark, sfDir)
    val tot = j.agg((sum("n_ref") + sum("n_cur")).as("t")).head.getLong(0)
    assert(tot === Tables.lineitem(spark, sfDir).count())
    // p/m ≤ 2 and q/m ≤ 2 ⇒ whole-bit value ≤ 1; JSD ≥ 0 per side is
    // not a whole-bit law, but the +1 upper bound is
    val bad = j.filter(col("ref_bits") > 1 || col("cur_bits") > 1)
    assert(bad.count() === 0, "pointwise log2 ratio vs mixture can't exceed 1 bit")
  }

  test("cls_hhi_concentration: HHI bounds — 1000/k ≤ hhi_pm ≤ 1000, " +
      "effective categories ≤ k") {
    classify.ClassifyQueries.clsHhiConcentration(spark, sfDir).collect()
      .foreach { r =>
        val k = r.getAs[Long]("k")
        val hhi = r.getAs[Long]("hhi_pm")
        assert(hhi <= 1000 && hhi >= 1000 / k - 1,
          s"HHI out of [1000/k, 1000]: $hhi (k=$k)")
        assert(r.getAs[Long]("eff_categories_milli") <= k * 1000 + 1000)
      }
  }

  test("mask_t_closeness: TVD is a per-mille distance — bounded, and " +
      "zero iff the class matches the global distribution") {
    val t = graft.mask.MaskQueries.maskTCloseness(spark, sfDir)
    assert(t.filter(col("tvd_pm") < 0 || col("tvd_pm") > 1000).count() === 0)
    val nG = t.agg(sum("n_g")).head.getLong(0)
    assert(nG === Tables.customer(spark, sfDir).count())
  }

  test("mask_info_loss: discernibility and rows reconcile with the " +
      "VGH frame") {
    val loss = graft.mask.MaskQueries.maskInfoLoss(spark, sfDir).collect()
    val vgh = graft.mask.MaskQueries.maskVghGeneralize(spark, sfDir).collect()
    assert(loss.map(_.getAs[Long]("n_rows")).sum ===
      vgh.map(_.getAs[Long]("n")).sum)
    // discernibility per level ≥ n_rows (equality iff all classes are
    // singletons) and ≤ n_rows² (one class)
    loss.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val d = r.getAs[Long]("discernibility")
      assert(d >= n && d <= n * n)
    }
  }

  test("cdc_soft_delete: every key survives with a flag; non-deleted " +
      "rows equal snapshot apply") {
    val sd = cdc.CdcQueries.softDelete(spark, sfDir)
    val keys = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(sd.count() === keys, "rewrite keeps every key")
    val live = sd.filter(!col("__deleted"))
      .select("user_id", "value", "last_event_id")
    val snap = cdc.CdcQueries.snapshotApply(spark, sfDir)
    assert(live.exceptAll(snap).count() === 0 &&
      snap.exceptAll(live).count() === 0,
      "non-deleted rows must equal snapshot-apply")
  }

  test("cdc_heartbeat: head shard has zero lag and silent runs fit " +
      "the spine") {
    val hb = cdc.CdcQueries.heartbeat(spark, sfDir).collect()
    assert(hb.exists(_.getAs[Long]("lag_us") == 0L),
      "some shard carries the stream head")
    hb.foreach { r => assert(r.getAs[Long]("lag_us") >= 0L) }
  }

  test("str_mann_kendall: the pair census is exhaustive and S is the " +
      "concordant-discordant difference") {
    streaming.EventStreams.strMannKendall(spark, sfDir).collect()
      .foreach { r =>
        val n = r.getAs[Long]("n_days")
        val pairs = r.getAs[Long]("n_concordant") +
          r.getAs[Long]("n_discordant") + r.getAs[Long]("n_tie")
        assert(pairs === n * (n - 1) / 2, "every (i<j) day pair counted once")
        assert(r.getAs[Long]("s_stat") ===
          r.getAs[Long]("n_concordant") - r.getAs[Long]("n_discordant"))
      }
  }

  test("q65_cohort_revenue: offset-0 actives cover every customer and " +
      "revenue reconciles") {
    val t = ops.Relational.q65(spark, sfDir)
    val firstMonthActives = t.filter(col("month_offset") === 0)
      .agg(sum("n_active")).head.getLong(0)
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(firstMonthActives === nCust,
      "every customer is active in their own cohort month")
    assert(t.filter(col("month_offset") < 0).count() === 0)
    val rev = t.agg(sum("rev_cents")).head.getLong(0)
    val total = Tables.orders(spark, sfDir)
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 " +
        "as bigint)"))).head.getLong(0)
    assert(rev === total, "the triangle partitions total revenue")
  }

  test("dedup_semdedup: at least one survivor per cell and drops are " +
      "per-mille bounded") {
    val s = graft.dedup.Dedup.dedupSemdedup(spark, sfDir)
    val n = s.agg(sum("n")).head.getLong(0)
    assert(n === Tables.embeddings(spark, sfDir).count())
    s.collect().foreach { r =>
      assert(r.getAs[Long]("n_dropped") < r.getAs[Long]("n"),
        "keep-first always leaves the lowest id standing")
      val pm = r.getAs[Long]("drop_pm")
      assert(pm >= 0 && pm <= 1000)
    }
  }

  test("src_rowgroup_prune: stats envelopes cover the corpus and the " +
      "mid-range predicate prunes only non-overlapping buckets") {
    val p = sources.SourceQueries.srcRowgroupPrune(spark, sfDir).collect()
    val rows = p.map(_.getAs[Long]("rows")).sum
    assert(rows === Tables.lineitem(spark, sfDir).count())
    // a bucket whose stats envelope intersects the predicate range is
    // NEVER pruned (stats pruning must be sound, not just effective)
    val mx = Tables.lineitem(spark, sfDir)
      .agg(max("l_orderkey")).head.getLong(0)
    val (lo, hi) = ((mx + 1) / 2, (mx + 1) * 3 / 4 - 1)
    p.foreach { r =>
      val overlaps = r.getAs[Long]("stats_max") >= lo &&
        r.getAs[Long]("stats_min") <= hi
      assert(r.getAs[Boolean]("pruned") === !overlaps)
    }
    assert(p.exists(_.getAs[Boolean]("pruned")),
      "the fixed quarter-range predicate must skip at least one bucket")
  }

  test("str_burn_rate: windows partition the stream, burn is " +
      "self-calibrated, and the hourly max dominates the window mean") {
    val b = streaming.EventStreams.strBurnRate(spark, sfDir)
    val n = b.agg(sum("n")).head.getLong(0)
    assert(n === Tables.events(spark, sfDir).count())
    b.collect().foreach { r =>
      // the window burn is the n-weighted mean of its hourly burns, so
      // the hourly max dominates it (±1 for integer floors)
      assert(r.getAs[Long]("max_burn_1h_pm") >=
        r.getAs[Long]("burn_6h_pm") - 1)
      assert(r.getAs[Long]("err_ppm") >= 0 &&
        r.getAs[Long]("err_ppm") <= 1000000)
    }
  }

  test("mask_token_collision: inputs are width-invariant and the " +
      "collision curve is monotone in width") {
    val t = graft.mask.MaskQueries.maskTokenCollision(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("token_width"))
    val nIn = t.map(_.getAs[Long]("n_inputs")).distinct
    assert(nIn.length === 1, "every width sees the same input set")
    t.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_inputs"))
      assert(r.getAs[Long]("n_tokens") +
        r.getAs[Long]("n_collided") >= r.getAs[Long]("n_inputs"),
        "non-collided inputs have unique tokens")
    }
    val pms = t.map(_.getAs[Long]("collision_pm"))
    assert(pms.zip(pms.tail).forall { case (a, b) => a >= b },
      s"longer tokens can't collide more: ${pms.toSeq}")
    assert(pms.head > pms.last,
      "the fixture must actually show the curve falling")
  }

  test("graft_winnow_sel equals the explode+window reference " +
      "construction, selection by selection") {
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val viaExpr = docs
      .select(col("doc_id"),
        explode(call_function(graft.expr.VectorExprs.winnowSelName,
          regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
          .as("sel"))
    val viaWindow = graft.text.TextAnalysis.winnowSelections(docs)
    // multiset equality both directions (explode keeps duplicates)
    val l = viaExpr.groupBy("doc_id", "sel").count()
    val r = viaWindow.groupBy("doc_id", "sel").count()
    assert(l.exceptAll(r).count() === 0 && r.exceptAll(l).count() === 0,
      "codegen winnowing must match the published explode+window form")
    // non-BMP safety: a surrogate-pair doc positions by code points
    import spark.implicits._
    val emoji = Seq((1L, "a😀bcdefghij klmnop")).toDF("doc_id", "text")
    val e = emoji.select(explode(call_function(
        graft.expr.VectorExprs.winnowSelName,
        regexp_replace(trim(lower(col("text"))), "\\s+", " "))).as("sel"))
    val w = graft.text.TextAnalysis.winnowSelections(emoji)
      .select(col("sel"))
    assert(e.exceptAll(w).count() === 0 && w.exceptAll(e).count() === 0,
      "surrogate pairs must count as one position on both paths")
  }

  test("emb_silhouette: scores are per-mille bounded and the panel " +
      "covers every vector") {
    val s = sim.EmbOps.embSilhouette(spark, sfDir)
    val n = s.agg(sum("n")).head.getLong(0)
    assert(n === Tables.embeddings(spark, sfDir).count())
    s.collect().foreach { r =>
      assert(r.getAs[Long]("mean_s_pm") >= -1000 &&
        r.getAs[Long]("mean_s_pm") <= 1000)
      assert(r.getAs[Long]("min_s_pm") >= -1000)
      assert(r.getAs[Long]("n_misrouted") <= r.getAs[Long]("n"))
    }
  }
}
