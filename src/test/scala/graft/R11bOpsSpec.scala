package graft

import org.apache.spark.sql.functions._

/** Round-11b pins: conservation/bound laws for the resumed-session
  * operators — each law is engine-independent (must hold on ANY
  * input), so a fixture change can't silently hollow the test out. */
class R11bOpsSpec extends SparkSpec {

  test("q66_interval_coverage: union length bounded by event mass " +
      "and island structure") {
    val cov = ops.Relational.q66(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(cov.map(_.getAs[Long]("n_events")).sum === nEvents,
      "every event lands in exactly one user panel")
    cov.foreach { r =>
      val nEv = r.getAs[Long]("n_events")
      val covered = r.getAs[Long]("covered_us")
      val maxIsl = r.getAs[Long]("max_island_us")
      val nIsl = r.getAs[Long]("n_islands")
      assert(nIsl >= 1 && nIsl <= nEv)
      // each event contributes at most its own 300s, at least one
      // interval is fully covered, and no island beats the union
      assert(covered <= nEv * 300000000L)
      assert(covered >= 300000000L && maxIsl >= 300000000L)
      assert(maxIsl <= covered)
    }
  }

  test("q67_bitmap_distinct: popcount equals the exact distinct " +
      "count per group (bitmap-OR is lossless)") {
    val bm = ops.Relational.q67(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_distinct_parts")))
      .toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("d"))
      .toMap
    assert(bm.keySet === exact.keySet)
    bm.foreach { case (k, (words, pops)) =>
      assert(pops === exact(k), s"bitmap distinct diverged at $k")
      assert(words <= pops, "a live word holds at least one bit")
    }
  }

  test("q68_decay_weighted: weights bounded by the 1024 grid and " +
      "freshness reconciles") {
    ops.Relational.q68(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val rev = r.getAs[Long]("rev_cents")
      val dec = r.getAs[Long]("decayed_1024")
      val pm = r.getAs[Long]("freshness_pm")
      val wt = r.getAs[Long]("wt_sum")
      assert(dec >= 0 && dec <= 1024L * rev)
      assert(pm >= 0 && pm <= 1000)
      assert(wt >= 0 && wt <= 1024L * n)
    }
  }

  test("cls_gamma_assoc: gamma in [-1000, 1000] and pair counts " +
      "bounded by n-choose-2") {
    val n = Tables.lineitem(spark, sfDir).count()
    val rows = classify.ClassifyQueries.clsGammaAssoc(spark, sfDir)
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val c = r.getAs[Long]("c_pairs"); val d = r.getAs[Long]("d_pairs")
      val g = r.getAs[Long]("gamma_pm")
      assert(c >= 0 && d >= 0 && c + d <= n * (n - 1) / 2)
      assert(g >= -1000 && g <= 1000)
    }
  }

  test("cls_anova: decomposition covers all rows; F and eta2 " +
      "non-negative with eta2 <= 1000") {
    val rows = classify.ClassifyQueries.clsAnova(spark, sfDir).collect()
    val n = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    rows.foreach { r =>
      assert(r.getAs[Long]("ssb") >= 0 && r.getAs[Long]("ssw") >= 0)
      assert(r.getAs[Long]("f_milli") >= 0)
      val eta = r.getAs[Long]("eta2_pm")
      assert(eta >= 0 && eta <= 1000)
      val mm = r.getAs[Long]("mean_milli")
      assert(mm >= 1000 && mm <= 50000,
        "quantity means must sit inside the value grid")
    }
  }

  test("emb_jl_projection: histogram buckets are consistent and " +
      "pair mass matches the consecutive-id pairing") {
    val rows = sim.EmbOps.embJlProjection(spark, sfDir).collect()
    val nVec = Tables.embeddings(spark, sfDir).count()
    val pairs = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(pairs >= 1 && pairs <= nVec / 2)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = r.getAs[Long]("lo_pm"); val hi = r.getAs[Long]("hi_pm")
      assert(lo >= b * 200 && hi < (b + 1) * 200 && lo <= hi,
        "bucket bounds must contain the ratio extrema")
      assert(b >= 0, "squared-distance ratios are non-negative")
    }
  }

  test("str_watermark_skew: the global watermark is the slowest " +
      "shard and the skew is non-negative") {
    val rows = streaming.EventStreams.strWatermarkSkew(spark, sfDir)
      .collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shards") >= 1 &&
        r.getAs[Long]("n_shards") <= 8)
      assert(r.getAs[Long]("skew_us") >= 0)
      val lag = r.getAs[Long]("laggard_shard")
      assert(lag >= 0 && lag < 8)
    }
  }

  test("dedup_shard_audit: content-keyed sharding is lossless, " +
      "global misses nothing, and no plan beats global") {
    val rows = dedup.Dedup.dedupShardAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("1_global", "2_by_content",
      "3_by_source", "4_by_round_robin"))
    val g = rows("1_global").getAs[Long]("n_removed")
    assert(rows("1_global").getAs[Long]("n_missed") === 0L)
    assert(rows("2_by_content").getAs[Long]("loss_pm") === 0L,
      "hash(fingerprint) sharding co-locates every duplicate")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_removed") <= g,
        "shard-local dedup never removes more than global")
      assert(r.getAs[Long]("n_missed") ===
        g - r.getAs[Long]("n_removed"))
    }
  }

  test("txt_ocr_garbage: per-mille rates bounded and doc mass " +
      "conserved") {
    val rows = text.TextAnalysis.txtOcrGarbage(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      Seq("mixed_pm", "cons_run_pm", "long_tok_pm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000, s"$c out of per-mille range")
      }
    }
  }

  test("src_delta_vacuum: retention holds recent removes, reclaims " +
      "expired ones, and flags the orphan") {
    val rows = sources.SourceQueries.srcDeltaVacuum(spark, sfDir)
      .collect().map(r => r.getAs[Long]("file_id") -> r).toMap
    assert(rows.keySet === (0L to 6L).toSet)
    assert(rows(1L).getString(2) === "expired_remove" &&
      rows(1L).getBoolean(3))
    assert(rows(3L).getString(2) === "recent_remove" &&
      !rows(3L).getBoolean(3), "inside-horizon remove must survive")
    assert(rows(6L).getString(2) === "orphan" && rows(6L).getBoolean(3))
    Seq(0L, 2L, 4L, 5L).foreach { f =>
      assert(rows(f).getString(2) === "live" && !rows(f).getBoolean(3))
    }
  }

  test("mm_image_letterbox: pad waste bounded, image mass conserved, " +
      "and scaled pixels never exceed the tile") {
    val rows = multimodal.BinaryPipeline.mmImageLetterbox(spark, sfDir)
      .collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum === nDocs)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_images")
      Seq("avg_waste_pm", "min_waste_pm", "max_waste_pm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000, s"$c out of per-mille range")
      }
      assert(r.getAs[Long]("min_waste_pm") <=
        r.getAs[Long]("avg_waste_pm"))
      assert(r.getAs[Long]("avg_waste_pm") <=
        r.getAs[Long]("max_waste_pm"))
      assert(r.getAs[Long]("scaled_px") <= 1024L * n)
    }
  }

  test("r11b executed-plan pins: q66's window is user-partitioned " +
      "and q67 aggregates without Expand") {
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      val qe = df.queryExecution
      qe.toRdd.count()
      qe.executedPlan.toString.split("== Initial Plan ==").head
    }
    val p66 = plan(ops.Relational.q66(spark, sfDir))
    assert(p66.contains("partitionspec") ||
      p66.contains("PartitionSpec") || p66.contains("user_id"),
      s"q66 window must be keyed by user_id:\n$p66")
    assert(!p66.matches("(?s).*Window \\[[^\\]]*\\]\\s*,\\s*\\[\\].*"),
      "q66 must not run an unpartitioned window")
    val p67 = plan(ops.Relational.q67(spark, sfDir))
    assert(!p67.contains("Expand"),
      s"bitmap distinct must not expand rows (that's the point):\n$p67")
  }

  test("pipe_packing_contamination: contaminated pairs are a strict " +
      "subset of each bin's causal pairs and mass is conserved") {
    val rows = pipeline.CorpusPipeline
      .pipePackingContamination(spark, sfDir).collect()
    val tok = pipeline.CorpusPipeline
      .pipePackSequences(spark, sfDir)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === tok,
      "token mass must match the packer's")
    rows.foreach { r =>
      val c = r.getAs[Long]("contam_pairs")
      val t = r.getAs[Long]("total_pairs")
      val pm = r.getAs[Long]("contam_pm")
      assert(c >= 0 && c <= t)
      assert(pm >= 0 && pm <= 1000)
      assert(r.getAs[Long]("n_mixed_bins") <= r.getAs[Long]("n_bins"))
      // a bin with one doc contaminates nothing; mixed bins must
      // exist at the 2048 budget on this corpus
      assert(r.getAs[Long]("n_mixed_bins") >= 1)
    }
  }

  test("mask_rank_swap: marginal distribution preserved exactly, " +
      "swap is an involution (sum + multiset conserved)") {
    val swapped = graft.mask.MaskQueries.maskRankSwap(spark, sfDir)
    val orig = Tables.customer(spark, sfDir)
      .select((col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val a = swapped.groupBy("swapped_cents").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = orig.groupBy("cents").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "rank swap must preserve the exact value multiset")
    val n = orig.count()
    assert(swapped.count() === n, "every customer keeps exactly one row")
  }

  test("pipe_shard_rebalance: excesses sum to zero and the flow " +
      "telescopes back to zero at the last shard") {
    val rows = pipeline.CorpusPipeline.pipeShardRebalance(spark, sfDir)
      .orderBy("shard_id").collect()
    assert(rows.map(_.getAs[Long]("excess")).sum === 0L,
      "targets must partition the total exactly")
    assert(rows.last.getAs[Long]("boundary_flow") === 0L,
      "the prefix flow must telescope to zero")
    val tgt = rows.map(_.getAs[Long]("target"))
    assert(tgt.max - tgt.min <= 1, "remainder spread is at most 1 token")
  }

  test("mask_dp_geometric: noise is bounded by the truncation and " +
      "drawn from the exact threshold table") {
    val rows = graft.mask.MaskQueries.maskDpGeometric(spark, sfDir).collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("noise")
      assert(k >= -10 && k <= 10, "truncated two-sided geometric")
      assert(r.getAs[Long]("n_released") ===
        r.getAs[Long]("n_true") + k)
    }
    // the mechanism is deterministic per cell: re-running draws the
    // identical noise (replayable release)
    val again = graft.mask.MaskQueries.maskDpGeometric(spark, sfDir).collect()
    assert(rows.map(_.toSeq.toList).toList ===
      again.map(_.toSeq.toList).toList)
  }

  test("cls_null_pattern: patterns partition customers and missing " +
      "flags nest (no orders implies no urgent/recent orders)") {
    val rows = classify.ClassifyQueries.clsNullPattern(spark, sfDir)
      .collect()
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCust)
    rows.foreach { r =>
      val p = r.getAs[Long]("pattern")
      // nesting law: bit0 (no orders at all) forces bits 1 and 2
      if ((p & 1L) == 1L) assert(p === 7L,
        s"a customer with no orders can't have urgent/recent ones: $p")
      val pm = r.getAs[Long]("share_pm")
      assert(pm >= 0 && pm <= 1000)
    }
  }

  test("knn_tombstone_audit: cell census conserves vectors and the " +
      "delete set is exactly the vec_id % 10 residue class") {
    val rows = sim.Knn.knnTombstoneAudit(spark, sfDir).collect()
    val nVec = Tables.embeddings(spark, sfDir).count()
    val nDel = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(10L)) === 0).count()
    assert(rows.map(_.getAs[Long]("n_before")).sum === nVec)
    assert(rows.map(_.getAs[Long]("n_deleted")).sum === nDel)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_live") ===
        r.getAs[Long]("n_before") - r.getAs[Long]("n_deleted"))
      val pm = r.getAs[Long]("live_pm")
      assert(pm >= 0 && pm <= 1000)
      assert(r.getAs[Boolean]("compact") === (pm < 800))
    }
  }

  test("txt_source_jsd: scores are non-negative, pairs cover the " +
      "full upper triangle once, and JSD is bounded by 1 bit/token") {
    val rows = text.TextAnalysis.txtSourceJsd(spark, sfDir).collect()
    val nSrc = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length === nSrc * (nSrc - 1) / 2,
      "exactly one row per unordered source pair")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      val j = r.getAs[Long]("jsd_millibits")
      // true JSD is within [0, 1] bit/token; the whole-bit floor
      // under-estimates by at most 1 bit per side, so the integer
      // score lives in [-1000, 1000] with near-identical sources at
      // the (slightly negative) bottom
      assert(j >= -1000 && j <= 1000, s"jsd out of range: $j")
    }
  }

  test("emb_clip_calibration: the p99 rank walk clips at most ~1% " +
      "of vectors and the energy ledger is consistent") {
    val r = sim.EmbOps.embClipCalibration(spark, sfDir).head()
    val n = r.getAs[Long]("n_vectors")
    val clipped = r.getAs[Long]("n_clipped")
    assert(n === Tables.embeddings(spark, sfDir).count())
    // strictly-above-p99 mass is bounded by n - ceil(0.99 n) < n/100+1
    assert(clipped * 100 <= n + 100,
      s"p99 clip must cut at most ~1%: $clipped of $n")
    assert(r.getAs[Long]("clipped_pm") >= 0 &&
      r.getAs[Long]("clipped_pm") <= 1000)
    assert(r.getAs[Long]("energy_lost_pm") >= 0 &&
      r.getAs[Long]("energy_lost_pm") <=
        r.getAs[Long]("clipped_pm"),
      "per-vector lost energy can't exceed the clipped share " +
        "(only the above-threshold excess is lost)")
    assert(r.getAs[Long]("p99_norm_milli") > 0)
  }

  test("mm_audio_pitch: lag census conserves docs, lags stay on the " +
      "candidate grid, and voicing is a bounded ratio") {
    val rows = multimodal.BinaryPipeline.mmAudioPitch(spark, sfDir)
      .collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val grid = Set(24L, 28L, 32L, 36L, 40L, 44L, 48L, 52L)
    rows.foreach { r =>
      assert(grid.contains(r.getAs[Long]("best_lag")))
      val lo = r.getAs[Long]("min_voiced_pm")
      val hi = r.getAs[Long]("max_voiced_pm")
      // |R(t)| <= R(0) by Cauchy-Schwarz: the ratio lives in [-1, 1]
      assert(lo >= -1000 && hi <= 1000 && lo <= hi)
    }
  }

  test("pipe_dedup_mix_shift: censuses conserve mass and the drift " +
      "column telescopes to ~0 across languages") {
    val rows = pipeline.CorpusPipeline.pipeDedupMixShift(spark, sfDir)
      .collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("docs_before")).sum === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_after") <= r.getAs[Long]("docs_before"))
      assert(r.getAs[Long]("tokens_after") <=
        r.getAs[Long]("tokens_before"))
      assert(r.getAs[Long]("drift_pm") ===
        r.getAs[Long]("share_after_pm") -
          r.getAs[Long]("share_before_pm"))
    }
    // shares each sum to ~1000 (floor loss < |langs|), so drifts sum
    // to ~0 — the mix is redistributed, never created
    val driftSum = rows.map(_.getAs[Long]("drift_pm")).sum
    assert(math.abs(driftSum) < rows.length,
      s"drift must telescope to ~0, got $driftSum")
  }

  test("pipe_truncation_waste: dropped mass is monotone decreasing " +
      "in the context length and bounded by the corpus") {
    val rows = pipeline.CorpusPipeline.pipeTruncationWaste(spark, sfDir)
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { case (_, panel) =>
      val byL = panel.sortBy(_.getAs[Long]("max_len"))
      assert(byL.map(_.getAs[Long]("max_len")).toSeq ===
        Seq(128L, 256L, 512L, 1024L))
      val drops = byL.map(_.getAs[Long]("tokens_dropped"))
      assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
        "a longer context never drops more tokens")
      val truncs = byL.map(_.getAs[Long]("docs_truncated"))
      assert(truncs.zip(truncs.tail).forall { case (a, b) => a >= b })
      byL.foreach { r =>
        assert(r.getAs[Long]("tokens_dropped") <=
          r.getAs[Long]("n_tokens"))
        val pm = r.getAs[Long]("dropped_pm")
        assert(pm >= 0 && pm <= 1000)
      }
    }
  }

  test("q69_bitmap_rollup: every grain's popcount equals the exact " +
      "distinct count (OR-merge is lossless across grains)") {
    val rows = ops.Relational.q69(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
    rows.foreach { r =>
      val gid = r.getAs[Long]("gid")
      val exact = gid match {
        case 0L => li.filter(col("l_returnflag") === r.getString(1) &&
          col("l_linestatus") === r.getString(2))
        case 1L => li.filter(col("l_returnflag") === r.getString(1))
        case _ => li
      }
      assert(r.getAs[Long]("n_distinct") ===
        exact.select("l_partkey").distinct().count(),
        s"grain $gid diverged from the exact distinct count")
    }
    assert(rows.count(_.getAs[Long]("gid") == 3L) === 1)
  }

  test("pipe_source_overlap_matrix: containment bounded, grains " +
      "canonical, and every exact overlap surfaces at head grain") {
    val rows = pipeline.CorpusPipeline
      .pipeSourceOverlapMatrix(spark, sfDir).collect()
    val heads = rows.filter(_.getString(0) == "head16")
      .map(r => (r.getString(1), r.getString(2))).toSet
    rows.foreach { r =>
      assert(Set("exact", "head16").contains(r.getString(0)))
      assert(r.getString(1) < r.getString(2), "canonical pair order")
      val pm = r.getAs[Long]("containment_pm")
      assert(pm >= 0 && pm <= 1000)
      assert(r.getAs[Long]("shared_fp") >= 1)
      if (r.getString(0) == "exact")
        assert(heads.contains((r.getString(1), r.getString(2))),
          "an exact copy shares its head — the head grain must see it")
    }
    // the head grain must fire on this corpus (degenerate-empty
    // results were the r10 advice trap)
    assert(heads.nonEmpty)
  }
}
