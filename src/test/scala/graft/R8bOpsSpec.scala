package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-8 operator batch: contingency
  * marginal identities, the KS sup-gap bounds, Zipf rank arithmetic,
  * compaction byte conservation, dedup-weight coverage, JSON-flatten
  * validity accounting, CEP negation, blocked edit-distance recall,
  * the Lloyd-round inertia guarantee, and replay idempotence. */
class R8bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cls_contingency: marginal identities hold (row leverage sums to 0)") {
    val out = graft.classify.ClassifyQueries.clsContingency(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val n = out.head.getAs[Long]("n")
    assert(out.map(_.getAs[Long]("obs")).sum == n)
    // per returnflag: sum(obs) = row_total and sum(leverage) = 0
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("obs")).sum ==
        rows.head.getAs[Long]("row_total"))
      assert(rows.map(_.getAs[Long]("leverage")).sum == 0L,
        "leverage must sum to zero within a row of the table")
    }
  }

  test("cls_ks_drift: sup gap is bounded and attained at a data value") {
    val r = graft.classify.ClassifyQueries.clsKsDrift(spark, sfDir)
      .collect().head
    val (nRef, nCur) = (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))
    val num = r.getAs[Long]("ks_num")
    assert(r.getAs[Long]("ks_den") == nRef * nCur)
    assert(num >= 0 && num <= nRef * nCur, "0 <= D <= 1 scaled")
    val atCents = r.getAs[Long]("at_cents")
    val exists = Tables.orders(spark, sfDir)
      .filter(floor(col("o_totalprice") * 100).cast("long") === atCents)
      .limit(1).count()
    assert(exists == 1L, "argmax value must be an observed data value")
  }

  test("txt_zipf: ranks are 1..100 and rank_freq = rank * freq") {
    val out = graft.text.TextAnalysis.txtZipf(spark, sfDir).collect()
    // sf0.001's vocabulary is smaller than the top-100 cap; ranks
    // must still be dense from 1 and never exceed 100
    assert(out.length <= 100)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    val freqs = out.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      "frequency must be non-increasing in rank")
    assert(out.forall(r =>
      r.getAs[Long]("rank_freq") ==
        r.getAs[Int]("rank").toLong * r.getAs[Long]("freq")))
  }

  test("pipe_compaction: plan conserves bytes and docs; file ids contiguous") {
    val docs = Tables.documents(spark, sfDir)
    val out = graft.pipeline.CorpusPipeline.pipeCompaction(spark, sfDir)
      .collect()
    val totalBytes = docs.agg(sum(col("n_chars"))).as[Long].head()
    assert(out.map(_.getAs[Long]("bytes")).sum == totalBytes)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("out_file")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq,
        "output file ids must be contiguous from 0 within a source")
    }
  }

  test("pipe_dedup_weights: every doc weighted once; singletons get 1000") {
    val out = graft.pipeline.CorpusPipeline.pipeDedupWeights(spark, sfDir)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    assert(out.length == Tables.documents(spark, sfDir).count())
    out.groupBy(_.getAs[Long]("cluster")).foreach { case (_, rows) =>
      val size = rows.head.getAs[Long]("cluster_size")
      assert(rows.length == size)
      assert(rows.forall(_.getAs[Long]("weight_pm") == 1000L / size))
    }
  }

  test("src_json_flatten: validity accounting matches the mangle gate") {
    val out = graft.sources.SourceQueries.srcJsonFlatten(spark, sfDir)
      .collect()
    val expected = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_id") % 97 === 0, 0L).otherwise(1L)).as("ok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, ok) = expected(r.getString(0))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_valid") == ok,
        "every unmangled payload must parse, every mangled one must not")
    }
    assert(out.map(_.getAs[Long]("n_valid")).sum <
      out.map(_.getAs[Long]("n")).sum, "the mangle gate must fire")
  }

  test("str_cep_pattern: negation kills a match; window bounds apply") {
    def ev(id: Long, user: Long, tpe: String, hour: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-0${1 + hour / 24}%d " +
        f"${hour % 24}%02d:00:00"), user, tpe, 1.0, "{}")
    val events = Seq(
      ev(1, 1, "signup", 0), ev(2, 1, "purchase", 5),    // clean: match
      ev(3, 2, "signup", 0), ev(4, 2, "error", 2),
      ev(5, 2, "purchase", 5),                           // error between: no
      ev(6, 3, "signup", 0), ev(7, 3, "purchase", 26),   // in window: match
      ev(8, 4, "signup", 0), ev(9, 4, "purchase", 5),
      ev(10, 4, "error", 7)                              // error after: match
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.EventStreams.cepPattern(events)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_matches")).toMap
    assert(out == Map(1L -> 1L, 3L -> 1L, 4L -> 1L),
      s"user 2's error-between match must be suppressed: $out")
  }

  test("dedup_edit_distance: one-char drift pairs; blocking is the contract") {
    val docs = Seq(
      (1L, "shared prefix alpha beta gamma delta", "en", "a", 1L),
      (2L, "shared prefix alpha beta gamma delts", "en", "a", 1L),
      (3L, "shared prefix alpha beta gamma delta", "en", "a", 1L),
      (4L, "different opening words entirely here", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.dedup.Dedup.editDistancePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // (1,2) and (2,3) at dist 1; (1,3) identical -> dist 0 excluded;
    // doc 4 in another block -> never paired
    assert(out.toSet == Set((1L, 2L, 1), (2L, 3L, 1)), s"got ${out.toSeq}")
  }

  test("knn_kmeans_refine: the Lloyd update improves every cell") {
    val out = graft.sim.EmbOps.knnKmeansRefine(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum ==
      Tables.embeddings(spark, sfDir).count())
    out.foreach { r =>
      assert(r.getAs[Long]("inertia_mean_xn") <=
        r.getAs[Long]("inertia_seed_xn"),
        s"cell ${r.get(0)}: mean-centered WCSS must not exceed seed WCSS")
    }
  }

  test("knn_loo_label: agreement bounded; per-mille arithmetic exact") {
    val out = graft.sim.Knn.knnLooLabel(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, a) = (r.getAs[Long]("n_queries"), r.getAs[Long]("n_agree"))
      assert(a >= 0 && a <= n)
      assert(r.getAs[Long]("agree_pm") == a * 1000 / n)
    }
  }

  test("str_distinct_windowed: sketch falls back to exact below k") {
    val out = graft.streaming.EventStreams
      .strDistinctWindowed(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (est, exact) =
        (r.getAs[Long]("est_users"), r.getAs[Long]("exact_users"))
      assert(exact > 0)
      // windows under k distinct users must report exactly
      if (exact < 64) assert(est == exact,
        s"sub-k window must be exact: est=$est exact=$exact")
      assert(r.getAs[Long]("err_pm") ==
        math.abs(est - exact) * 1000 / exact)
    }
  }

  test("knn_graph_clusters: cluster census covers the corpus; purity exact") {
    val out = graft.sim.Knn.knnGraphClusters(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_vectors")).sum ==
      Tables.embeddings(spark, sfDir).count(),
      "every vector must land in exactly one cluster")
    out.foreach { r =>
      assert(r.getAs[Long]("n_top") <= r.getAs[Long]("n_vectors"))
      assert(r.getAs[Long]("n_labels") >= 1)
      assert(r.getAs[Long]("purity_pm") ==
        r.getAs[Long]("n_top") * 1000 / r.getAs[Long]("n_vectors"))
    }
  }

  test("txt_bpe_apply: merging strictly compresses; bounds hold") {
    val out = graft.text.TextAnalysis.txtBpeApply(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (chars, syms) = (r.getAs[Long]("chars"), r.getAs[Long]("symbols"))
      assert(syms <= chars, "a merge can only reduce symbol count")
      assert(syms >= r.getAs[Long]("n_words"),
        "every word is at least one symbol")
      assert(r.getAs[Long]("symbols_per_kchar") == syms * 1000 / chars)
      assert(syms * 1000 / chars < 1000,
        "4 merge rounds must compress a natural-language corpus")
    }
  }

  test("txt_source_overlap: Jaccard symmetric-bounded; diagonal excluded") {
    val out = graft.text.TextAnalysis.txtSourceOverlap(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "only s1 < s2 pairs")
      val (i, n1, n2) = (r.getAs[Long]("i"), r.getAs[Long]("n1"),
        r.getAs[Long]("n2"))
      assert(i <= math.min(n1, n2))
      assert(r.getAs[Long]("jaccard_pm") == i * 1000 / (n1 + n2 - i))
    }
  }

  test("str_lateness_audit: two-level running max equals the naive one") {
    val out = graft.streaming.EventStreams.strLatenessAudit(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // recompute the naive global running max on the driver
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var seen = Long.MinValue
    val late = evs.map { case (_, us) =>
      seen = math.max(seen, us); (us, seen - us)
    }
    val naive = late.groupBy { case (us, _) => us / 21600000000L }
      .map { case (w, xs) => w -> xs.map(_._2).max }
    val got = out.map { r =>
      val us = r.getAs[java.time.LocalDateTime](0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      us / 21600000000L -> r.getAs[Long]("max_late_us")
    }.toMap
    assert(got == naive, "decomposed running max must equal the naive scan")
  }

  test("mask_ldiversity: l bounded by group size and sensitive domain") {
    val out = graft.mask.MaskQueries.maskLDiversity(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lMin = r.getAs[Long]("l_min")
      assert(lMin >= 1 && lMin <= 5, "l is bounded by the 5-class domain")
      assert(r.getAs[Long]("n_groups_l1") <= r.getAs[Long]("n_groups"))
      if (r.getAs[Long]("n_groups_l1") == 0)
        assert(lMin >= 2, "no homogeneous groups implies l_min >= 2")
    }
  }

  test("pipe_filter_sweep: monotone in the threshold; zero-threshold = all") {
    val out = graft.pipeline.CorpusPipeline.pipeFilterSweep(spark, sfDir)
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(50, 100, 200, 400, 800))
    val docs = out.map(_.getAs[Long]("n_docs"))
    val toks = out.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      "surviving docs must be non-increasing in the threshold")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }

  test("cdc_replay_idempotence: applied state equals clean delivery") {
    val out = graft.cdc.CdcQueries.replayIdempotence(spark, sfDir).collect()
    val clean = Tables.events(spark, sfDir)
      .select(when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d").otherwise("u").as("op"),
        floor(col("value") * 100).cast("long").as("cents"),
        (col("event_id") % 5 === 0).as("replayed"))
      .groupBy("op")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        sum(when(col("replayed"), 1L).otherwise(0L)).as("n_rep"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, cents, nRep) = clean(r.getString(0))
      assert(r.getAs[Long]("n_applied") == n,
        "exactly-once apply must converge to the clean row count")
      assert(r.getAs[Long]("applied_cents") == cents,
        "exactly-once apply must converge to the clean checksum")
      assert(r.getAs[Long]("n_dup_deliveries") == nRep,
        "dup count must equal the replayed-offset count")
      assert(r.getAs[Long]("n_delivered") == n + nRep)
    }
  }
}
