package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the second round-8 operator batch: DBSCAN
  * role/density consistency, co-moment positive-semidefiniteness
  * diagonals, the power-iteration/covariance cross-check, randomized-
  * response count conservation and estimator quality, banded-Hamming
  * completeness against brute force, and autocorrelation moment
  * identities. */
class R8cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("knn_dbscan: roles partition the corpus; density rules hold") {
    val out = graft.sim.Knn.knnDbscan(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir)
    assert(out.length == emb.count())
    val byRole = out.groupBy(_.getAs[String]("role")).view.mapValues(_.length)
    assert(byRole.getOrElse("core", 0) > 0, "eps/minPts must yield cores")
    assert(byRole.getOrElse("noise", 0) > 0, "outliers must stay unclustered")
    // every core/border row carries a real cluster label; noise = -1
    out.foreach { r =>
      val c = r.getAs[Long]("cluster")
      if (r.getAs[String]("role") == "noise") assert(c == -1L)
      else assert(c >= 0L, "clustered rows need a component label")
    }
    // cluster label is the min vec_id of the cluster's CORE members
    val cores = out.filter(_.getAs[String]("role") == "core")
    cores.groupBy(_.getAs[Long]("cluster")).foreach { case (lbl, rows) =>
      assert(rows.map(_.getAs[Long]("vec_id")).min == lbl)
    }
    // border labels refer to existing core clusters
    val coreLbls = cores.map(_.getAs[Long]("cluster")).toSet
    out.filter(_.getAs[String]("role") == "border")
      .foreach(r => assert(coreLbls.contains(r.getAs[Long]("cluster"))))
  }

  test("knn_dbscan: core degree >= 3 against the exact neighbor relation") {
    graft.expr.VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val deg = graft.dedup.Dedup.embeddingPairs(emb, 0.30)
      .select(col("id1").as("v")).union(
        graft.dedup.Dedup.embeddingPairs(emb, 0.30).select(col("id2")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.sim.Knn.knnDbscan(spark, sfDir).collect().foreach { r =>
      val d = deg.getOrElse(r.getAs[Long]("vec_id"), 0L)
      if (r.getAs[String]("role") == "core") assert(d >= 3L)
      else assert(d < 3L, "non-core rows must be below the density gate")
    }
  }

  test("emb_covariance: full triangle, diagonal variance non-negative") {
    val out = graft.sim.EmbOps.embCovariance(spark, sfDir).collect()
    val d = out.map(_.getAs[Long]("i")).max
    assert(out.length == d * (d + 1) / 2, "one row per upper-triangle slot")
    out.foreach { r =>
      assert(r.getAs[Long]("cov_xn2") ==
        r.getAs[Long]("n") * r.getAs[Long]("sum_qij") -
          r.getAs[Long]("sum_qi") * r.getAs[Long]("sum_qj"))
      if (r.getAs[Long]("i") == r.getAs[Long]("j"))
        assert(r.getAs[Long]("cov_xn2") >= 0L,
          "n*Σq² - (Σq)² >= 0 by Cauchy-Schwarz")
    }
  }

  test("emb_power_iter: one row per dim, n = corpus size, v0 = ±1") {
    val out = graft.sim.EmbOps.embPowerIter(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("d")).toSeq == (1L to out.length))
    assert(out.forall(_.getAs[Long]("n") == n))
    assert(out.forall(r => math.abs(r.getAs[Long]("v0")) == 1L))
    // A·v0 must not be the zero vector for a full-rank-ish corpus
    assert(out.exists(_.getAs[Long]("v1_q") != 0L))
  }

  test("mask_rand_response: counts conserved; estimator tracks truth") {
    val out = graft.mask.MaskQueries.maskRandResponse(spark, sfDir).collect()
    val nTrue = out.map(_.getAs[Long]("n_true")).sum
    val nObs = out.map(_.getAs[Long]("n_obs")).sum
    assert(nTrue == nObs, "RR permutes categories; total mass is conserved")
    out.foreach { r =>
      assert(r.getAs[Long]("est_num") ==
        r.getAs[Long]("n_obs") * 1000L - nTrue * 4L)
    }
    // the debiased estimate recovers each nation's true count to
    // within the mechanism's noise (generous bound for small SFs)
    val mad = out.map(r => math.abs(
      r.getAs[Long]("est_true") - r.getAs[Long]("n_true"))).max
    val bound = math.max(10L, nTrue / 10)
    assert(mad <= bound, s"estimator error $mad exceeds $bound")
  }

  test("mm_phash_dedup: matches brute-force Hamming<=3 over hash classes") {
    val out = graft.multimodal.BinaryPipeline.mmPhashDedup(spark, sfDir)
      .collect()
    out.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 1L && h <= 3L)
    }
    // brute force over the distinct classes (bounded: <=256 classes)
    val classes = graft.multimodal.BinaryPipeline.mmImagePhash(spark, sfDir)
      .select(col("hash_hi"), col("hash_lo")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      a <- classes; b <- classes
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      ham = java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
      if ham <= 3
    } yield (a, b)
    val got = out.map(r => ((r.getAs[Long]("hash_hi1"),
      r.getAs[Long]("hash_lo1")),
      (r.getAs[Long]("hash_hi2"), r.getAs[Long]("hash_lo2")))).toSet
    assert(got == brute.toSet,
      "banded candidates must find exactly the brute-force pairs")
  }

  test("str_concurrency: peak bounded by opens, conserved delta sum") {
    val out = graft.streaming.EventStreams.strConcurrency(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val nEvents = Tables.events(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_starts")).sum == nEvents,
      "every event opens exactly one interval")
    out.foreach { r =>
      val peak = r.getAs[Long]("max_concurrent")
      if (r.getAs[Long]("n_starts") > 0L)
        assert(peak >= 1L, "a window with a start saw >= 1 active")
      assert(peak >= 0L && peak <= nEvents)
    }
    // some window must hold more than one concurrent session, or the
    // sweep degenerates to a counter
    assert(out.exists(_.getAs[Long]("max_concurrent") > 1L))
    // the r9 carried-in seed: the window SPINE is gap-free (every 6 h
    // bucket between first and last delta reports, delta-less ones at
    // the carried concurrency)
    val starts = out.map(_.getAs[java.time.LocalDateTime]("window_start")
      .toEpochSecond(java.time.ZoneOffset.UTC)).sorted
    starts.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(1) - p(0) == 21600L, s"spine gap between ${p(0)} and ${p(1)}")
    }
  }

  test("cdc_sparse_patch: reconstruction matches a per-key replay") {
    val out = graft.cdc.CdcQueries.sparsePatch(spark, sfDir).collect()
    val patches = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = patches.groupBy(_._1)
    assert(out.length == byUser.size)
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val mine = byUser(u).sortBy(_._2)
      assert(r.getAs[Long]("last_seq") == mine.last._2)
      assert(r.getAs[Long]("n_patches") == mine.length)
      // replay: last value whose seq escapes the null schedule
      val lastVal = mine.filter(_._2 % 3 != 0).lastOption.map(_._3)
      assert(Option(r.getAs[java.lang.Double]("val")).map(_.toDouble)
        == lastVal)
      val lastStatus = mine.filter(_._2 % 4 != 0).lastOption
        .map(t => s"s${t._2 % 5}")
      assert(Option(r.getAs[String]("status")) == lastStatus)
    }
  }

  test("pipe_sample_fixed: exactly k, stable under re-run, hash-ordered") {
    val a = graft.pipeline.CorpusPipeline.pipeSampleFixed(spark, sfDir)
      .collect()
    val b = graft.pipeline.CorpusPipeline.pipeSampleFixed(spark, sfDir)
      .collect()
    val k = math.min(100L, Tables.documents(spark, sfDir).count())
    assert(a.length == k, "sample must be exactly min(k, corpus)")
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "the sample is deterministic across runs")
    assert(a.map(_.getAs[Int]("rank")).toSeq == (1 to a.length))
  }

  test("src_zip_archive: real round-trip with per-archive size arithmetic") {
    val out = graft.sources.SourceQueries.srcZipArchive(spark, sfDir)
      .collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 2 + id % 4
      assert(r.getAs[Long]("n_entries") == n)
      val expect = (0L until n).map(k =>
        22 + id.toString.length + (id + k) % 50).sum
      assert(r.getAs[Long]("total_bytes") == expect,
        "bytes read from ZipInputStream must equal the written payload")
    }
  }

  test("mask_rare_suppress: rare categories masked, frequent kept") {
    val part = Tables.part(spark, sfDir)
    val counts = part
      .groupBy(concat_ws("/", col("p_type"), col("p_size")).as("c"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = graft.mask.MaskQueries.maskRareSuppress(spark, sfDir)
      .collect()
    assert(out.length == part.count())
    out.foreach { r =>
      val t = r.getAs[String]("category")
      val m = r.getAs[String]("category_masked")
      if (counts(t) < 3) assert(m == "OTHER") else assert(m == t)
    }
    assert(out.exists(_.getAs[String]("category_masked") == "OTHER"),
      "the sf corpus must contain rare categories for the op to bite")
  }

  test("txt_script_mix: homoglyph injection detected on exactly id%7==0") {
    val out = graft.text.TextAnalysis.txtScriptMix(spark, sfDir).collect()
    out.foreach { r =>
      val injected = r.getAs[Long]("doc_id") % 7 == 0
      if (injected) {
        assert(r.getAs[Int]("n_cyr") > 0)
        assert(r.getAs[Boolean]("suspicious"),
          "translated docs must carry mixed-script words")
      } else {
        assert(r.getAs[Int]("n_cyr") == 0)
        assert(!r.getAs[Boolean]("suspicious"))
      }
    }
  }

  test("mm_audio_vad: accounting identities over the real decode") {
    val out = graft.multimodal.BinaryPipeline.mmAudioVad(spark, sfDir)
      .collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    out.foreach { r =>
      val (nf, na, ns, mr) = (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_segments"),
        r.getAs[Long]("max_run"))
      assert(nf == (100 + r.getAs[Long]("doc_id") % 50) *
        (1 + r.getAs[Long]("doc_id") % 2) / 32)
      assert(na <= nf)
      assert(ns <= na, "each segment holds at least one active frame")
      assert(mr <= na && (na == 0 || mr >= (na + ns - 1) / ns),
        "max run bounds: <= total active, >= ceil(active/segments)")
    }
    assert(out.exists(_.getAs[Long]("n_segments") > 1L),
      "the threshold must produce real segmentation, not one blob")
  }

  test("mm_image_patches: grid dims and total mass match the gradient") {
    val out = graft.multimodal.BinaryPipeline.mmImagePatches(spark, sfDir)
      .collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rows) =>
      val (w, h) = (8 + id % 32, 8 + (id * 7) % 32)
      assert(rows.length == (w / 8) * (h / 8),
        "one row per non-ragged 8x8 patch")
      rows.foreach { r =>
        val (py, px) = (r.getAs[Long]("py"), r.getAs[Long]("px"))
        val base = id % 256
        var expect = 0L
        for (dy <- 0 until 8; dx <- 0 until 8)
          expect += (base + (px * 8 + dx) + (py * 8 + dy)) % 256
        assert(r.getAs[Long]("mass") == expect,
          s"decoded patch mass must match gradient arithmetic at ($py,$px)")
      }
    }
  }

  test("cls_skewness: moment chain inequalities hold") {
    val out = graft.classify.ClassifyQueries.clsSkewness(spark, sfDir)
      .collect()
    assert(out.map(_.getAs[String]("col")).toSeq ==
      Seq("l_discount_milli", "l_quantity", "l_tax_milli"))
    out.foreach { r =>
      val (n, s1, s2, s4) = (r.getAs[Long]("n"), r.getAs[Long]("s1"),
        r.getAs[Long]("s2"), r.getAs[Long]("s4"))
      assert(n * s2 >= s1 * s1, "Cauchy-Schwarz on (1, x)")
      assert(n * s4 >= s2 * s2, "Cauchy-Schwarz on (1, x^2)")
      assert(s2 >= 0 && s4 >= 0)
    }
  }

  test("q37_unpivot: melt triples the row mass, totals match columns") {
    val li = Tables.lineitem(spark, sfDir)
    val out = graft.ops.Relational.q37(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("measure")).toSeq ==
      Seq("discount_milli", "price_cents", "quantity"))
    val n = li.count()
    assert(out.forall(_.getAs[Long]("n") == n),
      "every measure melts once per source row")
    val qtySum = li.agg(sum(floor(col("l_quantity")).cast("long")))
      .head().getLong(0)
    assert(out.find(_.getAs[String]("measure") == "quantity").get
      .getAs[Long]("total") == qtySum)
  }

  test("cls_entity_match: every dirty record finds its source record") {
    val out = graft.classify.ClassifyQueries.clsEntityMatch(spark, sfDir)
      .collect()
    val pairs = out.map(r => r.getAs[Long]("d_key") ->
      r.getAs[Long]("cand_key")).toSet
    val dirtyKeys = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 10 === 0)
      .select("c_custkey").collect().map(_.getLong(0))
    dirtyKeys.foreach { k =>
      assert(pairs.contains((k + 10000000L) -> k),
        s"transposed duplicate of $k must match back to its source")
    }
    // the transposition is <= 2 edits, so the true pair passes the gate
    out.foreach(r => assert(r.getAs[Int]("dist") <= 2))
  }

  test("knn_recall_binary: per-query overlap in [0, 5] for 10 queries") {
    val out = graft.sim.EmbOps.knnRecallBinary(spark, sfDir).collect()
    assert(out.length == 10)
    assert(out.forall { r =>
      val h = r.getAs[Long]("n_hits"); h >= 0 && h <= 5
    })
    assert(out.map(_.getAs[Long]("n_hits")).sum > 0,
      "the sign-bit path must recover some true neighbors")
  }

  test("knn_centrality: mass conserved exactly across rounds") {
    val out = graft.sim.Knn.knnCentrality(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("mass")).sum == 1000L * out.length,
      "integer routing must conserve total mass bit-exactly")
    assert(out.forall(_.getAs[Long]("deg") >= 1L),
      "only edge-incident nodes participate")
    assert(out.map(_.getAs[Long]("mass")).distinct.length > 1,
      "routing must differentiate hubs from fringe")
  }

  test("mask_encrypt: FIPS-197 known-answer vector through the builtin") {
    // AES-128 ECB: plaintext 00112233445566778899aabbccddeeff with
    // key 000102030405060708090a0b0c0d0e0f encrypts to
    // 69c4e0d86a7b0430d8cdb78070b4c55a (FIPS-197 appendix C.1)
    // ECB encrypts blocks independently, so under PKCS padding (the
    // only ECB padding Spark supports) the FIRST ciphertext block of
    // the 16-byte plaintext is still the FIPS-197 answer
    val got = spark.sql(
      """SELECT lower(substr(hex(aes_encrypt(
        |  unhex('00112233445566778899AABBCCDDEEFF'),
        |  unhex('000102030405060708090A0B0C0D0E0F'),
        |  'ECB', 'PKCS')), 1, 32)) AS ct""".stripMargin)
      .head().getString(0)
    assert(got == "69c4e0d86a7b0430d8cdb78070b4c55a",
      s"the cipher must be real AES, got $got")
    // and the driver key's round-trip over real data
    val out = graft.mask.MaskQueries.maskEncrypt(spark, sfDir).collect()
    val names = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[String]("dec") == names(r.getAs[Long]("c_custkey")))
      assert(r.getAs[Long]("cipher_len") % 16 == 0)
    }
  }

  test("emb_rq_sketch: residual energy bounded, codes differ in-cell") {
    val out = graft.sim.EmbOps.embRqSketch(spark, sfDir).collect()
    assert(out.length == Tables.embeddings(spark, sfDir).count())
    out.foreach { r =>
      // both e and seed are unit vectors: |r|^2 = 2 - 2cos <= 4
      val en = r.getAs[Long]("rnorm_milli")
      assert(en >= 0 && en <= 4000)
      val (lo, hi) = (r.getAs[Long]("rq_lo"), r.getAs[Long]("rq_hi"))
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32))
    }
    // the sign pattern must discriminate members within a cell
    out.groupBy(_.getAs[Int]("cell")).foreach { case (_, rows) =>
      if (rows.length > 1)
        assert(rows.map(r => (r.getAs[Long]("rq_lo"),
          r.getAs[Long]("rq_hi"))).distinct.length > 1)
    }
  }

  test("pipe_mix_alpha_curve: monotone flattening toward uniform") {
    val out = graft.pipeline.CorpusPipeline.pipeMixAlphaCurve(spark, sfDir)
      .collect()
    val byAlpha = out.groupBy(_.getAs[Long]("alpha_pm"))
    assert(byAlpha.keySet == Set(0L, 250L, 500L, 750L, 1000L))
    // at alpha=0 every language gets equal weight; at alpha=1000 the
    // share equals the raw document share
    byAlpha(0L).foreach(r => assert(r.getAs[Long]("w") == 1L))
    val spread = byAlpha.view.mapValues { rows =>
      val s = rows.map(_.getAs[Long]("share_pm"))
      s.max - s.min
    }.toMap
    assert(spread(0L) <= spread(500L) && spread(500L) <= spread(1000L),
      s"share spread must grow with alpha, got $spread")
  }

  test("cls_autocorr: moment identities and pair counts per lag") {
    val out = graft.classify.ClassifyQueries.clsAutocorr(spark, sfDir)
      .collect()
    assert(out.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 7L, 30L))
    out.foreach { r =>
      val (n, sxx, sx) = (r.getAs[Long]("n"), r.getAs[Long]("sxx"),
        r.getAs[Long]("sx"))
      assert(n > 0)
      assert(n * sxx >= sx * sx, "variance numerator non-negative")
    }
    // each lag's pair count is bounded by the day count (a sparse
    // series need NOT be monotone in the lag — a gap pattern can
    // match more day pairs at lag 30 than at lag 7)
    val nDays = Tables.orders(spark, sfDir)
      .select(col("o_orderdate")).distinct().count()
    assert(out.forall(_.getAs[Long]("n") <= nDays))
  }

  test("cdc_e2e_replicate: routed mass equals the live state exactly") {
    val out = graft.cdc.CdcQueries.cdcE2eReplicate(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("target_table")).toSet ==
      Set("users_masked", "activity_masked"))
    // the routed row total equals the applied snapshot's live keys
    val live = graft.cdc.CdcQueries.snapshotApply(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == live,
      "every surviving state row routes to exactly one target")
    // blur is zero-mean over the hash range: the masked total stays
    // within ±1000 cents per row of the true total
    val trueCents = graft.cdc.CdcQueries.snapshotApply(spark, sfDir)
      .agg(sum(floor(col("value") * 100).cast("long"))).head().getLong(0)
    val maskedCents = out.map(_.getAs[Long]("masked_cents_sum")).sum
    assert(math.abs(maskedCents - trueCents) <= 1000L * live)
  }

  test("src_dialect_sniff: one unambiguous detection per staged file") {
    val out = graft.sources.SourceQueries.srcDialectSniff(spark, sfDir)
      .collect()
    assert(out.length == 3, "each file must sniff to exactly one dialect")
    val got = out.map(r => r.getAs[String]("dialect_id") ->
      r.getAs[String]("detected_delim")).toMap
    assert(got == Map("pipe" -> "|", "semicolon" -> ";", "tab" -> "\t"))
    assert(out.forall(_.getAs[Long]("fields_per_line") == 3L))
  }

  test("property: 4x16-bit bands catch every Hamming<=3 pair (pigeonhole)") {
    // pure function property behind mm_phash_dedup's candidate
    // generation: any two 64-bit codes differing in <= 3 bits agree
    // exactly on at least one of the 4 disjoint 16-bit bands
    val rnd = new scala.util.Random(42)
    def bands(hi: Long, lo: Long): Seq[Long] =
      Seq(lo % 65536, lo / 65536, hi % 65536, hi / 65536)
    (1 to 2000).foreach { _ =>
      val hi = rnd.nextInt().toLong & 0xffffffffL
      val lo = rnd.nextInt().toLong & 0xffffffffL
      val nFlips = rnd.nextInt(4) // 0..3 bit flips
      var (h2, l2) = (hi, lo)
      (1 to nFlips).foreach { _ =>
        val b = rnd.nextInt(64)
        if (b < 32) l2 ^= (1L << b) else h2 ^= (1L << (b - 32))
      }
      val ham = java.lang.Long.bitCount(hi ^ h2) +
        java.lang.Long.bitCount(lo ^ l2)
      assert(ham <= 3)
      assert(bands(hi, lo).zip(bands(h2, l2)).exists(p => p._1 == p._2),
        s"pair at hamming $ham must share a band")
    }
  }

  test("property: segment (sum, maxPrefix) combine is the sweep's law") {
    // the associative combine the streaming concurrency merge uses:
    // for delta segments A ++ B, total = sA + sB and
    // maxPrefix = max(mpA, sA + mpB) — checked against the direct
    // prefix scan over random delta sequences
    val rnd = new scala.util.Random(7)
    def direct(ds: Seq[Long]): (Long, Long) = {
      var run = 0L; var mp = Long.MinValue
      ds.foreach { d => run += d; mp = math.max(mp, run) }
      (run, mp)
    }
    (1 to 500).foreach { _ =>
      val a = Seq.fill(1 + rnd.nextInt(20))((rnd.nextInt(3) - 1).toLong)
      val b = Seq.fill(1 + rnd.nextInt(20))((rnd.nextInt(3) - 1).toLong)
      val (sa, mpa) = direct(a)
      val (sb, mpb) = direct(b)
      val (st, mpt) = direct(a ++ b)
      assert(st == sa + sb)
      assert(mpt == math.max(mpa, sa + mpb),
        "the combine law must equal the direct scan")
    }
  }
}
