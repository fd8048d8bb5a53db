package graft

import org.apache.spark.sql.functions._

/** Brute-force agreement + invariant pins for the round-9 follow-on
  * operators (bigram surprisal, Gopher rule battery, rate-limit
  * audit, NOT-IN null-semantics audit). */
class R9dOpsSpec extends SparkSpec {

  private def docTokens(): Seq[(Long, String, String, Seq[String])] =
    Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text").collect()
      .map { r =>
        (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3).trim.toLowerCase.split("\\s+").toSeq
            .filter(_.nonEmpty))
      }.toSeq

  test("txt_bigram_surprisal equals the driver-side whole-bit LM") {
    val docs = docTokens()
    def bitlen(x: Long): Int = java.lang.Long.toBinaryString(x).length
    val uni = docs.flatMap(_._4).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val bigrams = docs.flatMap { case (_, _, _, w) =>
      w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val perDoc = docs.map { case (_, _, src, w) =>
      val bs = w.zip(w.drop(1)).map { case (a, b) =>
        (bitlen(uni(a)) - bitlen(cb(s"$a $b"))).toLong
      }
      (src, bs.size.toLong, bs.sum)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      val nt = rows.map(_._2).sum
      val ts = rows.map(_._3).sum
      val high = rows.count(r => r._3 * 1000 / r._2 >= 3000)
      (src, rows.size.toLong, nt, ts, high.toLong, ts * 1000 / nt)
    }.toSeq.sortBy(_._1)
    val got = text.TextAnalysis.txtBigramSurprisal(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // conditional surprisal must be cheaper than unigram surprisal
    // overall: knowing w1 can only shrink the candidate set
    val uniBits = text.TextAnalysis.txtSurprisal(spark, sfDir)
      .agg(sum("surprisal_bits"), sum("n_tokens")).collect().head
    val bigSum = expected.map(_._4).sum
    val bigN = expected.map(_._3).sum
    assert(bigSum.toDouble / bigN <
      uniBits.getLong(0).toDouble / uniBits.getLong(1))
  }

  test("pipe_gopher_rules matches per-doc rule replay") {
    val docs = docTokens()
    val perDoc = docs.map { case (_, lang, _, w0) =>
      // the operator splits the RAW text (no lowercasing) — fixture
      // text is already lowercase so the token streams agree
      val w = w0
      val n = w.size.toLong
      val counts = w.groupBy(identity).view.mapValues(_.size.toLong)
      val sumLen = w.map(_.length.toLong).sum
      val r1 = n >= 30 && n <= 120
      val r2 = sumLen >= 3 * n && sumLen <= 5 * n
      val r3 = w.exists(t => t == "the" || t == "a")
      val r4 = counts.size.toLong * 2 >= n
      val r5 = counts.values.max * 5 <= n
      (lang, r1, r2, r3, r4, r5)
    }
    val expected = perDoc.groupBy(_._1).map { case (lang, rs) =>
      (lang, rs.size.toLong,
        rs.count(!_._2).toLong, rs.count(!_._3).toLong,
        rs.count(!_._4).toLong, rs.count(!_._5).toLong,
        rs.count(!_._6).toLong,
        rs.count(r => r._2 && r._3 && r._4 && r._5 && r._6).toLong)
    }.toSeq.sortBy(_._1)
    val got = pipeline.CorpusPipeline.pipeGopherRules(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == expected)
    // the battery must actually discriminate on the fixture
    assert(expected.map(_._8).sum > 0)
    assert(expected.map(_._8).sum < expected.map(_._2).sum)
  }

  test("str_rate_limit equals a sorted per-user replay") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val win = 86399999999L
    val perEvent = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      sorted.map { case (_, et, us) =>
        // RANGE frame: peers (equal us) included regardless of order
        val c = sorted.count(r => r._3 >= us - win && r._3 <= us)
        (et, c.toLong)
      }
    }
    val expected = perEvent.groupBy(_._1).map { case (et, rs) =>
      (et, rs.size.toLong, rs.count(_._2 > 5).toLong, rs.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = streaming.EventStreams.strRateLimit(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  private def md5Hash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("dedup_lsh_sweep: S-curve monotonicity + b=16 brute replay") {
    val got = dedup.Dedup.dedupLshSweep(spark, sfDir)
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
        r.getAs[Number](3).longValue)).toSeq
    assert(got.map(_._1) == Seq(2L, 4L, 8L, 16L))
    // more, smaller bands monotonically admit more candidates and at
    // least as much yield (a pair colliding at r=16 collides at r=2)
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.map(_._4) == got.map(_._4).sorted)
    got.foreach { case (_, _, cand, est) => assert(est <= cand) }
    // driver replay of the finest config (16 bands × 2 rows)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split("\\s+").distinct.map(md5Hash).distinct))
    val blocks = docs.map { case (id, hs) =>
      val m = (0 until 32).map(i => hs.map(h =>
        ((h * (2L * i + 1)) & 4294967295L) ^ (h >> (i % 16))).min)
      id -> (0 until 16).map(j => (m(2 * j) << 32) | m(2 * j + 1))
    }.toMap
    val sizes = docs.map { case (id, hs) => id -> hs.length }.toMap
    val ids = docs.map(_._1).sorted
    var cand16 = 0L; var est16 = 0L
    for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if math.min(sizes(a), sizes(b)).toDouble >=
        math.max(sizes(a), sizes(b)).toDouble * 0.9
      if (0 until 16).exists(bd => blocks(a)(bd) == blocks(b)(bd))
    } {
      cand16 += 1
      if ((0 until 16).count(k => blocks(a)(k) == blocks(b)(k)) >= 13)
        est16 += 1
    }
    assert(got.last._3 == cand16)
    assert(got.last._4 == est16)
  }

  test("knn_rrf_fusion: fused recall@5 beats both quantized sources") {
    val rows = sim.Knn.knnRrfFusion(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rows.keySet == Set("fused", "hamming", "pq_adc"))
    assert(rows("fused") >= rows("hamming"))
    assert(rows("fused") >= rows("pq_adc"))
    // driver-side RRF replay from the two source lists
    def list(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Number](2).intValue)).toSeq
    val pq = list(sim.EmbOps.knnPqAdcFor(spark, sfDir,
      col("vec_id") < 10))
    val hm = list(sim.EmbOps.embHammingTopK(spark, sfDir))
    val t1 = sim.Knn.knnBrute(spark, sfDir)
      .filter(col("rank") === 1).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fusedHits = (pq ++ hm).groupBy(x => (x._1, x._2))
      .view.mapValues(_.map(x => 1000000L / (60 + x._3)).sum).toSeq
      .groupBy(_._1._1).map { case (qid, cands) =>
        val top5 = cands.sortBy { case ((_, nid), s) => (-s, nid) }
          .take(5).map(_._1._2).toSet
        if (top5.contains(t1(qid))) 1L else 0L
      }.sum
    assert(rows("fused") == fusedHits)
  }

  test("q54_listagg: bounded groups, sorted set rendering, top-k " +
      "pushed into the shuffle") {
    val df = ops.Relational.q54(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val names = r.getString(2).split("\\|").toSeq
      assert(n <= 10 && names.size.toLong == n)
      assert(names == names.sorted)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("cdc_shard_router: conservation, affinity, portable hash") {
    val rows = cdc.CdcQueries.shardRouter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val evs = Tables.events(spark, sfDir).select("user_id")
      .collect().map(_.getLong(0))
    assert(rows.map(_._2).sum == evs.length.toLong)
    // every key routes to exactly one shard → per-shard distinct
    // counts partition the global key set
    assert(rows.map(_._3).sum == evs.distinct.length.toLong)
    val expected = evs.groupBy(u => md5Hash(u.toString) % 16)
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { case (shard, n, _) =>
      assert(expected.getOrElse(shard, 0L) == n)
    }
  }

  test("pipe_dedup_survival: monotone funnel, exact stage replay") {
    val rows = pipeline.CorpusPipeline.pipeDedupSurvival(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // attrition can only shrink the corpus
    assert(rows.map(_._3) == rows.map(_._3).sorted.reverse)
    assert(rows.map(_._4) == rows.map(_._4).sorted.reverse)
    assert(rows.head._5 == 1000L)
    assert(rows.last._3 > 0)
    // stage 1 is the raw table; stage 3 removes exact text dups
    // among the quality survivors — replay both on the driver
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.head._3 == docs.length.toLong)
    val kept = Tables.documents(spark, sfDir)
      .filter(text.TextAnalysis.qualityScore(col("text")) >= 0.5)
      .select("text").collect().map(_.getString(0))
    assert(rows(1)._3 == kept.length.toLong)
    assert(rows(2)._3 == kept.distinct.length.toLong)
  }

  test("mm_image_edges: real decode equals the closed-form Sobel") {
    val got = multimodal.BinaryPipeline.mmImageEdges(spark, sfDir)
      .agg(sum("n_interior"), sum("n_edge_px"), sum("mag_sum"))
      .collect().head
    val seeds = Tables.documents(spark, sfDir)
      .select((col("doc_id") % 256).as("s")).collect()
      .map(_.getLong(0))
    def p(seed: Long, x: Int, y: Int): Int =
      ((seed + x + y) % 256).toInt
    val per = seeds.distinct.map { m =>
      val w = 8 + (m % 32).toInt; val h = 8 + ((m * 7) % 32).toInt
      var interior = 0L; var edges = 0L; var mag = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val gx = (p(m, x + 1, y - 1) + 2 * p(m, x + 1, y) + p(m, x + 1, y + 1)) -
          (p(m, x - 1, y - 1) + 2 * p(m, x - 1, y) + p(m, x - 1, y + 1))
        val gy = (p(m, x - 1, y + 1) + 2 * p(m, x, y + 1) + p(m, x + 1, y + 1)) -
          (p(m, x - 1, y - 1) + 2 * p(m, x, y - 1) + p(m, x + 1, y - 1))
        val v = math.abs(gx) + math.abs(gy)
        interior += 1; mag += v; if (v >= 256) edges += 1
      }
      m -> (interior, edges, mag)
    }.toMap
    val expected = seeds.map(per).foldLeft((0L, 0L, 0L)) {
      case ((a, b, c), (x, y, z)) => (a + x, b + y, c + z)
    }
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == expected)
    // the fixture really has edges (the 255→0 wrap lines)
    assert(expected._2 > 0)
  }

  test("src_rle_roundtrip: lossless decode, runs compress") {
    val rows = sources.SourceQueries.srcRleRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, runs, maxRun, mismatch) =>
      assert(mismatch == 0L)
      assert(runs <= n && maxRun <= n)
    }
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_._2).sum == total)
    // driver replay of the shard-local run count
    val vals = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expRuns = vals.groupBy(_._1 / 4096).values.map { shard =>
      val s = shard.sortBy(_._1).map(_._2)
      s.zip("" +: s.init).count { case (a, b) => a != b }
    }.sum
    assert(rows.map(_._3).sum == expRuns.toLong)
  }

  test("q55 equi-depth histogram equals the sorted-order replay") {
    val got = ops.Relational.q55(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val vals = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      val bounds = (1 to 8).map(i =>
        sorted((math.max(1L, i * n / 8) - 1).toInt))
      rows.map(_._2).groupBy(v => bounds.take(7).count(_ < v))
        .map { case (b, vs) =>
          (g, b.toLong, vs.size.toLong, bounds(b)) }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
    // depths partition each group exactly
    got.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.map(_._3).sum == vals.count(_._1 == g).toLong)
    }
  }

  test("emb_fps_coreset equals the driver farthest-point replay") {
    val got = sim.EmbOps.embFpsCoreset(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got.map(_._1) == (0L to 7L))
    assert(got.map(_._2).distinct.size == 8)
    // the selection radius can only shrink as the coreset grows
    val radii = got.drop(1).map(_._3)
    assert(radii == radii.sorted.reverse)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter { case (_, v) =>
        val ss = v.map(x => x * x).sum
        ss > 0 && !ss.isInfinity && !ss.isNaN
      }.sortBy(_._1)
    def d(a: Array[Double], b: Array[Double]): Double = {
      var da = 0.0; var db = 0.0; var ab = 0.0; var i = 0
      while (i < a.length) {
        da += a(i) * a(i); db += b(i) * b(i); ab += a(i) * b(i); i += 1
      }
      da - 2 * ab + db
    }
    var chosen = List(vecs.head)
    var dmin = vecs.map(v => v._1 -> d(v._2, vecs.head._2)).toMap
    (1 to 7).foreach { _ =>
      val pick = vecs.maxBy(v => (dmin(v._1), -v._1))
      chosen = chosen :+ pick
      dmin = vecs.map(v =>
        v._1 -> math.min(dmin(v._1), d(v._2, pick._2))).toMap
    }
    assert(got.map(_._2) == chosen.map(_._1))
  }

  test("dedup_lsh_sweep executed plan: one equi-join, codegen mask, " +
      "no distinct or HOF in the pair path") {
    val df = dedup.Dedup.dedupLshSweep(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the candidate contact is ONE equi-join on (band, block-sig,
    // size-band); first-band emission replaced the distinct pass
    val equiJoins = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length +
      "BroadcastHashJoin".r.findAllIn(plan).length
    assert(equiJoins == 1, s"expected exactly one pair join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("graft_match_mask"),
      "the match vector must be the codegen MatchMask, not a HOF")
    assert(!plan.toLowerCase.contains("zip_with"))
    // profile dedup + checkpoint sever the corpus: the pair join reads
    // the checkpointed profiles, never a parquet rescan
    assert(!plan.contains("Scan parquet"),
      s"pair path must run on checkpointed profiles:\n$plan")
  }

  test("pipe_dedup_survival executed plan: exact stage groups on " +
      "md5, near-dup join blocked on tokens") {
    val df = pipeline.CorpusPipeline.pipeDedupSurvival(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exact dedup must key on the md5 digest, never shuffle raw text
    assert(plan.contains("md5"))
    assert(!plan.contains("hashpartitioning(text"),
      s"never shuffle on the raw text bytes:\n$plan")
  }

  test("q53 null-semantics: NOT IN poisons, anti-join does not") {
    val rows = ops.Relational.q53(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val notExists = r.getLong(2)
      val notIn = r.getLong(3)
      val repaired = r.getLong(4)
      val nNull = r.getLong(5)
      assert(nNull > 0)            // the probe really is poisoned
      assert(notIn == 0L)          // three-valued logic zeroes NOT IN
      assert(repaired == notExists) // null repair restores parity
      assert(r.getLong(6) == (if (notIn != notExists) 1L else 0L))
    }
    // at least one region has customers with no orders (else the
    // audit distinguishes nothing)
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
