package graft

import org.apache.spark.sql.functions._

/** Brute-force agreement + invariant pins for the round-9 closing
  * operators: each rewritten form must equal its naive/textbook
  * formulation computed directly on the small fixture. */
class R9cOpsSpec extends SparkSpec {

  test("q50 decorrelated agg equals the literal EXISTS/NOT-EXISTS " +
      "self-join chain") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("sdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"),
        (datediff(col("sdate"), col("odate")) > 90).as("late"))
      .localCheckpoint()
    val a = l.filter(col("late"))
      .select(col("okey").as("a_okey"), col("skey").as("a_skey"))
    val waiting = a
      .join(l.select(col("okey").as("b_okey"), col("skey").as("b_skey")),
        col("a_okey") === col("b_okey") && col("a_skey") =!= col("b_skey"),
        "left_semi")
      .join(l.filter(col("late"))
          .select(col("okey").as("c_okey"), col("skey").as("c_skey")),
        col("a_okey") === col("c_okey") && col("a_skey") =!= col("c_skey"),
        "left_anti")
      .distinct()
    val naive = waiting.groupBy("a_skey").agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_name")),
        col("a_skey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_suppkey")).limit(10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    val got = ops.Relational.q50(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("cls_spearman matches driver-side tie-averaged ranks") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(floor(col("l_quantity")).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"),
        floor(col("l_discount") * 1000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doubled tie-averaged rank: 2·|{<v}| + |{=v}| + 1
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sorted = byV.keys.toSeq.sorted
      var less = 0L
      sorted.map { v =>
        val r = v -> (2 * less + byV(v) + 1); less += byV(v); r
      }.toMap
    }
    val n0 = rows.length.toLong
    // r10: percentile-quantized ranks (u = 2R·500 div n) keep the
    // moment sums inside int64 at any corpus size
    val rq = rank2(rows.map(_._1)).view.mapValues(_ * 500 / n0).toMap
    val rp = rank2(rows.map(_._2)).view.mapValues(_ * 500 / n0).toMap
    val rd = rank2(rows.map(_._3)).view.mapValues(_ * 500 / n0).toMap
    def stats(xy: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Long, Long) =
      (xy.size.toLong, xy.map(_._1).sum, xy.map(_._2).sum,
        xy.map(p => p._1 * p._1).sum, xy.map(p => p._2 * p._2).sum,
        xy.map(p => p._1 * p._2).sum,
        xy.map(p => (p._1 - p._2) * (p._1 - p._2)).sum)
    val expected = Map(
      "quantity~price_cents" ->
        stats(rows.map(r => (rq(r._1), rp(r._2)))),
      "quantity~discount_milli" ->
        stats(rows.map(r => (rq(r._1), rd(r._3)))))
    val got = classify.ClassifyQueries.clsSpearman(spark, sfDir)
      .collect().map(r => r.getAs[String]("pair") -> ((
        r.getAs[Long]("n"), r.getAs[Long]("sx"), r.getAs[Long]("sy"),
        r.getAs[Long]("sxx"), r.getAs[Long]("syy"), r.getAs[Long]("sxy"),
        r.getAs[Long]("sd2")))).toMap
    assert(got == expected)
    // quantized ranks stay inside [1, 1000]: moment sums are bounded
    // by 1e6·n however large the corpus (the int64 safety contract)
    got.values.foreach { case (n, sx, sy, sxx, syy, _, _) =>
      assert(sx <= 1000L * n && sy <= 1000L * n)
      assert(sxx <= 1000000L * n && syy <= 1000000L * n)
    }
  }

  test("src_bitmap_index bitwise algebra equals direct row counts") {
    val direct = Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("card"),
        sum(when((col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("long") > 500000L, 1L).otherwise(0L)).as("card_high"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = sources.SourceQueries.srcBitmapIndex(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(r.getAs[Long]("card") == direct(seg)._1)
      assert(r.getAs[Long]("card_high") == direct(seg)._2)
      // 64 keys per word: the index can't be smaller than card/64 words
      assert(r.getAs[Long]("n_words") * 64 >= direct(seg)._1)
    }
  }

  test("str_seasonal_error matches a driver-side replay on the dense " +
      "day spine") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val byDay = rows.map(r => r._2 -> r._3).toMap
      val days = byDay.keys.min to byDay.keys.max
      val series = days.map(d => byDay.getOrElse(d, 0L))
      // usable rows: both lag-7 and lag-1 defined => index >= 7
      val usable = (7 until series.length).map { i =>
        (math.abs(series(i) - series(i - 7)),
          math.abs(series(i) - series(i - 1)))
      }
      val e7 = usable.map(_._1).sum
      val e1 = usable.map(_._2).sum
      t -> (usable.length.toLong, e7, e1,
        if (e1 > 0) Some(e7 * 1000000L / e1) else None)
    }
    val got = streaming.EventStreams.strSeasonalError(spark, sfDir)
      .collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
          r.getAs[Long]("abs_err7"), r.getAs[Long]("abs_err1"),
          Option(r.get(r.fieldIndex("mase_e6"))).map(_.asInstanceOf[Long])))
      }.toMap
    assert(got == expected)
  }

  test("str_interpolate holds out non-adjacent days and reconstructs " +
      "a linear segment exactly") {
    // holdout pattern never hits two adjacent days
    val held = (0L to 1000L).filter(d => (d * 7 + 5) % 5 == 2)
    held.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(1) - w(0) > 1)
    }
    val rows = streaming.EventStreams.strInterpolate(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("abs_err_milli") >= 0)
      assert(r.getAs[Long]("max_err_milli") <= r.getAs[Long]("abs_err_milli")
        || r.getAs[Long]("n_held") == 1)
    }
    // exactness canary: interpolating the middle of a perfect line
    // reproduces it (the formula is the exact rational)
    val vp = 100L; val vn = 300L; val dp = 10L; val dn = 12L; val d = 11L
    assert((vp * (dn - d) + vn * (d - dp)) * 1000 / (dn - dp) == 200000L)
  }

  test("q51 union sketch built from truncated sketches equals the " +
      "sketch of the full union (mergeability)") {
    val k = 256
    val m = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus").as("s"), col("o_custkey").as("key"))
      .distinct()
    val h = m.select(col("s"),
        graft.mask.MaskFunctions.portableHash(col("key")).as("h"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = h.filter(_._1 == "O").map(_._2).sorted
    val b = h.filter(_._1 == "F").map(_._2).sorted
    val full = (a ++ b).distinct.sorted.take(k)
    val fromSketches = (a.take(k) ++ b.take(k)).distinct.sorted.take(k)
    assert(full.toSeq == fromSketches.toSeq)
    // the driver key's estimates agree with a direct replay
    val row = ops.Relational.q51(spark, sfDir).collect().head
    val exactUnion = (a ++ b).distinct.length.toLong
    val exactInter = a.toSet.intersect(b.toSet).size.toLong
    assert(row.getAs[Long]("exact_union") == exactUnion)
    assert(row.getAs[Long]("exact_inter") == exactInter)
    val nk = full.length
    val estU =
      if (nk < k) nk.toLong else (k - 1).toLong * 4294967296L / full.last
    assert(row.getAs[Long]("est_union") == estU)
    val nBoth = full.count(x => a.contains(x) && b.contains(x)).toLong
    val estI = if (nk < k) nBoth else nBoth * estU / k
    assert(row.getAs[Long]("est_inter") == estI)
  }

  test("graft_nfc composes decomposed marks, is idempotent, and " +
      "fast-paths normalized text") {
    import spark.implicits._
    graft.expr.VectorExprs.register(spark)
    val rows = Seq("Cafe\u0301", "Caf\u00e9", "plain ascii", "A\u030A b",
      "mixed Cafe\u0301 and \u00c5").toDF("s")
      .selectExpr("s", "graft_nfc(s) AS n", "graft_nfc(graft_nfc(s)) AS nn")
      .collect()
    rows.foreach { r =>
      val expected = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expected)
      assert(r.getString(2) == r.getString(1), "idempotence")
    }
    // decomposed input composes to the shorter canonical form
    assert(rows(0).getString(1) == "Caf\u00e9")
    // null propagates
    val nullRow = Seq[Option[String]](None).toDF("s")
      .selectExpr("graft_nfc(s) AS n").collect().head
    assert(nullRow.isNullAt(0))
  }

  test("txt_nfc_audit changed-doc count matches a driver-side " +
      "Normalizer replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._2).view.mapValues { rows =>
      rows.count { case (id, _, t) =>
        val wire =
          if (id % 7 == 0) "Cafe\u0301 " + t
          else if (id % 11 == 0) "A\u030A " + t
          else t
        java.text.Normalizer.normalize(
          wire, java.text.Normalizer.Form.NFC) != wire
      }.toLong
    }.toMap
    val got = text.TextAnalysis.txtNfcAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_changed")).toMap
    assert(got == expected)
    assert(got.values.sum > 0, "the dirtying must actually dirty")
  }

  test("emb_cosine_hist buckets are consistent and cover every " +
      "sampled pair") {
    val got = sim.EmbOps.embCosineHist(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("lo_micro"), r.getAs[Long]("hi_micro")))
    assert(got.nonEmpty)
    got.foreach { case (b, n, lo, hi) =>
      assert(n > 0 && lo <= hi)
      // both endpoints really belong to the bucket
      assert((lo + 2000000) / 100000 - 20 == b)
      assert((hi + 2000000) / 100000 - 20 == b)
      // milli-quantized unit vectors: |dot| ≤ (1000+ε)²
      assert(math.abs(lo) <= 1200000 && math.abs(hi) <= 1200000)
    }
    // pair coverage: every even id whose successor survived pairs once
    val ids = Tables.embeddings(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val expectedPairs =
      ids.count(i => i % 2 == 0 && ids.contains(i + 1)).toLong
    assert(got.map(_._2).sum == expectedPairs)
  }

  test("cls_golden_record survivorship matches a driver-side replay") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"),
        col("c_mktsegment"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
          r.getString(4)))
    case class Rec(name: String, cents: Long, seg: Option[String], rank: Int)
    val expected = cust.groupBy(_._2).view.mapValues { rows =>
      val goldens = rows.map { case (key, _, name, cents, seg) =>
        val recs = Seq(Rec(name, cents, Option(seg), 1)) ++
          (if (key % 10 == 3)
            Seq(Rec(name.toUpperCase, cents + 100, None, 2))
          else Nil)
        val gName = recs.map(r => (r.name.length, r.name)).max._2
        val gCents = recs.maxBy(_.rank).cents
        val gSeg = recs.map(r => (r.seg.map(_ => r.rank).getOrElse(-1),
          r.seg)).maxBy(_._1)._2
        (recs.length, gName, gCents, gSeg)
      }
      (goldens.length.toLong,
        goldens.count(_._1 > 1).toLong,
        goldens.map(_._3).sum,
        goldens.count(_._4.isDefined).toLong)
    }.toMap
    val got = classify.ClassifyQueries.clsGoldenRecord(spark, sfDir)
      .collect().map(r => r.getAs[Int]("nation") -> ((
        r.getAs[Long]("n_entities"), r.getAs[Long]("n_merged"),
        r.getAs[Long]("golden_cents"),
        r.getAs[Long]("n_with_segment")))).toMap
    assert(got == expected)
    assert(got.values.map(_._2).sum > 0, "merges must actually occur")
  }

  test("cdc_compat_audit classifies the three registry transitions " +
      "and agrees with a rule replay") {
    val got = cdc.CdcQueries.compatAudit(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("from_ep"), r.getAs[String]("compat"),
        r.getAs[Long]("n_added"), r.getAs[Long]("n_dropped")))
    assert(got.toSeq == Seq(
      (0L, "FULL", 1L, 0L), // event_type appears, optional
      (1L, "FORWARD", 0L, 0L), // event_type tightens to required
      (2L, "BACKWARD", 0L, 1L))) // user_id (required) dropped
    // the observed-inventory path depends on to_json omitting nulls
    import spark.implicits._
    val keys = Seq(("a", Option.empty[String]))
      .toDF("x", "y")
      .selectExpr("json_object_keys(to_json(struct(x, y))) AS k")
      .collect().head.getSeq[String](0)
    assert(keys == Seq("x"), "null fields must vanish from the wire")
  }

  test("mm_audio_resample decimator matches a sample-level replay " +
      "and halves the stream") {
    import graft.multimodal.BinaryPipeline._
    val got = mmAudioResample(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_out"), r.getAs[Long]("sum_abs_out"),
          r.getAs[Int]("max_abs_out"), r.getAs[Long]("retention_pm"))))
      .toMap
    assert(got.nonEmpty)
    got.keys.take(10).foreach { id =>
      val s = decodeWavSamples(encodeWav(id))
      val outs = s.grouped(2).filter(_.length == 2)
        .map(p => ((p(0) + p(1) + 65536) >> 1) - 32768).toArray
      assert(got(id)._1 == outs.length)
      assert(got(id)._1 * 2 == s.length - s.length % 2)
      assert(got(id)._2 == outs.map(v => math.abs(v).toLong).sum)
      assert(got(id)._3 == outs.map(math.abs).max)
      // a boxcar mean can only smooth: retention stays ≤ 1000 pm
      assert(got(id)._4 <= 1000L)
    }
  }

  test("cdc_ivm_merge equals a full recompute of the final state") {
    val got = cdc.CdcQueries.ivmMerge(spark, sfDir).collect()
      .map(r => r.getAs[String]("prio") -> ((r.getAs[Long]("n_base"),
        r.getAs[Long]("n_ins"), r.getAs[Long]("n_del"),
        r.getAs[Long]("n_upd"), r.getAs[Long]("n_final"),
        r.getAs[Long]("rev_final_cents")))).toMap
    // count algebra holds per group
    got.values.foreach { case (nb, ni, nd, _, nf, _) =>
      assert(nf == nb + ni - nd)
    }
    // full recompute in Spark agrees with the merged MV
    val o = Tables.orders(spark, sfDir).select(
        col("o_orderpriority").as("prio"), col("o_orderkey").as("key"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mid2 = o.map(_._3).min + o.map(_._3).max
    val base = o.filter(_._3 * 2 <= mid2)
    val tail = o.filter(_._3 * 2 > mid2)
    val finalRows =
      base.filter(_._2 % 10 != 3)
        .map(r => (r._1, if (r._2 % 10 == 7) r._4 + 100 else r._4)) ++
      tail.map(r => (r._1, r._4))
    val expected = finalRows.groupBy(_._1).view.mapValues(v =>
      (v.length.toLong, v.map(_._2).sum)).toMap
    got.foreach { case (p, (_, _, _, _, nf, rev)) =>
      assert((nf, rev) == expected(p))
    }
    assert(got.keySet == expected.keySet)
  }

  test("q52 percentile_cont matches a driver-side sorted " +
      "interpolation") {
    val byPrio = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = byPrio.flatMap { case (prio, s) =>
      Seq(50, 90).map { p =>
        val n = s.length.toLong
        val kLo = (p * (n - 1)) / 100 // 0-indexed floor rank
        val num = (p * (n - 1)) % 100
        val lo = s(kLo.toInt)
        val hi = if (num > 0) s(kLo.toInt + 1) else lo
        (prio, p.toLong) -> (n, lo, hi, lo * 1000 + (hi - lo) * 10 * num)
      }
    }
    val got = ops.Relational.q52(spark, sfDir).collect()
      .map(r => (r.getAs[String]("prio"), r.getAs[Long]("p")) -> ((
        r.getAs[Long]("n"), r.getAs[Long]("lo_cents"),
        r.getAs[Long]("hi_cents"), r.getAs[Long]("value_milli")))).toMap
    assert(got == expected)
  }

  test("mask_noise is bounded, keyed-deterministic, and internally " +
      "consistent") {
    val got = graft.mask.MaskQueries.maskNoise(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n = r.getAs[Long]("n")
      val bias = r.getAs[Long]("bias_cents")
      assert(r.getAs[Long]("sum_after") - r.getAs[Long]("sum_before")
        == bias)
      assert(r.getAs[Long]("max_abs_noise") <= 1000L)
      assert(math.abs(bias) <= 1000L * n)
    }
    // the noise replays from md5 alone (portable across engines)
    def replay(key: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"noise:$key".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    import spark.implicits._
    val engine = Seq(1L, 2L, 42L).toDF("c_custkey")
      .select(col("c_custkey"),
        (pmod(graft.mask.MaskFunctions.portableHash(
          concat(lit("noise:"), col("c_custkey").cast("string"))),
          lit(2001L)) - 1000L).as("noise"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 42L).foreach(k => assert(engine(k) == replay(k)))
  }

  test("mask_microagg clusters hold k..2k-1 members, cover every row, " +
      "and carry exact floor-means") {
    val k = 5
    val got = graft.mask.MaskQueries.maskMicroagg(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("nation"), r.getAs[Long]("cluster"),
        r.getAs[Long]("size"), r.getAs[Long]("mean_cents"),
        r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents")))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byNation = cust.groupBy(_._1)
    // coverage: cluster sizes sum to the nation's row count
    got.groupBy(_._1).foreach { case (nation, rows) =>
      assert(rows.map(_._3).sum == byNation(nation).length)
    }
    // size invariant: k..2k-1, except a <k-member nation degenerates
    // to ONE undersized cluster (documented in the operator doc)
    got.foreach { case (nation, _, size, _, _, _) =>
      if (byNation(nation).length >= k)
        assert(size >= k && size <= 2 * k - 1, s"cluster size $size")
      else
        assert(size == byNation(nation).length, s"degenerate size $size")
    }
    // brute force: same deterministic order, same clusters, floor-means
    val expected = byNation.flatMap { case (nation, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val ng = sorted.length
      val nClusters = math.max(ng / k, 1)
      sorted.zipWithIndex
        .groupBy { case (_, i) => math.min(i / k, nClusters - 1) }
        .map { case (cl, vs) =>
          val cents = vs.map(_._1)
          (nation, cl.toLong, cents.length.toLong,
            Math.floorDiv(cents.sum, cents.length.toLong),
            cents.min, cents.max)
        }
    }.toSet
    assert(got.toSet == expected)
  }
}
