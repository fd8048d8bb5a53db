package graft

import org.apache.spark.sql.functions._

/** Round-12c pins: engine-independent laws for the third r12 batch —
  * Kruskal–Wallis against a from-scratch mid-rank recount and its
  * ANOVA-on-ranks identity, Brown–Forsythe medians vs naive sorted
  * medians, crest factor vs a per-sample replay of the WAV generator,
  * and the dictionary advisor's direction on known-cardinality
  * columns. */
class R12cOpsSpec extends SparkSpec {

  private def eventCents: Array[(String, Long)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("cls_kruskal_wallis: per-group rank moments equal a naive " +
      "pooled mid-rank recount and H obeys the ANOVA-on-ranks identity") {
    val rows = classify.ClassifyQueries
      .clsKruskalWallis(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val v = eventCents
    val nt = v.length.toLong
    // naive pooled tie-averaged DOUBLED mid-ranks: 2R = 2·|{<x}| + |{=x}| + 1
    val sortedCounts = v.groupBy(_._2).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var below = 0L
    val rank2 = sortedCounts.map { case (x, c) =>
      val r2 = 2 * below + c + 1; below += c; x -> r2
    }.toMap
    // u = 2R·500 div N — the doubled-rank per-mille quantization
    val usImpl = v.map { case (g, x) => (g, rank2(x) * 500 / nt) }
    val byG = usImpl.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum,
        g.map(u => u._2 * u._2).sum)).toMap
    rows.foreach { r =>
      val (n, s1, s2) = byG(r.getAs[String]("grp"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("mean_rank_pm") === s1 / n)
      val _ = s2
    }
    // pooled identity: h_milli = (N−1)·SSB·1000 div SST on the u scale
    val t1 = byG.values.map(_._2).sum
    val t2 = byG.values.map(_._3).sum
    val bsum = byG.values.map { case (n, s1, _) => s1 * s1 / n }.sum
    val ssb = math.max(bsum - t1 * t1 / nt, 0L)
    val ssw = t2 - bsum
    val expected = (BigInt(nt - 1) * ssb * 1000 / (BigInt(ssb) + ssw))
      .toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("h_milli") === expected)
      assert(r.getAs[Long]("eta2_pm") === ssb * 1000 / (ssb + ssw))
    }
  }

  test("cls_levene: group centers are the exact lower medians and the " +
      "F statistic replays from naive absolute deviations") {
    val rows = classify.ClassifyQueries.clsLevene(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val v = eventCents
    val med = v.groupBy(_._1).view.mapValues { g =>
      val s = g.map(_._2).sorted
      s((s.length - 1) / 2) // lower median = rank ⌈n/2⌉, 1-indexed (n+1)/2
    }.toMap
    val devs = v.map { case (g, x) => (g, math.abs(x - med(g))) }
    val byG = devs.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum, g.map(d => d._2 * d._2).sum))
      .toMap
    val k = byG.size.toLong
    val nn = byG.values.map(_._1).sum
    val t1 = byG.values.map(_._2).sum
    val t2 = byG.values.map(_._3).sum
    val bsum = byG.values.map { case (n, s1, _) => s1 * s1 / n }.sum
    val ssb = math.max(bsum - t1 * t1 / nn, 0L)
    val ssw = t2 - bsum
    val f = (BigInt(ssb) * (nn - k) * 1000 / (BigInt(ssw) * (k - 1)))
      .toLong
    rows.foreach { r =>
      val g = r.getAs[String]("grp")
      assert(r.getAs[Long]("median_cents") === med(g))
      assert(r.getAs[Long]("mean_abs_dev_cents") ===
        byG(g)._2 / byG(g)._1)
      assert(r.getAs[Long]("f_milli") === f)
      assert(r.getAs[Long]("eta2_pm") === ssb * 1000 / (ssb + ssw))
    }
  }

  test("mm_audio_crest: per-rate panel replays from the generator " +
      "arithmetic and the squared crest factor never dips below 1000") {
    val rows = multimodal.BinaryPipeline
      .mmAudioCrest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val perDoc = ids.map { id =>
      val ns = (100 + id % 50) * (1 + id % 2)
      var peak = 0L; var e = 0L
      (0L until ns).foreach { k =>
        val u = ((id + 2 * k) % 251) + ((id + 2 * k + 1) % 251) * 256
        val s = if (u >= 32768) u - 65536 else u
        val a = math.abs(s)
        if (a > peak) peak = a
        e += a * a
      }
      val crest = if (e > 0) peak * peak * ns * 1000L / e else 0L
      (8000L + (id % 8) * 1000L, crest)
    }
    val byRate = perDoc.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum / g.length, g.map(_._2).max)
    }.toMap
    rows.foreach { r =>
      val (n, mean, mx) = byRate(r.getAs[Long]("rate"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("mean_crest_sq_pm") === mean)
      assert(r.getAs[Long]("max_crest_sq_pm") === mx)
      // peak² ≥ mean square power, always: squared crest ≥ 1000‰
      assert(mean >= 1000L)
    }
  }

  test("src_dict_efficiency: the advisor flags low-cardinality flags " +
      "as dictionary wins and the unique key as a dictionary loss, " +
      "with byte ledgers replaying naively") {
    val rows = sources.SourceQueries
      .srcDictEfficiency(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size === 5)
    assert(rows("l_returnflag").getAs[Boolean]("use_dict"))
    assert(rows("l_linestatus").getAs[Boolean]("use_dict"))
    // cardinality monotonicity: the 3-value flag must out-save the
    // order key (which still repeats ~4×/order, so its own verdict is
    // corpus-dependent — the ORDER of savings is the stable law)
    assert(rows("l_returnflag").getAs[Long]("saving_pm") >
      rows("l_orderkey").getAs[Long]("saving_pm"),
      "a 3-value flag must save more than a near-key column")
    // naive replay for l_returnflag
    val vals = Tables.lineitem(spark, sfDir).select("l_returnflag")
      .collect().map(_.getString(0))
    val nd = vals.distinct.length.toLong
    val plain = vals.map(_.length.toLong).sum
    val idxBits = java.lang.Long.toBinaryString(nd - 1).length.toLong
    val dict = vals.distinct.map(_.length.toLong).sum +
      (vals.length * idxBits + 7) / 8
    val r = rows("l_returnflag")
    assert(r.getAs[Long]("n_distinct") === nd)
    assert(r.getAs[Long]("plain_b") === plain)
    assert(r.getAs[Long]("dict_b") === dict)
    assert(r.getAs[Long]("saving_pm") ===
      ((plain - dict) * 1000 + 16000 * plain) / plain - 16000)
  }
}
