package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the round-6 additions: the Bloom prefilter's
  * no-false-negative guarantee, the histogram-bracket vocab-coverage
  * math vs the brute-force ranking, the Tukey-fence quartiles vs a
  * brute-force sort, the reconciliation audit actually flagging the
  * injected drift, HTML extraction leaving no markup behind, and the
  * PII scrub rewriting every hit. */
class R6OpsSpec extends SparkSpec {
  import spark.implicits._

  val sf001 = "/root/testdata/sf0.01"

  test("dedup_bloom: no false negatives — every true member is a maybe") {
    val row = graft.dedup.Dedup.dedupBloom(spark, sf001).collect().head
    val nMaybe = row.getAs[Long]("n_maybe")
    val nPresent = row.getAs[Long]("n_present")
    val nFp = row.getAs[Long]("n_false_pos")
    val nProbes = row.getAs[Long]("n_probes")
    // a Bloom filter can only over-approximate: every present key must
    // have been flagged maybe, so the maybes decompose exactly into
    // true members + false positives
    assert(nFp == nMaybe - nPresent,
      s"false negative detected: maybe=$nMaybe present=$nPresent fp=$nFp")
    assert(nMaybe <= nProbes && nPresent <= nMaybe)
    // the sized-down filter must actually exercise both report paths
    assert(nPresent > 0 && nFp > 0,
      s"degenerate demo: present=$nPresent fp=$nFp")
  }

  test("txt_vocab_coverage: bracket math equals brute-force top-k sum") {
    val out = graft.text.TextAnalysis.txtVocabCoverage(spark, sf001)
      .collect().map(r => r.getAs[Long]("k") ->
        r.getAs[Long]("tokens_covered")).toMap
    val counts = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(_.getAs[Long]("c")).sortBy(-_)
    for (k <- Seq(3, 10, 30)) {
      val brute = counts.take(k).sum
      assert(out(k.toLong) == brute,
        s"k=$k: bracket said ${out(k.toLong)}, brute force says $brute")
    }
  }

  test("cls_outliers: type-1 quartiles match a brute-force sort") {
    val rows = graft.classify.ClassifyQueries.clsOutliers(spark, sf001)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val cents = Tables.orders(spark, sf001)
      .select((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * lit(100))
        .cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    def typ1(p: Double): Long = cents(math.ceil(p * n).toInt - 1)
    val r = rows("o_totalprice")
    assert(r.getAs[Long]("n_values") == n)
    assert(r.getAs[Long]("q1_cents") == typ1(0.25))
    assert(r.getAs[Long]("q3_cents") == typ1(0.75))
    val iqr = r.getAs[Long]("q3_cents") - r.getAs[Long]("q1_cents")
    assert(r.getAs[Long]("hi_fence") ==
      r.getAs[Long]("q3_cents") + 3 * iqr / 2)
  }

  test("cdc_reconcile: the audit flags drift and clean buckets stay green") {
    val out = graft.cdc.CdcQueries.reconcile(spark, sf001).collect()
    val flagged = out.filter(!_.getAs[Boolean]("checksum_match"))
    val rowDrift = out.map(_.getAs[Long]("rows_delta")).sum
    // the hash-gated injection at this SF drops rows and corrupts
    // values; both failure shapes must surface
    assert(flagged.nonEmpty, "no bucket flagged despite injected drift")
    assert(rowDrift > 0, "dropped rows not visible in the row deltas")
    assert(flagged.exists(_.getAs[Long]("rows_delta") == 0L),
      "equal-count corruption not caught by the checksum")
    // buckets the audit passes must agree on both signals
    out.filter(_.getAs[Boolean]("checksum_match"))
      .foreach(r => assert(r.getAs[Long]("rows_delta") == 0L))
  }

  test("txt_html_strip: extraction leaves no markup and shrinks every page") {
    val out = graft.text.TextAnalysis.txtHtmlStrip(spark, sf001)
    val bad = out.filter(col("clean_head").rlike("<[A-Za-z/]") ||
      col("clean_head").contains("&amp;") ||
      col("n_chars_clean") >= col("n_chars_html")).count()
    assert(bad == 0L)
    assert(out.count() == Tables.documents(spark, sf001).count())
  }

  test("mask_text_scrub: the rewrite replaces every PII hit") {
    val df = Seq(
      "reach me at jane.doe+x@mail.example.org today",
      "ssn 123-45-6789 on file, backup 987-65-4321",
      "mixed a@b.co and 111-22-3333 in one line",
      "nothing sensitive here").toDF("t")
      .select(graft.mask.MaskQueries.scrubPii(col("t")).as("s"))
    val rows = df.collect().map(_.getString(0))
    assert(rows(0) == "reach me at [EMAIL] today")
    assert(rows(1) == "ssn [SSN] on file, backup [SSN]")
    assert(rows(2) == "mixed [EMAIL] and [SSN] in one line")
    assert(rows(3) == "nothing sensitive here")
  }
}
