package graft

import org.apache.spark.sql.functions._

/** Optimization-round equivalence pins: every r12 rewrite must produce
  * bit-identical results to the form it replaced (the oracle gate
  * re-proves the end-to-end keys; these pin the REWRITTEN UNIT against
  * the prior formulation directly, including edge shapes the corpus
  * may not cover). */
class R12PerfSpec extends SparkSpec {

  test("graft_char_gram_hashes equals the interpreted shingle pipeline") {
    import spark.implicits._
    // edge shapes: empty, shorter than k, exactly k, ASCII, multi-byte
    // (CJK), supplementary-plane emoji (UTF-16 surrogate pair = ONE
    // code point), repeated grams (distinct must dedupe), whitespace
    val samples = Seq(
      "", "abc", "abcd", "hello world, hello world",
      "漢字かな交じり文テスト", "a😀b😀c😀d😀e", "😀😀😀😀😀",
      "tab\tand\nnewline  spaces", "ababababab"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    val fast = df.select(col("doc_id"),
      expr("graft_char_gram_hashes(text, 4)").as("hs"))
    val slow = df.select(col("doc_id"),
      sort_array(array_distinct(expr(
        "transform(graft_ngrams(regexp_extract_all(text, '(?s).', 0), 4)," +
          " x -> xxhash64(x))"))).as("hs"))
    val f = fast.orderBy("doc_id").collect().map(_.toSeq)
    val s = slow.orderBy("doc_id").collect().map(_.toSeq)
    assert(f.toSeq == s.toSeq,
      s"codegen shingle set diverged:\n fast=${f.toSeq}\n slow=${s.toSeq}")
    // and over the real corpus sample
    val docs = Tables.documents(spark, sfDir)
    val a = docs.select(col("doc_id"),
        expr("graft_char_gram_hashes(text, 4)").as("hs"))
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = docs.select(col("doc_id"),
        sort_array(array_distinct(expr(
          "transform(graft_ngrams(regexp_extract_all(text, '(?s).', 0), 4)," +
            " x -> xxhash64(x))"))).as("hs"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "corpus shingle sets diverged")
  }

  test("cls_outliers / q36_mad checkpointed single-scan forms stay exact") {
    // the r12 rewrite materializes the melted projection once instead
    // of re-deriving it per radix pass; fences/medians must not move
    val out = classify.ClassifyQueries.clsOutliers(spark, sfDir).collect()
    assert(out.length == 3)
    val byCol = out.map(r => r.getString(0) -> r).toMap
    assert(byCol.keySet == Set("l_extendedprice", "l_quantity",
      "o_totalprice"))
    out.foreach { r =>
      val (q1, q3) = (r.getLong(2), r.getLong(3))
      assert(q1 <= q3, s"quartiles out of order: $r")
      assert(r.getLong(4) <= q1 && q3 <= r.getLong(5),
        s"fences must bracket the IQR: $r")
    }
    val mad = ops.Relational.q36(spark, sfDir).collect()
    assert(mad.nonEmpty)
    mad.foreach { r =>
      assert(r.getLong(3) >= 0L, s"MAD must be non-negative: $r")
      assert(r.getLong(1) > 0L)
    }
  }
}
