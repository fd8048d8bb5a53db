package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.Syntax._

/** §2.8 text analysis for training-data pipelines. All scalar
  * expressions over builtins (codegen'd, shuffle-free map passes). */
object TextAnalysis extends QueryModule {

  private val stopwords = Seq("the", "a", "of", "and", "to")
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "y"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("的", "是", "了"))

  private def words(c: Column): Column = split(c, "\\s+")

  private def countIn(c: Column, set: Seq[String]): Column =
    size(filter(words(c), w => w.isin(set.map(x => x: Any): _*)))

  private def countInSql(e: String, set: Seq[String]): String = {
    val inList = set.map(s => s"'$s'").mkString(", ")
    s"len(list_filter(regexp_split_to_array($e, '\\s+'), w -> w IN ($inList)))"
  }

  // -------------------------------------------------- txt_token_count
  /** Whitespace words + a BPE-ish regex token count (letters / digits /
    * single punctuation as separate tokens). */
  def txtTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(words(col("text"))).as("n_words"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_tokens"))
      .orderBy("doc_id")

  val txtTokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS n_words,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ txt_quality
  /** The quality score as a reusable Column (deterministic double
    * math, mirrored exactly by [[qualityScoreSql]]) — shared with the
    * corpus-preparation pipeline. */
  def qualityScore(c: Column): Column = {
    val nWords = size(words(c)).cast("double")
    val avgWlen = length(regexp_replace(c, "\\s+", "")).cast("double") / nWords
    val stopRatio = countIn(c, stopwords).cast("double") / nWords
    lit(0.4) * least(nWords / 100.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(avgWlen / 8.0, lit(1.0))
  }

  /** Oracle mirror of [[qualityScore]] over SQL expression `e`. */
  def qualityScoreSql(e: String): String = {
    val nw = s"CAST(len(regexp_split_to_array($e, '\\s+')) AS DOUBLE)"
    val awl = s"CAST(length(regexp_replace($e, '\\s+', '', 'g')) AS DOUBLE) / $nw"
    val sr = s"CAST(${countInSql(e, stopwords)} AS DOUBLE) / $nw"
    s"(0.4 * least($nw / 100.0, 1.0) + 0.3 * (1.0 - $sr) + " +
      s"0.3 * least(($awl) / 8.0, 1.0))"
  }

  /** Quality scoring from length/word/stopword stats — the standard
    * cheap pre-filter for web-scale corpora. Deterministic double math,
    * mirrored exactly in the oracle. */
  def txtQuality(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(words(col("text"))).cast("double")
    val avgWlen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nWords
    val stopRatio = countIn(col("text"), stopwords).cast("double") / nWords
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        nWords.cast("int").as("n_words"), avgWlen.as("avg_wlen"),
        stopRatio.as("stop_ratio"), qualityScore(col("text")).as("score"))
      .orderBy("doc_id")
  }

  val txtQualitySql: String = {
    val nw = "CAST(len(regexp_split_to_array(text, '\\s+')) AS DOUBLE)"
    val awl = s"CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / $nw"
    val sr = s"CAST(${countInSql("text", stopwords)} AS DOUBLE) / $nw"
    s"""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
       |  CAST($nw AS INTEGER) AS n_words,
       |  $awl AS avg_wlen,
       |  $sr AS stop_ratio,
       |  0.4 * least($nw / 100.0, 1.0) + 0.3 * (1.0 - $sr) +
       |    0.3 * least(($awl) / 8.0, 1.0) AS score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- txt_langid
  /** Marker-word language ID with fixed precedence — the n-gram-
    * heuristic shape (real corpora would use char n-gram profiles; the
    * mechanism — per-language evidence counts + argmax — is the same). */
  def txtLangid(spark: SparkSession, dir: String): DataFrame = {
    val counts = langMarkers.map { case (l, ms) => l -> countIn(col("text"), ms) }
    // explicit argmax with precedence: lang wins if its count > 0 and
    // >= every later lang's count, checked in declaration order
    def argmax(rem: Seq[(String, Column)]): Column = rem match {
      case (l, c) +: tail =>
        val geAll = tail.map { case (_, c2) => c >= c2 }
          .foldLeft(c > 0)(_ && _)
        when(geAll, l).otherwise(argmax(tail))
      case _ => lit("und")
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), argmax(counts).as("predicted"), col("lang"),
        (argmax(counts) === col("lang")).as("correct"))
      .orderBy("doc_id")
  }

  val txtLangidSql: String = {
    val counts = langMarkers.map { case (l, ms) => l -> countInSql("text", ms) }
    def argmax(rem: Seq[(String, String)]): String = rem match {
      case (l, c) +: tail =>
        val conds = (s"$c > 0" +: tail.map { case (_, c2) => s"$c >= $c2" })
          .mkString(" AND ")
        s"CASE WHEN $conds THEN '$l' ELSE ${argmax(tail)} END"
      case _ => "'und'"
    }
    val p = argmax(counts)
    s"""SELECT doc_id, $p AS predicted, lang, ($p = lang) AS correct
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- txt_lang_confusion
  /** Language-ID confusion matrix — the aggregate quality report over
    * [[txtLangid]]'s per-doc predictions (which language leaks into
    * which, and how much lands in "und"): one hash-agg over the
    * classifier output plus each actual language's total broadcast
    * back for a per-mille share. The matrix is |langs|² rows at any
    * corpus size — the operator a routing decision ("trust lang X's
    * auto-label?") actually reads, where the per-doc form is too big
    * to eyeball. */
  def txtLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cell = txtLangid(spark, dir).groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
    val tot = cell.groupBy("lang").agg(sum(col("n")).as("_t"))
    cell.join(broadcast(tot), "lang")
      .select(col("lang"), col("predicted"), col("n"),
        expr("n * 1000 div _t").as("share_pm"))
      .reportSort("lang", "predicted")
  }

  val txtLangConfusionSql: String =
    s"""WITH p AS ($txtLangidSql),
       |c AS (SELECT lang, predicted, COUNT(*) AS n FROM p GROUP BY 1, 2),
       |t AS (SELECT lang, SUM(n) AS tt FROM c GROUP BY lang)
       |SELECT c.lang, c.predicted, c.n,
       |  CAST(c.n * 1000 // t.tt AS BIGINT) AS share_pm
       |FROM c JOIN t ON c.lang = t.lang
       |ORDER BY c.lang, c.predicted""".stripMargin

  // -------------------------------------------------- txt_fingerprint
  /** Document fingerprints: normalized-content md5 + order-insensitive
    * (sorted-token) md5 — the cheap near-dup prefilter pair. */
  def txtFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val sorted = array_join(array_sort(split(norm, " ")), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(norm).as("fp"), md5(sorted).as("sorted_fp"))
      .orderBy("doc_id")
  }

  val txtFingerprintSql: String = {
    val norm = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
    s"""SELECT doc_id, md5($norm) AS fp,
       |  md5(array_to_string(list_sort(regexp_split_to_array($norm, ' ')), ' ')) AS sorted_fp
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------- txt_top_bigrams
  /** Top-k bigrams per language — n-gram statistics as one explode +
    * agg + per-group rank (Spark's WindowGroupLimit keeps the rank
    * filter bounded per partition). */
  def txtTopBigrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.VectorExprs.register(spark)
    // codegen'd neighbor-concat (graft.expr.Bigrams) — the HOF
    // transform/sequence/element_at formulation is CodegenFallback and
    // dominated this operator's runtime
    val bigrams = call_function(graft.expr.VectorExprs.bigramsName,
      words(col("text")))
    Tables.documents(spark, dir)
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(desc("n"), col("bigram"))))
      .filter(col("rnk") <= 3)
      .select(col("lang"), col("bigram"), col("n"), col("rnk"))
      .reportSort("lang", "rnk")
  }

  val txtTopBigramsSql: String =
    """WITH big AS (
      |  SELECT lang,
      |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      |  FROM (SELECT lang, regexp_split_to_array(text, '\s+') AS w FROM documents) t)
      |SELECT lang, bigram, n, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT lang, bigram, COUNT(*) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY COUNT(*) DESC, bigram) AS rnk
      |  FROM big GROUP BY lang, bigram) r
      |WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin

  // --------------------------------------------------- txt_vocab_stats
  /** Per-language vocabulary statistics — the corpus-health numbers a
    * training pipeline tracks per source: vocabulary size, hapax
    * (singleton) count, total token mass, and the share of the top
    * token in exact per-mille (integer math, no float ratios cross
    * the oracle boundary). One explode + two agg shuffles, both keyed
    * on (lang[, token]) — the sharded word-count shape that scales
    * linearly. */
  def txtVocabStats(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
    tok.groupBy("lang")
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax_count"),
        sum(col("n")).as("token_mass"),
        max(col("n")).as("top_token_n"))
      .select(col("lang"), col("vocab_size"), col("hapax_count"),
        col("token_mass"),
        floor((col("top_token_n") * 1000L).cast("double") /
          col("token_mass").cast("double")).as("top_share_pm"))
      .reportSort("lang")
  }

  val txtVocabStatsSql: String =
    """WITH tok AS (
      |  SELECT lang, w, COUNT(*) AS n FROM (
      |    SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS w
      |    FROM documents) t
      |  GROUP BY lang, w)
      |SELECT lang, COUNT(*) AS vocab_size,
      |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
      |  CAST(SUM(n) AS BIGINT) AS token_mass,
      |  CAST(FLOOR(CAST(MAX(n) * 1000 AS DOUBLE) /
      |       CAST(SUM(n) AS DOUBLE)) AS BIGINT) AS top_share_pm
      |FROM tok GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------- txt_collocations
  /** Top collocations per language scored by pointwise mutual
    * information: PMI(x,y) = ln(p(x,y) / (p(x)·p(y))) with p estimated
    * from unigram/bigram counts over the language's token mass. The
    * standard phrase-mining signal (high-PMI pairs are multiword
    * units, not chance co-occurrences). Plan shape: the codegen bigram
    * pass feeds one (lang,bigram) count agg; two post-agg joins attach
    * the unigram counts (post-agg tables are tiny relative to the
    * corpus — AQE broadcasts them at runtime, nothing requires it);
    * ranking is by exact integer count with a string tie-break, so
    * cross-engine ordering never depends on float bits. The score
    * column is the PMI LIFT p(x,y)/(p(x)·p(y)) rather than its log:
    * +,×,/ are IEEE-exact and bit-reproducible across engines, while
    * ln() is correctly-rounded in neither Java nor DuckDB (measured
    * 1-ulp disagreement) — monotone-equivalent, PMI = ln(lift).
    */
  def txtCollocations(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, dir)
    val uni = docs.select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("nw"))
    val tot = uni.groupBy("lang").agg(sum(col("nw")).as("nn"))
    val big = docs.select(col("lang"),
        explode(call_function(graft.expr.VectorExprs.bigramsName,
          words(col("text")))).as("bigram"))
      .groupBy("lang", "bigram").agg(count(lit(1)).as("nxy"))
      .filter(col("nxy") >= 10)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    val u1 = uni.select(col("lang").as("l1"), col("w").as("w1"),
      col("nw").as("nx"))
    val u2 = uni.select(col("lang").as("l2"), col("w").as("w2"),
      col("nw").as("ny"))
    val lift =
      (col("nxy").cast("double") * col("nn").cast("double")) /
      (col("nx").cast("double") * col("ny").cast("double"))
    big
      .join(u1, col("lang") === col("l1") && big("w1") === u1("w1"))
      .join(u2, col("lang") === col("l2") && big("w2") === u2("w2"))
      .join(tot, "lang")
      .withColumn("lift", lift)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(desc("nxy"), col("bigram"))))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("bigram"), col("nxy"), col("lift"), col("rnk"))
      .reportSort("lang", "rnk")
  }

  val txtCollocationsSql: String =
    """WITH uni AS (
      |  SELECT lang, w, COUNT(*) AS nw FROM (
      |    SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS w
      |    FROM documents) t GROUP BY lang, w),
      |tot AS (SELECT lang, CAST(SUM(nw) AS BIGINT) AS nn FROM uni GROUP BY lang),
      |big AS (
      |  SELECT lang, bigram, COUNT(*) AS nxy FROM (
      |    SELECT lang,
      |      unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      |    FROM (SELECT lang, regexp_split_to_array(text, '\s+') AS w
      |          FROM documents) d) b
      |  GROUP BY lang, bigram HAVING COUNT(*) >= 10),
      |j AS (
      |  SELECT big.lang, big.bigram, big.nxy,
      |    (CAST(big.nxy AS DOUBLE) * CAST(tot.nn AS DOUBLE)) /
      |      (CAST(u1.nw AS DOUBLE) * CAST(u2.nw AS DOUBLE)) AS lift,
      |    ROW_NUMBER() OVER (PARTITION BY big.lang
      |      ORDER BY big.nxy DESC, big.bigram) AS rnk
      |  FROM big
      |  JOIN uni u1 ON u1.lang = big.lang
      |    AND u1.w = string_split(big.bigram, ' ')[1]
      |  JOIN uni u2 ON u2.lang = big.lang
      |    AND u2.w = string_split(big.bigram, ' ')[2]
      |  JOIN tot ON tot.lang = big.lang)
      |SELECT lang, bigram, nxy, lift, CAST(rnk AS INTEGER) AS rnk
      |FROM j WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin

  // --------------------------------------------------- txt_sentences
  /** Sentence segmentation stats per doc: segments are `[.!?]+`-run
    * splits that contain at least one word character (the non-empty
    * rule is EXPLICIT on both engines — trailing-empty behavior of
    * split differs between engines, so nothing relies on it). Emits
    * exact integers only: sentence count and the longest sentence's
    * word count. Map-only scalar pass; the HOFs here are per-doc and
    * bounded by sentence count (a corpus-scale hot path would get a
    * codegen expression like the bigram/minhash ops). */
  def txtSentences(spark: SparkSession, dir: String): DataFrame = {
    val segs = filter(split(col("text"), "[.!?]+"), s => s.rlike("\\w"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(segs).as("n_sentences"),
        array_max(transform(segs,
          s => size(split(trim(s), "\\s+")))).as("max_sentence_words"))
      .orderBy("doc_id")
  }

  val txtSentencesSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
      |    s -> regexp_matches(s, '\w'))) AS INTEGER) AS n_sentences,
      |  CAST(list_max(list_transform(
      |    list_filter(regexp_split_to_array(text, '[.!?]+'),
      |      s -> regexp_matches(s, '\w')),
      |    s -> len(regexp_split_to_array(trim(s), '\s+'))))
      |    AS INTEGER) AS max_sentence_words
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- txt_boilerplate
  /** Sentence-level boilerplate detection — the CCNet-style paragraph
    * dedup signal beside the 8-gram span fraction: a NORMALIZED
    * sentence (lowercased, whitespace-collapsed) that appears in ≥ 2
    * distinct documents is boilerplate (headers, footers, license
    * blurbs), and a doc's boilerplate per-mille decides whether it
    * survives corpus filtering. Same linear shape as
    * [[graft.dedup.Dedup.spanFraction]]: one sentence-split pass, each
    * sentence reduced to the portable 32-bit md5-prefix hash so every
    * exchange ships 16-byte rows; per-doc distinct → posting counts
    * via one map-side-combining hash-agg; join-back adds no fan-out
    * beyond existing rows. Counts are over DISTINCT normalized
    * sentences per doc. */
  def txtBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val segs = filter(split(col("text"), "[.!?]+"), s => s.rlike("\\w"))
    val sh = conv(substring(md5(
      regexp_replace(trim(lower(col("s"))), "\\s+", " ")), 1, 8), 16, 10)
      .cast("long")
    val sents = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(segs).as("s"))
      .select(col("doc_id"), sh.as("sh"))
      .distinct()
    val posting = sents.groupBy("sh").agg(count(lit(1)).as("_nd"))
    sents.join(posting, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("_nd") >= 2, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_pm", expr("n_boiler * 1000 div n_sentences"))
      .orderBy("doc_id")
  }

  val txtBoilerplateSql: String =
    """WITH s AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x'||substr(md5(regexp_replace(trim(lower(x)), '\s+', ' ',
      |      'g')),1,8))::BIGINT AS sh
      |  FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(regexp_split_to_array(text, '[.!?]+'),
      |        x -> regexp_matches(x, '\w'))) AS x
      |    FROM documents) t),
      |p AS (SELECT sh, COUNT(*) AS nd FROM s GROUP BY sh)
      |SELECT s.doc_id, COUNT(*) AS n_sentences,
      |  CAST(SUM(CASE WHEN p.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boiler,
      |  CAST(SUM(CASE WHEN p.nd >= 2 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS boiler_pm
      |FROM s JOIN p ON s.sh = p.sh
      |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- txt_tfidf
  /** Per-language salient terms by exact-integer TF-IDF lift: for each
    * (lang, term), tf = occurrences in that language, df = distinct
    * docs corpus-wide containing the term, and the score is the lift
    * tf·N/df in per-mille — integer arithmetic end to end (idf's log
    * is monotone in N/df, so the ranking is the TF-IDF ranking without
    * a float crossing the oracle boundary). Plan shape: one token
    * explode feeds a (lang, term) count and a distinct-doc count, the
    * corpus total is a 1-row broadcast, and the top-k rank runs over
    * the AGGREGATED vocab table where Spark's WindowGroupLimit caps
    * per-partition state at k — never a corpus-sized window. */
  def txtTfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("lang"), col("doc_id"),
        explode(words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val tf = toks.groupBy("lang", "w").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val rk = Window.partitionBy("lang")
      .orderBy(col("lift_pm").desc, col("w"))
    tf.join(dfreq, "w")
      .crossJoin(broadcast(total))
      .withColumn("lift_pm", expr("tf * n_docs * 1000 div df"))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("w").as("term"), col("tf"), col("df"),
        col("lift_pm"), col("rank"))
      .reportSort("lang", "rank")
  }

  val txtTfidfSql: String =
    """WITH toks AS (
      |  SELECT lang, doc_id, w FROM (
      |    SELECT lang, doc_id,
      |      unnest(regexp_split_to_array(text, '\s+')) AS w
      |    FROM documents) t
      |  WHERE len(w) > 0),
      |tf AS (SELECT lang, w, COUNT(*) AS tf FROM toks GROUP BY lang, w),
      |dfreq AS (
      |  SELECT w, COUNT(*) AS df
      |  FROM (SELECT DISTINCT doc_id, w FROM toks) d GROUP BY w),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.lang, tf.w, tf.tf, dfreq.df,
      |    CAST(tf.tf * n.n_docs * 1000 // dfreq.df AS BIGINT) AS lift_pm
      |  FROM tf JOIN dfreq USING (w) CROSS JOIN n),
      |r AS (
      |  SELECT lang, w, tf, df, lift_pm,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY lift_pm DESC, w) AS rank
      |  FROM scored)
      |SELECT lang, w AS term, tf, df, lift_pm,
      |  CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin

  // --------------------------------------------------- txt_repetition
  /** Gopher-style within-document repetition signal: the fraction of
    * word trigram instances that are repeats of an earlier trigram in
    * the SAME document (duplicate-instance mass = n_grams −
    * n_distinct_grams). High values flag boilerplate/spam/looping
    * generation — a standard pre-training quality gate alongside
    * [[qualityScore]].
    *
    * Scale shape: the per-doc statistic is computed entirely row-local
    * — codegen [[graft.expr.NGrams]] builds the gram array,
    * `array_distinct` dedups it inside the row — so there is NO
    * shuffle until the final |langs|-row aggregation. (The naive
    * formulation — explode grams, groupBy (doc, gram) — shuffles the
    * whole corpus twice; this one ships five longs per language.)
    * Integers only: per-doc per-mille via integer div, summed/maxed
    * exactly. */
  def txtRepetition(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val g = call_function(graft.expr.VectorExprs.ngramsName,
      words(col("text")), lit(3))
    Tables.documents(spark, dir)
      .select(col("lang"), size(g).as("n_tri"),
        size(array_distinct(g)).as("n_dist"))
      .filter(col("n_tri") >= lit(1))
      .select(col("lang"),
        expr("(n_tri - n_dist) * 1000 div n_tri").as("pm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pm")).as("sum_pm"),
        max(col("pm")).as("max_pm"),
        sum(when(col("pm") >= 100, 1L).otherwise(0L)).as("n_repetitive"))
      .reportSort("lang")
  }

  val txtRepetitionSql: String =
    """WITH d AS (
      |  SELECT lang,
      |    list_transform(range(1, len(w) - 1),
      |      i -> array_to_string(w[i:i+2], ' ')) AS g
      |  FROM (SELECT lang, regexp_split_to_array(text, '\s+') AS w
      |        FROM documents) t),
      |pm AS (
      |  SELECT lang,
      |    (len(g) - len(list_distinct(g))) * 1000 // len(g) AS pm
      |  FROM d WHERE len(g) >= 1)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(pm) AS BIGINT) AS sum_pm, MAX(pm) AS max_pm,
      |  CAST(SUM(CASE WHEN pm >= 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repetitive
      |FROM pm GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------ txt_rarity
  /** Perplexity surrogate without transcendental math: every token
    * gets a global rarity RANK (1 = most frequent, ties broken by the
    * token itself), and each document scores the integer mean rank of
    * its token INSTANCES — rare-token-heavy docs (noise, codes,
    * boilerplate IDs) score high exactly where a unigram LM would
    * assign high perplexity, but the statistic is engine-exact
    * integers end to end. Scale shape: the global rarity rank is
    * computed WITHOUT a global one-partition window — the
    * shard-rank + exclusive-prefix-sum decomposition of
    * [[graft.pipeline.CorpusPipeline.globalShuffle]] applied to the
    * (df desc, w) order key. Shard = (df, first code point of w):
    * contiguous in the global order (string comparison is code-point
    * order, so bucketing by the first code point respects it), and it
    * splits the huge df=1 long-tail across ≤|alphabet| sub-shards.
    * The local row_number runs per shard; shard offsets come from a
    * prefix-sum window over the AGGREGATED per-shard counts (≤
    * |distinct df|·|alphabet| rows — the same bounded post-agg-window
    * class as the value histograms, never |vocab|). The token→rank
    * join is a plain shuffle join the optimizer may broadcast when
    * the vocab is small. */
  def txtRarity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(words(col("text"))).as("w"))
    val hist = tok.groupBy("w").agg(count(lit(1)).as("df"))
      .withColumn("_wb", ascii(substring(col("w"), 1, 1)))
    val counts = hist.groupBy("df", "_wb").agg(count(lit(1)).as("_c"))
    // single-partition BY DESIGN (input is the bounded aggregated
    // shard-count frame, not the vocab). The partition key is a
    // constant-valued but non-foldable expression: a literal would be
    // folded away by EliminateWindowPartitions and re-trip WindowExec's
    // unpartitioned-window warning meant for corpus-sized inputs.
    val pre = Window.partitionBy(pmod(col("_c"), lit(1)))
      .orderBy(desc("df"), col("_wb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select(col("df"), col("_wb"), col("_off"))
    val local = Window.partitionBy(col("df"), col("_wb")).orderBy(col("w"))
    val rank = hist
      .withColumn("_lr", row_number().over(local).cast("long"))
      .join(offsets, Seq("df", "_wb"))
      .select(col("w"), (col("_off") + col("_lr")).as("rank"))
    tok.join(rank, "w")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tok"), sum(col("rank")).as("rank_sum"))
      .select(col("lang"), expr("rank_sum div n_tok").as("mean_rank"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("mean_rank")).as("sum_mean_rank"),
        max(col("mean_rank")).as("max_mean_rank"))
      .reportSort("lang")
  }

  val txtRaritySql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(regexp_split_to_array(text, '\s+')) AS w
      |  FROM documents),
      |r AS (
      |  SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rank
      |  FROM tok GROUP BY w),
      |d AS (
      |  SELECT t.doc_id, t.lang,
      |    SUM(r.rank) // COUNT(*) AS mean_rank
      |  FROM tok t JOIN r USING (w)
      |  GROUP BY t.doc_id, t.lang)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(mean_rank) AS BIGINT) AS sum_mean_rank,
      |  CAST(MAX(mean_rank) AS BIGINT) AS max_mean_rank
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------ txt_char_classes
  /** Per-language character-class profile — the writing-system signal
    * beside [[txtLangid]]'s n-gram heuristic: per-mille of alphabetic,
    * digit, and whitespace characters over each language's total
    * character mass. Counts come from codegen regexp strips (length
    * of text minus the class's complement), summed exactly as
    * integers; the per-mille division happens once per language row.
    * Row-local until the |langs|-row aggregation — no shuffle of
    * text. */
  def txtCharClasses(spark: SparkSession, dir: String): DataFrame = {
    def kept(re: String) =
      length(regexp_replace(col("text"), re, ""))
    Tables.documents(spark, dir)
      .select(col("lang"), length(col("text")).as("n_chars"),
        kept("[^A-Za-z]").as("n_alpha"),
        kept("[^0-9]").as("n_digit"),
        kept("[^\\s]").as("n_space"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sc"), sum(col("n_alpha")).as("sa"),
        sum(col("n_digit")).as("sd"), sum(col("n_space")).as("ss"))
      .select(col("lang"), col("n_docs"),
        col("sc").as("n_chars"),
        expr("sa * 1000 div sc").as("alpha_pm"),
        expr("sd * 1000 div sc").as("digit_pm"),
        expr("ss * 1000 div sc").as("space_pm"))
      .reportSort("lang")
  }

  val txtCharClassesSql: String =
    """WITH d AS (
      |  SELECT lang, length(text) AS n_chars,
      |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
      |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
      |    length(regexp_replace(text, '[^\s]', '', 'g')) AS n_space
      |  FROM documents),
      |s AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS sc,
      |    CAST(SUM(n_alpha) AS BIGINT) AS sa,
      |    CAST(SUM(n_digit) AS BIGINT) AS sd,
      |    CAST(SUM(n_space) AS BIGINT) AS ss
      |  FROM d GROUP BY lang)
      |SELECT lang, n_docs, sc AS n_chars,
      |  (sa * 1000) // sc AS alpha_pm,
      |  (sd * 1000) // sc AS digit_pm,
      |  (ss * 1000) // sc AS space_pm
      |FROM s ORDER BY lang""".stripMargin

  // --------------------------------------------------- txt_html_strip
  /** HTML → text extraction (the first transform a crawl corpus gets,
    * before any quality/dedup step): drop script/style subtrees, strip
    * tags, decode the common entities, collapse whitespace. The HTML
    * is synthesized deterministically around each doc's text (title
    * heading, paragraph body, nav div with entities, a script and a
    * style block), so both engines rebuild identical input pages; the
    * per-doc hash of the extracted text proves the cleaned BYTES
    * match, and the markup/clean length delta is the boilerplate-mass
    * signal. Pure codegen map pass — no shuffle until the final
    * per-doc projection. */
  def txtHtmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val title = array_join(slice(words(col("text")), 1, 5), " ")
    val html = concat(
      lit("<html><head><script type=\"text/javascript\">var x = 1;</script>"),
      lit("<style>.nav{color:red}</style></head><body><h1>"), title,
      lit("</h1><p>"), col("text"),
      lit("</p><div class=\"nav\">Home &amp; News &gt; Archive&nbsp;2024</div>"),
      lit("</body></html>"))
    val noScript = regexp_replace(
      regexp_replace(html, "<script.*?</script>", " "),
      "<style.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags, "&amp;", "&"), "&lt;", "<"), "&gt;", ">"), "&nbsp;", " ")
    val clean = trim(regexp_replace(decoded, "\\s+", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(html).cast("long").as("n_chars_html"),
        length(clean).cast("long").as("n_chars_clean"),
        substring(clean, 1, 40).as("clean_head"),
        graft.mask.MaskFunctions.portableHash(clean).as("clean_hash"))
      .orderBy("doc_id")
  }

  val txtHtmlStripSql: String = {
    val title =
      "array_to_string((regexp_split_to_array(text, '\\s+'))[1:5], ' ')"
    val html = "'<html><head><script type=\"text/javascript\">var x = 1;" +
      "</script><style>.nav{color:red}</style></head><body><h1>' || " +
      title + " || '</h1><p>' || text || '</p><div class=\"nav\">" +
      "Home &amp; News &gt; Archive&nbsp;2024</div></body></html>'"
    s"""WITH h AS (SELECT doc_id, $html AS page FROM documents),
       |c AS (
       |  SELECT doc_id, page, trim(regexp_replace(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(page,
       |        '<script.*?</script>', ' ', 'g'),
       |        '<style.*?</style>', ' ', 'g'),
       |        '<[^>]+>', ' ', 'g'),
       |        '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
       |        '&nbsp;', ' ', 'g'),
       |    '\\s+', ' ', 'g')) AS clean
       |  FROM h)
       |SELECT doc_id, CAST(length(page) AS BIGINT) AS n_chars_html,
       |  CAST(length(clean) AS BIGINT) AS n_chars_clean,
       |  substr(clean, 1, 40) AS clean_head,
       |  (('0x'||substr(md5(clean),1,8))::BIGINT) AS clean_hash
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------- txt_vocab_coverage
  /** Top-k vocabulary coverage curve — the tokenizer-design question
    * "what fraction of corpus tokens do the k most frequent words
    * cover?" over a k-grid (3/10/30 here, spanning the test corpus's
    * deliberately small vocab; production grids are 100/1k/10k). Computed TIE-BREAK-FREE from the
    * frequency histogram: words collapse to (count → #words, mass)
    * rows, a prefix sum in descending count order locates each k's
    * bracket, and the partial tie group contributes (k − words_above)
    * × count — so no per-word ordering ever matters and no window
    * ever sees the vocab, only the ≤|distinct counts| histogram (the
    * q27/q29 value-histogram trick applied to frequencies). */
  def txtVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val hist = tok.groupBy("c").agg(count(lit(1)).as("m"))
    // single-partition by design: runs over the ≤|distinct counts|
    // histogram, never the vocab (non-foldable constant key — see
    // txtRarity — keeps the deliberate single partition warning-free)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("m"), lit(1))).orderBy(desc("c"))
    val cum = hist
      .withColumn("cw", sum(col("m")).over(w))
      .withColumn("cm", sum(expr("c * m")).over(w))
    val tot = tok.agg(count(lit(1)).as("vocab_size"),
      sum(col("c")).as("total_tokens"))
    val ks = spark.range(1).select(
      explode(array(lit(3L), lit(10L), lit(30L))).as("k"))
    ks.crossJoin(broadcast(tot))
      .join(cum, col("cw") >= col("k") && col("cw") - col("m") < col("k"),
        "left_outer")
      .select(col("k"), col("vocab_size"), col("total_tokens"),
        coalesce(col("cm") - col("c") * col("m") +
          (col("k") - (col("cw") - col("m"))) * col("c"),
          col("total_tokens")).as("tokens_covered"))
      .withColumn("coverage_pm",
        expr("tokens_covered * 1000 div total_tokens"))
      .reportSort("k")
  }

  val txtVocabCoverageSql: String =
    """WITH tok AS (
      |  SELECT w, COUNT(*) AS c FROM (
      |    SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
      |    FROM documents) t
      |  GROUP BY w),
      |hist AS (SELECT c, COUNT(*) AS m FROM tok GROUP BY c),
      |cum AS (SELECT c, m,
      |          SUM(m) OVER (ORDER BY c DESC) AS cw,
      |          SUM(c * m) OVER (ORDER BY c DESC) AS cm
      |        FROM hist),
      |tot AS (SELECT COUNT(*) AS vocab_size,
      |          CAST(SUM(c) AS BIGINT) AS total_tokens FROM tok),
      |ks AS (SELECT unnest([3, 10, 30]) AS k)
      |SELECT CAST(k AS BIGINT) AS k, vocab_size, total_tokens,
      |  CAST(COALESCE(cm - c * m + (k - (cw - m)) * c, total_tokens)
      |    AS BIGINT) AS tokens_covered,
      |  CAST(COALESCE(cm - c * m + (k - (cw - m)) * c, total_tokens)
      |    * 1000 // total_tokens AS BIGINT) AS coverage_pm
      |FROM ks CROSS JOIN tot
      |LEFT JOIN cum ON cw >= k AND cw - m < k
      |ORDER BY k""".stripMargin

  // ------------------------------------------------- txt_readability
  /** Readability profile per language — words/sentences/syllables and
    * an integer Flesch–Kincaid grade: syllables are vowel-group runs
    * (the deterministic proxy both engines compute identically via one
    * regexp pass), and the grade is the FK formula in MILLI-grade
    * integer arithmetic (390·W div S + 11800·Syl div W − 15590), so no
    * float ratio ever crosses the oracle boundary. One codegen map
    * pass + one combiner-friendly per-lang agg. */
  def txtReadability(spark: SparkSession, dir: String): DataFrame = {
    val nW = size(words(col("text"))).cast("long")
    val nS = size(filter(split(col("text"), "[.!?]+"),
      s => s.rlike("\\w"))).cast("long")
    val nSyl = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    Tables.documents(spark, dir)
      .select(col("lang"), nW.as("nw"), nS.as("ns"), nSyl.as("nsy"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("ns")).as("n_sentences"), sum(col("nsy")).as("n_syllables"))
      .withColumn("wps_milli", expr("n_words * 1000 div n_sentences"))
      .withColumn("spw_milli", expr("n_syllables * 1000 div n_words"))
      .withColumn("fk_grade_milli",
        expr("390 * n_words div n_sentences " +
          "+ 11800 * n_syllables div n_words - 15590"))
      .reportSort("lang")
  }

  val txtReadabilitySql: String =
    """WITH d AS (
      |  SELECT lang,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS nw,
      |    CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
      |      s -> regexp_matches(s, '\w'))) AS BIGINT) AS ns,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS nsy
      |  FROM documents),
      |a AS (SELECT lang, COUNT(*) AS n_docs,
      |        CAST(SUM(nw) AS BIGINT) AS n_words,
      |        CAST(SUM(ns) AS BIGINT) AS n_sentences,
      |        CAST(SUM(nsy) AS BIGINT) AS n_syllables
      |      FROM d GROUP BY lang)
      |SELECT lang, n_docs, n_words, n_sentences, n_syllables,
      |  CAST(n_words * 1000 // NULLIF(n_sentences, 0) AS BIGINT)
      |    AS wps_milli,
      |  CAST(n_syllables * 1000 // NULLIF(n_words, 0) AS BIGINT)
      |    AS spw_milli,
      |  CAST(390 * n_words // NULLIF(n_sentences, 0)
      |    + 11800 * n_syllables // NULLIF(n_words, 0) - 15590 AS BIGINT)
      |    AS fk_grade_milli
      |FROM a ORDER BY lang""".stripMargin

  // ------------------------------------------------------ txt_hapax
  /** Hapax-legomena census per language — the vocabulary-tail health
    * metric (a scraped corpus whose hapax share explodes is full of
    * OCR noise / IDs / mojibake; one whose share collapses is
    * template spam). Per language: vocabulary size, hapax count
    * (words seen exactly once IN THAT LANGUAGE), total token mass,
    * hapax per-mille of the vocabulary. One explode + one
    * (lang, word) hash-agg + one |langs|-row fold — no windows, no
    * joins; the same two-agg shape as the TF-IDF DF pass. */
  def txtHapax(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("df"))
      .groupBy("lang")
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("df")).as("total_tokens"))
      .select(col("lang"), col("vocab_size"), col("n_hapax"),
        col("total_tokens"),
        expr("n_hapax * 1000 div vocab_size").as("hapax_pm"))
      .reportSort("lang")

  val txtHapaxSql: String =
    """WITH tf AS (
      |  SELECT lang, w, COUNT(*) AS df
      |  FROM (SELECT lang,
      |          unnest(regexp_split_to_array(text, '\s+')) AS w
      |        FROM documents) t
      |  GROUP BY lang, w),
      |g AS (
      |  SELECT lang, COUNT(*) AS vocab_size,
      |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hapax,
      |    CAST(SUM(df) AS BIGINT) AS total_tokens
      |  FROM tf GROUP BY lang)
      |SELECT lang, vocab_size, n_hapax, total_tokens,
      |  CAST(n_hapax * 1000 // vocab_size AS BIGINT) AS hapax_pm
      |FROM g ORDER BY lang""".stripMargin

  // --------------------------------------------- txt_encoding_audit
  /** Encoding-health audit per source — the mojibake detector every
    * web-scale ingest runs before training: how many documents carry
    * C0 control characters (broken escapes, binary bleed-through),
    * the U+FFFD replacement character (a decoder already gave up
    * upstream), or classic UTF-8-as-Latin-1 mojibake marks (Â/Ã
    * digraph residue). Pure codegen rlike flags + one |sources|-row
    * agg; row-local until the final fold. */
  def txtEncodingAudit(spark: SparkSession, dir: String): DataFrame = {
    val ctrl = col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
    val repl = col("text").contains("�")
    // concrete digraphs ("Ã©" = mojibake é, "â€" = mojibake quote
    // family), not a regex over non-ASCII ranges — substring match
    // has identical semantics in any engine
    val moji = col("text").contains("Ã©") || col("text").contains("â€")
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(ctrl, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(repl, 1L).otherwise(0L)).as("n_replacement"),
        sum(when(moji, 1L).otherwise(0L)).as("n_mojibake"))
      .select(col("source"), col("n_docs"), col("n_ctrl"),
        col("n_replacement"), col("n_mojibake"),
        expr("(n_ctrl + n_replacement + n_mojibake) * 1000 div n_docs")
          .as("suspect_pm"))
      .reportSort("source")
  }

  val txtEncodingAuditSql: String =
    """WITH f AS (
      |  SELECT source,
      |    CASE WHEN regexp_matches(text,
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS c,
      |    CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS r,
      |    CASE WHEN contains(text, 'Ã©') OR contains(text, 'â€')
      |      THEN 1 ELSE 0 END AS m
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(c) AS BIGINT) AS n_ctrl,
      |  CAST(SUM(r) AS BIGINT) AS n_replacement,
      |  CAST(SUM(m) AS BIGINT) AS n_mojibake,
      |  CAST((SUM(c) + SUM(r) + SUM(m)) * 1000 // COUNT(*) AS BIGINT)
      |    AS suspect_pm
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------- txt_novelty
  /** Per-document n-gram NOVELTY in corpus order — the "how much of
    * this doc has the corpus already seen" profile (the streaming-
    * ingest complement of span dedup: attribution goes to the FIRST
    * doc_id carrying each 5-gram, so re-crawls and syndicated copies
    * score near zero while fresh content scores high). Shape: one
    * linear gram explode + distinct, one min-agg on the 8-byte gram
    * hash (combiner-friendly — a boilerplate gram partial-aggregates
    * map-side), one join back on the same hash partitioning, one
    * per-doc fold. No windows, no pair joins — the dedup_span shape
    * with min-attribution instead of a document-frequency test. */
  def txtNovelty(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(call_function(graft.expr.VectorExprs.ngramsName,
          words(col("text")), lit(5))).as("g"))
      // 60-bit gram key (15 md5 hex chars — the Dedup.scala signed-
      // BIGINT idiom): a 32-bit key birthday-collides past ~10^5
      // distinct grams, merging unrelated grams and deflating n_novel
      // at corpus scale
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
      .distinct()
    val first = grams.groupBy("gh").agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_pm", expr("n_novel * 1000 div n_grams"))
      .orderBy("doc_id")
  }

  val txtNoveltySql: String =
    """WITH docs AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x'||substr(md5(g),1,15))::BIGINT AS gh
      |  FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(w) - 3),
      |        i -> array_to_string(w[i:i+4], ' '))) AS g
      |    FROM docs) t),
      |f AS (SELECT gh, MIN(doc_id) AS first_doc FROM grams GROUP BY gh)
      |SELECT g.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
      |    * 1000 // COUNT(*) AS BIGINT) AS novelty_pm
      |FROM grams g JOIN f USING (gh)
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- txt_bpe_pairs
  /** The first BPE-training iteration: per language, the most frequent
    * ADJACENT CHARACTER pairs inside words — the statistic byte-pair
    * encoding greedily merges, and the vocabulary-design signal a
    * tokenizer team reads per corpus slice (which digraphs dominate
    * which language). Pair extraction is a generated position sequence
    * + substring (codegen Generate — no interpreted lambda), counts
    * are one (lang, pair) hash-agg, and the per-language top-10 runs
    * as a partial map-side WindowGroupLimit. A full BPE trainer
    * iterates this exact unit: count → merge best pair → recount. */
  def txtBpePairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("lang"), col("w"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("lang"), expr("substring(w, i, 2)").as("pair"))
      .groupBy("lang", "pair").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(desc("n"), col("pair")))
        .cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("lang"), col("rnk"), col("pair"), col("n"))
      .reportSort("lang", "rnk")
  }

  val txtBpePairsSql: String =
    """WITH t AS (
      |  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS w
      |  FROM documents),
      |p AS (
      |  SELECT lang, substr(w, CAST(i AS INTEGER), 2) AS pair
      |  FROM (SELECT lang, w, unnest(range(1, length(w))) AS i
      |        FROM t WHERE length(w) >= 2) z),
      |c AS (SELECT lang, pair, COUNT(*) AS n FROM p GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, pair, n, ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY n DESC, pair) AS rnk
      |  FROM c)
      |SELECT lang, CAST(rnk AS BIGINT) AS rnk, pair, n
      |FROM r WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin

  // --------------------------------------------------- txt_bpe_train
  /** K greedy BPE merge rounds — the iterated form of
    * [[txtBpePairs]]'s single counting pass: per language, count
    * adjacent symbol pairs, merge the most frequent pair into one
    * symbol, recount over the merged encoding, K times. Emits the
    * merge table (lang, round, pair, frequency at merge time) — the
    * artifact a tokenizer training run publishes.
    *
    * Scale shape: the corpus is first collapsed to WORD TYPES with
    * occurrence counts (one linear hash-agg — the classic BPE trainer
    * optimization; every later round works on the type table, orders
    * of magnitude smaller than the corpus). Each round is then one
    * (lang, x, y) weighted hash-agg + a per-lang argmax + one
    * broadcast of the ≤|langs| winning pairs back onto the type
    * table. The merge itself is a single codegen `replace` over a
    * sentinel-delimited symbol string: each symbol is wrapped in
    * U+0001 so adjacency is the 2-sentinel boundary, and replace()'s
    * left-to-right non-overlapping scan IS the BPE merge rule (both
    * engines share those semantics, so "aaa" merges to [aa, a]
    * identically). No driver-side loop state beyond the fixed K. */
  def txtBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeShared(spark, dir).filter(col("kind") === "m")
      .select(col("lang"), col("round"), col("x").as("pair_left"),
        col("y").as("pair_right"), col("n"))
      .reportSort("lang", "round")

  /** The K-round trainer core over any (lang, text) frame. */
  def bpeTrain(docs: DataFrame, k: Int): DataFrame =
    bpeRounds(docs, k)._1
      .select(col("lang"), col("round"), col("x").as("pair_left"),
        col("y").as("pair_right"), col("n"))
      .orderBy("lang", "round")

  /** Session-memoized combined (merge table ⊎ encoded words) frame at
    * K=4 — `txt_bpe_train` and `txt_bpe_apply` are two views of ONE
    * trainer run, so the 4-round chain executes once per corpus (the
    * dedup pair-set memo pattern; the union carries a kind tag and
    * per-kind nulls so one checkpoint serves both schemas). */
  private def bpeShared(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "bpe4") {
      val (m, e) = bpeRounds(Tables.documents(spark, dir), 4)
      m.select(lit("m").as("kind"), col("lang"), col("round"),
          col("x"), col("y"), col("n"),
          lit(null).cast("long").as("wn"),
          lit(null).cast("string").as("enc"))
        .unionAll(e.select(lit("e").as("kind"), col("lang"),
          lit(null).cast("long").as("round"),
          lit(null).cast("string").as("x"),
          lit(null).cast("string").as("y"),
          lit(null).cast("long").as("n"),
          col("wn"), col("enc")))
    }

  /** K greedy merge rounds; returns (merge table, the FINAL encoded
    * word-type table (lang, wn, enc)) — the encoded table is what
    * [[txtBpeApply]] measures tokenizer fertility on. */
  private def bpeRounds(docs: DataFrame, k: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val SEP = "\u0001"
    val K = k
    var cur = docs
      .select(col("lang"), explode(words(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("lang", "w").agg(count(lit(1)).as("wn"))
      .select(col("lang"), col("wn"),
        regexp_replace(col("w"), "(.)", SEP + "$1" + SEP).as("enc"))
    var merges: DataFrame = null
    for (r <- 1 to K) {
      val pairs = cur
        .select(col("lang"), col("wn"),
          split(trim(col("enc"), SEP), SEP + SEP).as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("lang"), col("wn"), col("s"),
          explode(sequence(lit(0), size(col("s")) - 2)).as("i"))
        .select(col("lang"), col("wn"),
          col("s")(col("i")).as("x"), col("s")(col("i") + 1).as("y"))
        .groupBy("lang", "x", "y").agg(sum(col("wn")).as("n"))
      val best = pairs
        .withColumn("_rk", row_number().over(
          Window.partitionBy("lang").orderBy(desc("n"), col("x"), col("y"))))
        .filter(col("_rk") === 1)
        .select(col("lang"), lit(r.toLong).as("round"),
          col("x"), col("y"), col("n"))
      merges = if (merges == null) best else merges.union(best)
      cur = cur.join(broadcast(best.select("lang", "x", "y")),
          Seq("lang"), "left")
        .withColumn("enc", when(col("x").isNull, col("enc")).otherwise(
          replace(col("enc"),
            concat(lit(SEP), col("x"), lit(SEP + SEP), col("y"), lit(SEP)),
            concat(lit(SEP), col("x"), col("y"), lit(SEP)))))
        .select("lang", "wn", "enc")
        // cut the per-round lineage (lazy local checkpoint): without
        // it the K-round chain compiles into ONE deep plan in which
        // round r's subtree is embedded by every later round AND by
        // the merge-table union — quadratic re-analysis/codegen and
        // re-executed projections. The checkpointed frame is the
        // word-TYPE table (vocab-sized at any corpus scale), so the
        // cut is cheap at 100 TB too.
        .cutLazy
    }
    (merges, cur)
  }

  // ---------------------------------------------------- txt_bpe_apply
  /** Apply the K trained BPE merges corpus-wide and measure tokenizer
    * FERTILITY — the statistic that decides whether a merge table is
    * worth shipping: per language, weighted word instances, total
    * characters, total post-merge symbols, and symbols-per-1000-chars
    * (1000 = nothing merged; lower = the tokenizer compresses). Only
    * the trained vocabulary (words ≥ 2 chars) is measured — the same
    * contract as the trainer. The encoded word-TYPE table is tiny
    * (vocab-sized, weights carry the instance counts), so applying
    * merges costs |vocab| work regardless of corpus size — the
    * classic trainer/encoder asymmetry. */
  def txtBpeApply(spark: SparkSession, dir: String): DataFrame = {
    val SEP = "\u0001"
    val enc = bpeShared(spark, dir).filter(col("kind") === "e")
    enc.select(col("lang"), col("wn"),
        size(split(trim(col("enc"), SEP), SEP + SEP)).as("n_sym"),
        length(regexp_replace(col("enc"), SEP, "")).as("n_chars"))
      .groupBy("lang")
      .agg(sum(col("wn")).as("n_words"),
        sum(col("wn") * col("n_chars")).as("chars"),
        sum(col("wn") * col("n_sym")).as("symbols"))
      .withColumn("symbols_per_kchar", expr("symbols * 1000 div chars"))
      .reportSort("lang")
  }

  /** Oracle replays the identical K merges: same sentinel encoding,
    * same weighted pair counts, same (n DESC, x, y) argmax, same
    * left-to-right replace. Generated per round so Spark and SQL can
    * never drift on K. */
  /** Both BPE oracles share ONE merge-chain builder (through e4), so
    * the trainer and the fertility measure can never drift on K or on
    * the merge semantics. */
  private lazy val bpeSqlPair: (String, String) = {
    val S = "chr(1)"
    val rounds = (1 to 4).map { r =>
      s"""s$r AS (
         |  SELECT lang, wn,
         |    string_split(trim(e${r - 1}.enc, $S), $S||$S) AS s
         |  FROM e${r - 1}),
         |p$r AS (
         |  SELECT lang, x, y, CAST(SUM(wn) AS BIGINT) AS n FROM (
         |    SELECT lang, wn, s[i] AS x, s[i+1] AS y
         |    FROM (SELECT lang, wn, s, unnest(range(1, len(s))) AS i
         |          FROM s$r) z) q
         |  GROUP BY 1, 2, 3),
         |b$r AS (
         |  SELECT lang, x, y, n FROM (
         |    SELECT lang, x, y, n, ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY n DESC, x, y) AS rk
         |    FROM p$r) q WHERE rk = 1),
         |e$r AS (
         |  SELECT e.lang, e.wn,
         |    CASE WHEN b.x IS NULL THEN e.enc ELSE
         |      replace(e.enc, $S||b.x||$S||$S||b.y||$S, $S||b.x||b.y||$S)
         |    END AS enc
         |  FROM e${r - 1} e LEFT JOIN b$r b USING (lang))""".stripMargin
    }.mkString(",\n")
    val out = (1 to 4).map { r =>
      s"""SELECT lang, CAST($r AS BIGINT) AS round, x AS pair_left,
         |  y AS pair_right, n FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    val chain = s"""WITH wt AS (
       |  SELECT lang, w, COUNT(*) AS wn FROM (
       |    SELECT lang, unnest(regexp_split_to_array(text, '\\s+')) AS w
       |    FROM documents) t
       |  WHERE length(w) >= 2 GROUP BY 1, 2),
       |e0 AS (
       |  SELECT lang, wn,
       |    regexp_replace(w, '(.)', $S||'\\1'||$S, 'g') AS enc
       |  FROM wt),
       |$rounds""".stripMargin
    val applySql = s"""$chain,
       |fin AS (
       |  SELECT lang, wn,
       |    len(string_split(trim(enc, $S), $S||$S)) AS n_sym,
       |    length(replace(enc, $S, '')) AS n_chars
       |  FROM e4)
       |SELECT lang, CAST(SUM(wn) AS BIGINT) AS n_words,
       |  CAST(SUM(wn * n_chars) AS BIGINT) AS chars,
       |  CAST(SUM(wn * n_sym) AS BIGINT) AS symbols,
       |  CAST(SUM(wn * n_sym) * 1000 // SUM(wn * n_chars) AS BIGINT)
       |    AS symbols_per_kchar
       |FROM fin GROUP BY lang ORDER BY lang""".stripMargin
    val trainSql = s"""$chain
       |$out
       |ORDER BY lang, round""".stripMargin
    (trainSql, applySql)
  }

  val txtBpeTrainSql: String = bpeSqlPair._1
  val txtBpeApplySql: String = bpeSqlPair._2

  // ------------------------------------------------ txt_source_overlap
  /** Pairwise SOURCE vocabulary overlap — the provenance signal a
    * corpus report uses to spot re-crawled or mirrored feeds before
    * dedup ever runs (two "independent" sources sharing 90% of their
    * vocabulary are one source): per source the distinct token set,
    * pairwise intersection via ONE token-keyed self-join, exact
    * integer Jaccard per-mille. Scale shape: the join fans out at
    * most |sources|² per token (source count is bounded metadata
    * cardinality, not data volume), and only (source, token-hash)
    * pairs shuffle. */
  def txtSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(words(col("text"))).as("w"))
      .distinct()
    val sizes = tok.groupBy("source").agg(count(lit(1)).as("n"))
    val a = tok.select(col("source").as("s1"), col("w"))
    val b = tok.select(col("source").as("s2"), col("w"))
    a.join(b, Seq("w")).filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("i"))
      .join(broadcast(sizes.select(col("source").as("s1"),
        col("n").as("n1"))), "s1")
      .join(broadcast(sizes.select(col("source").as("s2"),
        col("n").as("n2"))), "s2")
      .select(col("s1"), col("s2"), col("i"), col("n1"), col("n2"),
        expr("i * 1000 div (n1 + n2 - i)").as("jaccard_pm"))
      .reportSort("s1", "s2")
  }

  val txtSourceOverlapSql: String =
    """WITH t0 AS (
      |  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS w
      |  FROM documents),
      |tok AS (SELECT DISTINCT source, w FROM t0),
      |sizes AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY source),
      |inter AS (
      |  SELECT a.source AS s1, b.source AS s2, COUNT(*) AS i
      |  FROM tok a JOIN tok b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s1, s2, CAST(i AS BIGINT) AS i,
      |  CAST(x.n AS BIGINT) AS n1, CAST(y.n AS BIGINT) AS n2,
      |  CAST(i * 1000 // (x.n + y.n - i) AS BIGINT) AS jaccard_pm
      |FROM inter JOIN sizes x ON x.source = inter.s1
      |  JOIN sizes y ON y.source = inter.s2
      |ORDER BY s1, s2""".stripMargin

  // ------------------------------------------------------- txt_zipf
  /** Rank–frequency (Zipf) audit of the global token distribution —
    * the head-of-vocabulary fingerprint a corpus report leads with:
    * the top-100 tokens with rank, frequency, and the integer
    * `rank × freq` product whose rough constancy IS the Zipf signal
    * (a corpus whose product collapses after rank ~10 is template
    * spam, not natural text). Shape: one explode + one (token)
    * map-side-combining hash-agg, then a global top-100 via
    * TakeOrderedAndProject (no full sort — each partition forwards
    * only its own top-100); the rank window runs over the collected
    * 100-row frame (deliberate single partition). */
  def txtZipf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("token")).limit(100)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(pmod(col("freq"), lit(1)))
          .orderBy(desc("freq"), col("token"))))
      .select(col("rank"), col("token"), col("freq"),
        (col("rank").cast("long") * col("freq")).as("rank_freq"))
      .reportSort("rank")
  }

  val txtZipfSql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
      |  FROM documents),
      |g AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
      |r AS (SELECT token, freq,
      |    ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
      |  FROM g)
      |SELECT CAST(rank AS INTEGER) AS rank, token,
      |  CAST(freq AS BIGINT) AS freq,
      |  CAST(rank * freq AS BIGINT) AS rank_freq
      |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin

  // ------------------------------------------------ txt_script_mix
  /** Mixed-script / homoglyph audit — the spoofing signal a corpus
    * sanitizer runs before tokenization (Cyrillic 'а' inside Latin
    * words defeats exact dedup, poisons vocab, and is the classic
    * spam/phish obfuscation): per document the Latin and Cyrillic
    * letter counts and the number of WORDS mixing both scripts. The
    * corpus is ASCII, so a deterministic homoglyph injection
    * (translate a/e/o → U+0430/0435/043E on every 7th doc) plants the
    * attack both engines see identically; detection is row-local
    * codegen (translate + regexp counts + a filtered word split) —
    * no shuffle at any scale. */
  def txtScriptMix(spark: SparkSession, dir: String): DataFrame = {
    val injected = when(pmod(col("doc_id"), lit(7)) === 0,
      translate(col("text"), "aeo", "\u0430\u0435\u043e"))
      .otherwise(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), injected.as("s"))
      .select(col("doc_id"),
        length(regexp_replace(col("s"), "[^a-z]", "")).as("n_latin"),
        length(regexp_replace(col("s"), "[^\u0430-\u044f]", ""))
          .as("n_cyr"),
        size(filter(split(col("s"), "\\s+"),
          w => w.rlike("[a-z]") && w.rlike("[\u0430-\u044f]")))
          .as("n_mixed_words"))
      .withColumn("suspicious", col("n_mixed_words") > 0)
      .orderBy("doc_id")
  }

  val txtScriptMixSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0
      |      THEN translate(text, 'aeo', '\u0430\u0435\u043e')
      |      ELSE text END AS s
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(regexp_replace(s, '[^a-z]', '', 'g')) AS INTEGER)
      |    AS n_latin,
      |  CAST(length(regexp_replace(s, '[^\u0430-\u044f]', '', 'g'))
      |    AS INTEGER) AS n_cyr,
      |  CAST(len(list_filter(regexp_split_to_array(s, '\s+'),
      |    w -> regexp_matches(w, '[a-z]')
      |     AND regexp_matches(w, '[\u0430-\u044f]'))) AS INTEGER)
      |    AS n_mixed_words,
      |  len(list_filter(regexp_split_to_array(s, '\s+'),
      |    w -> regexp_matches(w, '[a-z]')
      |     AND regexp_matches(w, '[\u0430-\u044f]'))) > 0
      |    AS suspicious
      |FROM s ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- txt_heaps
  /** Heaps'-law vocabulary-growth audit — how fast the vocabulary
    * grows as the corpus grows, the curve that says whether more data
    * still buys new tokens (sublinear growth ⇒ healthy natural text;
    * near-linear ⇒ ID/noise contamination): per corpus decile (docs
    * in doc_id order), cumulative docs, token occurrences, and
    * DISTINCT vocabulary. The trick that makes cumulative-distinct
    * scale: a token's decile of FIRST occurrence (one min per
    * distinct token) fully determines every prefix's vocabulary —
    * vocab(decile) = Σ first-occurrence counts up to it — so the
    * corpus collapses to three ≤10-row bucket aggregates and the
    * cumulative windows run over those 10 rows, never the corpus. */
  def txtHeaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val md = docs.agg((max(col("doc_id")) + 1L).as("md"))
    def bucketed(df: DataFrame, idCol: String, outName: String): DataFrame =
      df.crossJoin(broadcast(md))
        .groupBy(expr(s"$idCol * 10 div md + 1").as("decile"))
        .agg(count(lit(1)).as(outName))
    val d = bucketed(docs, "doc_id", "_d")
    val t = bucketed(tok, "doc_id", "_t")
    val v = bucketed(tok.groupBy("w").agg(min(col("doc_id")).as("fdoc")),
      "fdoc", "_v")
    val cum = Window.partitionBy(pmod(col("decile"), lit(1)))
      .orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(t, Seq("decile"), "full").join(v, Seq("decile"), "full")
      .select(col("decile"),
        sum(coalesce(col("_d"), lit(0L))).over(cum).as("docs_n"),
        sum(coalesce(col("_t"), lit(0L))).over(cum).as("tokens_n"),
        sum(coalesce(col("_v"), lit(0L))).over(cum).as("vocab_n"))
      .reportSort("decile")
  }

  val txtHeapsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
      |  FROM documents),
      |mx AS (SELECT MAX(doc_id) + 1 AS md FROM documents),
      |db AS (SELECT doc_id * 10 // md + 1 AS decile, COUNT(*) AS d
      |       FROM documents, mx GROUP BY 1),
      |tb AS (SELECT doc_id * 10 // md + 1 AS decile, COUNT(*) AS t
      |       FROM tok, mx GROUP BY 1),
      |fd AS (SELECT w, MIN(doc_id) AS fdoc FROM tok GROUP BY w),
      |vb AS (SELECT fdoc * 10 // md + 1 AS decile, COUNT(*) AS v
      |       FROM fd, mx GROUP BY 1),
      |u AS (
      |  SELECT COALESCE(db.decile, tb.decile, vb.decile) AS decile,
      |    COALESCE(d, 0) AS d, COALESCE(t, 0) AS t, COALESCE(v, 0) AS v
      |  FROM db FULL JOIN tb ON db.decile = tb.decile
      |    FULL JOIN vb ON COALESCE(db.decile, tb.decile) = vb.decile)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(SUM(d) OVER w AS BIGINT) AS docs_n,
      |  CAST(SUM(t) OVER w AS BIGINT) AS tokens_n,
      |  CAST(SUM(v) OVER w AS BIGINT) AS vocab_n
      |FROM u
      |WINDOW w AS (ORDER BY decile
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY decile""".stripMargin

  // ------------------------------------------------ txt_doc_keywords
  /** Per-document keyword extraction — the top-3 TF-IDF terms that
    * summarize each doc (the retrieval/labeling primitive): integer
    * score tf·N div df (exact surrogate for tf·idf — monotone in the
    * same ratio, no float log), ranked per doc with the rank-≤-3
    * filter Spark executes as a WindowGroupLimit (each task forwards
    * ≤3 candidates per doc before the exchange). Window partitions
    * are per-DOC (bounded by doc length), never corpus-wide; df and
    * N are hash-agg + 1-row broadcast. */
  def txtDocKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val n = docs.agg(count(lit(1)).as("nd"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tok.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(df, "w").crossJoin(broadcast(n))
      .withColumn("score", expr("tf * nd div df"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), col("w"))))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("w"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val txtDocKeywordsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
      |  FROM documents),
      |n AS (SELECT COUNT(*) AS nd FROM documents),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
      |r AS (
      |  SELECT tf.doc_id, tf.w, tf.tf * n.nd // df.df AS score,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf * n.nd // df.df DESC, tf.w) AS rank
      |  FROM tf JOIN df USING (w) CROSS JOIN n)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, w,
      |  CAST(score AS BIGINT) AS score
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // --------------------------------------------------- txt_winnowing
  /** WINNOWING fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
    * MOSS local-fingerprinting algorithm): hash every char 8-gram of
    * the normalized text, slide a window of w=4 consecutive hashes,
    * and keep each window's MINIMUM hash with the rightmost-position
    * tie-break — the selection is LOCAL (any match of ≥ w+k−1 chars
    * shares a fingerprint, the guarantee threshold) yet keeps only
    * ~2/(w+1) of positions. The min-with-rightmost-tie rule packs
    * into ONE integer window-min: key = hash·2²⁰ + (2²⁰−1−pos), so
    * lexicographic min ⇔ (min hash, max pos) — no argmin gymnastics,
    * portable to the oracle bit-for-bit. All windows are doc-bounded
    * (partitioned by doc_id); the gram explode is the linear scan a
    * 100 TB fingerprint pass performs anyway. Positions are capped by
    * the 2²⁰ packing (1M chars/doc — bigger docs shift the split).
    * Per doc: windows seen, fingerprints kept, distinct hashes, and
    * the kept-density in per-mille (theory: ~400‰ at w=4). */
  /** Per-window winnowing SELECTIONS (doc_id, sel) for pos ≥ w — the
    * one corpus gram pass (explode → portable hash → packed window
    * min) both winnowing consumers derive from. */
  /** Kept as the independent explode+window REFERENCE construction:
    * the spec pins [[graft.expr.WinnowSelect]]'s map-only selections
    * against this form, so the codegen path can never drift from the
    * published definition. Not on any production path. */
  private[graft] def winnowSelections(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val w = 4
    val normC = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val grams = docs
      .select(col("doc_id"), normC.as("norm"))
      .filter(length(col("norm")) >= k + w - 1)
      .select(col("doc_id"),
        explode(expr(s"sequence(1, length(norm) - ${k - 1})")).as("pos"),
        col("norm"))
      .select(col("doc_id"), col("pos"),
        graft.mask.MaskFunctions.portableHash(
          expr(s"substring(norm, pos, $k)")).as("h"))
      .select(col("doc_id"), col("pos"),
        (col("h") * 1048576L + (lit(1048575L) - col("pos"))).as("key"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("sel", min(col("key")).over(win))
      .filter(col("pos") >= w)
      .select(col("doc_id"), col("sel"))
  }

  /** Bump when the winnowing construction (k, w, hash, packing)
    * changes — stale cross-JVM layouts must never re-attach. */
  private val winnowAlgoVersion = "a1"

  /** WRITE-ONCE WINNOWING LAYOUTS (the kNN-edge precedent): the corpus
    * fingerprint pass is a capital cost, not a per-query cost — the
    * first consumer per source layout pays ONE gram pass
    * (localCheckpoint-shared across both products) and publishes
    *  (a) `winnow_fps`   (doc_id, h) distinct postings, bucketed on h
    *      — [[graft.dedup.Dedup]]'s pair join and posting cap ride the
    *      h-buckets with no exchange;
    *  (b) `winnow_stats` per-doc (n_windows, n_fps, n_hashes), bucketed
    *      on doc_id — [[txtWinnowing]]'s whole answer.
    * Later consumers (any JVM, same machine) re-attach by DDL and pay
    * a bucketed scan. Returns (fps, stats). */
  private[graft] def winnowLayouts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    graft.expr.VectorExprs.register(spark)
    val tag = s"${Tables.layoutTag(dir)}_k8w4_$winnowAlgoVersion"
    // lazy: computed (and checkpointed) only if at least one table
    // actually needs building — and then shared by both builds. The
    // codegen graft_winnow_sel expression emits each doc's selection
    // multiset in ONE map pass — no per-position explode, no per-doc
    // ordered window, and both per-doc distincts happen in-row, so the
    // build's only shuffles are the two 8-bucket writes (the
    // explode+window form cost ~3× the whole build at sf0.1)
    lazy val sel = Tables.documents(spark, dir)
      // the digest pass is CPU-bound at ~3.5k grams/doc; a small-SF
      // corpus arrives as ONE parquet split, so spread it across the
      // cluster before hashing (at 100 TB the source's natural splits
      // already do this; the ~MB text shuffle is noise vs the digests)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function(graft.expr.VectorExprs.winnowSelName,
          regexp_replace(trim(lower(col("text"))), "\\s+", " "))
          .as("sels"))
      .filter(size(col("sels")) > 0)
      // strip the packed positions ONCE here (the hash transform is an
      // interpreted HOF — both products consumed it separately before,
      // 3 lambda passes over ~1.5k sels/doc; now it runs once into the
      // checkpoint)
      .select(col("doc_id"), col("sels"),
        expr("transform(sels, x -> x div 1048576)").as("hs"))
      .cut
    val fps = Tables.attachBucketed(spark, tag, s"winnow_fps_$tag",
        "doc_id BIGINT, h BIGINT", "h", 8) {
      sel.select(col("doc_id"),
        explode(array_distinct(col("hs"))).as("h"))
    }
    val stats = Tables.attachBucketed(spark, tag, s"winnow_stats_$tag",
        "doc_id BIGINT, n_windows BIGINT, n_fps BIGINT, n_hashes BIGINT",
        "doc_id", 8) {
      sel.select(col("doc_id"),
        size(col("sels")).cast("long").as("n_windows"),
        size(array_distinct(col("sels"))).cast("long").as("n_fps"),
        size(array_distinct(col("hs"))).cast("long").as("n_hashes"))
    }
    (fps, stats)
  }


  def txtWinnowing(spark: SparkSession, dir: String): DataFrame =
    winnowLayouts(spark, dir)._2
      .withColumn("density_pm", expr("n_fps * 1000 div n_windows"))
      .orderBy("doc_id")

  val txtWinnowingSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, norm,
      |    unnest(generate_series(1, length(norm) - 7)) AS pos
      |  FROM d WHERE length(norm) >= 11),
      |g AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |    ('0x'||substr(md5(substr(norm, CAST(pos AS INT), 8)),
      |      1, 8))::BIGINT * 1048576
      |      + (1048575 - CAST(pos AS BIGINT)) AS key
      |  FROM e),
      |s AS (
      |  SELECT doc_id, pos,
      |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
      |  FROM g)
      |SELECT doc_id, COUNT(*) AS n_windows,
      |  COUNT(DISTINCT sel) AS n_fps,
      |  COUNT(DISTINCT sel // 1048576) AS n_hashes,
      |  COUNT(DISTINCT sel) * 1000 // COUNT(*) AS density_pm
      |FROM s WHERE pos >= 4
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- txt_code_ratio
  /** Code-vs-prose detector — the corpus-mix gauge an LLM data
    * pipeline runs before deciding tokenizer and mix weights: per doc
    * the density of code punctuation (`{}()[];=<>`) in per-mille of
    * chars and the fraction of lines that start indented, both via
    * the subtract-after-strip counting trick (`len − len(strip)` —
    * one codegen regexp per signal, no explode, no UDF); a doc is
    * flagged code-like when either signal clears its threshold
    * (≥30‰ code chars or ≥400‰ indented lines). Rolled up per source:
    * doc counts, code-flagged counts and per-mille, and the average
    * signal levels. Map-only until the |sources|-sized hash-agg. */
  def txtCodeRatio(spark: SparkSession, dir: String): DataFrame = {
    val codeChars = length(col("text")) -
      length(regexp_replace(col("text"), "[{}()\\[\\];=<>]", ""))
    val nLines = length(col("text")) -
      length(regexp_replace(col("text"), "\n", "")) + 1
    val indented = (length(col("text")) -
      length(regexp_replace(col("text"), "\n[ \t]", "\n"))) +
      when(col("text").rlike("^[ \t]"), 1).otherwise(0)
    Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("source"),
        codeChars.cast("long").as("cc"),
        length(col("text")).cast("long").as("len"),
        nLines.cast("long").as("nl"),
        indented.cast("long").as("ind"))
      .select(col("source"),
        expr("cc * 1000 div len").as("code_pm"),
        expr("ind * 1000 div nl").as("indent_pm"))
      .withColumn("is_code",
        (col("code_pm") >= 30) || (col("indent_pm") >= 400))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code_docs"),
        sum(col("code_pm")).as("_cs"),
        sum(col("indent_pm")).as("_is"))
      .select(col("source"), col("n_docs"), col("n_code_docs"),
        expr("n_code_docs * 1000 div n_docs").as("code_doc_pm"),
        expr("_cs div n_docs").as("avg_code_pm"),
        expr("_is div n_docs").as("avg_indent_pm"))
      .reportSort("source")
  }

  val txtCodeRatioSql: String =
    """WITH s AS (
      |  SELECT source,
      |    CAST(length(text)
      |      - length(regexp_replace(text, '[{}()\[\];=<>]', '', 'g'))
      |      AS BIGINT) AS cc,
      |    CAST(length(text) AS BIGINT) AS len,
      |    CAST(length(text) - length(replace(text, chr(10), '')) + 1
      |      AS BIGINT) AS nl,
      |    CAST(length(text)
      |      - length(regexp_replace(text, chr(10) || '[ \t]', chr(10),
      |          'g'))
      |      + CASE WHEN regexp_matches(text, '^[ \t]') THEN 1 ELSE 0
      |        END AS BIGINT) AS ind
      |  FROM documents WHERE length(text) > 0),
      |p AS (
      |  SELECT source, cc * 1000 // len AS code_pm,
      |    ind * 1000 // nl AS indent_pm
      |  FROM s),
      |f AS (
      |  SELECT source, code_pm, indent_pm,
      |    CASE WHEN code_pm >= 30 OR indent_pm >= 400 THEN 1 ELSE 0
      |    END AS is_code
      |  FROM p)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(is_code) AS BIGINT) AS n_code_docs,
      |  CAST(SUM(is_code) * 1000 // COUNT(*) AS BIGINT) AS code_doc_pm,
      |  CAST(SUM(code_pm) // COUNT(*) AS BIGINT) AS avg_code_pm,
      |  CAST(SUM(indent_pm) // COUNT(*) AS BIGINT) AS avg_indent_pm
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------- txt_surprisal
  /** Integer unigram SURPRISAL — the perplexity-proxy quality gate
    * (filter docs whose average token surprisal says "not like the
    * corpus") made oracle-portable by measuring information in WHOLE
    * BITS: floor(log₂ x) = len(bin(x)) − 1 is pure string length on
    * the binary rendering both engines produce identically, so
    * s(token) = len(bin(N)) − len(bin(count)) needs no libm log at
    * all. A doc of corpus-typical tokens scores low; rare-token-heavy
    * docs (the gibberish/boilerplate tails an LM filter drops) score
    * high. One token explode → token-count hash-agg → count join back
    * on the token key (the only shuffle pair) → per-doc sum →
    * per-source report with the ≥ 9-bits/token outlier count. Whole-
    * bit granularity is deliberate: it is the resolution at which
    * the measurement stays exact at any scale. */
  def txtSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(words(regexp_replace(trim(lower(col("text"))),
          "\\s+", " "))).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("_n"))
    val scored = toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"),
        (length(expr("bin(_n)")) - length(expr("bin(cnt)")))
          .cast("long").as("s"))
    scored.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("nt"), sum(col("s")).as("ts"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("ts")).as("surprisal_bits"),
        sum(when(expr("ts * 1000 div nt") >= 9000L, 1L).otherwise(0L))
          .as("n_high_docs"))
      .withColumn("mean_surprisal_milli",
        expr("surprisal_bits * 1000 div n_tokens"))
      .reportSort("source")
  }

  val txtSurprisalSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    unnest(regexp_split_to_array(
      |      regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
      |      AS tok
      |  FROM documents),
      |tk AS (SELECT * FROM t WHERE length(tok) > 0),
      |c AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
      |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
      |s AS (
      |  SELECT tk.doc_id, tk.source,
      |    CAST(length(bin(n.n)) - length(bin(c.cnt)) AS BIGINT) AS s
      |  FROM tk JOIN c USING (tok) CROSS JOIN n),
      |d AS (
      |  SELECT doc_id, source, COUNT(*) AS nt,
      |    CAST(SUM(s) AS BIGINT) AS ts
      |  FROM s GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  CAST(SUM(ts) AS BIGINT) AS surprisal_bits,
      |  CAST(SUM(CASE WHEN ts * 1000 // nt >= 9000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_high_docs,
      |  CAST(SUM(ts) * 1000 // SUM(nt) AS BIGINT)
      |    AS mean_surprisal_milli
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------- txt_bigram_surprisal
  /** Integer BIGRAM (conditional) surprisal — the second-order LM
    * quality gate. [[txtSurprisal]] scores a token against the corpus
    * unigram table; here each transition w1→w2 is scored against how
    * predictable w2 is GIVEN w1: s = ⌊log₂ c(w1)⌋ − ⌊log₂ c(w1,w2)⌋
    * in whole bits (len(bin(x)) − 1 cancels), so a doc full of
    * corpus-typical collocations scores near zero while shuffled /
    * templated word salad (every transition rare) scores high — the
    * signal a KenLM-style perplexity filter uses, with no libm log.
    * Shape: per-doc bigram counts (one (doc,bigram) hash-agg from the
    * codegen neighbor-concat), corpus bigram counts REGROUPED from the
    * per-doc partial (map-side combine, never a second explode),
    * unigram counts from one token explode; two key joins on the
    * count tables (both dimension-sized vs the corpus at scale — the
    * vocab and bigram-vocab grow sub-linearly per Heaps' law). */
  def txtBigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), words(norm).as("w"))
    val db = base
      .select(col("doc_id"), col("source"),
        explode(call_function(graft.expr.VectorExprs.bigramsName,
          col("w"))).as("bigram"))
      .groupBy("doc_id", "source", "bigram")
      .agg(count(lit(1)).as("nb"))
    val cb = db.groupBy("bigram").agg(sum(col("nb")).as("cb"))
    val c1 = base.select(explode(col("w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val scored = db
      .withColumn("tok", substring_index(col("bigram"), " ", 1))
      .join(cb, "bigram").join(c1, "tok")
      .select(col("doc_id"), col("source"), col("nb"),
        (col("nb") * (length(expr("bin(c1)")) - length(expr("bin(cb)")))
          .cast("long")).as("s"))
    scored.groupBy("doc_id", "source")
      .agg(sum(col("nb")).as("nt"), sum(col("s")).as("ts"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_bigrams"),
        sum(col("ts")).as("surprisal_bits"),
        sum(when(expr("ts * 1000 div nt") >= 3000L, 1L).otherwise(0L))
          .as("n_high_docs"))
      .withColumn("mean_surprisal_milli",
        expr("surprisal_bits * 1000 div n_bigrams"))
      .reportSort("source")
  }

  val txtBigramSurprisalSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    regexp_split_to_array(
      |      regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
      |  FROM documents),
      |db AS (
      |  SELECT doc_id, source, bigram, COUNT(*) AS nb
      |  FROM (SELECT doc_id, source,
      |          unnest(list_transform(range(1, len(w)),
      |            i -> w[i] || ' ' || w[i+1])) AS bigram
      |        FROM base) t
      |  GROUP BY 1, 2, 3),
      |cb AS (SELECT bigram, CAST(SUM(nb) AS BIGINT) AS cb
      |       FROM db GROUP BY 1),
      |c1 AS (SELECT tok, COUNT(*) AS c1
      |       FROM (SELECT unnest(w) AS tok FROM base) t
      |       WHERE length(tok) > 0 GROUP BY 1),
      |s AS (
      |  SELECT db.doc_id, db.source, db.nb,
      |    db.nb * CAST(length(bin(c1.c1)) - length(bin(cb.cb)) AS BIGINT)
      |      AS s
      |  FROM db JOIN cb USING (bigram)
      |  JOIN c1 ON split_part(db.bigram, ' ', 1) = c1.tok),
      |d AS (
      |  SELECT doc_id, source, CAST(SUM(nb) AS BIGINT) AS nt,
      |    CAST(SUM(s) AS BIGINT) AS ts
      |  FROM s GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(ts) AS BIGINT) AS surprisal_bits,
      |  CAST(SUM(CASE WHEN ts * 1000 // nt >= 3000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_high_docs,
      |  CAST(SUM(ts) * 1000 // SUM(nt) AS BIGINT)
      |    AS mean_surprisal_milli
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------- txt_nfc_audit
  /** UNICODE NFC NORMALIZATION AUDIT — the canonicalization step
    * upstream of every fingerprint/dedup/equality operator: visually
    * identical text with decomposed combining marks (e + U+0301 vs é)
    * hashes differently, splits dedup clusters, and double-counts
    * vocabulary. The corpus is deterministically "dirtied" with
    * decomposed prefixes (doc_id mod 7 → e+◌́, doc_id mod 11 → A+◌̊ —
    * replayable in any engine), normalized through the codegen
    * [[graft.expr.NfcNormalize]] expression (JDK UAX #15, the same
    * algorithm as DuckDB's nfc_normalize), and audited per language:
    * docs changed, exact codepoint counts before/after (composition
    * strictly shortens these inputs), and a 32-bit-md5-prefix content
    * checksum over the NORMALIZED text — the green hash proves both
    * engines produce byte-identical canonical forms, not just equal
    * counts. Map-only: one scan, one hash-agg; the fast path returns
    * already-normalized strings unallocated. */
  def txtNfcAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val wire = Tables.documents(spark, dir).select(col("lang"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit("Cafe\u0301 "), col("text")))
        .when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit("A\u030A "), col("text")))
        .otherwise(col("text")).as("wire"))
    wire.withColumn("nfc", expr("graft_nfc(wire)"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nfc") =!= col("wire"), 1L).otherwise(0L))
          .as("n_changed"),
        sum(length(col("wire"))).as("chars_before"),
        sum(length(col("nfc"))).as("chars_after"),
        sum(expr("CAST(conv(substring(md5(nfc), 1, 8), 16, 10) AS BIGINT)"))
          .as("fp_sum"))
      .reportSort("lang")
  }

  val txtNfcAuditSql: String =
    """WITH w AS (
      |  SELECT lang,
      |    CASE WHEN doc_id % 7 = 0 THEN 'Cafe' || chr(769) || ' ' || text
      |         WHEN doc_id % 11 = 0 THEN 'A' || chr(778) || ' ' || text
      |         ELSE text END AS wire
      |  FROM documents),
      |n AS (SELECT lang, wire, nfc_normalize(wire) AS nfc FROM w)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN nfc <> wire THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(SUM(LENGTH(wire)) AS BIGINT) AS chars_before,
      |  CAST(SUM(LENGTH(nfc)) AS BIGINT) AS chars_after,
      |  CAST(SUM(('0x'||substr(md5(nfc),1,8))::BIGINT) AS BIGINT)
      |    AS fp_sum
      |FROM n GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------- txt_compression_proxy
  /** COMPRESSIBILITY PROXY — distinct-to-total character-4-gram ratio
    * per document: highly repetitive text (boilerplate, keyword spam,
    * generated filler) has few distinct shingles relative to length,
    * the same signal a gzip-ratio quality filter thresholds, computed
    * exactly with no codec. Shape: entirely MAP-ONLY — the 4-gram set
    * is built per doc by the codegen [[graft.expr.NGrams]] over the
    * character array and deduped in place; no gram ever crosses a
    * shuffle (the naive explode→distinct→count pays a corpus-chars
    * exchange for the same number). */
  def txtCompressionProxy(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        call_function(graft.expr.VectorExprs.ngramsName,
          split(col("text"), ""), lit(4)).as("_g"))
      .select(col("doc_id"),
        size(col("_g")).cast("long").as("n_grams"),
        size(array_distinct(col("_g"))).cast("long").as("n_distinct"))
      .filter(col("n_grams") > 0)
      .withColumn("comp_pm", expr("n_distinct * 1000 div n_grams"))
      .orderBy("doc_id")
  }

  val txtCompressionProxySql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_transform(range(0, GREATEST(length(text) - 3, 0)),
      |      i -> substr(text, CAST(i + 1 AS INTEGER), 4)) AS gs
      |  FROM documents)
      |SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
      |  CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(gs)) * 1000 // len(gs) AS BIGINT)
      |    AS comp_pm
      |FROM g WHERE len(gs) > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- txt_sentence_stats
  /** Sentence segmentation stats — the readability/quality companion
    * to word counts: split on terminal punctuation runs ([.!?]+),
    * keep non-empty trimmed sentences, and report per doc the count,
    * exact mean words per sentence (milli), and the longest sentence
    * — run-on text and fragment spam sit at the two tails. All
    * per-doc array ops, map-only; the corpus never shuffles. */
  def txtSentenceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("""filter(transform(split(text, '[.!?]+'), s -> trim(s)),
                s -> s != '')""").as("_s"))
      .select(col("doc_id"),
        expr("transform(_s, s -> size(split(s, '\\\\s+')))").as("_w"))
      .filter(size(col("_w")) > 0)
      .select(col("doc_id"),
        size(col("_w")).cast("long").as("n_sentences"),
        expr("aggregate(_w, 0L, (a, x) -> a + x)").as("_tw"),
        array_max(col("_w")).cast("long").as("max_words"))
      .withColumn("mean_words_milli",
        expr("_tw * 1000 div n_sentences"))
      .drop("_tw")
      .orderBy("doc_id")

  val txtSentenceStatsSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(
      |      regexp_split_to_array(text, '[.!?]+'), x -> trim(x)),
      |      x -> x <> '') AS ss
      |  FROM documents),
      |w AS (
      |  SELECT doc_id,
      |    list_transform(ss,
      |      x -> len(regexp_split_to_array(x, '\s+'))) AS ws
      |  FROM s WHERE len(ss) > 0)
      |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_sentences,
      |  CAST(list_max(ws) AS BIGINT) AS max_words,
      |  CAST(list_sum(ws) * 1000 // len(ws) AS BIGINT)
      |    AS mean_words_milli
      |FROM w ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ txt_mattr
  /** MOVING-AVERAGE TYPE-TOKEN RATIO (MATTR, window 20) — the
    * length-robust lexical-diversity measure (raw TTR collapses as
    * documents grow; a fixed window makes scores comparable across
    * lengths). The textbook form materializes every window and
    * re-counts distinct types — O(L·w) per doc. This is the LINEAR
    * rewrite: token position p with previous occurrence q contributes
    * +1 to exactly the window starts in [max(1, p−w+1, q+1),
    * min(p, L−w+1)] (the starts whose window sees p as the FIRST
    * occurrence of its type), so Σ over starts of
    * distinct-types-in-window = Σ_p of that interval's length — one
    * per-(doc, token) lag window (doc-bounded) and pure row
    * arithmetic, no window ever materialized. mattr_pm = that sum
    * ·1000 div (n_starts·w). */
  def txtMattr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = 20
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(words(col("text")))
        .as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val byTok = Window.partitionBy("doc_id", "tok").orderBy("p")
    val withL = toks
      .withColumn("q", coalesce(lag(col("p"), 1).over(byTok), lit(0)))
      .join(toks.groupBy("doc_id").agg(max(col("p")).as("L")), "doc_id")
      .filter(col("L") >= w)
    withL
      .select(col("doc_id"), col("L"),
        greatest(lit(1), col("p") - (w - 1), col("q") + 1).as("a"),
        least(col("p"), col("L") - (w - 1)).as("b"))
      .select(col("doc_id"), col("L"),
        when(col("b") >= col("a"), col("b") - col("a") + 1)
          .otherwise(0L).cast("long").as("contrib"))
      .groupBy("doc_id", "L")
      .agg(sum(col("contrib")).as("_sum"))
      .select(col("doc_id"),
        (col("L") - (w - 1)).cast("long").as("n_windows"),
        expr(s"_sum * 1000 div ((L - ${w - 1}) * $w)").as("mattr_pm"))
      .orderBy("doc_id")
  }

  val txtMattrSql: String =
    """WITH t0 AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS p, ws[CAST(i AS INTEGER)]
      |    AS tok, len(ws) AS L
      |  FROM t0, unnest(range(1, len(ws) + 1)) u(i)),
      |lg AS (
      |  SELECT doc_id, p, L,
      |    COALESCE(LAG(p) OVER (PARTITION BY doc_id, tok ORDER BY p), 0)
      |      AS q
      |  FROM toks WHERE L >= 20),
      |c AS (
      |  SELECT doc_id, L,
      |    GREATEST(1, p - 19, q + 1) AS a,
      |    LEAST(p, L - 19) AS b
      |  FROM lg)
      |SELECT doc_id, CAST(L - 19 AS BIGINT) AS n_windows,
      |  CAST(SUM(CASE WHEN b >= a THEN b - a + 1 ELSE 0 END) * 1000 //
      |    ((L - 19) * 20) AS BIGINT) AS mattr_pm
      |FROM c GROUP BY doc_id, L ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ txt_ocr_garbage
  /** GARBLED-TEXT DETECTOR — the OCR/mojibake pre-filter a web+scan
    * corpus runs before tokenizer training (garbage tokens poison BPE
    * merges and inflate vocab): per token, three cheap badness
    * signals — mixed letter+digit tokens, long consonant runs, and
    * over-long tokens — counted with higher-order array filters (no
    * explode: the whole feature pass is map-side codegen, the only
    * shuffle is the |sources| rollup). Per-source per-mille rates are
    * exactly what the ingest dashboard plots; the same counters run
    * per-doc to gate individual documents at 100 TB. */
  def txtOcrGarbage(spark: SparkSession, dir: String): DataFrame = {
    val toks = "split(text, '\\\\s+')"
    def cnt(cond: String) =
      expr(s"size(filter($toks, t -> $cond))").cast("long")
    Tables.documents(spark, dir)
      .select(col("source"),
        expr(s"size($toks)").cast("long").as("nt"),
        cnt("t rlike '[a-z]' and t rlike '[0-9]'").as("mx"),
        cnt("t rlike '[bcdfghjklmnpqrstvwxz]{3,}'").as("cr"),
        cnt("length(t) >= 8").as("lg"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("mx")).as("n_mixed"), sum(col("cr")).as("n_cons_run"),
        sum(col("lg")).as("n_long"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_mixed * 1000 div n_tokens").as("mixed_pm"),
        expr("n_cons_run * 1000 div n_tokens").as("cons_run_pm"),
        expr("n_long * 1000 div n_tokens").as("long_tok_pm"))
      .reportSort("source")
  }

  val txtOcrGarbageSql: String =
    """WITH d AS (
      |  SELECT source,
      |    len(regexp_split_to_array(text, '\s+')) AS nt,
      |    len(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> regexp_matches(t, '[a-z]')
      |        AND regexp_matches(t, '[0-9]'))) AS mx,
      |    len(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> regexp_matches(t,
      |        '[bcdfghjklmnpqrstvwxz]{3,}'))) AS cr,
      |    len(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> length(t) >= 8)) AS lg
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  CAST(SUM(mx) * 1000 // SUM(nt) AS BIGINT) AS mixed_pm,
      |  CAST(SUM(cr) * 1000 // SUM(nt) AS BIGINT) AS cons_run_pm,
      |  CAST(SUM(lg) * 1000 // SUM(nt) AS BIGINT) AS long_tok_pm
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------ txt_source_jsd
  /** SOURCE-SIMILARITY MATRIX — pairwise Jensen–Shannon divergence
    * between source unigram distributions (the input a mixing policy
    * needs: two near-identical sources shouldn't both get full
    * weight): vocab hashes onto a FIXED 64-bucket grid (the
    * distribution sketch stays |sources × 64| no matter the corpus),
    * the grid densifies so one-sided buckets contribute their full
    * 1-bit mixture term, and every log rides the
    * `cls_mutual_info`/`cls_jsd_drift` BIN-LENGTH identity — p/m and
    * q/m are ratios of pure integer products, so both engines
    * compute identical whole-bit values with no libm. The floor
    * under-estimates each side by < 1 bit, so the per-pair score
    * (milli-bits/token by integer division) is a DETERMINISTIC
    * similarity ORDER in [-1000, 1000] — near-identical sources sit
    * at the slightly-negative bottom, divergent ones climb toward
    * +1000; ≤ C(20,2) output rows.
    * One corpus explode → sketch; everything pairwise runs on the
    * sketch. */
  def txtSourceJsd(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), "\\s+")).as("w"))
      .groupBy(col("source"),
        pmod(graft.mask.MaskFunctions.portableHash(col("w")), lit(64L))
          .as("bucket"))
      .agg(count(lit(1)).as("n"))
    val dense = counts.select(col("source")).distinct()
      .withColumn("bucket", explode(sequence(lit(0L), lit(63L))))
      .join(counts, Seq("source", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .cut // |sources×64| sketch, 3 consumers
    val totals = dense.groupBy("source").agg(sum(col("n")).as("t"))
    val a = dense.join(totals, "source")
      .select(col("source").as("s1"), col("bucket"),
        col("n").as("na"), col("t").as("ra"))
    val b = dense.join(totals, "source")
      .select(col("source").as("s2"), col("bucket"),
        col("n").as("nb"), col("t").as("rb"))
    a.join(b, Seq("bucket"))
      .filter(col("s1") < col("s2"))
      .withColumn("bits_a", when(col("na") > 0,
        length(expr("bin(2 * na * rb)")) -
          length(expr("bin(na * rb + nb * ra)"))).otherwise(0)
        .cast("long"))
      .withColumn("bits_b", when(col("nb") > 0,
        length(expr("bin(2 * nb * ra)")) -
          length(expr("bin(na * rb + nb * ra)"))).otherwise(0)
        .cast("long"))
      .groupBy("s1", "s2")
      .agg(sum(col("na") * col("bits_a")).as("wa"),
        sum(col("nb") * col("bits_b")).as("wb"),
        max(col("ra")).as("ta"), max(col("rb")).as("tb"))
      .select(col("s1"), col("s2"),
        // wa/wb can be slightly NEGATIVE (near-identical sources:
        // the floor under-estimates each side by <1 bit), and a raw
        // signed `div` is the repo's pinned hash hazard (DuckDB `//`
        // truncates in this build where Spark would too — but the
        // behavior is build-dependent). Non-negative shift on BOTH
        // sides: bits ∈ [-63, 1] so |w| ≤ 63·t and w·500 + 64000·t
        // is provably ≥ 0; `(w·500 + K·t) div t − K` is then an
        // exact floor in every engine.
        (expr("(wa * 500 + 64000 * ta) div ta - 64000") +
          expr("(wb * 500 + 64000 * tb) div tb - 64000"))
          .as("jsd_millibits"))
      .reportSort("s1", "s2")
  }

  val txtSourceJsdSql: String =
    """WITH w AS (
      |  SELECT source,
      |    ('0x'||substr(md5(unnest(
      |      regexp_split_to_array(text, '\s+'))),1,8))::BIGINT % 64
      |      AS bucket
      |  FROM documents),
      |c AS (SELECT source, bucket, COUNT(*) AS n FROM w GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, g.bucket, COALESCE(c.n, 0) AS n
      |  FROM (SELECT DISTINCT source FROM c) s
      |  CROSS JOIN (SELECT UNNEST(range(64)) AS bucket) g
      |  LEFT JOIN c ON c.source = s.source AND c.bucket = g.bucket),
      |t AS (SELECT source, SUM(n) AS t FROM grid GROUP BY 1),
      |d AS (SELECT grid.source, bucket, n, t
      |      FROM grid JOIN t USING (source)),
      |p AS (
      |  SELECT a.source AS s1, b.source AS s2, a.bucket,
      |    a.n AS na, a.t AS ra, b.n AS nb, b.t AS rb,
      |    CASE WHEN a.n > 0 THEN
      |      length(bin(2 * a.n * b.t)) -
      |      length(bin(a.n * b.t + b.n * a.t)) ELSE 0 END AS bits_a,
      |    CASE WHEN b.n > 0 THEN
      |      length(bin(2 * b.n * a.t)) -
      |      length(bin(a.n * b.t + b.n * a.t)) ELSE 0 END AS bits_b
      |  FROM d a JOIN d b ON a.bucket = b.bucket
      |    AND a.source < b.source)
      |SELECT s1, s2,
      |  CAST((SUM(na * bits_a) * 500 + 64000 * MAX(ra)) // MAX(ra)
      |       - 64000 +
      |       (SUM(nb * bits_b) * 500 + 64000 * MAX(rb)) // MAX(rb)
      |       - 64000 AS BIGINT)
      |    AS jsd_millibits
      |FROM p GROUP BY 1, 2 ORDER BY s1, s2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_source_jsd" -> (txtSourceJsd _),
    "txt_ocr_garbage" -> (txtOcrGarbage _),
    "txt_compression_proxy" -> (txtCompressionProxy _),
    "txt_sentence_stats" -> (txtSentenceStats _),
    "txt_mattr" -> (txtMattr _),
    "txt_nfc_audit" -> (txtNfcAudit _),
    "txt_bigram_surprisal" -> (txtBigramSurprisal _),
    "txt_surprisal" -> (txtSurprisal _),
    "txt_winnowing" -> (txtWinnowing _),
    "txt_code_ratio" -> (txtCodeRatio _),
    "txt_heaps" -> (txtHeaps _),
    "txt_lang_confusion" -> (txtLangConfusion _),
    "txt_doc_keywords" -> (txtDocKeywords _),
    "txt_zipf" -> (txtZipf _),
    "txt_bpe_apply" -> (txtBpeApply _),
    "txt_source_overlap" -> (txtSourceOverlap _),
    "txt_bpe_pairs" -> (txtBpePairs _),
    "txt_bpe_train" -> (txtBpeTrain _),
    "txt_novelty" -> (txtNovelty _),
    "txt_hapax" -> (txtHapax _),
    "txt_encoding_audit" -> (txtEncodingAudit _),
    "txt_vocab_coverage" -> (txtVocabCoverage _),
    "txt_readability" -> (txtReadability _),
    "txt_html_strip" -> (txtHtmlStrip _),
    "txt_char_classes" -> (txtCharClasses _),
    "txt_rarity" -> (txtRarity _),
    "txt_repetition" -> (txtRepetition _),
    "txt_tfidf" -> (txtTfidf _),
    "txt_collocations" -> (txtCollocations _),
    "txt_sentences" -> (txtSentences _),
    "txt_boilerplate" -> (txtBoilerplate _),
    "txt_vocab_stats" -> (txtVocabStats _),
    "txt_top_bigrams" -> (txtTopBigrams _),
    "txt_token_count" -> (txtTokenCount _),
    "txt_quality" -> (txtQuality _),
    "txt_langid" -> (txtLangid _),
    "txt_script_mix" -> (txtScriptMix _),
    "txt_fingerprint" -> (txtFingerprint _))

  val oracles: Map[String, String] = Map(
    "txt_source_jsd" -> txtSourceJsdSql,
    "txt_ocr_garbage" -> txtOcrGarbageSql,
    "txt_compression_proxy" -> txtCompressionProxySql,
    "txt_sentence_stats" -> txtSentenceStatsSql,
    "txt_mattr" -> txtMattrSql,
    "txt_nfc_audit" -> txtNfcAuditSql,
    "txt_bigram_surprisal" -> txtBigramSurprisalSql,
    "txt_surprisal" -> txtSurprisalSql,
    "txt_winnowing" -> txtWinnowingSql,
    "txt_code_ratio" -> txtCodeRatioSql,
    "txt_heaps" -> txtHeapsSql,
    "txt_lang_confusion" -> txtLangConfusionSql,
    "txt_doc_keywords" -> txtDocKeywordsSql,
    "txt_zipf" -> txtZipfSql,
    "txt_bpe_apply" -> txtBpeApplySql,
    "txt_source_overlap" -> txtSourceOverlapSql,
    "txt_bpe_pairs" -> txtBpePairsSql,
    "txt_bpe_train" -> txtBpeTrainSql,
    "txt_novelty" -> txtNoveltySql,
    "txt_hapax" -> txtHapaxSql,
    "txt_encoding_audit" -> txtEncodingAuditSql,
    "txt_vocab_coverage" -> txtVocabCoverageSql,
    "txt_readability" -> txtReadabilitySql,
    "txt_html_strip" -> txtHtmlStripSql,
    "txt_char_classes" -> txtCharClassesSql,
    "txt_rarity" -> txtRaritySql,
    "txt_repetition" -> txtRepetitionSql,
    "txt_tfidf" -> txtTfidfSql,
    "txt_collocations" -> txtCollocationsSql,
    "txt_sentences" -> txtSentencesSql,
    "txt_boilerplate" -> txtBoilerplateSql,
    "txt_vocab_stats" -> txtVocabStatsSql,
    "txt_top_bigrams" -> txtTopBigramsSql,
    "txt_token_count" -> txtTokenCountSql,
    "txt_quality" -> txtQualitySql,
    "txt_langid" -> txtLangidSql,
    "txt_script_mix" -> txtScriptMixSql,
    "txt_fingerprint" -> txtFingerprintSql)
}
