package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.dedup.Dedup
import graft.text.TextAnalysis
import graft.Syntax._

/** End-to-end training-corpus preparation — the composition the
  * individual §2.6/§2.8 operators exist for, as ONE declarative plan:
  *
  *   1. quality-score every document (codegen scalar pass);
  *   2. drop low-quality docs (score < threshold);
  *   3. near-dup the SURVIVORS (blocked Jaccard pair join — dedup cost
  *      scales with the filtered corpus, not the raw one: filter
  *      before the expensive operator, the same reason predicate
  *      pushdown matters);
  *   4. keep one doc per near-dup pair (greedy keeper);
  *   5. report per-language corpus stats (exact-int counts, order-free
  *      min/max for the float column — no order-dependent float sums
  *      cross the oracle boundary).
  *
  * Every stage reuses the already-verified pieces (qualityScore,
  * ngramJaccard, applyPairs), so the pipeline itself is the unit under
  * test: its oracle recomposes the same stages in SQL.
  */
object CorpusPipeline extends QueryModule {

  def corpusFilter(docs: DataFrame, minScore: Double,
      jaccard: Double): DataFrame = {
    val scored = docs.withColumn("_score",
      TextAnalysis.qualityScore(col("text")))
    val kept = scored.filter(col("_score") >= minScore)
    val deduped = Dedup.applyPairs(kept, Dedup.ngramJaccard(kept, jaccard))
    deduped.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        min(col("_score")).as("min_score"),
        max(col("_score")).as("max_score"))
      .orderBy("lang")
  }

  /** Driver entry at (minScore=0.5, t=0.9): rides the write-once
    * [[graft.dedup.Dedup.pairs09]] pair LAYOUT instead of re-running
    * the candidate join on the kept subset — Jaccard is pairwise
    * (other docs' membership can't change a pair's score), so the
    * kept-subset pair set is EXACTLY the global t=0.9 pair set
    * restricted to kept endpoints: two semi-joins against the
    * kept-id frame, zero new corpus pair passes. The generic
    * [[corpusFilter]] form stays for arbitrary thresholds. */
  def pipeCorpusFilter(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val scored = Tables.documents(spark, dir).withColumn("_score",
      TextAnalysis.qualityScore(col("text")))
    val kept = scored.filter(col("_score") >= 0.5)
    val keptIds = kept.select(col("doc_id"))
    val pairs = Dedup.pairs09(spark, dir)
      .join(keptIds.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
      .join(keptIds.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
    Dedup.applyPairs(kept, pairs)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        min(col("_score")).as("min_score"),
        max(col("_score")).as("max_score"))
      .reportSort("lang")
  }

  val pipeCorpusFilterSql: String = {
    val score = TextAnalysis.qualityScoreSql("text")
    s"""WITH kept AS (
       |  SELECT doc_id, lang, text, $score AS s
       |  FROM documents WHERE $score >= 0.5),
       |tok AS (
       |  SELECT doc_id, lang,
       |    unnest(list_distinct(regexp_split_to_array(text, '\\s+'))) AS w
       |  FROM kept),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |  FROM tok a JOIN tok b
       |    ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(i AS DOUBLE)/CAST(s1.n + s2.n - i AS DOUBLE) >= 0.9)
       |SELECT lang, COUNT(*) AS n_docs,
       |  MIN(s) AS min_score, MAX(s) AS max_score
       |FROM kept
       |WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM pairs)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // -------------------------------------------- pipe_sample_stratified
  /** Deterministic stratified sampling — the reproducible subset
    * selector every training pipeline needs (a RNG-based sample
    * changes across retries/replays; a hash-gate never does). Keeps a
    * doc iff portableHash(doc_id) mod 100 < pct: per-stratum rates
    * stay proportional because the hash is uniform, and any engine
    * can recompute membership. Map-only pass + one agg shuffle. */
  def sampleStratified(docs: DataFrame, pct: Int): DataFrame =
    docs.filter(
      pmod(graft.mask.MaskFunctions.portableHash(col("doc_id")), lit(100L)) < pct)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .reportSort("lang")

  def pipeSampleStratified(spark: SparkSession, dir: String): DataFrame =
    sampleStratified(Tables.documents(spark, dir), 30)

  val pipeSampleStratifiedSql: String =
    """SELECT lang, COUNT(*) AS n_sampled,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM documents
      |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < 30
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ----------------------------------------------- pipe_pack_sequences
  /** Contiguous sequence packing: assign documents (per language, in
    * doc_id order) to training context windows of `budget` tokens by
    * cumulative token count — the standard streaming-pack
    * approximation (bin = floor(cumulative-before / budget); a doc
    * straddling a boundary starts its tail in the next bin, which is
    * what sequence-packing loaders do).
    *
    * TWO-LEVEL prefix sum, because a window partitioned by `lang`
    * alone (cardinality ~5) would sort the largest language's ENTIRE
    * corpus in one task at 100 TB. Shards are contiguous doc_id
    * ranges (`doc_id div docsPerShard`), so:
    *
    *   global_before(doc) = Σ tokens of earlier shards (exclusive
    *                        prefix over per-shard totals — one tiny
    *                        agg, broadcast back)
    *                      + within-shard running sum (window over
    *                        (lang, shard) — bounded partitions).
    *
    * Bit-identical to the single-window formulation (the oracle is
    * unchanged); no window in the plan partitions a corpus-sized
    * input by a low-cardinality key (PlanSpec pins this). */
  def packSequences(docs: DataFrame, budget: Int,
      docsPerShard: Long = 1L << 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = size(split(col("text"), "\\s+")).cast("long")
    val base = docs.select(col("lang"), col("doc_id"), toks.as("_t"))
      .withColumn("_shard", expr(s"doc_id div $docsPerShard"))
    val shardTotals = base.groupBy("lang", "_shard").agg(sum("_t").as("_tot"))
    val pre = Window.partitionBy("lang").orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shardTotals
      .withColumn("_off", coalesce(sum(col("_tot")).over(pre), lit(0L)))
      .select(col("lang"), col("_shard"), col("_off"))
    val local = Window.partitionBy("lang", "_shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("_local", coalesce(sum(col("_t")).over(local), lit(0L)))
      .join(broadcast(offsets), Seq("lang", "_shard"))
      .withColumn("bin", floor((col("_off") + col("_local")) / budget.toLong))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("n_tokens"))
      .orderBy("lang", "bin")
  }

  def pipePackSequences(spark: SparkSession, dir: String): DataFrame =
    // 64 docs/shard exercises many shards even at test SF — the bin
    // assignment is shard-width-invariant, so any width is correct
    packSequences(Tables.documents(spark, dir), 2048, docsPerShard = 64)

  val pipePackSequencesSql: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS nt
      |  FROM documents),
      |c AS (
      |  SELECT lang, doc_id, nt,
      |    COALESCE(SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      |  FROM t)
      |SELECT lang, CAST(FLOOR(bef / 2048) AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
      |FROM c GROUP BY lang, FLOOR(bef / 2048) ORDER BY lang, bin""".stripMargin

  // --------------------------------------------------- pipe_interleave
  /** Deterministic weighted mixture interleave — how a training loader
    * draws from multiple corpora at fixed ratios (en:3, zh:2, rest:1
    * here). Every doc gets a reproducible shuffle position
    * (portable-hash order, doc_id tie-break) within its language, and
    * batch k takes the next `weight` docs of each language — so full
    * batches hold exactly the target mixture, with no RNG state to
    * replay. Output pins both the counts and the hash-order head of
    * every (batch, lang) cell.
    *
    * TWO-LEVEL rank, same reason as [[packSequences]]: ranking with a
    * window partitioned by `lang` alone serializes each language
    * through one task. The hash axis is carved into contiguous ranges
    * (`_h div (2^32/hashShards)` — contiguous in the (_h, doc_id)
    * order because _h is the leading sort key), rows are ranked
    * within (lang, shard), and shard ranks are offset by the
    * exclusive prefix sum of per-shard counts. Identical to the
    * global row_number; the oracle is unchanged. */
  def interleave(docs: DataFrame, horizon: Int,
      hashShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = when(col("lang") === "en", lit(3L))
      .when(col("lang") === "zh", lit(2L)).otherwise(lit(1L))
    val shardWidth = (1L << 32) / hashShards
    val base = docs
      .withColumn("_h", graft.mask.MaskFunctions.portableHash(col("doc_id")))
      .withColumn("_w", w)
      .withColumn("_shard", expr(s"_h div $shardWidth"))
    val counts = base.groupBy("lang", "_shard").agg(count(lit(1)).as("_c"))
    val pre = Window.partitionBy("lang").orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select(col("lang"), col("_shard"), col("_off"))
    val local = Window.partitionBy("lang", "_shard")
      .orderBy(col("_h"), col("doc_id"))
    base
      .withColumn("_lr", row_number().over(local).cast("long") - 1L)
      .join(broadcast(offsets), Seq("lang", "_shard"))
      .withColumn("batch", floor((col("_off") + col("_lr")) / col("_w")))
      .filter(col("batch") < horizon)
      .groupBy("batch", "lang")
      .agg(count(lit(1)).as("n_docs"), min(col("_h")).as("min_hash"))
      .reportSort("batch", "lang")
  }

  def pipeInterleave(spark: SparkSession, dir: String): DataFrame =
    interleave(Tables.documents(spark, dir), 20)

  val pipeInterleaveSql: String =
    """WITH h AS (
      |  SELECT lang, doc_id,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS hh,
      |    CASE lang WHEN 'en' THEN 3 WHEN 'zh' THEN 2 ELSE 1 END AS w
      |  FROM documents),
      |r AS (
      |  SELECT lang, hh, w,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hh, doc_id) - 1 AS r
      |  FROM h)
      |SELECT CAST(FLOOR(r / w) AS BIGINT) AS batch, lang,
      |  COUNT(*) AS n_docs, MIN(hh) AS min_hash
      |FROM r WHERE FLOOR(r / w) < 20
      |GROUP BY 1, 2 ORDER BY batch, lang""".stripMargin

  // ------------------------------------------------ pipe_mix_weights
  /** Temperature-scaled multilingual sampling weights: w_l ∝ n_l^α
    * with α = 1/2 — the standard scheme for upweighting low-resource
    * languages in a training mixture (α=1 is proportional sampling,
    * α→0 is uniform). Exactness across engines: n^(1/2) is computed
    * as FLOOR(SQRT(n)) — IEEE-754 sqrt is correctly rounded and
    * n < 2^52, so the floored value is bit-identical anywhere — and
    * the weights are exact integer per-mille of the isqrt masses.
    * One map-side-combining agg; the weights table is |langs| rows,
    * broadcast to whatever sampler consumes it. */
  def mixWeights(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("_m", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = counts.agg(sum(col("_m")).as("_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        expr("_m * 1000 div _tot").as("weight_pm"))
      .reportSort("lang")
  }

  def pipeMixWeights(spark: SparkSession, dir: String): DataFrame =
    mixWeights(Tables.documents(spark, dir))

  val pipeMixWeightsSql: String =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS m
      |  FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(m) AS BIGINT) AS tot FROM c)
      |SELECT lang, n_docs, CAST(m * 1000 // tot AS BIGINT) AS weight_pm
      |FROM c CROSS JOIN t ORDER BY lang""".stripMargin

  // ----------------------------------------------- pipe_global_shuffle
  /** Deterministic GLOBAL shuffle — the reproducible corpus
    * permutation every training run needs (same data → same order, on
    * any engine, after any retry). Order key = portable hash of
    * doc_id (tie-broken by doc_id), but the global rank is computed
    * WITHOUT a global sort: the hash axis is carved into contiguous
    * shards (`_h div width` — contiguous in (hash, doc_id) order), a
    * row_number runs within each shard, and shard ranks are offset by
    * the exclusive prefix sum of per-shard counts — a window over the
    * ≤ #shards aggregated rows only. The oracle IS the global
    * ROW_NUMBER, proving the two-level decomposition exact. */
  def globalShuffle(docs: DataFrame, hashShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shardWidth = (1L << 32) / hashShards
    val base = docs
      .withColumn("_h", graft.mask.MaskFunctions.portableHash(col("doc_id")))
      .withColumn("_shard", expr(s"_h div $shardWidth"))
    val counts = base.groupBy("_shard").agg(count(lit(1)).as("_c"))
    // single-partition by design: ≤ #shards aggregated rows. The
    // non-foldable constant partition key (a literal would be folded
    // away by EliminateWindowPartitions) marks the single partition
    // as deliberate instead of tripping WindowExec's warning.
    val pre = Window.partitionBy(pmod(col("_c"), lit(1))).orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select(col("_shard"), col("_off"))
    val local = Window.partitionBy("_shard")
      .orderBy(col("_h"), col("doc_id"))
    base
      .withColumn("_lr", row_number().over(local).cast("long") - 1L)
      .join(broadcast(offsets), Seq("_shard"))
      .select(col("doc_id"), (col("_off") + col("_lr")).as("pos"))
      .orderBy("pos")
  }

  def pipeGlobalShuffle(spark: SparkSession, dir: String): DataFrame =
    globalShuffle(Tables.documents(spark, dir))

  val pipeGlobalShuffleSql: String =
    """SELECT doc_id,
      |  ROW_NUMBER() OVER (ORDER BY
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
      |    doc_id) - 1 AS pos
      |FROM documents ORDER BY pos""".stripMargin

  // ----------------------------------------------- pipe_epoch_plan
  /** Epoch planning — the step that turns [[mixWeights]]' proportions
    * into per-source REPEAT FACTORS for a fixed training budget: a
    * source whose temperature-scaled target exceeds its available
    * tokens is repeated (the "N epochs of the small corpus" decision),
    * the rest contribute a partial pass. Per language: available
    * tokens, the per-mille weight, the integer target, full epochs
    * (target div available) and the leftover partial-pass tokens — all
    * exact integer arithmetic, one map-side-combining agg over the
    * corpus plus a |langs|-row plan join. */
  def epochPlan(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val nt = size(split(col("text"), "\\s+")).cast("long")
    val counts = docs.select(col("lang"), nt.as("_nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("avail_tokens"))
      .withColumn("_m", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = counts.agg(sum(col("_m")).as("_tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("weight_pm", expr("_m * 1000 div _tot"))
      .withColumn("target_tokens",
        expr(s"weight_pm * $budgetTokens div 1000"))
      .select(col("lang"), col("n_docs"), col("avail_tokens"),
        col("weight_pm"), col("target_tokens"),
        expr("target_tokens div avail_tokens").as("n_full_epochs"),
        expr("target_tokens % avail_tokens").as("partial_tokens"))
      .reportSort("lang")
  }

  def pipeEpochPlan(spark: SparkSession, dir: String): DataFrame =
    epochPlan(Tables.documents(spark, dir), 2000000L)

  val pipeEpochPlanSql: String =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
      |      AS avail_tokens,
      |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS m
      |  FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(m) AS BIGINT) AS tot FROM c),
      |p AS (
      |  SELECT lang, n_docs, avail_tokens,
      |    CAST(m * 1000 // tot AS BIGINT) AS weight_pm
      |  FROM c CROSS JOIN t)
      |SELECT lang, n_docs, avail_tokens, weight_pm,
      |  CAST(weight_pm * 2000000 // 1000 AS BIGINT) AS target_tokens,
      |  CAST(weight_pm * 2000000 // 1000 // avail_tokens AS BIGINT)
      |    AS n_full_epochs,
      |  CAST(weight_pm * 2000000 // 1000 % avail_tokens AS BIGINT)
      |    AS partial_tokens
      |FROM p ORDER BY lang""".stripMargin

  // --------------------------------------------- pipe_token_budget
  /** Budgeted greedy selection per source — materializing a training
    * mix: each source (lang) takes documents in the deterministic
    * shuffled order until its TOKEN budget is filled (the step that
    * turns [[pipeMixWeights]]-style proportions into an actual doc
    * set). The cumulative token sum uses the same two-level prefix-sum
    * decomposition as [[globalShuffle]] — running sum within
    * (source, hash-shard) + broadcast exclusive shard offsets — so no
    * window ever spans more than corpus/(sources·shards) rows and the
    * plan survives a per-source corpus of any size (a naive
    * per-source cumsum window would put one source's whole corpus in
    * one partition — the r4 scale-killer class). The oracle IS that
    * naive global cumsum, proving the decomposition exact. */
  def tokenBudget(docs: DataFrame, budget: Long = 10000,
      hashShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shardWidth = (1L << 32) / hashShards
    val base = docs
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("_nt"),
        graft.mask.MaskFunctions.portableHash(col("doc_id")).as("_h"))
      .withColumn("_shard", expr(s"_h div $shardWidth"))
    val counts = base.groupBy("lang", "_shard").agg(sum(col("_nt")).as("_c"))
    val pre = Window.partitionBy("lang").orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts // ≤ |langs|·shards rows — the ONLY skinny window
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select(col("lang"), col("_shard"), col("_off"))
    val local = Window.partitionBy("lang", "_shard")
      .orderBy(col("_h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("_run", sum(col("_nt")).over(local))
      .join(broadcast(offsets), Seq("lang", "_shard"))
      .withColumn("_cum", col("_off") + col("_run"))
      .filter(col("_cum") <= budget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("_nt")).as("tokens_selected"),
        max(col("_cum")).as("max_cum"))
      .reportSort("lang")
  }

  def pipeTokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudget(Tables.documents(spark, dir))

  val pipeTokenBudgetSql: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |    len(regexp_split_to_array(text, '\s+')) AS nt,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM documents),
      |c AS (
      |  SELECT lang, nt,
      |    SUM(nt) OVER (PARTITION BY lang ORDER BY h, doc_id) AS cum
      |  FROM t)
      |SELECT lang, COUNT(*) AS n_selected,
      |  CAST(SUM(nt) AS BIGINT) AS tokens_selected,
      |  CAST(MAX(cum) AS BIGINT) AS max_cum
      |FROM c WHERE cum <= 10000 GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------- pipe_shard_manifest
  /** The dataloader-facing artifact: a SHARD MANIFEST over the
    * deterministic global order — shard s holds positions
    * [s·size, (s+1)·size), and the manifest records per shard the doc
    * count, exact token mass, position range, and an id checksum, so
    * a training job can (a) address any shard without scanning others
    * and (b) prove it read exactly the intended docs. Built on the
    * [[globalShuffle]] two-level rank (no global sort); everything is
    * exact integers and the oracle re-derives the same manifest from
    * the global ROW_NUMBER. */
  def shardManifest(docs: DataFrame, shardSize: Long = 64): DataFrame = {
    val ranked = globalShuffle(docs)
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("nt"),
      graft.mask.MaskFunctions.portableHash(col("doc_id")).as("idh"))
    ranked.join(toks, "doc_id")
      .withColumn("shard", expr(s"pos div $shardSize"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        min(col("pos")).as("pos_min"),
        max(col("pos")).as("pos_max"),
        sum(col("idh")).as("id_checksum"))
      .orderBy("shard")
  }

  def pipeShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(spark, dir))

  // ------------------------------------------------ pipe_shard_skew
  /** Shard-balance audit over the manifest — the STRAGGLER predictor
    * (a training epoch runs at the pace of its heaviest shard, so the
    * number that matters is max/mean, not the mean): from the
    * |shards|-row token manifest, the straggler factor in per-mille
    * of the mean (max·n·1000 div total — exact integers, no float
    * mean) and how many shards run ≥ 1.5× hot
    * (2·tokens·n > 3·total, the same ratio cross-multiplied).
    * The manifest frame is localCheckpoint-ed for its two consumers
    * (totals + hot count); nothing here ever re-touches the corpus. */
  def pipeShardSkew(spark: SparkSession, dir: String): DataFrame = {
    val m = shardManifest(Tables.documents(spark, dir))
      .select(col("shard"), col("n_tokens")).cut
    val t = m.agg(count(lit(1)).as("n_shards"),
      sum(col("n_tokens")).as("tokens_total"),
      max(col("n_tokens")).as("tokens_max"),
      min(col("n_tokens")).as("tokens_min"))
    val hot = m.crossJoin(broadcast(t))
      .filter(col("n_tokens") * 2 * col("n_shards") >
        col("tokens_total") * 3)
      .agg(count(lit(1)).as("n_hot"))
    t.crossJoin(broadcast(hot))
      .select(col("n_shards"), col("tokens_total"), col("tokens_max"),
        col("tokens_min"),
        expr("tokens_max * n_shards * 1000 div tokens_total")
          .as("straggler_pm"),
        col("n_hot"))
  }

  val pipeShardSkewSql: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY
      |      ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
      |      doc_id) - 1 AS pos,
      |    len(regexp_split_to_array(text, '\s+')) AS nt
      |  FROM documents),
      |s AS (
      |  SELECT pos // 64 AS shard, CAST(SUM(nt) AS BIGINT) AS nt
      |  FROM r GROUP BY 1),
      |t AS (
      |  SELECT COUNT(*) AS n_shards,
      |    CAST(SUM(nt) AS BIGINT) AS tokens_total,
      |    CAST(MAX(nt) AS BIGINT) AS tokens_max,
      |    CAST(MIN(nt) AS BIGINT) AS tokens_min
      |  FROM s),
      |h AS (
      |  SELECT COUNT(*) AS n_hot FROM s, t
      |  WHERE s.nt * 2 * t.n_shards > t.tokens_total * 3)
      |SELECT t.n_shards, t.tokens_total, t.tokens_max, t.tokens_min,
      |  CAST(t.tokens_max * t.n_shards * 1000 // t.tokens_total
      |    AS BIGINT) AS straggler_pm,
      |  CAST(h.n_hot AS BIGINT) AS n_hot
      |FROM t, h""".stripMargin

  val pipeShardManifestSql: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY
      |      ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
      |      doc_id) - 1 AS pos,
      |    len(regexp_split_to_array(text, '\s+')) AS nt,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS idh
      |  FROM documents)
      |SELECT pos // 64 AS shard, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  MIN(pos) AS pos_min, MAX(pos) AS pos_max,
      |  CAST(SUM(idh) AS BIGINT) AS id_checksum
      |FROM r GROUP BY 1 ORDER BY shard""".stripMargin

  // ------------------------------------------------ pipe_curriculum
  /** Deterministic curriculum schedule — easy-to-hard training order:
    * docs are staged by quality band (⌊quality·10⌋, the shared
    * [[graft.text.TextAnalysis.qualityScore]] — identical IEEE doubles
    * on every engine) and shuffled reproducibly WITHIN each stage.
    * Same two-level decomposition as [[globalShuffle]], with the stage
    * as the leading key: rank within (stage, hash-shard), offset by
    * the exclusive prefix sum over the ≤ stages×shards aggregated
    * counts — no global sort ever materializes. The oracle is the
    * global ROW_NUMBER over (stage, hash, doc_id), proving the
    * decomposition exact. */
  def curriculum(docs: DataFrame, hashShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shardWidth = (1L << 32) / hashShards
    val base = docs
      .withColumn("_stage",
        floor(graft.text.TextAnalysis.qualityScore(col("text")) * 10)
          .cast("long"))
      .withColumn("_h", graft.mask.MaskFunctions.portableHash(col("doc_id")))
      .withColumn("_shard", expr(s"_h div $shardWidth"))
    val counts = base.groupBy("_stage", "_shard").agg(count(lit(1)).as("_c"))
    // single-partition by design: ≤ #stages·#shards aggregated rows
    // (non-foldable constant key — see globalShuffle)
    val pre = Window.partitionBy(pmod(col("_c"), lit(1)))
      .orderBy("_stage", "_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select(col("_stage"), col("_shard"), col("_off"))
    val local = Window.partitionBy("_stage", "_shard")
      .orderBy(col("_h"), col("doc_id"))
    base
      .withColumn("_lr", row_number().over(local).cast("long") - 1L)
      .join(broadcast(offsets), Seq("_stage", "_shard"))
      .select(col("doc_id"), col("_stage").as("stage"),
        (col("_off") + col("_lr")).as("pos"))
      .orderBy("pos")
  }

  def pipeCurriculum(spark: SparkSession, dir: String): DataFrame =
    curriculum(Tables.documents(spark, dir))

  val pipeCurriculumSql: String = {
    val q = graft.text.TextAnalysis.qualityScoreSql("text")
    s"""SELECT doc_id,
       |  CAST(FLOOR(($q) * 10) AS BIGINT) AS stage,
       |  ROW_NUMBER() OVER (ORDER BY FLOOR(($q) * 10),
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
       |    doc_id) - 1 AS pos
       |FROM documents ORDER BY pos""".stripMargin
  }

  // ------------------------------------------------- pipe_contamination
  /** Benchmark-contamination check: which training documents share any
    * word n-gram with the held-out eval split? The standard leakage
    * gate before a training run (eval examples whose n-grams appear in
    * the corpus inflate the benchmark). Mechanics, all linear-scaling:
    *
    *   - the eval split is a deterministic hash gate (same mechanism as
    *     [[sampleStratified]] — reproducible, engine-independent);
    *   - one codegen n-gram pass ([[graft.expr.NGrams]]) feeds both
    *     sides, each gram reduced to a portable 64-bit-range hash so
    *     the join ships 16-byte rows, never gram strings;
    *   - train⋈eval is a shuffle hash-join on the gram hash (at corpus
    *     scale the eval side is tiny — AQE broadcasts it at runtime,
    *     but nothing in the plan REQUIRES that);
    *   - per-doc distinct grams before the join cap the join fan-out at
    *     (distinct grams) × (eval docs sharing them).
    */
  def contamination(docs: DataFrame, n: Int, evalGate: Int): DataFrame = {
    val grams = docs
      .withColumn("_eval",
        pmod(graft.mask.MaskFunctions.portableHash(col("doc_id")),
          lit(evalGate.toLong)) === 0L)
      .select(col("doc_id"), col("_eval"),
        explode(call_function(graft.expr.VectorExprs.ngramsName,
          split(col("text"), "\\s+"), lit(n))).as("g"))
      .select(col("doc_id"), col("_eval"),
        graft.mask.MaskFunctions.portableHash(col("g")).as("gh"))
      .distinct()
    val train = grams.filter(!col("_eval"))
      .select(col("doc_id").as("train_doc"), col("gh"))
    val held = grams.filter(col("_eval"))
      .select(col("doc_id").as("eval_doc"), col("gh"))
    train.join(held, "gh")
      .groupBy("train_doc")
      .agg(countDistinct(col("gh")).as("n_shared"),
        countDistinct(col("eval_doc")).as("n_eval_docs"))
      .orderBy("train_doc")
  }

  def pipeContamination(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    contamination(Tables.documents(spark, dir), 4, 20)
  }

  val pipeContaminationSql: String =
    """WITH docs AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 20 = 0 AS is_eval
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, is_eval,
      |    ('0x'||substr(md5(g),1,8))::BIGINT AS gh
      |  FROM (
      |    SELECT doc_id, is_eval,
      |      unnest(list_transform(range(1, len(w) - 2),
      |        i -> array_to_string(w[i:i+3], ' '))) AS g
      |    FROM docs) t)
      |SELECT t.doc_id AS train_doc,
      |  COUNT(DISTINCT t.gh) AS n_shared,
      |  COUNT(DISTINCT e.doc_id) AS n_eval_docs
      |FROM grams t JOIN grams e ON t.gh = e.gh
      |WHERE NOT t.is_eval AND e.is_eval
      |GROUP BY t.doc_id ORDER BY train_doc""".stripMargin

  // ------------------------------------------------ pipe_split_leakage
  /** Train/heldout split-leakage audit — the document-level sibling of
    * [[contamination]]'s n-gram check: after assigning every document
    * to train or heldout by a deterministic hash gate, does any
    * NEAR-DUPLICATE pair cross the split? A heldout doc whose near-dup
    * sits in train is a leaked eval example (the model "memorizes" it
    * from the training copy), so the release gate is this one-row
    * audit: split sizes, crossing-pair count, and the count of
    * distinct leaked heldout docs. The expensive part is the verified
    * [[Dedup.ngramJaccard]] pair join the pipeline already runs; the
    * audit itself is two broadcast-sized joins over the pair set, and
    * the remedy (move the whole near-dup CLUSTER to one side) is why
    * split assignment must happen on cluster labels, not raw doc ids —
    * the number this audit reports is exactly the cost of getting that
    * wrong. */
  def splitLeakage(docs: DataFrame, pairs: DataFrame,
      holdGate: Int): DataFrame = {
    val split = docs.select(col("doc_id"),
      (pmod(graft.mask.MaskFunctions.portableHash(col("doc_id")),
        lit(holdGate.toLong)) === 0L).as("_held"))
    val x = pairs
      .join(split.select(col("doc_id").as("d1"), col("_held").as("h1")),
        "d1")
      .join(split.select(col("doc_id").as("d2"), col("_held").as("h2")),
        "d2")
      .filter(col("h1") =!= col("h2"))
    val counts = split.agg(
      sum(when(col("_held"), 0L).otherwise(1L)).as("n_train"),
      sum(when(col("_held"), 1L).otherwise(0L)).as("n_heldout"))
    counts
      .crossJoin(broadcast(x.agg(count(lit(1)).as("n_cross_pairs"))))
      .crossJoin(broadcast(
        x.select(when(col("h1"), col("d1")).otherwise(col("d2"))
            .as("held_doc"))
          .distinct()
          .agg(count(lit(1)).as("n_leaked_heldout"))))
      .select("n_train", "n_heldout", "n_cross_pairs", "n_leaked_heldout")
  }

  def pipeSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, dir)
    splitLeakage(docs, Dedup.ngramJaccard(docs, 0.9), 10)
  }

  val pipeSplitLeakageSql: String =
    s"""${Dedup.nearDupPairsCte},
       |split AS (
       |  SELECT doc_id,
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10 = 0
       |      AS held
       |  FROM documents),
       |x AS (
       |  SELECT p.d1, p.d2, s1.held AS h1, s2.held AS h2
       |  FROM pairs p JOIN split s1 ON s1.doc_id = p.d1
       |  JOIN split s2 ON s2.doc_id = p.d2
       |  WHERE s1.held <> s2.held)
       |SELECT
       |  CAST((SELECT COUNT(*) FROM split WHERE NOT held) AS BIGINT)
       |    AS n_train,
       |  CAST((SELECT COUNT(*) FROM split WHERE held) AS BIGINT)
       |    AS n_heldout,
       |  CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_cross_pairs,
       |  CAST((SELECT COUNT(DISTINCT CASE WHEN h1 THEN d1 ELSE d2 END)
       |    FROM x) AS BIGINT) AS n_leaked_heldout""".stripMargin

  // --------------------------------------------- pipe_split_by_cluster
  /** The REMEDY [[splitLeakage]] motivates: assign train/heldout on
    * the near-dup CLUSTER label, not the raw doc id, so a whole
    * near-dup family lands on one side and no pair can cross the
    * split BY CONSTRUCTION. Emits per split the doc/token masses plus
    * the crossing-pair count — which this assignment provably pins to
    * zero, and the oracle recomputes all of it (labels, hash
    * assignment, pair join) to hold the construction to its claim.
    * Cost beyond the components run the dedup pass already does: one
    * hash of the label and a broadcast-sized audit join. */
  def pipeSplitByCluster(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the session-scoped memo hands back the SAME checkpointed pair
    // set and label frame the dedup keys already materialized — the
    // pair join and the components iteration run once per JVM, not
    // once per consumer key
    val pairs = Dedup.pairs09(spark, dir)
    val assign = Dedup.labels09(spark, dir).select(col("doc_id"),
      when(pmod(graft.mask.MaskFunctions.portableHash(col("lbl")),
        lit(10L)) === 0L, "heldout").otherwise("train").as("split"))
    val x = pairs
      .join(assign.select(col("doc_id").as("d1"), col("split").as("s1")),
        "d1")
      .join(assign.select(col("doc_id").as("d2"), col("split").as("s2")),
        "d2")
      .filter(col("s1") =!= col("s2"))
    val nt = size(split(col("text"), "\\s+")).cast("long")
    docs.select(col("doc_id"), nt.as("_nt"))
      .join(assign, "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"))
      .crossJoin(broadcast(x.agg(count(lit(1)).as("n_cross_pairs"))))
      .select("split", "n_docs", "n_tokens", "n_cross_pairs")
      .reportSort("split")
  }

  val pipeSplitByClusterSql: String =
    s"""${Dedup.componentLabelsCte},
       |assign AS (
       |  SELECT id AS doc_id,
       |    CASE WHEN ('0x'||substr(md5(CAST(lbl AS VARCHAR)),1,8))::BIGINT
       |      % 10 = 0 THEN 'heldout' ELSE 'train' END AS split
       |  FROM labels),
       |x AS (
       |  SELECT p.d1 FROM pairs p
       |  JOIN assign a1 ON a1.doc_id = p.d1
       |  JOIN assign a2 ON a2.doc_id = p.d2
       |  WHERE a1.split <> a2.split)
       |SELECT a.split, COUNT(*) AS n_docs,
       |  CAST(SUM(len(regexp_split_to_array(d.text, '\\s+'))) AS BIGINT)
       |    AS n_tokens,
       |  CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_cross_pairs
       |FROM documents d JOIN assign a ON a.doc_id = d.doc_id
       |GROUP BY a.split ORDER BY a.split""".stripMargin

  // ------------------------------------------------ pipe_cross_source
  /** Cross-source contamination matrix — the dataset-release question
    * "how much of source A also lives in source B?" answered at
    * hash-join cost: documents sharing a HEAD FINGERPRINT (md5 of the
    * first 8 normalized tokens — the prefix signal that catches
    * syndicated articles and boilerplate-headed families that differ
    * in their tails, which exact-content fingerprints miss) are
    * counted per source pair. distinct(source, fp) first, so the join
    * is over the compacted fingerprint set, never doc×doc; the
    * fingerprint IS the shuffle key, so a 100 TB corpus pairs with
    * ordinary hash-partition parallelism. */
  def pipeCrossSource(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val fp = md5(array_join(slice(split(norm, " "), 1, 8), " "))
    val fps = Tables.documents(spark, dir)
      .select(col("source"), fp.as("fp")).distinct()
    fps.select(col("source").as("source_a"), col("fp"))
      .join(fps.select(col("source").as("source_b"), col("fp")), "fp")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_heads"))
      .orderBy("source_a", "source_b")
  }

  val pipeCrossSourceSql: String =
    """WITH f AS (
      |  SELECT DISTINCT source,
      |    md5(array_to_string((regexp_split_to_array(
      |      regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
      |      ' '))[1:8], ' ')) AS fp
      |  FROM documents)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  COUNT(*) AS n_shared_heads
      |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  // ----------------------------------------------- pipe_domain_filter
  /** Domain blocklist filtering — the crawl-hygiene gate that runs on
    * the canonical URL before any text is even read: docs from exactly
    * blocklisted domains (a curated list, here a deterministic
    * hash-gated stand-in for the external list file, applied as a
    * small broadcast membership join) and from blocked TLD suffixes
    * (.biz/.info) are dropped; the report is the per-source keep/drop
    * census a release audit wants. The two rules are DISJOINT in the
    * report (exact list wins) so the counts reconcile to n_docs. One
    * map pass + one tiny distinct-domain agg for the list. */
  def pipeDomainFilter(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.mask.MaskFunctions.portableHash(
      concat(lit("dom:"), col("doc_id").cast("string")))
    val tlds = array(lit("com"), lit("org"), lit("net"),
      lit("info"), lit("biz"))
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), h.as("_h"))
      .select(col("source"), concat(col("source"), lit("-"),
        pmod(shiftright(col("_h"), 3), lit(50L)).cast("string"), lit("."),
        element_at(tlds, (pmod(col("_h"), lit(5L)) + 1).cast("int")))
        .as("domain"))
    val blocklist = docs.select(col("domain")).distinct()
      .filter(pmod(graft.mask.MaskFunctions.portableHash(col("domain")),
        lit(11L)) === 0L)
      .withColumn("listed", lit(true))
    docs.join(broadcast(blocklist), Seq("domain"), "left_outer")
      .select(col("source"), col("domain"),
        coalesce(col("listed"), lit(false)).as("in_list"),
        (col("domain").endsWith(".biz") || col("domain").endsWith(".info"))
          .as("bad_tld"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("domain")).as("n_domains"),
        sum(when(col("in_list"), 1L).otherwise(0L)).as("n_blocked_list"),
        sum(when(!col("in_list") && col("bad_tld"), 1L).otherwise(0L))
          .as("n_blocked_tld"),
        sum(when(!col("in_list") && !col("bad_tld"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("kept_pm", expr("n_kept * 1000 div n_docs"))
      .reportSort("source")
  }

  val pipeDomainFilterSql: String =
    """WITH d AS (
      |  SELECT source,
      |    source || '-' || CAST(
      |      (('0x'||substr(md5('dom:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT
      |        // 8) % 50 AS VARCHAR) || '.' ||
      |    (['com','org','net','info','biz'])[
      |      CAST(('0x'||substr(md5('dom:'||CAST(doc_id AS VARCHAR)),1,8))
      |        ::BIGINT % 5 + 1 AS INTEGER)] AS domain
      |  FROM documents),
      |bl AS (
      |  SELECT DISTINCT domain, TRUE AS listed FROM d
      |  WHERE ('0x'||substr(md5(domain),1,8))::BIGINT % 11 = 0),
      |f AS (
      |  SELECT source, d.domain,
      |    COALESCE(listed, FALSE) AS in_list,
      |    (d.domain LIKE '%.biz' OR d.domain LIKE '%.info') AS bad_tld
      |  FROM d LEFT JOIN bl ON d.domain = bl.domain)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains,
      |  CAST(SUM(CASE WHEN in_list THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_blocked_list,
      |  CAST(SUM(CASE WHEN NOT in_list AND bad_tld THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_blocked_tld,
      |  CAST(SUM(CASE WHEN NOT in_list AND NOT bad_tld THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN NOT in_list AND NOT bad_tld THEN 1 ELSE 0 END)
      |    * 1000 // COUNT(*) AS BIGINT) AS kept_pm
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ----------------------------------------------- pipe_url_canonical
  /** URL canonicalization + dedup — the first dedup a crawl corpus
    * gets (before any text comparison): the same page arrives under
    * http/https, with/without `www.`, mixed-case host, tracking
    * params, trailing slashes and fragments, and URL-level dedup
    * removes those re-fetches at hash-join cost, reserving MinHash
    * money for true near-dups. The whole chain is codegen'd
    * regexp_replace/extract — no UDF: strip fragment, force https,
    * drop `www.`, lowercase the HOST ONLY (paths are case-
    * significant), remove `utm_*` tracking params (repairing `?`/`&`
    * structure), strip the trailing slash. The oracle synthesizes the
    * same messy variants from a portable hash and must land on the
    * same families. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val https = regexp_replace(noFrag, "(?i)^https?://", "https://")
    val noWww = regexp_replace(https, "(?i)^https://www\\.", "https://")
    val host = lower(regexp_extract(noWww, "^https://([^/?#]+)", 1))
    val rest = regexp_extract(noWww, "^https://[^/?#]+(.*)$", 1)
    val q1 = regexp_replace(rest, "&utm_[^&]*", "")
    val q2 = regexp_replace(q1, "\\?utm_[^&]*&", "?")
    val q3 = regexp_replace(q2, "\\?utm_[^&]*$", "")
    val s1 = regexp_replace(q3, "/\\?", "?")
    val s2 = regexp_replace(s1, "/$", "")
    concat(lit("https://"), host, s2)
  }

  def pipeUrlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.mask.MaskFunctions.portableHash(
      concat(lit("url:"), col("doc_id").cast("string")))
    val messy = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), h.as("_h"))
      .select(col("source"), concat(
        when(col("_h") % 2 === 0, "http").otherwise("https"), lit("://"),
        when(shiftright(col("_h"), 1) % 2 === 0, "www.").otherwise(""),
        when(shiftright(col("_h"), 2) % 2 === 0, upper(col("source")))
          .otherwise(col("source")),
        lit(".example.com/doc/"), (col("doc_id") % 300).cast("string"),
        when(shiftright(col("_h"), 3) % 2 === 0, "/").otherwise(""),
        when(shiftright(col("_h"), 4) % 2 === 0,
          concat(lit("?utm_source=feed&utm_ref="),
            (col("_h") % 100).cast("string"))).otherwise(""))
        .as("url"))
    val fams = messy.select(col("source"), canonicalizeUrl(col("url")).as("canon"))
      .groupBy("source", "canon").agg(count(lit(1)).as("k"))
    fams.groupBy("source")
      .agg(sum(col("k")).as("n_urls"),
        count(lit(1)).as("n_canonical"),
        sum(when(col("k") > 1, col("k")).otherwise(0L))
          .as("n_in_dup_families"),
        max(col("k")).as("max_family"))
      .reportSort("source")
  }

  val pipeUrlCanonicalSql: String =
    """WITH u AS (
      |  SELECT source, doc_id % 300 AS pid,
      |    ('0x'||substr(md5('url:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT
      |      AS h
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |    (CASE WHEN h%2=0 THEN 'http' ELSE 'https' END)||'://'||
      |    (CASE WHEN (h//2)%2=0 THEN 'www.' ELSE '' END)||
      |    (CASE WHEN (h//4)%2=0 THEN upper(source) ELSE source END)||
      |    '.example.com/doc/'||CAST(pid AS VARCHAR)||
      |    (CASE WHEN (h//8)%2=0 THEN '/' ELSE '' END)||
      |    (CASE WHEN (h//16)%2=0
      |       THEN '?utm_source=feed&utm_ref='||CAST(h%100 AS VARCHAR)
      |       ELSE '' END) AS url
      |  FROM u),
      |c AS (
      |  SELECT source,
      |    'https://'||
      |    lower(regexp_extract(
      |      regexp_replace(regexp_replace(regexp_replace(url,
      |        '#.*$', ''), '(?i)^https?://', 'https://'),
      |        '(?i)^https://www\.', 'https://'),
      |      '^https://([^/?#]+)', 1))||
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(
      |        regexp_extract(
      |          regexp_replace(regexp_replace(regexp_replace(url,
      |            '#.*$', ''), '(?i)^https?://', 'https://'),
      |            '(?i)^https://www\.', 'https://'),
      |          '^https://[^/?#]+(.*)$', 1),
      |        '&utm_[^&]*', '', 'g'),
      |      '\?utm_[^&]*&', '?'), '\?utm_[^&]*$', ''),
      |      '/\?', '?'), '/$', '') AS canon
      |  FROM m),
      |f AS (SELECT source, canon, COUNT(*) AS k FROM c GROUP BY 1, 2)
      |SELECT source, CAST(SUM(k) AS BIGINT) AS n_urls,
      |  COUNT(*) AS n_canonical,
      |  CAST(SUM(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT)
      |    AS n_in_dup_families,
      |  CAST(MAX(k) AS BIGINT) AS max_family
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------ pipe_dataset_card
  /** Dataset-card stats — the per-source summary every corpus release
    * ships: doc count, exact total tokens, and EXACT median/p90 token
    * counts per language. The percentiles use the scale-safe value-
    * histogram selection (same machinery as q27): a map-side-combining
    * (lang, token-count) histogram, then order statistics located in
    * the cumulative counts — windows only ever see the aggregated
    * histogram (|langs| × |distinct counts| rows), never the corpus. */
  def datasetCard(docs: DataFrame): DataFrame = {
    import graft.ops.OrderStats._
    val nt = size(split(col("text"), "\\s+")).cast("long")
    val cum = cumulativeHistogram(
      docs.select(col("lang"), nt.as("nt")), Seq("lang"), "nt")
    cum.groupBy("lang")
      .agg(max(col("n")).as("n_docs"),
        sum(col("nt") * col("c")).as("total_tokens"),
        avg(when(holdsRank(midRank1) || holdsRank(midRank2), col("nt")))
          .as("median_tokens"),
        max(when(holdsRank(rank90), col("nt"))).as("p90_tokens"))
      .reportSort("lang")
  }

  def pipeDatasetCard(spark: SparkSession, dir: String): DataFrame =
    datasetCard(Tables.documents(spark, dir))

  val pipeDatasetCardSql: String =
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS nt
      |  FROM documents),
      |h AS (SELECT lang, nt, COUNT(*) AS c FROM t GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, nt, c,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY nt) AS hi,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY nt) - c + 1 AS lo,
      |    SUM(c) OVER (PARTITION BY lang) AS n
      |  FROM h)
      |SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
      |  CAST(SUM(nt * c) AS BIGINT) AS total_tokens,
      |  AVG(CASE WHEN (lo <= (n + 1) // 2 AND (n + 1) // 2 <= hi)
      |         OR (lo <= (n + 2) // 2 AND (n + 2) // 2 <= hi)
      |      THEN nt END) AS median_tokens,
      |  MAX(CASE WHEN lo <= CEIL(n * 0.9) AND CEIL(n * 0.9) <= hi
      |      THEN nt END) AS p90_tokens
      |FROM cum GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------ pipe_dataset_diff
  /** Dataset VERSION diff — the release-engineering view a corpus
    * publisher ships with every refresh: per source, how many docs
    * were added, removed, changed, or untouched between v1 and v2.
    * v2 is synthesized deterministically from v1 (every 11th doc
    * dropped, every remaining 7th doc edited, every 13th re-ingested
    * under a new id) so the oracle recomputes both versions. Shape:
    * content collapses to md5 DIGESTS before the join, so the
    * full-outer diff join shuffles (id, source, 32-byte hash) — never
    * document bodies — and the report is a |sources|×|statuses| fold.
    * At 100 TB this is the manifest-diff pattern: hash at the scan,
    * join on the key, compare digests. */
  def datasetDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val v2 = v1.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(v1.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          col("text")))
    def digests(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"), col("source").as(s"src_$tag"),
        md5(col("text")).as(s"h_$tag"))
    digests(v1, "a").join(digests(v2, "b"), Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_a"), col("src_b")).as("source"),
        when(col("h_b").isNull, "removed")
          .when(col("h_a").isNull, "added")
          .when(col("h_a") =!= col("h_b"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
      .reportSort("source", "status")
  }

  def pipeDatasetDiff(spark: SparkSession, dir: String): DataFrame =
    datasetDiff(spark, dir)

  val pipeDatasetDiffSql: String =
    """WITH v1 AS (
      |  SELECT doc_id, source, text FROM documents),
      |v2 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
      |      AS text
      |  FROM v1 WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, source, text
      |  FROM v1 WHERE doc_id % 13 = 0),
      |j AS (
      |  SELECT COALESCE(a.source, b.source) AS source,
      |    CASE WHEN b.doc_id IS NULL THEN 'removed'
      |         WHEN a.doc_id IS NULL THEN 'added'
      |         WHEN md5(a.text) <> md5(b.text) THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT source, status, COUNT(*) AS n_docs
      |FROM j GROUP BY source, status ORDER BY source, status""".stripMargin

  // --------------------------------------------- pipe_compaction
  /** Small-file compaction PLANNER — the table-maintenance step every
    * 100 TB lake needs: manifest entries (here (source, lang) groups
    * with their byte mass) are greedily packed into target-size output
    * files by exclusive-prefix-sum division (`offset div target`), so
    * consecutive small entries coalesce and oversize entries span
    * files — contiguity within source is preserved (the property that
    * keeps partition pruning effective after compaction). The planner
    * runs entirely on MANIFEST metadata (|sources×langs| rows), never
    * on data: the only window is over one source's manifest entries.
    * Emits per planned output file: entry count, doc count, bytes. */
  def compactionPlan(docs: DataFrame, target: Long = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val entries = docs.groupBy("source", "lang")
      .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
    val pre = Window.partitionBy("source").orderBy("lang")
      .rowsBetween(Window.unboundedPreceding, -1)
    entries
      .withColumn("_off", coalesce(sum(col("bytes")).over(pre), lit(0L)))
      .withColumn("out_file", expr(s"_off div $target"))
      .groupBy("source", "out_file")
      .agg(count(lit(1)).as("n_entries"), sum(col("n_docs")).as("n_docs"),
        sum(col("bytes")).as("bytes"))
      .orderBy("source", "out_file")
  }

  def pipeCompaction(spark: SparkSession, dir: String): DataFrame =
    compactionPlan(Tables.documents(spark, dir))

  val pipeCompactionSql: String =
    """WITH e AS (
      |  SELECT source, lang, SUM(n_chars) AS bytes,
      |    COUNT(*) AS n_docs
      |  FROM documents GROUP BY 1, 2),
      |o AS (
      |  SELECT source, lang, n_docs, bytes,
      |    COALESCE(SUM(bytes) OVER (PARTITION BY source ORDER BY lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS off
      |  FROM e)
      |SELECT source, CAST(off // 65536 AS BIGINT) AS out_file,
      |  COUNT(*) AS n_entries, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(bytes) AS BIGINT) AS bytes
      |FROM o GROUP BY 1, 2 ORDER BY source, out_file""".stripMargin

  // --------------------------------------------- pipe_filter_sweep
  /** Quality-threshold SWEEP — the tuning curve a corpus owner plots
    * before fixing a length filter (what does each candidate
    * threshold cost in documents and tokens?): one scan melts each
    * doc into its |thresholds| (threshold, survives?) entries and one
    * hash-agg yields surviving doc and token counts per threshold.
    * The sweep costs ONE pass regardless of how many thresholds are
    * probed — never a pass per candidate. */
  def pipeFilterSweep(spark: SparkSession, dir: String): DataFrame = {
    val thresholds = Seq(50, 100, 200, 400, 800)
    Tables.documents(spark, dir)
      .select(col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"))
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"),
        col("n_chars"), col("nt"))
      .groupBy("threshold")
      .agg(sum(when(col("n_chars") >= col("threshold"), 1L).otherwise(0L))
          .as("n_docs"),
        sum(when(col("n_chars") >= col("threshold"), col("nt"))
          .otherwise(0L)).as("n_tokens"))
      .reportSort("threshold")
  }

  val pipeFilterSweepSql: String =
    """WITH d AS (
      |  SELECT n_chars,
      |    len(regexp_split_to_array(text, '\s+')) AS nt
      |  FROM documents),
      |m AS (
      |  SELECT unnest([50, 100, 200, 400, 800]) AS threshold,
      |    n_chars, nt
      |  FROM d)
      |SELECT CAST(threshold AS INTEGER) AS threshold,
      |  CAST(SUM(CASE WHEN n_chars >= threshold THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n_chars >= threshold THEN nt ELSE 0 END)
      |    AS BIGINT) AS n_tokens
      |FROM m GROUP BY threshold ORDER BY threshold""".stripMargin

  // ------------------------------------------- pipe_dedup_weights
  /** Cluster-size sampling weights — the SemDeDup-style soft
    * alternative to dropping near-dups: every document in a near-dup
    * cluster (the memoized 0.9-Jaccard components,
    * [[graft.dedup.Dedup.labels09]]) gets weight 1000 div |cluster|
    * per-mille, so a cluster contributes ~one document's mass to the
    * training mix regardless of how many copies were crawled. Shape:
    * the component labels (already computed once per corpus and
    * shared across every dedup consumer) → |clusters| size agg →
    * join back on the label key both sides already hash by. */
  def pipeDedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val lbls = graft.dedup.Dedup.labels09(spark, dir)
    val sizes = lbls.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    lbls.join(sizes, "lbl")
      .select(col("doc_id"), col("lbl").as("cluster"), col("cluster_size"),
        expr("1000 div cluster_size").as("weight_pm"))
      .orderBy("doc_id")
  }

  val pipeDedupWeightsSql: String =
    s"""${graft.dedup.Dedup.componentLabelsCte},
       |csizes AS (SELECT lbl, COUNT(*) AS cluster_size
       |           FROM labels GROUP BY lbl)
       |SELECT l.id AS doc_id, l.lbl AS cluster,
       |  CAST(s.cluster_size AS BIGINT) AS cluster_size,
       |  CAST(1000 // s.cluster_size AS BIGINT) AS weight_pm
       |FROM labels l JOIN csizes s USING (lbl)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------- pipe_mix_alpha_curve
  /** The FULL temperature-sampling curve — how the language mixture
    * shifts as α sweeps proportional → uniform ([[mixWeights]] is the
    * single α = ½ point): per α ∈ {0, ¼, ½, ¾, 1} the weight
    * w = ⌊n^α⌋ computed ONLY from correctly-rounded IEEE sqrt
    * compositions (α = ¼ is √√n, ¾ is √n·√√n — bit-identical on any
    * engine; no pow(), whose rounding is libm-dependent), and each
    * α's exact per-mille share. One corpus scan collapses to |langs|
    * counts; the curve is a 5-way melt of that dimension-sized frame.
    */
  def pipeMixAlphaCurve(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .cut
    val nD = col("n_docs").cast("double")
    val alphas: Seq[(Int, Column)] = Seq(
      0 -> lit(1L),
      250 -> floor(sqrt(sqrt(nD))).cast("long"),
      500 -> floor(sqrt(nD)).cast("long"),
      750 -> floor(sqrt(nD) * sqrt(sqrt(nD))).cast("long"),
      1000 -> col("n_docs"))
    val melted = counts.select(col("lang"), col("n_docs"),
        explode(array(alphas.map { case (a, w) =>
          struct(lit(a).as("alpha_pm"), w.as("w"))
        }: _*)).as("m"))
      .select(col("lang"), col("n_docs"),
        col("m.alpha_pm").as("alpha_pm"), col("m.w").as("w"))
    val tot = melted.groupBy("alpha_pm").agg(sum(col("w")).as("_tot"))
    melted.join(broadcast(tot), Seq("alpha_pm"))
      .select(col("alpha_pm").cast("long").as("alpha_pm"), col("lang"),
        col("n_docs"), col("w"),
        expr("w * 1000 div _tot").as("share_pm"))
      .reportSort("alpha_pm", "lang")
  }

  val pipeMixAlphaCurveSql: String =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |m AS (
      |  SELECT lang, n_docs,
      |    unnest([0, 250, 500, 750, 1000]) AS alpha_pm,
      |    unnest([1,
      |      CAST(FLOOR(SQRT(SQRT(CAST(n_docs AS DOUBLE)))) AS BIGINT),
      |      CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT),
      |      CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) *
      |        SQRT(SQRT(CAST(n_docs AS DOUBLE)))) AS BIGINT),
      |      n_docs]) AS w
      |  FROM c),
      |t AS (SELECT alpha_pm, SUM(w) AS tot FROM m GROUP BY alpha_pm)
      |SELECT CAST(m.alpha_pm AS BIGINT) AS alpha_pm, m.lang, m.n_docs,
      |  CAST(m.w AS BIGINT) AS w,
      |  CAST(m.w * 1000 // t.tot AS BIGINT) AS share_pm
      |FROM m JOIN t ON t.alpha_pm = m.alpha_pm
      |ORDER BY alpha_pm, lang""".stripMargin

  // ---------------------------------------------- pipe_sample_fixed
  /** Deterministic EXACT-k uniform sample — the eval/holdout-set
    * primitive (a fixed-size set every run and every engine agrees
    * on, unlike rate-based sampling whose size drifts with the
    * corpus): order by (portable id hash, doc_id) and take the first
    * k = 100. The hash order is uniform in the ids, so the prefix is
    * an unbiased sample; the plan is TakeOrderedAndProject — each
    * partition forwards at most k rows, no global sort, no shuffle of
    * the corpus — the same shape at any scale. The in-sample rank is
    * a window over the ≤ k collected rows only (deliberate
    * single-partition marker, same idiom as the prefix-sum offsets).
    */
  def pipeSampleFixed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 100
    val h = graft.mask.MaskFunctions.portableHash(col("doc_id"))
    val top = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), h.as("_h"))
      .orderBy(col("_h"), col("doc_id")).limit(k)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(pmod(col("_h"), lit(1)))
          .orderBy(col("_h"), col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"))
      .reportSort("rank")
  }

  val pipeSampleFixedSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rank
      |  FROM h)
      |SELECT CAST(rank AS INTEGER) AS rank, doc_id, lang
      |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin

  // ----------------------------------------------- pipe_pad_waste
  /** Length-bucket padding-waste audit — the batching-efficiency
    * number behind sequence bucketing: docs batch with peers of
    * similar length, each padded to its bucket ceiling {128, 256,
    * 512, 1024, 2048} (longer docs truncate at the top bucket), and
    * waste is ceiling − tokens. The table a pipeline reads to trade
    * padding FLOPs against truncation loss when choosing bucket
    * boundaries (the [[packSequences]] alternative for
    * position-sensitive training). One scan, map-side combine into
    * ≤ 5 rows — flat at any corpus size. */
  def pipePadWaste(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), "\\s+")).cast("long")
    Tables.documents(spark, dir).select(toks.as("t"))
      .withColumn("bucket",
        when(col("t") <= 128, 128L).when(col("t") <= 256, 256L)
          .when(col("t") <= 512, 512L).when(col("t") <= 1024, 1024L)
          .otherwise(2048L))
      .withColumn("kept", least(col("t"), lit(2048L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("tokens_kept"),
        sum(col("bucket") - col("kept")).as("pad_tokens"),
        sum(greatest(col("t") - lit(2048L), lit(0L)))
          .as("truncated_tokens"))
      .withColumn("waste_pm",
        expr("pad_tokens * 1000 div (pad_tokens + tokens_kept)"))
      .reportSort("bucket")
  }

  val pipePadWasteSql: String =
    """WITH d AS (
      |  SELECT len(regexp_split_to_array(text, '\s+')) AS t
      |  FROM documents),
      |b AS (
      |  SELECT t,
      |    CASE WHEN t <= 128 THEN 128 WHEN t <= 256 THEN 256
      |         WHEN t <= 512 THEN 512 WHEN t <= 1024 THEN 1024
      |         ELSE 2048 END AS bucket,
      |    LEAST(t, 2048) AS kept
      |  FROM d)
      |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(kept) AS BIGINT) AS tokens_kept,
      |  CAST(SUM(bucket - kept) AS BIGINT) AS pad_tokens,
      |  CAST(SUM(GREATEST(t - 2048, 0)) AS BIGINT) AS truncated_tokens,
      |  CAST(SUM(bucket - kept) * 1000
      |    // (SUM(bucket - kept) + SUM(kept)) AS BIGINT) AS waste_pm
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------- pipe_sample_weighted
  /** Deterministic EXACT-k WEIGHTED sample — the quality/mass-
    * proportional selection step (SemDeDup cluster weights, DoReMi
    * domain weights, token-mass-proportional holdouts) beside
    * [[pipeSampleFixed]]'s uniform draw. The classic algorithm is
    * Efraimidis–Spirakis (A-ES: top-k by u^(1/w)) — but pow on
    * doubles is not bit-portable across engines, so the key is the
    * EXACT-INTEGER race surrogate: key = hash div w, smallest k win.
    * The hash is a uniform 32-bit integer draw per doc, and dividing
    * by the integer weight shrinks a doc's expected key
    * proportionally — selection probability rises monotonically with
    * w (doubling w halves the key) while staying pure integer math
    * both engines replay bit-for-bit. Weight here is token mass
    * (1 + n_chars div 64 — a BPE-ish chars-per-token scale).
    *
    * Same plan shape as the uniform draw: TakeOrderedAndProject on
    * (key, doc_id) — each partition forwards at most k rows, no
    * global sort, no corpus shuffle; the in-sample rank windows over
    * the ≤ k collected rows (single-partition marker). */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.mask.MaskFunctions.portableHash(col("doc_id"))
    val top = docs
      .select(col("doc_id"), col("lang"),
        expr("1 + n_chars div 64").as("w"), h.as("_h"))
      .withColumn("_key", expr("_h div w"))
      .orderBy(col("_key"), col("doc_id")).limit(k)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(pmod(col("_key"), lit(1)))
          .orderBy(col("_key"), col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"), col("w"))
      .reportSort("rank")
  }

  def pipeSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir), 100)

  val pipeSampleWeightedSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, 1 + n_chars // 64 AS w,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang, w,
      |    ROW_NUMBER() OVER (ORDER BY h // w, doc_id) AS rank
      |  FROM h)
      |SELECT CAST(rank AS INTEGER) AS rank, doc_id, lang,
      |  CAST(w AS BIGINT) AS w
      |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin

  // -------------------------------------------- pipe_mix_temperature
  /** TEMPERATURE-SMOOTHED source mixing — the exponent trick every
    * multilingual/multi-source training mix uses (sample ∝ tokensᵅ,
    * α < 1) so head sources stop drowning the tail without the tail
    * being oversampled into memorization. α = 1/2 keeps the whole
    * computation PORTABLE: sqrt is correctly rounded under IEEE-754
    * (unlike pow/exp, which differ across libm builds), so
    * floor(√tokens · 1000) is the same BIGINT in both engines and the
    * shares stay exact-integer per-mille. Reports, per source: raw
    * token share, smoothed share, and the boost the smoothing grants
    * (positive for tail sources, negative for head ones — Σ boost
    * ≈ 0). One scan → |sources| hash-agg; everything after is
    * |sources|-sized. */
  def pipeMixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val nt = size(split(col("text"), "\\s+")).cast("long")
    val weights = Tables.documents(spark, dir)
      .select(col("source"), nt.as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"))
      .withColumn("_w",
        expr("cast(floor(sqrt(cast(tokens as double)) * 1000) as long)"))
    val tot = weights.agg(sum(col("tokens")).as("_tt"),
      sum(col("_w")).as("_tw"))
    weights.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        expr("tokens * 1000 div _tt").as("raw_pm"),
        expr("_w * 1000 div _tw").as("smoothed_pm"))
      .withColumn("boost_pm", col("smoothed_pm") - col("raw_pm"))
      .reportSort("source")
  }

  val pipeMixTemperatureSql: String =
    """WITH w AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
      |      AS tokens
      |  FROM documents GROUP BY 1),
      |s AS (
      |  SELECT source, n_docs, tokens,
      |    CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1000) AS BIGINT)
      |      AS wq
      |  FROM w),
      |t AS (SELECT SUM(tokens) AS tt, SUM(wq) AS tw FROM s)
      |SELECT source, n_docs, tokens,
      |  CAST(tokens * 1000 // tt AS BIGINT) AS raw_pm,
      |  CAST(wq * 1000 // tw AS BIGINT) AS smoothed_pm,
      |  CAST(wq * 1000 // tw - tokens * 1000 // tt AS BIGINT)
      |    AS boost_pm
      |FROM s CROSS JOIN t ORDER BY source""".stripMargin

  // --------------------------------------------- pipe_dedup_survival
  /** STAGE-ATTRITION FUNNEL — the dataset-card table that says where
    * the corpus went: raw → quality gate → exact dedup → near-dup
    * dedup, with doc and token counts and the per-mille of the raw
    * corpus surviving each stage. This is the report that justifies a
    * pipeline config to a review board (and catches the classic bug
    * where a mis-tuned stage silently deletes 90% of a language).
    * Stage order matters and is the cheap-to-expensive production
    * order: the quality gate is a row-local scan, exact dedup is one
    * hash-agg on md5(text) (never a shuffle on the raw text bytes),
    * and the blocked-Jaccard near-dup pass — the expensive one — only
    * ever sees what survived both. Every stage reuses the verified
    * operators ([[TextAnalysis.qualityScore]], [[Dedup.ngramJaccard]],
    * [[Dedup.applyPairs]]); the funnel is their composition, counted.
    */
  def pipeDedupSurvival(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"))
    // the quality-gated frame feeds several consumers (the exact-dedup
    // agg, the semi-join probe, its own stat row, and through s3 the
    // near-dup pass) — materialize it once instead of re-running the
    // quality scan per consumer (the md5 stage itself stays in the
    // plan: R9dOpsSpec pins that exact dedup keys on the digest)
    val s2 = docs
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
      .cut
    val keepers = s2.groupBy(md5(col("text")).as("_k"))
      .agg(min(col("doc_id")).as("_keep"))
    val s3 = s2.join(keepers, col("doc_id") === col("_keep"),
      "left_semi")
    val s4 = Dedup.applyPairs(s3, Dedup.ngramJaccard(s3, 0.9))
    def stat(df: DataFrame, stage: Long, name: String) =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("toks")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(name).as("name"),
          col("n_docs"), col("n_tokens"))
    val raw = docs.agg(count(lit(1)).as("_raw"))
    stat(docs, 1L, "raw")
      .unionByName(stat(s2, 2L, "quality"))
      .unionByName(stat(s3, 3L, "exact"))
      .unionByName(stat(s4, 4L, "neardup"))
      .crossJoin(broadcast(raw))
      .select(col("stage"), col("name"), col("n_docs"),
        col("n_tokens"), expr("n_docs * 1000 div _raw").as("keep_pm"))
      .reportSort("stage")
  }

  // -------------------------------------------- pipe_quality_survival
  /** QUALITY × DEDUP-SURVIVAL matrix — the bias audit a curation
    * pipeline owes its users: near-dup removal keeps the SMALLEST id
    * of every pair, which is quality-blind, so if drop rates skew
    * across quality deciles the dedup stage is silently reshaping
    * the quality mix (SemDeDup reports exactly this interaction).
    * Per fixed quality decile (⌊score·10⌋, top bucket folded into 9
    * so the grid is scale-stable): docs, dropped-as-d2 count, drop
    * per-mille. Rides the write-once [[graft.dedup.Dedup.pairs09]]
    * LAYOUT (zero new pair passes — one broadcast-ready distinct-d2
    * frame) + the map-only quality score; one corpus scan, |10|-row
    * output. */
  // --------------------------------------- pipe_coherent_sample
  /** COHERENT (referentially-consistent) SAMPLING across a table
    * graph — the dev-snapshot primitive: sample the ROOT entity by
    * keyed hash (custkey per-mille < 200) and take children by
    * DESCENT (orders of kept customers, lineitems of kept orders),
    * so every sampled child's parent exists. The audit contrasts
    * this against the naive INDEPENDENT per-table hash sample and
    * measures its orphan rate — independent sampling at rate p
    * leaves ~(1−p) of sampled children parentless, which silently
    * breaks every join in the downstream dev environment; coherent
    * descent is orphan-free BY CONSTRUCTION (spec-pinned 0). Scale:
    * keyed semi joins on the natural keys (custkey, orderkey) — the
    * descent is the same shuffle a production FK join pays, no
    * broadcast of SF-proportional keep sets. Output: one row per
    * table with both samples' rates and the orphan gauge. */
  def pipeCoherentSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.mask.MaskFunctions.portableHash
    def keepPm(c: Column): Column = pmod(portableHash(c), lit(1000L))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
      .withColumn("_keep", keepPm(col("c_custkey")) < 200)
      .cut // 3 consumers: own stats + both descents
    val custKept = cust.filter(col("_keep")).select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .withColumn("_ikeep", keepPm(col("o_orderkey")) < 200)
      .cut // 4 consumers
    val ordKept = ord.join(custKept,
      col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).cut
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"))
      .withColumn("_ikeep", keepPm(concat(col("l_orderkey"),
        lit(":"), col("l_linenumber"))) < 200)
    def row(table: String, total: DataFrame, coherent: DataFrame,
        indepTotal: DataFrame, indepOrphans: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(coherent.agg(count(lit(1)).as("n_coh"))))
        .crossJoin(broadcast(indepTotal.agg(count(lit(1)).as("n_ind"))))
        .crossJoin(broadcast(
          indepOrphans.agg(count(lit(1)).as("n_orph"))))
        .select(lit(table).as("tbl"), col("n_rows"), col("n_coh"),
          expr("n_coh * 1000 div n_rows").as("coherent_pm"),
          col("n_ind"),
          expr("CASE WHEN n_ind = 0 THEN 0" +
            " ELSE n_orph * 1000 div n_ind END").as("indep_orphan_pm"))
    val ordIndep = ord.filter(col("_ikeep"))
    val liIndep = li.filter(col("_ikeep"))
    row("1_customer", cust, custKept, custKept,
        custKept.limit(0))
      .unionByName(row("2_orders", ord, ord.join(ordKept,
          Seq("o_orderkey"), "left_semi"), ordIndep,
        ordIndep.join(custKept,
          col("o_custkey") === col("c_custkey"), "left_anti")))
      .unionByName(row("3_lineitem", li, li.join(
          ordKept.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_semi"), liIndep,
        liIndep.join(ord.filter(col("_ikeep"))
            .select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")))
      .reportSort("tbl")
  }

  val pipeCoherentSampleSql: String =
    """WITH ck AS (
      |  SELECT c_custkey,
      |    ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1,8))::BIGINT
      |      % 1000 < 200 AS keep
      |  FROM customer),
      |ok AS (
      |  SELECT o_orderkey, o_custkey,
      |    ('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)),1,8))::BIGINT
      |      % 1000 < 200 AS ikeep
      |  FROM orders),
      |ordc AS (
      |  SELECT o.o_orderkey FROM ok o
      |  JOIN ck ON ck.c_custkey = o.o_custkey AND ck.keep),
      |lk AS (
      |  SELECT l_orderkey,
      |    ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
      |      CAST(l_linenumber AS VARCHAR)),1,8))::BIGINT
      |      % 1000 < 200 AS ikeep
      |  FROM lineitem),
      |r1 AS (
      |  SELECT '1_customer' AS tbl, COUNT(*) AS n_rows,
      |    SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_coh,
      |    SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_ind,
      |    0 AS n_orph
      |  FROM ck),
      |r2 AS (
      |  SELECT '2_orders' AS tbl, COUNT(*) AS n_rows,
      |    SUM(CASE WHEN EXISTS (SELECT 1 FROM ordc
      |      WHERE ordc.o_orderkey = ok.o_orderkey) THEN 1 ELSE 0 END)
      |      AS n_coh,
      |    SUM(CASE WHEN ikeep THEN 1 ELSE 0 END) AS n_ind,
      |    SUM(CASE WHEN ikeep AND NOT EXISTS (SELECT 1 FROM ck
      |      WHERE ck.c_custkey = ok.o_custkey AND ck.keep)
      |      THEN 1 ELSE 0 END) AS n_orph
      |  FROM ok),
      |r3 AS (
      |  SELECT '3_lineitem' AS tbl, COUNT(*) AS n_rows,
      |    SUM(CASE WHEN EXISTS (SELECT 1 FROM ordc
      |      WHERE ordc.o_orderkey = lk.l_orderkey) THEN 1 ELSE 0 END)
      |      AS n_coh,
      |    SUM(CASE WHEN ikeep THEN 1 ELSE 0 END) AS n_ind,
      |    SUM(CASE WHEN ikeep AND NOT EXISTS (SELECT 1 FROM ok
      |      WHERE ok.o_orderkey = lk.l_orderkey AND ok.ikeep)
      |      THEN 1 ELSE 0 END) AS n_orph
      |  FROM lk),
      |u AS (
      |  SELECT * FROM r1 UNION ALL SELECT * FROM r2
      |  UNION ALL SELECT * FROM r3)
      |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_coh AS BIGINT) AS n_coh,
      |  CAST(n_coh * 1000 // n_rows AS BIGINT) AS coherent_pm,
      |  CAST(n_ind AS BIGINT) AS n_ind,
      |  CAST(CASE WHEN n_ind = 0 THEN 0
      |    ELSE n_orph * 1000 // n_ind END AS BIGINT)
      |    AS indep_orphan_pm
      |FROM u ORDER BY tbl""".stripMargin

  // --------------------------------------- pipe_waterfill_budget
  /** WATERFILLING BUDGET ALLOCATION — the max-min-fair allocator for
    * a token budget with per-source CAPACITY CAPS, the constraint
    * [[pipeTokenBudget]]-style proportional splits ignore: a
    * proportional share can EXCEED a small source's inventory (you
    * can't sample tokens that don't exist), and naively clipping it
    * silently under-spends the budget. Waterfill instead raises one
    * common fill level λ until Σ min(cᵢ, λ) = T: every source below
    * the waterline is taken whole, every source above gets exactly λ
    * (±1 from the integer residual, dealt deterministically), so the
    * budget is spent EXACTLY and the unsaturated allocations are
    * max-min fair. Solved closed-form on the |sources| frame
    * (capacity-ascending prefix sums — a 20-row dim here; for
    * high-cardinality source domains the waterline generalizes to a
    * [[graft.ops.OrderStats.radixRankSelect]]-style capped binary
    * search, same two-scan shape). T = 60% of corpus chars.
    * R12eOpsSpec pins Σalloc = T, alloc ≤ cap, and ±1 fairness. */
  def pipeWaterfillBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val caps = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("cap"))
    val tot = caps.agg(sum(col("cap")).as("_tc"),
      count(lit(1)).as("_k"))
    // |sources| frame from here on (dim-bounded, not the q62 trap)
    val byCap = Window.orderBy(col("cap"), col("source"))
    val pre = caps.crossJoin(broadcast(tot))
      .withColumn("_t", expr("_tc * 3 div 5"))
      .withColumn("_i", row_number().over(byCap))
      .withColumn("_p", coalesce(sum(col("cap")).over(
        byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // source i is SATURATED iff filling everyone smaller whole and
      // giving the k-i+1 larger sources cap_i each still fits in T
      .withColumn("sat",
        col("_p") + col("cap") * (col("_k") - col("_i") + 1) <= col("_t"))
    val water = pre.filter(col("sat"))
      .agg(max(col("_i")).as("_j"), sum(col("cap")).as("_used"))
    pre.crossJoin(broadcast(water))
      .withColumn("_j", coalesce(col("_j"), lit(0L)))
      .withColumn("_used", coalesce(col("_used"), lit(0L)))
      .withColumn("_lvl",
        expr("CASE WHEN _j >= _k THEN NULL" +
          " ELSE (_t - _used) div (_k - _j) END"))
      .withColumn("_res",
        expr("CASE WHEN _j >= _k THEN 0" +
          " ELSE (_t - _used) % (_k - _j) END"))
      // residual +1s go to the largest-capacity unsaturated sources
      // (capacity can absorb them; ties broken by source name)
      .withColumn("_ur", when(col("sat"), lit(null)).otherwise(
        row_number().over(Window.partitionBy("sat")
          .orderBy(desc("cap"), col("source")))))
      .select(col("source"), col("cap"),
        when(col("sat"), col("cap"))
          .otherwise(col("_lvl") +
            when(col("_ur") <= col("_res"), 1L).otherwise(0L))
          .as("alloc"),
        col("sat").as("saturated"),
        col("_lvl").as("fill_level"))
      .withColumn("take_pm", expr("alloc * 1000 div cap"))
      .reportSort("source")
  }

  val pipeWaterfillBudgetSql: String =
    """WITH caps AS (
      |  SELECT source, SUM(n_chars) AS cap
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT SUM(cap) AS tc, COUNT(*) AS k FROM caps),
      |pre AS (
      |  SELECT source, cap, tc * 3 // 5 AS t, k,
      |    ROW_NUMBER() OVER (ORDER BY cap, source) AS i,
      |    COALESCE(SUM(cap) OVER (ORDER BY cap, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
      |  FROM caps CROSS JOIN tot),
      |s AS (
      |  SELECT *, p + cap * (k - i + 1) <= t AS sat FROM pre),
      |w AS (
      |  SELECT COALESCE(MAX(CASE WHEN sat THEN i END), 0) AS j,
      |    COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS used
      |  FROM s),
      |x AS (
      |  SELECT s.*, w.j, w.used,
      |    CASE WHEN w.j >= s.k THEN NULL
      |      ELSE (s.t - w.used) // (s.k - w.j) END AS lvl,
      |    CASE WHEN w.j >= s.k THEN 0
      |      ELSE (s.t - w.used) % (s.k - w.j) END AS res,
      |    CASE WHEN sat THEN NULL ELSE ROW_NUMBER() OVER (
      |      PARTITION BY sat ORDER BY cap DESC, source) END AS ur
      |  FROM s CROSS JOIN w)
      |SELECT source, CAST(cap AS BIGINT) AS cap,
      |  CAST(CASE WHEN sat THEN cap
      |    ELSE lvl + CASE WHEN ur <= res THEN 1 ELSE 0 END END
      |    AS BIGINT) AS alloc,
      |  sat AS saturated, CAST(lvl AS BIGINT) AS fill_level,
      |  CAST((CASE WHEN sat THEN cap
      |    ELSE lvl + CASE WHEN ur <= res THEN 1 ELSE 0 END END)
      |    * 1000 // cap AS BIGINT) AS take_pm
      |FROM x ORDER BY source""".stripMargin

  def pipeQualitySurvival(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val drops = Dedup.pairs09(spark, dir)
      .select(col("d2").as("doc_id")).distinct()
      .withColumn("_dropped", lit(1L))
    Tables.documents(spark, dir)
      .withColumn("bucket",
        least(floor(TextAnalysis.qualityScore(col("text")) * 10),
          lit(9L)).cast("long"))
      .join(drops, Seq("doc_id"), "left")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("_dropped"), lit(0L))).as("n_dropped"))
      .withColumn("drop_pm", expr("n_dropped * 1000 div n_docs"))
      .orderBy("bucket")
  }

  val pipeQualitySurvivalSql: String = {
    val score = TextAnalysis.qualityScoreSql("text")
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |    unnest(list_distinct(regexp_split_to_array(text, '\\s+'))) AS w
       |  FROM documents),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |  FROM tok a JOIN tok b
       |    ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |drops AS (
       |  SELECT DISTINCT d2 AS doc_id FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes z ON z.doc_id = d2
       |  WHERE CAST(i AS DOUBLE)/CAST(s1.n + z.n - i AS DOUBLE) >= 0.9),
       |b AS (
       |  SELECT doc_id,
       |    LEAST(CAST(FLOOR(($score) * 10) AS BIGINT), 9) AS bucket
       |  FROM documents)
       |SELECT bucket, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN drops.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN drops.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000 // COUNT(*) AS BIGINT) AS drop_pm
       |FROM b LEFT JOIN drops USING (doc_id)
       |GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  val pipeDedupSurvivalSql: String = {
    val score = TextAnalysis.qualityScoreSql("text")
    s"""WITH d AS (
       |  SELECT doc_id, lang, text,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
       |      AS toks
       |  FROM documents),
       |s2 AS (SELECT * FROM d WHERE $score >= 0.5),
       |keepers AS (
       |  SELECT md5(text) AS k, MIN(doc_id) AS keep
       |  FROM s2 GROUP BY 1),
       |s3 AS (SELECT * FROM s2 WHERE doc_id IN
       |  (SELECT keep FROM keepers)),
       |tok AS (
       |  SELECT doc_id, lang,
       |    unnest(list_distinct(regexp_split_to_array(text, '\\s+'))) AS w
       |  FROM s3),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
       |  FROM tok a JOIN tok b
       |    ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes z ON z.doc_id = d2
       |  WHERE CAST(i AS DOUBLE)/CAST(s1.n + z.n - i AS DOUBLE) >= 0.9),
       |s4 AS (SELECT * FROM s3
       |  WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM pairs)),
       |raw AS (SELECT COUNT(*) AS r FROM d),
       |f AS (
       |  SELECT 1 AS stage, 'raw' AS name, COUNT(*) AS n_docs,
       |    CAST(COALESCE(SUM(toks), 0) AS BIGINT) AS n_tokens FROM d
       |  UNION ALL
       |  SELECT 2, 'quality', COUNT(*),
       |    CAST(COALESCE(SUM(toks), 0) AS BIGINT) FROM s2
       |  UNION ALL
       |  SELECT 3, 'exact', COUNT(*),
       |    CAST(COALESCE(SUM(toks), 0) AS BIGINT) FROM s3
       |  UNION ALL
       |  SELECT 4, 'neardup', COUNT(*),
       |    CAST(COALESCE(SUM(toks), 0) AS BIGINT) FROM s4)
       |SELECT CAST(stage AS BIGINT) AS stage, name, n_docs, n_tokens,
       |  CAST(n_docs * 1000 // r AS BIGINT) AS keep_pm
       |FROM f CROSS JOIN raw ORDER BY stage""".stripMargin
  }

  // ------------------------------------------------ pipe_gopher_rules
  /** GOPHER-STYLE RULE BATTERY — the published pretraining quality
    * gates (Rae et al. 2021 §A1.1, reused by FineWeb/Dolma) as one
    * per-document pass with a per-language ATTRITION PANEL: for each
    * rule, how many docs it alone rejects, plus the docs surviving the
    * whole battery — the report a data curator reads before committing
    * a filter config. Rules kept exact-integer so the oracle replays
    * bit-for-bit (a mean-word-length bound 3 ≤ Σlen/n ≤ 5 is evaluated
    * as 3n ≤ Σlen ≤ 5n — no float division):
    *   R1 word count within [30, 120];
    *   R2 mean word length within [3, 5];
    *   R3 contains a stopword ('the'/'a' — the Gopher "has ≥2 of 8
    *      common English words" gate scaled to the fixture corpus);
    *   R4 distinct-token ratio ≥ 1/2 (templated word-salad gate);
    *   R5 top-token fraction ≤ 1/5 (single-token spam gate).
    * Shape: one token explode → (doc, tok) hash-agg → per-doc agg →
    * per-lang agg; the explode is the only wide stage and combines
    * map-side. At 100 TB each doc contributes one row per DISTINCT
    * token to the first agg — strictly smaller than the corpus. */
  def pipeGopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val perDoc = toks.groupBy("doc_id", "lang", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_c"),
        sum(col("c") * length(col("tok"))).as("sum_len"),
        max(when(col("tok").isin("the", "a"), 1L).otherwise(0L))
          .as("has_stop"))
    val flagged = perDoc.select(col("lang"),
      (col("n") >= 30 && col("n") <= 120).as("r1"),
      (col("sum_len") >= col("n") * 3 &&
        col("sum_len") <= col("n") * 5).as("r2"),
      (col("has_stop") === 1L).as("r3"),
      (col("n_distinct") * 2 >= col("n")).as("r4"),
      (col("max_c") * 5 <= col("n")).as("r5"))
    def fails(r: Column) = sum(when(r, 0L).otherwise(1L))
    flagged.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        fails(col("r1")).as("fail_wordcount"),
        fails(col("r2")).as("fail_wordlen"),
        fails(col("r3")).as("fail_stopword"),
        fails(col("r4")).as("fail_distinct"),
        fails(col("r5")).as("fail_toptoken"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4") &&
          col("r5"), 1L).otherwise(0L)).as("n_keep"))
      .reportSort("lang")
  }

  val pipeGopherRulesSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    unnest(regexp_split_to_array(text, '\s+')) AS tok
      |  FROM documents),
      |tc AS (
      |  SELECT doc_id, lang, tok, COUNT(*) AS c
      |  FROM t WHERE length(tok) > 0 GROUP BY 1, 2, 3),
      |d AS (
      |  SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n,
      |    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_c,
      |    CAST(SUM(c * length(tok)) AS BIGINT) AS sum_len,
      |    MAX(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END)
      |      AS has_stop
      |  FROM tc GROUP BY 1, 2),
      |f AS (
      |  SELECT lang,
      |    (n BETWEEN 30 AND 120) AS r1,
      |    (sum_len BETWEEN n * 3 AND n * 5) AS r2,
      |    (has_stop = 1) AS r3,
      |    (n_distinct * 2 >= n) AS r4,
      |    (max_c * 5 <= n) AS r5
      |  FROM d)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS fail_wordcount,
      |  CAST(SUM(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS fail_wordlen,
      |  CAST(SUM(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS fail_stopword,
      |  CAST(SUM(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS fail_distinct,
      |  CAST(SUM(CASE WHEN r5 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS fail_toptoken,
      |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------- pipe_stratified_split
  /** STRATIFIED EVAL HOLDOUT — the split a benchmark pipeline needs
    * when a plain random cut would starve small (lang, source) cells:
    * within every stratum, exactly ⌊n/10⌋ documents are held out,
    * chosen by PORTABLE HASH RANK (md5 of doc_id — deterministic,
    * engine-replayable, and independent of ingestion order, which a
    * "first n/10 rows" split is not). The audit row per stratum
    * carries the eval-id checksum, so the gate verifies the exact
    * SELECTION, not just the counts. One hash-rank window per stratum
    * (stratum-bounded partitions), one rollup. */
  def pipeStratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byS = Window.partitionBy("lang", "source")
      .orderBy(graft.mask.MaskFunctions.portableHash(col("doc_id")),
        col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("_rk", row_number().over(byS))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy("lang", "source")))
      .withColumn("_eval", col("_rk") <= expr("_n div 10"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_eval"), 1L).otherwise(0L)).as("n_eval"),
        sum(when(col("_eval"), col("doc_id")).otherwise(0L))
          .as("eval_ids_sum"))
      .withColumn("eval_pm", expr("n_eval * 1000 div n_docs"))
      .orderBy("lang", "source")
  }

  val pipeStratifiedSplitSql: String =
    """WITH r AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))
      |        ::BIGINT, doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY lang, source) AS n
      |  FROM documents)
      |SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN rk <= n // 10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_eval,
      |  CAST(SUM(CASE WHEN rk <= n // 10 THEN doc_id ELSE 0 END)
      |    AS BIGINT) AS eval_ids_sum,
      |  CAST(SUM(CASE WHEN rk <= n // 10 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS eval_pm
      |FROM r GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // --------------------------------------------- pipe_freshness_decay
  /** RECENCY-DECAYED MIX WEIGHTS — the freshness half-life every
    * crawl-refresh pipeline applies before mixing snapshots: a
    * document's sampling weight halves every 90 days of age, so stale
    * copies of a source stop dominating the mix while never being
    * hard-dropped. Age is the deterministic per-doc stand-in
    * doc_id mod 365 (the fixture carries no crawl timestamp; the
    * derivation is the documented seam where a real corpus plugs its
    * snapshot date). Weights are exact integers — w_pm = 1000 >>
    * (age div 90) — so the weighted token mass and the resulting
    * per-source shares survive the oracle boundary with no float.
    * One scan, one hash-agg; the share window runs on the |sources|
    * frame. */
  def pipeFreshnessDecay(spark: SparkSession, dir: String): DataFrame = {
    val nt = size(split(col("text"), "\\s+")).cast("long")
    val per = Tables.documents(spark, dir)
      .select(col("source"), nt.as("_nt"),
        (col("doc_id") % 365).as("_age"))
      .withColumn("_wpm", expr("shiftright(1000, cast(_age div 90 as int))"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("tokens_raw"),
        sum(col("_nt") * col("_wpm")).as("tokens_weighted_milli"))
    per.withColumn("share_pm",
        expr("tokens_weighted_milli * 1000 div " +
          "sum(tokens_weighted_milli) over ()"))
      .reportSort("source")
  }

  val pipeFreshnessDecaySql: String =
    """WITH per AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
      |      AS tokens_raw,
      |    CAST(SUM(len(regexp_split_to_array(text, '\s+')) *
      |      (1000 >> CAST((doc_id % 365) // 90 AS INTEGER))) AS BIGINT)
      |      AS tokens_weighted_milli
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs, tokens_raw, tokens_weighted_milli,
      |  CAST(tokens_weighted_milli * 1000 //
      |    SUM(tokens_weighted_milli) OVER () AS BIGINT) AS share_pm
      |FROM per ORDER BY source""".stripMargin

  // ------------------------------------------------- pipe_datasheet
  /** DATASET DATASHEET — the release artifact every published corpus
    * ships (Datasheets for Datasets, Gebru et al.): per language, the
    * document and token mass, source diversity, the exact-duplicate
    * rate, and the token-length distribution's p50/p90. Everything is
    * one corpus scan + dimension-sized frames: counts/dup-rate are a
    * hash-agg over (lang) with md5 fingerprints, and BOTH quantiles
    * come from ONE [[graft.ops.OrderStats.radixRankSelect]] pass
    * (domain-capped histogram exchanges — never a per-lang sort of
    * the corpus). Exact integers end to end. */
  def pipeDatasheet(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        md5(col("text")).as("fp"))
      .cut
    val qs = OrderStats.radixRankSelect(
        base.select(col("lang"), col("nt")), Seq("lang"), "nt",
        Seq("p50" -> expr("(n + 1) div 2"),
          "p90" -> expr("(9 * n + 9) div 10")), shift = 4)
      .groupBy("lang")
      .agg(max(when(col("sel") === "p50", col("sel_value")))
          .as("tokens_p50"),
        max(when(col("sel") === "p90", col("sel_value")))
          .as("tokens_p90"))
    base.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("fp")).as("n_unique"))
      .join(qs, "lang")
      .withColumn("dup_pm",
        expr("(n_docs - n_unique) * 1000 div n_docs"))
      .reportSort("lang")
  }

  val pipeDatasheetSql: String =
    """WITH b AS (
      |  SELECT doc_id, lang, source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS nt,
      |    md5(text) AS fp
      |  FROM documents),
      |h AS (SELECT lang, nt, COUNT(*) AS c FROM b GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, nt,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY nt) AS hi,
      |    SUM(c) OVER (PARTITION BY lang) AS n
      |  FROM h),
      |q AS (
      |  SELECT lang,
      |    CAST(MIN(CASE WHEN hi >= (n + 1) // 2 THEN nt END) AS BIGINT)
      |      AS tokens_p50,
      |    CAST(MIN(CASE WHEN hi >= (9 * n + 9) // 10 THEN nt END)
      |      AS BIGINT) AS tokens_p90
      |  FROM cum GROUP BY lang),
      |a AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |    COUNT(DISTINCT source) AS n_sources,
      |    COUNT(DISTINCT fp) AS n_unique
      |  FROM b GROUP BY lang)
      |SELECT a.lang, n_docs, n_tokens, n_sources, n_unique,
      |  tokens_p50, tokens_p90,
      |  CAST((n_docs - n_unique) * 1000 // n_docs AS BIGINT) AS dup_pm
      |FROM a JOIN q USING (lang) ORDER BY lang""".stripMargin

  // ------------------------------------- pipe_packing_contamination
  /** CROSS-DOC ATTENTION CONTAMINATION in packed training windows —
    * the cost of packing WITHOUT attention-mask resets: the
    * per-language token stream is chunked into fixed `budget`-token
    * sequences the way a pretraining loader actually batches
    * (documents SPLIT at window boundaries), each doc contributes a
    * contiguous SEGMENT to every window it crosses, and a window
    * with segments s₁..s_k has exactly (W² − Σsᵢ²)/2 cross-document
    * causal pairs out of W(W−1)/2 total — the per-mille a
    * boundary-reset kernel reclaims. Windows are derived from the
    * same two-level prefix decomposition as [[packSequences]] (no
    * per-language global window over docs); the per-doc explode
    * emits ⌈len/budget⌉+1 segments at most, so the segment frame
    * stays corpus-linear. Exact integer pair counts (the even
    * difference W²−Σsᵢ² halves exactly). */
  def packingContamination(docs: DataFrame, budget: Int,
      docsPerShard: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("lang"), col("doc_id"),
        expr("size(split(text, '\\\\s+'))").cast("long").as("_t"))
      .withColumn("_shard", expr(s"doc_id div $docsPerShard"))
    val pre = Window.partitionBy("lang").orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("lang", "_shard")
      .agg(sum(col("_t")).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_tot")).over(pre), lit(0L)))
      .select(col("lang"), col("_shard"), col("_off"))
    val local = Window.partitionBy("lang", "_shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val segs = base
      .withColumn("_local", coalesce(sum(col("_t")).over(local), lit(0L)))
      .join(broadcast(offsets), Seq("lang", "_shard"))
      .withColumn("bef", col("_off") + col("_local"))
      .withColumn("bin", explode(expr(
        s"sequence(bef div $budget, (bef + _t - 1) div $budget)")))
      .withColumn("seg",
        least(col("bef") + col("_t"), (col("bin") + 1) * budget) -
          greatest(col("bef"), col("bin") * budget))
    segs.groupBy("lang", "bin")
      .agg(sum(col("seg")).as("w"),
        sum(col("seg") * col("seg")).as("s2"),
        count(lit(1)).as("nd"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_bins"), sum(col("w")).as("n_tokens"),
        sum(expr("(w * w - s2) div 2")).as("contam_pairs"),
        sum(expr("w * (w - 1) div 2")).as("total_pairs"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_mixed_bins"))
      .select(col("lang"), col("n_bins"), col("n_tokens"),
        col("contam_pairs"), col("total_pairs"),
        expr("contam_pairs * 1000 div total_pairs").as("contam_pm"),
        col("n_mixed_bins"))
      .reportSort("lang")
  }

  def pipePackingContamination(spark: SparkSession, dir: String)
      : DataFrame =
    packingContamination(Tables.documents(spark, dir), 2048,
      docsPerShard = 64)

  val pipePackingContaminationSql: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS nt
      |  FROM documents),
      |c AS (
      |  SELECT lang, doc_id, nt,
      |    COALESCE(SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      |  FROM t),
      |sp AS (
      |  SELECT lang, bin,
      |    LEAST(bef + nt, (bin + 1) * 2048) -
      |      GREATEST(bef, bin * 2048) AS seg
      |  FROM c, UNNEST(range(CAST(bef // 2048 AS BIGINT),
      |    CAST((bef + nt - 1) // 2048 + 1 AS BIGINT))) AS u(bin)),
      |g AS (
      |  SELECT lang, bin, SUM(seg) AS w, SUM(seg * seg) AS s2,
      |    COUNT(*) AS nd
      |  FROM sp GROUP BY 1, 2)
      |SELECT lang, COUNT(*) AS n_bins,
      |  CAST(SUM(w) AS BIGINT) AS n_tokens,
      |  CAST(SUM((w * w - s2) // 2) AS BIGINT) AS contam_pairs,
      |  CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS total_pairs,
      |  CAST(SUM((w * w - s2) // 2) * 1000 //
      |    SUM(w * (w - 1) // 2) AS BIGINT) AS contam_pm,
      |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_mixed_bins
      |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------- pipe_shard_rebalance
  /** MINIMAL-MOVE SHARD REBALANCING PLAN (the defrag a skewed corpus
    * layout needs before a training run — stragglers are paced by
    * the fattest shard): shards get exact token targets (total div n,
    * remainder to the lowest ids), and the LINEAR water-filling plan
    * is a prefix sum of excesses — `boundary_flow(i)` is exactly the
    * token mass that must cross the i→i+1 boundary, so Σ|flow| is
    * the minimal adjacent-move cost and max|flow| the bottleneck
    * link. Everything after the one corpus hash-agg runs on the
    * |shards| manifest frame; the plan never touches documents. */
  def pipeShardRebalance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards = Tables.documents(spark, dir)
      .groupBy(expr("doc_id div 64").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("size(split(text, '\\\\s+'))").cast("long"))
          .as("n_tokens"))
      .cut // |shards| frame, totals + plan consumers
    val tot = shards.agg(sum(col("n_tokens")).as("t"),
      count(lit(1)).as("n"))
    val byId = Window.orderBy("shard_id") // |shards| frame only
    shards.crossJoin(broadcast(tot))
      .withColumn("idx", row_number().over(byId) - 1)
      .withColumn("target",
        expr("t div n + if(idx < t % n, 1L, 0L)"))
      .withColumn("excess", col("n_tokens") - col("target"))
      .withColumn("boundary_flow", sum(col("excess"))
        .over(byId.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("shard_id"), col("n_docs"), col("n_tokens"),
        col("target"), col("excess"), col("boundary_flow"))
      .orderBy("shard_id")
  }

  val pipeShardRebalanceSql: String =
    """WITH s AS (
      |  SELECT doc_id // 64 AS shard_id, COUNT(*) AS n_docs,
      |    SUM(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT))
      |      AS n_tokens
      |  FROM documents GROUP BY 1),
      |t AS (SELECT SUM(n_tokens) AS t, COUNT(*) AS n FROM s),
      |p AS (
      |  SELECT shard_id, n_docs, n_tokens, t, n,
      |    ROW_NUMBER() OVER (ORDER BY shard_id) - 1 AS idx
      |  FROM s CROSS JOIN t),
      |q AS (
      |  SELECT shard_id, n_docs, n_tokens,
      |    t // n + CASE WHEN idx < t % n THEN 1 ELSE 0 END AS target
      |  FROM p)
      |SELECT shard_id, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(target AS BIGINT) AS target,
      |  CAST(n_tokens - target AS BIGINT) AS excess,
      |  CAST(SUM(n_tokens - target) OVER (ORDER BY shard_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS boundary_flow
      |FROM q ORDER BY shard_id""".stripMargin

  // -------------------------------------------- pipe_dedup_mix_shift
  /** MIX SHIFT UNDER DEDUP — the curation-bias audit (exact dedup is
    * not mix-neutral: boilerplate-heavy languages/sources lose more
    * mass, so the post-dedup mixture silently drifts from the one
    * the mixing policy was tuned on): per language, docs and tokens
    * before vs after keep-first exact dedup, each side's share of
    * its corpus in per-mille, and the share DRIFT the retuning step
    * needs. One fingerprint hash-agg (keeper = min doc id) + one
    * key-join back — the same two corpus passes exact dedup already
    * pays; the drift math runs on the |langs| frame. */
  def pipeDedupMixShift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("size(split(text, '\\\\s+'))").cast("long").as("_t"),
        md5(lower(col("text"))).as("fp"))
    val keepers = docs.groupBy("fp").agg(min(col("doc_id")).as("keep"))
    val tagged = docs.join(keepers, Seq("fp"))
      .withColumn("kept", col("doc_id") === col("keep"))
    val perLang = tagged.groupBy("lang")
      .agg(count(lit(1)).as("docs_before"),
        sum(col("_t")).as("tokens_before"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("docs_after"),
        sum(when(col("kept"), col("_t")).otherwise(0L))
          .as("tokens_after"))
      .cut // |langs| frame, totals + drift consumers
    val tot = perLang.agg(sum(col("tokens_before")).as("tb"),
      sum(col("tokens_after")).as("ta"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("docs_before"), col("docs_after"),
        col("tokens_before"), col("tokens_after"),
        expr("tokens_before * 1000 div tb").as("share_before_pm"),
        expr("tokens_after * 1000 div ta").as("share_after_pm"))
      // drift is a DIFFERENCE of two already-floored non-negative
      // shares — no signed division ever happens, so no engine skew
      .withColumn("drift_pm",
        col("share_after_pm") - col("share_before_pm"))
      .reportSort("lang")
  }

  val pipeDedupMixShiftSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
      |      AS t,
      |    md5(lower(text)) AS fp
      |  FROM documents),
      |k AS (SELECT fp, MIN(doc_id) AS keep FROM d GROUP BY 1),
      |g AS (
      |  SELECT lang, COUNT(*) AS docs_before, SUM(t) AS tokens_before,
      |    SUM(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS docs_after,
      |    SUM(CASE WHEN doc_id = keep THEN t ELSE 0 END)
      |      AS tokens_after
      |  FROM d JOIN k USING (fp) GROUP BY 1),
      |t AS (SELECT SUM(tokens_before) AS tb, SUM(tokens_after) AS ta
      |      FROM g)
      |SELECT lang, docs_before, CAST(docs_after AS BIGINT)
      |    AS docs_after,
      |  CAST(tokens_before AS BIGINT) AS tokens_before,
      |  CAST(tokens_after AS BIGINT) AS tokens_after,
      |  CAST(tokens_before * 1000 // tb AS BIGINT) AS share_before_pm,
      |  CAST(tokens_after * 1000 // ta AS BIGINT) AS share_after_pm,
      |  CAST(tokens_after * 1000 // ta - tokens_before * 1000 // tb
      |    AS BIGINT) AS drift_pm
      |FROM g CROSS JOIN t ORDER BY lang""".stripMargin

  // ------------------------------------------- pipe_truncation_waste
  /** TRUNCATION-WASTE LEDGER across candidate context lengths — the
    * "which max_seq_len do we train at" table (truncate-at-L throws
    * away every token past L; too small wastes long-document mass,
    * too large wastes padding — the [[packSequences]] companion
    * decision): for L ∈ {128, 256, 512, 1024}, per-source docs
    * truncated, tokens dropped, and the dropped share in per-mille.
    * ONE corpus scan feeds all four candidate lengths (the L-grid
    * explodes the |sources×4| ledger, not the corpus — each doc
    * emits 4 tiny structs, map-side). Monotone in L by construction
    * — spec-pinned. */
  def pipeTruncationWaste(spark: SparkSession, dir: String): DataFrame = {
    val ls = Seq(128, 256, 512, 1024)
    val t = expr("size(split(text, '\\\\s+'))").cast("long")
    Tables.documents(spark, dir)
      .select(col("source"), t.as("t"))
      .select(col("source"), col("t"),
        explode(array(ls.map(l => struct(lit(l.toLong).as("max_len"),
          greatest(col("t") - l, lit(0L)).as("dropped"))): _*))
          .as("m"))
      .groupBy(col("source"), col("m.max_len").as("max_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"),
        sum(when(col("m.dropped") > 0, 1L).otherwise(0L))
          .as("docs_truncated"),
        sum(col("m.dropped")).as("tokens_dropped"))
      .select(col("source"), col("max_len"), col("n_docs"),
        col("n_tokens"), col("docs_truncated"), col("tokens_dropped"),
        expr("tokens_dropped * 1000 div n_tokens").as("dropped_pm"))
      .reportSort("source", "max_len")
  }

  val pipeTruncationWasteSql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS t
      |  FROM documents),
      |g AS (
      |  SELECT source, l.max_len, t,
      |    GREATEST(t - l.max_len, 0) AS dropped
      |  FROM t CROSS JOIN
      |    (SELECT UNNEST([128, 256, 512, 1024]) AS max_len) l)
      |SELECT source, CAST(max_len AS BIGINT) AS max_len,
      |  COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN dropped > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_truncated,
      |  CAST(SUM(dropped) AS BIGINT) AS tokens_dropped,
      |  CAST(SUM(dropped) * 1000 // SUM(t) AS BIGINT) AS dropped_pm
      |FROM g GROUP BY 1, 2 ORDER BY source, max_len""".stripMargin

  // --------------------------------------- pipe_source_overlap_matrix
  /** CONTENT-PROVENANCE OVERLAP MATRIX — which source PAIRS carry the
    * same documents (`txt_source_overlap` compares vocabularies; this
    * compares exact content — the licensing/provenance question "is
    * source B just a re-crawl of A?"): fingerprints group to their
    * source SET, sets of size ≥ 2 explode into unordered source
    * pairs, and each (s1, s2) cell reports shared fingerprints plus
    * the per-mille of the smaller side's corpus that the overlap
    * covers (containment — the re-crawl detector). The pair explode
    * is bounded by |sources|² per fingerprint worst-case but
    * fingerprint-linear in practice; output ≤ C(20,2) rows. */
  def pipeSourceOverlapMatrix(spark: SparkSession, dir: String)
      : DataFrame = {
    // two fingerprint grains: exact content, and the HEAD (first 16
    // tokens) — the re-crawl/template detector that fires on
    // truncated or tail-edited copies the full hash misses
    val head = md5(concat_ws(" ",
      slice(split(lower(col("text")), "\\s+"), 1, 16)))
    val fp = Tables.documents(spark, dir)
      .select(explode(array(
        struct(lit("exact").as("grain"),
          md5(lower(col("text"))).as("fp")),
        struct(lit("head16").as("grain"), head.as("fp")))).as("m"),
        col("source"))
      .select(col("m.grain").as("grain"), col("m.fp").as("fp"),
        col("source"))
      .distinct()
    val perSrc = fp.groupBy("grain", "source")
      .agg(count(lit(1)).as("n_fp"))
    val sets = fp.groupBy("grain", "fp")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    val pairs = sets
      .select(col("grain"), explode(expr(
        """flatten(transform(ss, (a, i) ->
          |  transform(slice(ss, i + 2, size(ss) - i - 1),
          |    b -> struct(a as s1, b as s2))))""".stripMargin))
        .as("p"))
      .groupBy(col("grain"), col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("shared_fp"))
    pairs
      .join(broadcast(perSrc.withColumnRenamed("source", "s1")
        .withColumnRenamed("n_fp", "n1")), Seq("grain", "s1"))
      .join(broadcast(perSrc.withColumnRenamed("source", "s2")
        .withColumnRenamed("n_fp", "n2")), Seq("grain", "s2"))
      .select(col("grain"), col("s1"), col("s2"), col("shared_fp"),
        expr("shared_fp * 1000 div least(n1, n2)")
          .as("containment_pm"))
      .orderBy("grain", "s1", "s2")
  }

  val pipeSourceOverlapMatrixSql: String =
    """WITH fp AS (
      |  SELECT DISTINCT 'exact' AS grain, md5(lower(text)) AS fp,
      |    source
      |  FROM documents
      |  UNION
      |  SELECT DISTINCT 'head16',
      |    md5(array_to_string(
      |      regexp_split_to_array(lower(text), '\s+')[1:16], ' ')),
      |    source
      |  FROM documents),
      |ps AS (SELECT grain, source, COUNT(*) AS n_fp
      |       FROM fp GROUP BY 1, 2),
      |pr AS (
      |  SELECT a.grain, a.source AS s1, b.source AS s2,
      |    COUNT(*) AS shared_fp
      |  FROM fp a JOIN fp b
      |    ON a.grain = b.grain AND a.fp = b.fp
      |      AND a.source < b.source
      |  GROUP BY 1, 2, 3)
      |SELECT pr.grain AS grain, s1, s2, shared_fp,
      |  CAST(shared_fp * 1000 // LEAST(p1.n_fp, p2.n_fp) AS BIGINT)
      |    AS containment_pm
      |FROM pr JOIN ps p1 ON pr.grain = p1.grain AND pr.s1 = p1.source
      |JOIN ps p2 ON pr.grain = p2.grain AND pr.s2 = p2.source
      |ORDER BY pr.grain, s1, s2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_source_overlap_matrix" -> (pipeSourceOverlapMatrix _),
    "pipe_truncation_waste" -> (pipeTruncationWaste _),
    "pipe_dedup_mix_shift" -> (pipeDedupMixShift _),
    "pipe_shard_rebalance" -> (pipeShardRebalance _),
    "pipe_packing_contamination" -> (pipePackingContamination _),
    "pipe_datasheet" -> (pipeDatasheet _),
    "pipe_stratified_split" -> (pipeStratifiedSplit _),
    "pipe_freshness_decay" -> (pipeFreshnessDecay _),
    "pipe_dedup_survival" -> (pipeDedupSurvival _),
    "pipe_coherent_sample" -> (pipeCoherentSample _),
    "pipe_waterfill_budget" -> (pipeWaterfillBudget _),
    "pipe_quality_survival" -> (pipeQualitySurvival _),
    "pipe_gopher_rules" -> (pipeGopherRules _),
    "pipe_mix_temperature" -> (pipeMixTemperature _),
    "pipe_sample_weighted" -> (pipeSampleWeighted _),
    "pipe_pad_waste" -> (pipePadWaste _),
    "pipe_sample_fixed" -> (pipeSampleFixed _),
    "pipe_mix_alpha_curve" -> (pipeMixAlphaCurve _),
    "pipe_compaction" -> (pipeCompaction _),
    "pipe_filter_sweep" -> (pipeFilterSweep _),
    "pipe_dedup_weights" -> (pipeDedupWeights _),
    "pipe_dataset_diff" -> (pipeDatasetDiff _),
    "pipe_corpus_filter" -> (pipeCorpusFilter _),
    "pipe_sample_stratified" -> (pipeSampleStratified _),
    "pipe_pack_sequences" -> (pipePackSequences _),
    "pipe_interleave" -> (pipeInterleave _),
    "pipe_contamination" -> (pipeContamination _),
    "pipe_split_leakage" -> (pipeSplitLeakage _),
    "pipe_split_by_cluster" -> (pipeSplitByCluster _),
    "pipe_url_canonical" -> (pipeUrlCanonical _),
    "pipe_cross_source" -> (pipeCrossSource _),
    "pipe_domain_filter" -> (pipeDomainFilter _),
    "pipe_dataset_card" -> (pipeDatasetCard _),
    "pipe_global_shuffle" -> (pipeGlobalShuffle _),
    "pipe_token_budget" -> (pipeTokenBudget _),
    "pipe_epoch_plan" -> (pipeEpochPlan _),
    "pipe_curriculum" -> (pipeCurriculum _),
    "pipe_shard_manifest" -> (pipeShardManifest _),
    "pipe_shard_skew" -> (pipeShardSkew _),
    "pipe_mix_weights" -> (pipeMixWeights _))

  val oracles: Map[String, String] = Map(
    "pipe_source_overlap_matrix" -> pipeSourceOverlapMatrixSql,
    "pipe_truncation_waste" -> pipeTruncationWasteSql,
    "pipe_dedup_mix_shift" -> pipeDedupMixShiftSql,
    "pipe_shard_rebalance" -> pipeShardRebalanceSql,
    "pipe_packing_contamination" -> pipePackingContaminationSql,
    "pipe_datasheet" -> pipeDatasheetSql,
    "pipe_stratified_split" -> pipeStratifiedSplitSql,
    "pipe_freshness_decay" -> pipeFreshnessDecaySql,
    "pipe_dedup_survival" -> pipeDedupSurvivalSql,
    "pipe_coherent_sample" -> pipeCoherentSampleSql,
    "pipe_waterfill_budget" -> pipeWaterfillBudgetSql,
    "pipe_quality_survival" -> pipeQualitySurvivalSql,
    "pipe_gopher_rules" -> pipeGopherRulesSql,
    "pipe_mix_temperature" -> pipeMixTemperatureSql,
    "pipe_sample_weighted" -> pipeSampleWeightedSql,
    "pipe_pad_waste" -> pipePadWasteSql,
    "pipe_sample_fixed" -> pipeSampleFixedSql,
    "pipe_mix_alpha_curve" -> pipeMixAlphaCurveSql,
    "pipe_compaction" -> pipeCompactionSql,
    "pipe_filter_sweep" -> pipeFilterSweepSql,
    "pipe_dedup_weights" -> pipeDedupWeightsSql,
    "pipe_dataset_diff" -> pipeDatasetDiffSql,
    "pipe_corpus_filter" -> pipeCorpusFilterSql,
    "pipe_sample_stratified" -> pipeSampleStratifiedSql,
    "pipe_pack_sequences" -> pipePackSequencesSql,
    "pipe_interleave" -> pipeInterleaveSql,
    "pipe_contamination" -> pipeContaminationSql,
    "pipe_split_leakage" -> pipeSplitLeakageSql,
    "pipe_split_by_cluster" -> pipeSplitByClusterSql,
    "pipe_url_canonical" -> pipeUrlCanonicalSql,
    "pipe_cross_source" -> pipeCrossSourceSql,
    "pipe_domain_filter" -> pipeDomainFilterSql,
    "pipe_dataset_card" -> pipeDatasetCardSql,
    "pipe_global_shuffle" -> pipeGlobalShuffleSql,
    "pipe_token_budget" -> pipeTokenBudgetSql,
    "pipe_epoch_plan" -> pipeEpochPlanSql,
    "pipe_curriculum" -> pipeCurriculumSql,
    "pipe_shard_manifest" -> pipeShardManifestSql,
    "pipe_shard_skew" -> pipeShardSkewSql,
    "pipe_mix_weights" -> pipeMixWeightsSql)
}
