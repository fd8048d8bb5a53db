package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** §2.6 deduplication for training-data pipelines.
  *
  * Scale shapes (the part that matters at 100 TB):
  *  - exact dedup = hash-agg, ONE shuffle on the fingerprint;
  *  - token/n-gram Jaccard = inverted-index join (shuffle on token),
  *    never an n² cross join — blocking keys (lang) bound bucket fan-out;
  *  - MinHash-LSH = the real scale path: candidates come from band-
  *    bucket joins (shuffle on band hash), verification touches only
  *    candidate pairs;
  *  - SimHash = 64 agg bits per doc, candidates from band equality,
  *    verify by XOR popcount;
  *  - embedding dedup = thresholded pair join; at scale candidates come
  *    from LSH/centroid buckets (see graft.sim), never all-pairs.
  */
object Dedup extends QueryModule {

  /** Distinct tokens per doc (the inverted-index base). */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), "\\s+"))).as("w"))

  // ------------------------------------------------------ dedup_exact
  /** Content-hash dedup: one hash-agg; keeper = min doc_id per group. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(lower(col("text"))).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(spark, dir)).orderBy("keeper")

  val dedupExactSql: String =
    """SELECT md5(lower(text)) AS fingerprint, MIN(doc_id) AS keeper,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(lower(text)) ORDER BY keeper""".stripMargin

  // ---------------------------------------------- dedup_ngram_jaccard
  /** Token-set Jaccard near-dup pairs, blocked by lang:
    * j = |A∩B| / (|A|+|B|-|A∩B|).
    *
    * Design choice: token sets become SORTED HASH ARRAYS once, pairs
    * come from a block join (lang + size-ratio necessary condition),
    * and each pair is verified by the codegen'd merge-intersection.
    * This beats the classic inverted-index token join whenever blocks
    * are bounded (here ~n/5 docs per lang) because it never
    * materializes the candidate×token row explosion; with weak/no
    * blocking keys, prefer the inverted index restricted to rare
    * tokens, or MinHash (below) — at 100 TB you block by
    * (lang, length-bucket, shard). Token hashing (xxhash64) keeps the
    * arrays primitive; 64-bit collisions are negligible. */
  def ngramJaccard(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = tokens(docs)
      .groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_set(xxhash64(col("w")))).as("hs"))
      .withColumn("n", size(col("hs")))
    // the broadcast join's parallelism = streamed-side partitions, and a
    // small corpus arrives as ONE parquet split — spread it first
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val a = sets.repartition(par).select(col("doc_id").as("d1"), col("lang"),
      col("hs").as("hs1"), col("n").as("n1"))
    val b = sets.select(col("doc_id").as("d2"), col("lang").as("lang2"),
      col("hs").as("hs2"), col("n").as("n2"))
    val i = call_function(graft.expr.VectorExprs.intersectName,
      col("hs1"), col("hs2"))
    // broadcast: the compact doc-set side is MBs even at large corpora
    // (ids + token hashes), and a shuffle join on `lang` would put the
    // whole corpus on <=#langs cores. At 100 TB, when neither side fits
    // a broadcast, shuffle on (lang, length-bucket) instead.
    a.join(broadcast(b),
        col("lang") === col("lang2") && col("d1") < col("d2") &&
          least(col("n1"), col("n2")).cast("double") >=
            greatest(col("n1"), col("n2")).cast("double") * threshold)
      .select(col("d1"), col("d2"),
        (i.cast("double") / (col("n1") + col("n2") - i).cast("double")).as("j"))
      .filter(col("j") >= threshold)
  }

  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    ngramJaccard(Tables.documents(spark, dir), 0.9).orderBy("d1", "d2")
  }

  val dedupNgramSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(list_distinct(regexp_split_to_array(text, '\s+'))) AS w
      |  FROM documents),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      |  FROM tok a JOIN tok b
      |    ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, CAST(i AS DOUBLE)/CAST(s1.n + s2.n - i AS DOUBLE) AS j
      |FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
      |WHERE CAST(i AS DOUBLE)/CAST(s1.n + s2.n - i AS DOUBLE) >= 0.9
      |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------ dedup_minhash_lsh
  /** MinHash signatures (k permutations via seeded xxhash64) banded into
    * LSH buckets; candidate pairs from bucket equality, then verified
    * with true Jaccard — only candidates pay the verify cost. Rows-only
    * driver check (xxhash64 is not portable to the oracle engine);
    * DedupSpec pins recall vs the exact ngram pairs. */
  def minhashLsh(docs: DataFrame, numHashes: Int = 32, bands: Int = 4,
      threshold: Double = 0.9): DataFrame = {
    // bands=4 × rows=8: P(candidate | j=0.9) ≈ 0.90, while j≈0.7 false
    // candidates drop to ~0.2 — on self-similar corpora the verify-join
    // width, not recall, is the binding constraint
    val rowsPerBand = numHashes / bands
    // ONE tokenization: the sorted token-hash array serves both the
    // signatures (permutation i = xxhash64(i, tokenHash), min over the
    // array) and the exact verify — no second explode/groupBy pass.
    val sets = tokens(docs).groupBy("doc_id")
      .agg(sort_array(collect_set(xxhash64(col("w")))).as("hs"))
      .withColumn("n", size(col("hs")))
    val sigCols = (0 until numHashes).map(i =>
      array_min(transform(col("hs"), h => xxhash64(lit(i), h))).as(s"h$i"))
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("sig"))
    }
    // Buckets carry the doc-set arrays inline so candidate pairs verify
    // in the SAME join (shuffle on (band, sig) only) — no distinct over
    // the raw candidate set and no join back to doc sets. A pair
    // colliding in several bands re-verifies cheaply (codegen'd merge
    // intersection); the final distinct touches only survivors.
    val buckets = sets
      .select((col("doc_id") +: col("hs") +: col("n") +: sigCols): _*)
      .select(col("doc_id"), col("hs"), col("n"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("hs"), col("n"),
        col("bk.band").as("band"), col("bk.sig").as("sig"))
    // spread the streamed side: broadcast-join parallelism equals its
    // partition count, and a small corpus is a single parquet split
    val x = buckets.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id").as("d1"), col("hs").as("hs1"),
        col("n").as("n1"), col("band"), col("sig"))
    val y = buckets.select(col("doc_id").as("d2"), col("hs").as("hs2"),
      col("n").as("n2"), col("band").as("band2"), col("sig").as("sig2"))
    val i = call_function(graft.expr.VectorExprs.intersectName,
      col("hs1"), col("hs2"))
    // broadcast for the same reason as ngramJaccard: hash-shuffling on
    // (band, sig) strands a self-similar corpus on a handful of cores;
    // at 100 TB (no broadcast) shuffle on (band, sig) and let AQE split
    // skewed buckets.
    x.join(broadcast(y),
        col("band") === col("band2") && col("sig") === col("sig2") &&
          col("d1") < col("d2") &&
          // necessary condition: j >= t implies min(n)/max(n) >= t
          least(col("n1"), col("n2")).cast("double") >=
            greatest(col("n1"), col("n2")).cast("double") * threshold)
      .select(col("d1"), col("d2"),
        (i.cast("double") / (col("n1") + col("n2") - i).cast("double")).as("j"))
      .filter(col("j") >= threshold)
      .distinct()
  }

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    minhashLsh(Tables.documents(spark, dir)).orderBy("d1", "d2")
  }

  // ---------------------------------------------------- dedup_simhash
  /** 32-bit SimHash per doc (majority vote per bit over token hashes);
    * candidates share a 16-bit band, verified by XOR popcount ≤ maxHam.
    * Rows-only driver check; DedupSpec asserts determinism + symmetry. */
  def simhash(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val tok = tokens(docs).withColumn("h", xxhash64(col("w")))
    val bitAggs = (0 until 32).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val votes = tok.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 32).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    val sigs = votes.select(col("doc_id"), sig.as("sh"))
      .withColumn("hi", shiftright(col("sh"), 16))
    val pairs = sigs.as("x").join(sigs.as("y"),
        col("x.hi") === col("y.hi") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
    pairs.filter(col("hamming") <= maxHamming)
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhash(Tables.documents(spark, dir)).orderBy("d1", "d2")

  // -------------------------------------------------- dedup_embedding
  /** Dot product in double with a strict left-to-right fold (the fold
    * order is part of the oracle contract — identical on both engines). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product (graft.expr.DotProduct) — same accumulation
    * order as [[dot]], ~10× faster on pair joins because the HOF
    * formulation is CodegenFallback. Callers must have run
    * `VectorExprs.register(spark)` (or the GraftExtensions config). */
  def fastDot(x: Column, y: Column): Column =
    call_function(graft.expr.VectorExprs.dotName, x, y)

  /** Cosine similarity of two raw embedding arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2-normalize embeddings ONCE (O(n)), so every pair comparison is a
    * single dot product instead of three — the difference between
    * O(n·d) and O(n²·d) extra work when pairing. */
  def normalized(emb: DataFrame): DataFrame = {
    val e = transform(col("embedding"), x => x.cast("double"))
    emb.withColumn("_n", sqrt(dot(e, e)))
      .select(col("vec_id"), transform(e, x => x / col("_n")).as("e"))
  }

  /** Embedding-cosine near-dup pairs over pre-normalized vectors; only
    * ids cross the oracle boundary (never float scores — SURVEY §5).
    * The O(n²) pair filter runs the codegen'd dot. */
  def embeddingPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val n = normalized(emb)
    // the O(n²) loop-join's parallelism = streamed-side partitions; a
    // small embedding table is one parquet split, so spread it first
    val a = n.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("id1"), col("e").as("e1"))
    val b = n.select(col("vec_id").as("id2"), col("e").as("e2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .filter(fastDot(col("e1"), col("e2")) >= threshold)
      .select("id1", "id2")
  }

  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    embeddingPairs(Tables.embeddings(spark, dir), 0.40).orderBy("id1", "id2")
  }

  val dedupEmbeddingSql: String =
    """WITH n AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS e
      |  FROM embeddings)
      |SELECT a.vec_id AS id1, b.vec_id AS id2
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.e, b.e) >= 0.40
      |ORDER BY id1, id2""".stripMargin

  // ------------------------------------------------------ dedup_apply
  /** Apply near-dup pairs to the corpus: greedy keeper selection — in
    * every pair (d1 < d2) the smaller id survives, so any doc that
    * appears as a d2 is dropped. (True connected-components keeps one
    * doc per cluster via iterative min-label propagation; greedy is the
    * standard single-pass choice and never drops both sides.) */
  def applyPairs(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("d2").as("_drop")).distinct(),
      col("doc_id") === col("_drop"), "left_anti")

  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val docs = Tables.documents(spark, dir)
    applyPairs(docs, ngramJaccard(docs, 0.9))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("lang")
  }

  val dedupApplySql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(list_distinct(regexp_split_to_array(text, '\s+'))) AS w
      |  FROM documents),
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
      |SELECT lang, COUNT(*) AS n_kept FROM documents
      |WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM pairs)
      |GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_apply" -> (dedupApply _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgram _),
    "dedup_minhash_lsh" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _))

  /** minhash/simhash rely on xxhash64 (not reproducible in the oracle
    * engine) → rows-only checks; their semantics are pinned by
    * DedupSpec against the exact-Jaccard oracle-verified pairs. */
  val oracles: Map[String, String] = Map(
    "dedup_apply" -> dedupApplySql,
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramSql,
    "dedup_embedding" -> dedupEmbeddingSql)
}
