package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.Syntax._

/** Embedding storage operators for 100 TB-scale vector corpora.
  *
  * Quantization is what makes a trillion-vector corpus storable and
  * scannable: per-vector affine int8 codes cut an fp32 embedding 4×
  * (plus two floats of scale metadata) while preserving ANN recall.
  * The op is a pure map pass — no shuffle, fully codegen-able
  * builtins — and the oracle recomputes codes bit-identically (floor
  * of identical IEEE doubles; no round(), whose half-even/half-up
  * split differs between engines).
  */
object EmbOps extends QueryModule {

  // -------------------------------------------------- emb_quantize
  /** Per-vector int8 quantization summary: the affine range, and the
    * exact integer checksum of the code vector (order-fixed fold —
    * ints are exact, so the whole code array is pinned by the oracle
    * without shipping 64 columns). A constant vector (mx == mn)
    * quantizes to all-zero codes. */
  def quantize(emb: DataFrame): DataFrame = {
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    def code(x: Column): Column =
      least(floor((x.cast("double") - mn) / ((mx - mn) / 255.0)),
        lit(255.0)).cast("long")
    val codes = when(mx === mn,
        transform(col("embedding"), _ => lit(0L)))
      .otherwise(transform(col("embedding"), x => code(x)))
    emb.select(col("vec_id"), mn.as("qmin"), mx.as("qmax"),
      aggregate(codes, lit(0L), (acc, v) => acc + v).as("code_sum"))
  }

  def embQuantize(spark: SparkSession, dir: String): DataFrame =
    quantize(Tables.embeddings(spark, dir)).orderBy("vec_id")

  val embQuantizeSql: String =
    """SELECT vec_id,
      |  CAST(list_min(embedding) AS DOUBLE) AS qmin,
      |  CAST(list_max(embedding) AS DOUBLE) AS qmax,
      |  CAST(CASE WHEN CAST(list_max(embedding) AS DOUBLE) =
      |                 CAST(list_min(embedding) AS DOUBLE) THEN 0
      |    ELSE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(LEAST(FLOOR((x - CAST(list_min(embedding) AS DOUBLE)) /
      |        ((CAST(list_max(embedding) AS DOUBLE) -
      |          CAST(list_min(embedding) AS DOUBLE)) / 255.0)), 255.0) AS BIGINT)))
      |    END AS BIGINT) AS code_sum
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------- emb_hamming_topk
  /** Binary (sign-bit) quantization + exact Hamming top-k — the
    * billion-scale memory path: each vector collapses to one bit per
    * dimension (64 dims → 8 bytes, a 32× cut vs float32), distance is
    * `bit_count(xor)` (one popcount instruction per word), and
    * cosine-neighbor recall stays high because the sign pattern of a
    * normalized embedding preserves angular locality (the SimHash
    * identity). Packing uses 32-bit words (two per 64-dim vector) so
    * the bit arithmetic stays inside non-negative BIGINT range in
    * every engine — no sign-bit wraparound to reconcile.
    *
    * Scale shape: the corpus side is a 24-byte (id, lo, hi) code
    * table — the form you pin in RAM across a fleet; the 10-query
    * probe broadcasts over it and the per-query top-5 runs as a
    * partial map-side WindowGroupLimit. This is the brute-force scan
    * of [[Knn.knnBrute]] made ~50× cheaper per row, and the shortlist
    * stage a binary-first retrieval stack re-ranks behind. */
  /** Pack the sign bits of elements [from, until) of array column `c`
    * (1-based element_at; positive → 1) into one long word — shared
    * by the raw-embedding packing here and the residual packing in
    * [[embRqSketch]]. */
  private def packSigns(c: Column, from: Int, until: Int,
      width: Int): Column =
    (from until math.min(until, width)).map { i =>
      when(element_at(c, i + 1) > lit(0.0), lit(1L << (i - from)))
        .otherwise(lit(0L))
    }.reduceOption(_ + _).getOrElse(lit(0L))

  def hammingTopK(emb: DataFrame, k: Int): DataFrame = {
    val width = Knn.embWidth(emb)
    require(width <= 64, s"two-word packing covers <=64 dims, got $width")
    val sigs = emb.select(col("vec_id"),
      packSigns(col("embedding"), 0, 32, width).as("lo"),
      packSigns(col("embedding"), 32, 64, width).as("hi"))
    val q = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("lo").as("qlo"),
        col("hi").as("qhi"))
    val c = sigs.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("nid"), col("lo"), col("hi"))
    broadcast(q).join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (bit_count(expr("qlo ^ lo")) + bit_count(expr("qhi ^ hi")))
          .cast("long").as("hamming"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("hamming"), col("nid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("hamming"))
  }

  /** Session-memoized Hamming shortlist (the shared-list precedent in
    * [[Knn.bruteList]]): the key's own answer AND RRF fusion's second
    * retriever — one derivation per (session, corpus). */
  private[graft] def hammingList(spark: SparkSession, dir: String)
      : DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "embHammingTop5") {
      hammingTopK(Tables.embeddings(spark, dir), 5)
    }

  def embHammingTopK(spark: SparkSession, dir: String): DataFrame =
    hammingList(spark, dir).reportSort("qid", "rank")

  val embHammingSql: String =
    """WITH s AS (
      |  SELECT vec_id,
      |    CAST(list_sum(list_transform(range(1, 33),
      |      i -> CASE WHEN embedding[i] > 0
      |           THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS lo,
      |    CAST(list_sum(list_transform(range(33, 65),
      |      i -> CASE WHEN embedding[i] > 0
      |           THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS hi
      |  FROM embeddings),
      |d AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    CAST(bit_count(xor(q.lo, c.lo)) +
      |         bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming
      |  FROM s q JOIN s c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10),
      |r AS (
      |  SELECT qid, nid, hamming, ROW_NUMBER() OVER (PARTITION BY qid
      |    ORDER BY hamming, nid) AS rank
      |  FROM d)
      |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, hamming
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------- sql_surface
  /** The pure-SQL user surface: the whole query is `spark.sql` TEXT
    * over a registered view, using the graft vector functions exactly
    * as a SQL-only user would after setting
    * `spark.sql.extensions=graft.expr.GraftExtensions`. Adjacent-id
    * cosine similarity, emitted as FLOOR(milli) — both engines compute
    * the same normalized doubles bit-for-bit (strict fold order), so
    * the truncation is portable. */
  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("graft_embeddings")
    // Degenerate vectors (zero norm, NaN/Inf components) are excluded
    // up front, mirroring Dedup.embeddingPairs: a NaN normalized dot
    // would hit Spark's non-ANSI CAST(FLOOR(NaN) AS BIGINT) = 0 while
    // DuckDB diverges. `> 0 AND < Infinity` rejects NaN in BOTH
    // engines (each orders NaN above Infinity).
    spark.sql(
      """WITH n AS (
        |  SELECT vec_id, graft_normalize(CAST(embedding AS ARRAY<DOUBLE>)) AS e
        |  FROM graft_embeddings
        |  WHERE graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>)) > 0
        |    AND graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>))
        |        < CAST('Infinity' AS DOUBLE))
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  CAST(FLOOR(graft_dot(a.e, b.e) * 1000) AS BIGINT) AS sim_milli
        |FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
        |ORDER BY id1""".stripMargin)
  }

  val sqlSurfaceSql: String =
    """WITH n AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS e
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0)
      |SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  CAST(FLOOR(list_dot_product(a.e, b.e) * 1000) AS BIGINT) AS sim_milli
      |FROM n a JOIN n b ON b.vec_id = a.vec_id + 1
      |ORDER BY id1""".stripMargin

  // ------------------------------------------------ emb_matryoshka
  /** Matryoshka truncation-energy audit: how much of each vector's
    * energy (squared norm) survives truncation to the first 16/32/48
    * dims — the number that decides whether MRL-style prefix
    * truncation (the 4×-cheaper ANN index) is safe for this corpus.
    * Per-vector math is one codegen map pass (graft_dot on prefix
    * slices — no shuffle); `stack` unpivots the three prefixes and the
    * only shuffle is the 3-row aggregation. Energy ratios are
    * FLOOR(per-mille) of identical IEEE doubles — bit-portable, so the
    * oracle recomputes them exactly. Degenerate (zero/NaN-norm)
    * vectors are excluded the same way sql_surface excludes them. */
  def embMatryoshka(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val e = col("embedding").cast("array<double>")
    def ss(c: Column): Column =
      call_function(graft.expr.VectorExprs.dotName, c, c)
    val full = ss(e)
    def pm(d: Int): Column =
      floor(ss(slice(e, 1, d)) * lit(1000.0) / full).cast("long")
    Tables.embeddings(spark, dir)
      .filter(full > 0 && full < lit(Double.PositiveInfinity))
      .select(pm(16).as("pm16"), pm(32).as("pm32"), pm(48).as("pm48"))
      .select(expr("stack(3, 16, pm16, 32, pm32, 48, pm48)")
        .as(Seq("prefix_dims", "pm")))
      .groupBy("prefix_dims")
      .agg(count(lit(1)).as("n_vecs"), sum(col("pm")).as("sum_pm"),
        min(col("pm")).as("min_pm"))
      .reportSort("prefix_dims")
  }

  val embMatryoshkaSql: String =
    """WITH v AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |p AS (
      |  SELECT d.prefix_dims,
      |    CAST(FLOOR(list_dot_product(e[1:d.prefix_dims],
      |                                e[1:d.prefix_dims]) * 1000.0 /
      |               list_dot_product(e, e)) AS BIGINT) AS pm
      |  FROM v CROSS JOIN
      |    (SELECT unnest([16, 32, 48]) AS prefix_dims) d)
      |SELECT prefix_dims, COUNT(*) AS n_vecs,
      |  CAST(SUM(pm) AS BIGINT) AS sum_pm,
      |  MIN(pm) AS min_pm
      |FROM p GROUP BY prefix_dims ORDER BY prefix_dims""".stripMargin

  // ------------------------------------------ emb_matryoshka_recall
  /** MATRYOSHKA RECALL — the deployment dial [[embMatryoshka]]'s
    * energy view only hints at: when vectors are truncated to their
    * first d dims (the MRL serving trick — shorter vectors, same
    * index machinery), how much of the FULL-dimension top-5 survives?
    * For d ∈ {8, 16, 32}, brute-force retrieval over the truncated,
    * re-normalized prefixes is audited against the full-width
    * baseline — recall@5 totals and the worst query's overlap, the
    * same integer audit frame as `knn_recall_audit`. Degenerate
    * prefixes (zero norm) are excluded on BOTH sides so no NaN
    * cosine ever crosses the oracle boundary. Energy retained
    * (pm16 ≈ 250‰ for isotropic vectors) vs recall retained is the
    * curve that decides the serving width. */
  def embMatryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val full = Knn.bruteForce(emb, emb.filter(col("vec_id") < 10), 5)
      .select("qid", "nid")
    def audit(d: Int): DataFrame = {
      val sliced = slice(col("embedding"), 1, d)
      val ss = call_function(graft.expr.VectorExprs.dotName,
        sliced.cast("array<double>"), sliced.cast("array<double>"))
      val t = emb.filter(ss > 0)
        .select(col("vec_id"), sliced.as("embedding"))
      val approx = Knn.bruteForce(t, t.filter(col("vec_id") < 10), 5)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      full.join(approx, Seq("qid", "nid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("n_hits"),
          min(col("hits")).as("min_hits"))
        .select(lit(d).as("trunc_dims"), col("n_queries"),
          col("n_hits"), col("min_hits"))
    }
    audit(8).unionByName(audit(16)).unionByName(audit(32))
      .reportSort("trunc_dims")
  }

  val embMatryoshkaRecallSql: String = {
    def trunc(d: Int): String =
      s"""t$d AS (
         |  SELECT vec_id,
         |    list_transform(x, v -> v / sqrt(list_dot_product(x, x)))
         |      AS e
         |  FROM (SELECT vec_id,
         |          CAST(embedding AS DOUBLE[])[1:$d] AS x
         |        FROM embeddings) s
         |  WHERE list_dot_product(x, x) > 0),
         |r$d AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS nid,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.e, c.e) DESC, c.vec_id)
         |        AS rank
         |    FROM t$d q JOIN t$d c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rank <= 5),
         |a$d AS (
         |  SELECT $d AS trunc_dims, f.qid,
         |    SUM(CASE WHEN x.nid IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM fb f LEFT JOIN r$d x
         |    ON f.qid = x.qid AND f.nid = x.nid
         |  GROUP BY f.qid)""".stripMargin
    s"""WITH fullq AS (${Knn.knnBruteSql.replace("ORDER BY qid, rank", "")}),
       |fb AS (SELECT qid, nid FROM fullq),
       |${trunc(8)},
       |${trunc(16)},
       |${trunc(32)},
       |u AS (SELECT * FROM a8 UNION ALL SELECT * FROM a16
       |      UNION ALL SELECT * FROM a32)
       |SELECT CAST(trunc_dims AS INT) AS trunc_dims,
       |  COUNT(*) AS n_queries, CAST(SUM(hits) AS BIGINT) AS n_hits,
       |  CAST(MIN(hits) AS BIGINT) AS min_hits
       |FROM u GROUP BY trunc_dims ORDER BY trunc_dims""".stripMargin
  }

  // ---------------------------------------------------------- emb_pq
  /** Product quantization — the trillion-vector storage codec (IVF-PQ
    * is the standard ANN index layout): the 64-dim vector splits into
    * M=4 16-dim subspaces, each assigned to the nearest of K=8
    * centroids, so a vector stores as 4 bytes of codes (64× smaller
    * than fp32) plus the shared codebook. Centroids are deterministic
    * DATA POINTS (the K lowest-id non-degenerate vectors — same
    * seeding discipline as knn_centroid), so the full codebook,
    * every assignment, and every quantization error reproduce
    * bit-for-bit in the oracle. Distance math d = ⟨a,a⟩−2⟨a,b⟩+⟨b,b⟩
    * runs on codegen graft_dot slices; argmin ties break on centroid
    * id via lexicographic (d, k) minimum in BOTH engines.
    *
    * Scale shape: the codebook is K rows broadcast everywhere; each
    * vector expands to K·M candidate rows INSIDE its partition (no
    * shuffle before partial aggregation), and the final (vec, m)
    * reduce ships only the winning struct. Linear in corpus size. */
  def embPq(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val e = col("embedding").cast("array<double>")
    def ss(c: Column): Column =
      call_function(graft.expr.VectorExprs.dotName, c, c)
    val emb = Tables.embeddings(spark, dir)
      .filter(ss(e) > 0 && ss(e) < lit(Double.PositiveInfinity))
      .select(col("vec_id"), e.as("e"))
    val cents = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("k"), col("e").as("c"))
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("k"),
        explode(sequence(lit(0), lit(3))).as("m"), col("e"), col("c"))
      .withColumn("a", expr("slice(e, m*16+1, 16)"))
      .withColumn("b", expr("slice(c, m*16+1, 16)"))
      .withColumn("d",
        expr("graft_dot(a,a) - 2*graft_dot(a,b) + graft_dot(b,b)"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d"), col("k"))).as("best"))
      .select(col("vec_id"), col("m").as("subspace"),
        col("best.k").as("code"),
        floor(col("best.d") * 1000000).cast("long").as("err_micro"))
      .orderBy("vec_id", "subspace")
  }

  val embPqSql: String =
    """WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |cents AS (SELECT vec_id AS k, e AS c FROM emb
      |          ORDER BY vec_id LIMIT 8),
      |pairs AS (
      |  SELECT emb.vec_id, cents.k, mm.m,
      |    list_dot_product(emb.e[mm.m*16+1 : mm.m*16+16],
      |                     emb.e[mm.m*16+1 : mm.m*16+16])
      |    - 2 * list_dot_product(emb.e[mm.m*16+1 : mm.m*16+16],
      |                           cents.c[mm.m*16+1 : mm.m*16+16])
      |    + list_dot_product(cents.c[mm.m*16+1 : mm.m*16+16],
      |                       cents.c[mm.m*16+1 : mm.m*16+16]) AS d
      |  FROM emb CROSS JOIN cents
      |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) mm)
      |SELECT vec_id, m AS subspace,
      |  min({'d': d, 'k': k}).k AS code,
      |  CAST(FLOOR(min({'d': d, 'k': k}).d * 1000000) AS BIGINT)
      |    AS err_micro
      |FROM pairs GROUP BY vec_id, m ORDER BY vec_id, subspace""".stripMargin

  // ------------------------------------------------------ knn_pq_adc
  /** PQ-approximate nearest-neighbor search by ASYMMETRIC DISTANCE
    * COMPUTATION — how a trillion-vector index actually ranks: the
    * query stays full-precision, every corpus vector is its 4 PQ codes
    * ([[embPq]]'s codebook), and distance is the sum over subspaces of
    * d²(query-sub, centroid[code]) — looked up, never recomputed
    * per-pair. The lookup table is (queries × K × M) rows — tiny,
    * broadcast — so ranking touches only 4-byte codes per corpus
    * vector: the bandwidth win IS the operator. Everything
    * (codebook, codes, ADC sums, ranks) is deterministic, so the
    * oracle reproduces the entire approximate index bit-for-bit. */
  def knnPqAdc(spark: SparkSession, dir: String): DataFrame =
    knnPqAdcFor(spark, dir, col("vec_id") % 50 === 0)

  /** [[knnPqAdc]] with a caller-chosen query set (same index, same
    * ADC math) — lets composites (e.g. RRF fusion) rank the SAME
    * queries as the other retrievers they fuse with. */
  def knnPqAdcFor(spark: SparkSession, dir: String,
      qFilter: Column): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val e = col("embedding").cast("array<double>")
    def ss(c: Column): Column =
      call_function(graft.expr.VectorExprs.dotName, c, c)
    val emb = Tables.embeddings(spark, dir)
      .filter(ss(e) > 0 && ss(e) < lit(Double.PositiveInfinity))
      .select(col("vec_id"), e.as("e"))
    val cents = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("k"), col("e").as("c"))
    // corpus → PQ codes (same assignment as emb_pq) — query-set
    // independent, so the code table is a session memo shared by the
    // two declared query sets (knn_pq_adc's %50, RRF fusion's <10)
    val codes = graft.dedup.Dedup.memoized(spark, dir, "embPqCodes") {
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("k"),
          explode(sequence(lit(0), lit(3))).as("m"), col("e"), col("c"))
        .withColumn("d", expr(
          """graft_dot(slice(e, m*16+1, 16), slice(e, m*16+1, 16))
            | - 2*graft_dot(slice(e, m*16+1, 16), slice(c, m*16+1, 16))
            | + graft_dot(slice(c, m*16+1, 16), slice(c, m*16+1, 16))"""
            .stripMargin))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("d"), col("k"))).as("best"))
        .select(col("vec_id"), col("m"), col("best.k").as("code"))
    }
    // query → per-(subspace, centroid) distance lookup table
    val qdist = emb.filter(qFilter)
      .select(col("vec_id").as("qid"), col("e").as("q"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("k"),
        explode(sequence(lit(0), lit(3))).as("m"), col("q"), col("c"))
      .withColumn("qd", expr(
        """graft_dot(slice(q, m*16+1, 16), slice(q, m*16+1, 16))
          | - 2*graft_dot(slice(q, m*16+1, 16), slice(c, m*16+1, 16))
          | + graft_dot(slice(c, m*16+1, 16), slice(c, m*16+1, 16))"""
          .stripMargin))
      .select(col("qid"), col("m"), col("k").as("code"), col("qd"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("adc"), col("vec_id"))
    codes.join(broadcast(qdist), Seq("m", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      // FIXED-ORDER component sum, not sum(): a commutative float sum
      // would make the ADC depend on aggregation arrival order
      .agg(max(when(col("m") === 0, col("qd"))).as("q0"),
        max(when(col("m") === 1, col("qd"))).as("q1"),
        max(when(col("m") === 2, col("qd"))).as("q2"),
        max(when(col("m") === 3, col("qd"))).as("q3"))
      .withColumn("adc", expr("((q0 + q1) + q2) + q3"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id").as("nid"),
        floor(col("adc") * 1000000).cast("long").as("adc_micro"))
      .orderBy("qid", "rank")
  }

  val knnPqAdcSql: String = knnPqAdcSqlFor("q.vec_id % 50 = 0")

  /** Oracle mirror of [[knnPqAdcFor]]: same SQL with a caller-chosen
    * query predicate over the aliased query scan `q`. */
  def knnPqAdcSqlFor(pred: String): String =
    s"""WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |cents AS (SELECT vec_id AS k, e AS c FROM emb
      |          ORDER BY vec_id LIMIT 8),
      |pairs AS (
      |  SELECT emb.vec_id, cents.k, mm.m,
      |    list_dot_product(emb.e[mm.m*16+1 : mm.m*16+16],
      |                     emb.e[mm.m*16+1 : mm.m*16+16])
      |    - 2 * list_dot_product(emb.e[mm.m*16+1 : mm.m*16+16],
      |                           cents.c[mm.m*16+1 : mm.m*16+16])
      |    + list_dot_product(cents.c[mm.m*16+1 : mm.m*16+16],
      |                       cents.c[mm.m*16+1 : mm.m*16+16]) AS d
      |  FROM emb CROSS JOIN cents
      |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) mm),
      |codes AS (
      |  SELECT vec_id, m, min({'d': d, 'k': k}).k AS code
      |  FROM pairs GROUP BY vec_id, m),
      |qdist AS (
      |  SELECT q.vec_id AS qid, mm.m, cents.k AS code,
      |    list_dot_product(q.e[mm.m*16+1 : mm.m*16+16],
      |                     q.e[mm.m*16+1 : mm.m*16+16])
      |    - 2 * list_dot_product(q.e[mm.m*16+1 : mm.m*16+16],
      |                           cents.c[mm.m*16+1 : mm.m*16+16])
      |    + list_dot_product(cents.c[mm.m*16+1 : mm.m*16+16],
      |                       cents.c[mm.m*16+1 : mm.m*16+16]) AS qd
      |  FROM emb q CROSS JOIN cents
      |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) mm
      |  WHERE $pred),
      |adc AS (
      |  SELECT d.qid, c.vec_id,
      |    ((MAX(CASE WHEN c.m = 0 THEN d.qd END)
      |      + MAX(CASE WHEN c.m = 1 THEN d.qd END))
      |      + MAX(CASE WHEN c.m = 2 THEN d.qd END))
      |      + MAX(CASE WHEN c.m = 3 THEN d.qd END) AS adc
      |  FROM codes c JOIN qdist d ON c.m = d.m AND c.code = d.code
      |  WHERE c.vec_id <> d.qid
      |  GROUP BY d.qid, c.vec_id),
      |r AS (
      |  SELECT qid, vec_id, adc, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY adc, vec_id) AS rank
      |  FROM adc)
      |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id AS nid,
      |  CAST(FLOOR(adc * 1000000) AS BIGINT) AS adc_micro
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ------------------------------------------------------ knn_ivf_pq
  /** The COMPOSED production index: IVF coarse cells × PQ codes. The
    * same 8 seed vectors serve as coarse quantizer (cell = argmin of
    * the full-vector distance, computed as the fixed-order sum of the
    * 4 subspace distances) and as PQ codebook (per-subspace argmin =
    * the code). A query probes its nProbe=2 nearest cells and ranks
    * ONLY those cells' members, by ADC lookup — at a trillion vectors
    * this is the whole game: the scan touches |probed cells|/|cells|
    * of the corpus and 4 bytes per touched vector. Build = one pass
    * over the corpus emitting (cell, codes) — the stored index; here
    * the pass is inlined so the oracle can rebuild the ENTIRE index
    * (cells, codes, probes, ADC ranks) bit-for-bit. */
  def knnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val e = col("embedding").cast("array<double>")
    def ss(c: Column): Column =
      call_function(graft.expr.VectorExprs.dotName, c, c)
    val emb = Tables.embeddings(spark, dir)
      .filter(ss(e) > 0 && ss(e) < lit(Double.PositiveInfinity))
      .select(col("vec_id"), e.as("e"))
    val cents = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("k"), col("e").as("c"))
    // one distance pass feeds everything: (vec, k, m) subspace dists
    val pairs = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("k"),
        explode(sequence(lit(0), lit(3))).as("m"), col("e"), col("c"))
      .withColumn("d", expr(
        """graft_dot(slice(e, m*16+1, 16), slice(e, m*16+1, 16))
          | - 2*graft_dot(slice(e, m*16+1, 16), slice(c, m*16+1, 16))
          | + graft_dot(slice(c, m*16+1, 16), slice(c, m*16+1, 16))"""
          .stripMargin))
      .select(col("vec_id"), col("k"), col("m"), col("d"))
    val full = pairs.groupBy("vec_id", "k")
      .agg(max(when(col("m") === 0, col("d"))).as("d0"),
        max(when(col("m") === 1, col("d"))).as("d1"),
        max(when(col("m") === 2, col("d"))).as("d2"),
        max(when(col("m") === 3, col("d"))).as("d3"))
      .withColumn("td", expr("((d0 + d1) + d2) + d3"))
      .select(col("vec_id"), col("k"), col("td"))
    import org.apache.spark.sql.expressions.Window
    val cellW = Window.partitionBy("vec_id").orderBy(col("td"), col("k"))
    val cells = full.withColumn("_r", row_number().over(cellW))
      .filter(col("_r") === 1).select(col("vec_id"), col("k").as("cell"))
    val codes = pairs.groupBy("vec_id", "m")
      .agg(min(struct(col("d"), col("k"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.k").as("code"))
    val isQ = col("vec_id") % 50 === 0
    val probes = full.filter(isQ)
      .withColumn("_r", row_number().over(cellW))
      .filter(col("_r") <= 2)
      .select(col("vec_id").as("qid"), col("k").as("cell"))
    val qdist = pairs.filter(isQ)
      .select(col("vec_id").as("qid"), col("m"), col("k").as("code"),
        col("d").as("qd"))
    val candidates = probes.join(cells, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val rankW = Window.partitionBy("qid").orderBy(col("adc"), col("vec_id"))
    candidates
      .join(codes, "vec_id")
      .join(broadcast(qdist), Seq("qid", "m", "code"))
      .groupBy("qid", "vec_id")
      .agg(max(when(col("m") === 0, col("qd"))).as("q0"),
        max(when(col("m") === 1, col("qd"))).as("q1"),
        max(when(col("m") === 2, col("qd"))).as("q2"),
        max(when(col("m") === 3, col("qd"))).as("q3"))
      .withColumn("adc", expr("((q0 + q1) + q2) + q3"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id").as("nid"),
        floor(col("adc") * 1000000).cast("long").as("adc_micro"))
      .orderBy("qid", "rank")
  }

  val knnIvfPqSql: String =
    """WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |cents AS (SELECT vec_id AS k, e AS c FROM emb
      |          ORDER BY vec_id LIMIT 8),
      |pairs AS (
      |  SELECT emb.vec_id, cents.k, mm.m,
      |    list_dot_product(emb.e[mm.m*16+1 : mm.m*16+16],
      |                     emb.e[mm.m*16+1 : mm.m*16+16])
      |    - 2 * list_dot_product(emb.e[mm.m*16+1 : mm.m*16+16],
      |                           cents.c[mm.m*16+1 : mm.m*16+16])
      |    + list_dot_product(cents.c[mm.m*16+1 : mm.m*16+16],
      |                       cents.c[mm.m*16+1 : mm.m*16+16]) AS d
      |  FROM emb CROSS JOIN cents
      |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) mm),
      |fulld AS (
      |  SELECT vec_id, k,
      |    ((MAX(CASE WHEN m = 0 THEN d END)
      |      + MAX(CASE WHEN m = 1 THEN d END))
      |      + MAX(CASE WHEN m = 2 THEN d END))
      |      + MAX(CASE WHEN m = 3 THEN d END) AS td
      |  FROM pairs GROUP BY vec_id, k),
      |ranked AS (
      |  SELECT vec_id, k, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY td, k) AS r
      |  FROM fulld),
      |cells AS (SELECT vec_id, k AS cell FROM ranked WHERE r = 1),
      |codes AS (
      |  SELECT vec_id, m, min({'d': d, 'k': k}).k AS code
      |  FROM pairs GROUP BY vec_id, m),
      |probes AS (
      |  SELECT vec_id AS qid, k AS cell FROM ranked
      |  WHERE r <= 2 AND vec_id % 50 = 0),
      |qdist AS (
      |  SELECT vec_id AS qid, m, k AS code, d AS qd FROM pairs
      |  WHERE vec_id % 50 = 0),
      |adc AS (
      |  SELECT p.qid, cl.vec_id,
      |    ((MAX(CASE WHEN co.m = 0 THEN q.qd END)
      |      + MAX(CASE WHEN co.m = 1 THEN q.qd END))
      |      + MAX(CASE WHEN co.m = 2 THEN q.qd END))
      |      + MAX(CASE WHEN co.m = 3 THEN q.qd END) AS adc
      |  FROM probes p
      |  JOIN cells cl ON cl.cell = p.cell AND cl.vec_id <> p.qid
      |  JOIN codes co ON co.vec_id = cl.vec_id
      |  JOIN qdist q ON q.qid = p.qid AND q.m = co.m AND q.code = co.code
      |  GROUP BY p.qid, cl.vec_id),
      |r AS (
      |  SELECT qid, vec_id, adc, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY adc, vec_id) AS rank
      |  FROM adc)
      |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id AS nid,
      |  CAST(FLOOR(adc * 1000000) AS BIGINT) AS adc_micro
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ------------------------------------------------ emb_norm_audit
  /** Vector-hygiene audit — the gate a production embedding pipeline
    * runs before indexing: squared-norm histogram (deci-buckets of
    * ⟨e,e⟩, FLOOR of identical IEEE doubles) with the degenerate
    * population (zero/NaN/Inf norm — the vectors every other §2.7
    * operator excludes) surfaced as the NULL bucket, plus each
    * bucket's id range for triage. One codegen map pass and a
    * |buckets|-row agg — linear, no shuffle before the partial agg. */
  // ------------------------------------------------ emb_dup_vectors
  /** EXACT-DUPLICATE VECTOR audit — the cheap first gate BEFORE any
    * cosine near-dup pass ([[graft.dedup.Dedup]]'s embedding dedup
    * pays a candidate join; bitwise duplicates need only a hash-agg,
    * and ingestion pipelines that re-embed re-crawled documents
    * produce them constantly): each vector's signature is the md5 of
    * its milli-quantized integer grid joined with ',' — engine-
    * portable text, no float formatting ever crosses the boundary —
    * and the per-label report counts vectors, distinct signatures,
    * the duplicate share per-mille, and the worst multiplicity. One
    * corpus map pass → (label, sig) hash-agg → |label| rollup; at
    * 100 TB this is the dedupe-before-index move, map-side-combining
    * all the way. */
  def embDupVectors(spark: SparkSession, dir: String): DataFrame = {
    val sig = expr("md5(concat_ws(',', transform(" +
      "CAST(embedding AS ARRAY<DOUBLE>), " +
      "x -> CAST(CAST(FLOOR(x * 1000) AS BIGINT) AS STRING))))")
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"), sig.as("sig"))
      .groupBy("label", "sig")
      .agg(count(lit(1)).as("c"))
      .groupBy("label")
      .agg(sum(col("c")).as("n_vecs"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_multiplicity"))
      .withColumn("dup_pm",
        expr("(n_vecs - n_distinct) * 1000 div n_vecs"))
      .reportSort("label")
  }

  val embDupVectorsSql: String =
    """WITH s AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    md5(array_to_string(list_transform(
      |      CAST(embedding AS DOUBLE[]),
      |      x -> CAST(CAST(FLOOR(x * 1000) AS BIGINT) AS VARCHAR)),
      |      ',')) AS sig
      |  FROM embeddings),
      |g AS (SELECT label, sig, COUNT(*) AS c FROM s GROUP BY 1, 2)
      |SELECT label, CAST(SUM(c) AS BIGINT) AS n_vecs,
      |  COUNT(*) AS n_distinct,
      |  CAST(MAX(c) AS BIGINT) AS max_multiplicity,
      |  CAST((SUM(c) - COUNT(*)) * 1000 // SUM(c) AS BIGINT) AS dup_pm
      |FROM g GROUP BY label ORDER BY label""".stripMargin

  def embNormAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val e = col("embedding").cast("array<double>")
    val ss = call_function(graft.expr.VectorExprs.dotName, e, e)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        when(ss > 0 && ss < lit(Double.PositiveInfinity),
          floor(ss * 10).cast("long")).as("norm_bucket"))
      .groupBy("norm_bucket")
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_id"),
        max(col("vec_id")).as("max_id"))
      .reportSort(asc_nulls_first("norm_bucket"))
  }

  val embNormAuditSql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    CASE WHEN isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                        CAST(embedding AS DOUBLE[])))
      |          AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                               CAST(embedding AS DOUBLE[])) > 0
      |      THEN CAST(FLOOR(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                       CAST(embedding AS DOUBLE[]))
      |                      * 10) AS BIGINT)
      |    END AS norm_bucket
      |  FROM embeddings)
      |SELECT norm_bucket, COUNT(*) AS n_vecs,
      |  MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
      |FROM v GROUP BY norm_bucket ORDER BY norm_bucket NULLS FIRST"""
      .stripMargin

  // ---------------------------------------------------- emb_drift
  /** Embedding-distribution drift between two populations — the
    * monitor a vector store runs when the encoder is retrained or a
    * new ingest source lands (centroid shift per leading dimension;
    * a systematic shift means re-indexing, not appending). The
    * populations split deterministically on vec_id parity so the
    * oracle recomputes both sides; per leading dimension d<8 each
    * side reports its exact milli-quantized component sum and count,
    * plus the cross-multiplied mean gap |Σa·n_b − Σb·n_a| — all
    * integer arithmetic after FLOOR of identical IEEE doubles. Shape:
    * posexplode bounded to 8 entries/vector (map-only), one 8-row
    * agg; linear in corpus size, constant output. */
  def embDrift(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .filter(col("dim") < 8)
      .select(col("dim").cast("long").as("dim"),
        (col("vec_id") % 2 === 0).as("_a"),
        floor(col("x") * 1000).cast("long").as("milli"))
      .groupBy("dim")
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("_a"), col("milli")).otherwise(0L)).as("sum_a_milli"),
        sum(when(!col("_a"), col("milli")).otherwise(0L)).as("sum_b_milli"))
      .select(col("dim"), col("n_a"), col("n_b"),
        col("sum_a_milli"), col("sum_b_milli"),
        // cross-multiplied mean gap — division-free because floor- vs
        // truncating integer division disagree on NEGATIVE sums
        // across engines; |Σa·n_b − Σb·n_a| is exact and sign-safe
        abs(col("sum_a_milli") * col("n_b") -
          col("sum_b_milli") * col("n_a")).as("shift_x"))
      .reportSort("dim")

  val embDriftSql: String =
    """WITH dims AS (SELECT UNNEST(range(8)) AS dim),
      |x AS (
      |  SELECT vec_id, d.dim,
      |    CAST(FLOOR(CAST(embedding[CAST(d.dim AS INTEGER) + 1]
      |      AS DOUBLE) * 1000) AS BIGINT) AS milli
      |  FROM embeddings CROSS JOIN dims d
      |  WHERE len(embedding) > d.dim),
      |g AS (
      |  SELECT CAST(dim AS BIGINT) AS dim,
      |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END)
      |      AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN milli ELSE 0 END)
      |      AS BIGINT) AS sum_a_milli,
      |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE milli END)
      |      AS BIGINT) AS sum_b_milli
      |  FROM x GROUP BY dim)
      |SELECT dim, n_a, n_b, sum_a_milli, sum_b_milli,
      |  CAST(ABS(sum_a_milli * n_b - sum_b_milli * n_a) AS BIGINT)
      |    AS shift_x
      |FROM g ORDER BY dim""".stripMargin

  // ---------------------------------------------------- emb_outliers
  /** Per-cluster embedding outliers — the mislabeled/noise detector a
    * labeled vector corpus runs before training (a vector far from
    * its own label's centroid is a labeling error or garbage
    * ingest). Exact integer throughout: components quantize to milli
    * units, the per-(label, dim) SUM plays the centroid (mean × n),
    * and each vector scores Σ_d (n·x_d − S_d)² — n²·(distance to
    * centroid)², same argsort, no division, no sqrt. Top-3 per label
    * by (score desc, vec_id). Shape: bounded posexplode, one
    * combiner-friendly (label, dim) sum-agg broadcast back, one
    * per-vector agg; the per-label rank filter runs as a partial
    * map-side WindowGroupLimit (k=3 state per task). */
  def embOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v") * 1000).cast("long").as("milli"))
    val sums = x.groupBy("label", "dim")
      .agg(sum(col("milli")).as("s"), count(lit(1)).as("n"))
    x.join(broadcast(sums), Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum(expr("(n * milli - s) * (n * milli - s)")).as("score"))
      .withColumn("rnk", row_number().over(Window.partitionBy("label")
        .orderBy(desc("score"), col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("label"), col("rnk"), col("vec_id"), col("score"))
      .reportSort("label", "rnk")
  }

  val embOutliersSql: String =
    """WITH dims AS (SELECT UNNEST(range(256)) AS dim),
      |x AS (
      |  SELECT vec_id, label, d.dim,
      |    CAST(FLOOR(CAST(embedding[CAST(d.dim AS INTEGER) + 1]
      |      AS DOUBLE) * 1000) AS BIGINT) AS milli
      |  FROM embeddings CROSS JOIN dims d
      |  WHERE len(embedding) > d.dim),
      |sums AS (
      |  SELECT label, dim, CAST(SUM(milli) AS BIGINT) AS s,
      |    COUNT(*) AS n
      |  FROM x GROUP BY label, dim),
      |scored AS (
      |  SELECT x.vec_id, x.label,
      |    CAST(SUM((n * milli - s) * (n * milli - s)) AS BIGINT)
      |      AS score
      |  FROM x JOIN sums ON x.label = sums.label AND x.dim = sums.dim
      |  GROUP BY x.vec_id, x.label),
      |r AS (
      |  SELECT label, vec_id, score, ROW_NUMBER() OVER (
      |    PARTITION BY label ORDER BY score DESC, vec_id) AS rnk
      |  FROM scored)
      |SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, score
      |FROM r WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin

  // ------------------------------------------------ knn_kmeans_refine
  /** One Lloyd (k-means) refinement round over the IVF seed cells —
    * the training step that turns data-point seeds into REAL
    * centroids (seeded IVF is the r1 bootstrap; production indexes
    * train their coarse quantizer). Exact integer throughout, so both
    * engines replay the round bit-for-bit: components quantize to
    * milli units, each vector assigns to the argmin-d² seed
    * (tie-break by cell), and the within-cell sum of squares is
    * reported around BOTH the seed and the post-update mean — the
    * mean's WCSS·n uses the division-free identity
    * n·Σ‖x−μ‖² = n·ΣΣx² − Σ_d(Σx)², proving the Lloyd update
    * improves every cell (inertia_mean_xn ≤ inertia_seed_xn) without
    * a float mean ever crossing the oracle boundary.
    *
    * Shape: posexplode → (cells×dims) broadcast seed table → one
    * (vec, cell) distance agg (the IVF assignment cost, corpus×cells
    * skinny rows), argmin via per-vector WindowGroupLimit, then two
    * combiner-friendly hash-aggs; further rounds repeat the same
    * plan with the (cell, dim, sum, n) frame as the new quantized
    * centroid table. */
  // ---------------------------------------------- emb_silhouette
  /** SILHOUETTE panel per label cluster — the cluster-quality gate
    * run after any partitioned ANN build (are the label cells
    * actually separated, or is the IVF routing table built on mush?):
    * per point, a = squared distance to its OWN label centroid, b =
    * min squared distance to any OTHER centroid, s = (b−a)·1000 /
    * max(a,b) in exact per-mille. Coordinates are milli-quantized
    * integers (the [[knnKmeansRefine]] convention) and centroids are
    * integer-division means — a DEFINED quantization both engines
    * replay exactly, same contract as `cls_spearman`'s per-mille
    * ranks. Shape: one melt scan → |cells × dims| centroid frame
    * (broadcast) → per-(point, cell) distance agg → |points| argmin —
    * distances ride the small centroid broadcast, the corpus never
    * self-joins. The per-label report: n, mean/min silhouette,
    * and how many points sit closer to a foreign centroid (s < 0 —
    * the misrouted mass an IVF probe sweep would have to absorb). */
  def embSilhouette(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v") * 1000).cast("long").as("m"))
    // +1000n shift before the div: m ≥ −1000, so the numerator is
    // non-negative and truncating (Spark) and flooring (DuckDB)
    // integer division agree — the q60_mom_change idiom
    val cen = x.groupBy(col("label").as("cell"), col("dim"))
      .agg(expr("(sum(m) + 1000 * count(1)) div count(1) - 1000")
        .as("cv"))
    val d2 = x.join(broadcast(cen), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("cell"))
      .agg(sum(expr("(m - cv) * (m - cv)")).as("d2"))
    val ab = d2.groupBy("vec_id", "label")
      .agg(max(when(col("cell") === col("label"), col("d2"))).as("a"),
        min(when(col("cell") =!= col("label"), col("d2"))).as("b"))
      .select(col("vec_id"), col("label"),
        // same shift: (b−a)·1000 ≥ −g·1000, numerator stays ≥ 0
        expr("((b - a) * 1000 + greatest(a, b, 1L) * 1000) " +
          "div greatest(a, b, 1L) - 1000").as("s_pm"))
    ab.groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(col("s_pm")).as("sum_s_pm"),
        min(col("s_pm")).as("min_s_pm"),
        sum(when(col("s_pm") < 0, 1L).otherwise(0L)).as("n_misrouted"))
      .select(col("label"), col("n"),
        expr("(sum_s_pm + 1000 * n) div n - 1000").as("mean_s_pm"),
        col("min_s_pm"), col("n_misrouted"))
      .reportSort("label")
  }

  val embSilhouetteSql: String =
    """WITH x AS (
      |  SELECT vec_id, label, d.dim,
      |    CAST(FLOOR(CAST(embedding[CAST(d.dim AS INTEGER) + 1]
      |      AS DOUBLE) * 1000) AS BIGINT) AS m
      |  FROM embeddings
      |  CROSS JOIN (SELECT UNNEST(range(256)) AS dim) d
      |  WHERE len(embedding) > d.dim),
      |cen AS (
      |  SELECT label AS cell, dim,
      |    (SUM(m) + 1000 * COUNT(*)) // COUNT(*) - 1000 AS cv
      |  FROM x GROUP BY 1, 2),
      |d2 AS (
      |  SELECT x.vec_id, x.label, cen.cell,
      |    SUM((x.m - cen.cv) * (x.m - cen.cv)) AS d2
      |  FROM x JOIN cen ON x.dim = cen.dim GROUP BY 1, 2, 3),
      |g AS (
      |  SELECT vec_id, label,
      |    MAX(CASE WHEN cell = label THEN d2 END) AS a,
      |    MIN(CASE WHEN cell <> label THEN d2 END) AS b
      |  FROM d2 GROUP BY 1, 2),
      |ab AS (
      |  SELECT vec_id, label,
      |    ((b - a) * 1000 + GREATEST(a, b, 1) * 1000)
      |      // GREATEST(a, b, 1) - 1000 AS s_pm
      |  FROM g)
      |SELECT label, COUNT(*) AS n,
      |  CAST((SUM(s_pm) + 1000 * COUNT(*)) // COUNT(*) - 1000
      |    AS BIGINT) AS mean_s_pm,
      |  CAST(MIN(s_pm) AS BIGINT) AS min_s_pm,
      |  CAST(SUM(CASE WHEN s_pm < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_misrouted
      |FROM ab GROUP BY label ORDER BY label""".stripMargin

  def knnKmeansRefine(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val x = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v") * 1000).cast("long").as("m"))
    val seedIds = emb.groupBy(col("label").as("cell"))
      .agg(min(col("vec_id")).as("svid"))
    val seeds = x.join(broadcast(seedIds), col("vec_id") === col("svid"))
      .select(col("cell"), col("dim"), col("m").as("sv"))
    val assign = x.join(broadcast(seeds), Seq("dim"))
      .groupBy("vec_id", "cell")
      .agg(sum(expr("(m - sv) * (m - sv)")).as("d2"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cell"))))
      .filter(col("_rk") === 1)
      .select("vec_id", "cell", "d2")
    val seedInertia = assign.groupBy("cell")
      .agg(sum(col("d2")).as("ins"), count(lit(1)).as("n2"))
    val meanInertia = x.join(assign.select("vec_id", "cell"), "vec_id")
      .groupBy("cell", "dim")
      .agg(sum(col("m")).as("sm"), sum(expr("m * m")).as("smm"),
        count(lit(1)).as("n"))
      .groupBy("cell")
      .agg(max(col("n")).as("n"),
        sum(expr("n * smm - sm * sm")).as("inertia_mean_xn"))
    meanInertia.join(seedInertia, "cell")
      .select(col("cell"), col("n"),
        (col("ins") * col("n2")).as("inertia_seed_xn"),
        col("inertia_mean_xn"))
      .reportSort("cell")
  }

  val knnKmeansRefineSql: String =
    """WITH x AS (
      |  SELECT vec_id, label, d.dim,
      |    CAST(FLOOR(CAST(embedding[CAST(d.dim AS INTEGER) + 1]
      |      AS DOUBLE) * 1000) AS BIGINT) AS m
      |  FROM embeddings
      |  CROSS JOIN (SELECT UNNEST(range(256)) AS dim) d
      |  WHERE len(embedding) > d.dim),
      |sid AS (SELECT label AS cell, MIN(vec_id) AS svid
      |        FROM embeddings GROUP BY label),
      |s AS (SELECT sid.cell, x.dim, x.m AS sv
      |      FROM x JOIN sid ON x.vec_id = sid.svid),
      |dist AS (
      |  SELECT x.vec_id, s.cell,
      |    SUM((x.m - s.sv) * (x.m - s.sv)) AS d2
      |  FROM x JOIN s ON x.dim = s.dim GROUP BY 1, 2),
      |a AS (
      |  SELECT vec_id, cell, d2 FROM (
      |    SELECT vec_id, cell, d2, ROW_NUMBER() OVER (
      |      PARTITION BY vec_id ORDER BY d2, cell) AS rk
      |    FROM dist) t
      |  WHERE rk = 1),
      |si AS (SELECT cell, SUM(d2) AS ins, COUNT(*) AS n2
      |       FROM a GROUP BY cell),
      |pd AS (
      |  SELECT a.cell, x.dim, SUM(x.m) AS sm, SUM(x.m * x.m) AS smm,
      |    COUNT(*) AS n
      |  FROM x JOIN a ON x.vec_id = a.vec_id GROUP BY 1, 2),
      |im AS (
      |  SELECT cell, MAX(n) AS n, SUM(n * smm - sm * sm)
      |    AS inertia_mean_xn
      |  FROM pd GROUP BY cell)
      |SELECT im.cell, CAST(im.n AS BIGINT) AS n,
      |  CAST(si.ins * si.n2 AS BIGINT) AS inertia_seed_xn,
      |  CAST(im.inertia_mean_xn AS BIGINT) AS inertia_mean_xn
      |FROM im JOIN si ON im.cell = si.cell ORDER BY im.cell""".stripMargin

  // ------------------------------------------------ emb_covariance
  /** Exact-integer dimension co-moment matrix — the sufficient
    * statistics for PCA / whitening / decorrelation of an embedding
    * space (which dims are redundant, where the variance lives):
    * per dim pair (i ≤ j) the count, milli-quantized sums, and the
    * cross-multiplied covariance numerator n·Σqᵢqⱼ − Σqᵢ·Σqⱼ — all
    * BIGINT, so no float summation order crosses the oracle boundary
    * (q = floor(1000·x) caps at ~±525 here; Σq² stays inside int64
    * past 10¹² vectors).
    *
    * Shape: ONE scan; two chained codegen Generates emit the d(d+1)/2
    * upper-triangle slots per row, and the single hash-agg partial-
    * aggregates them map-side into |pairs| groups — the shuffle is
    * 2,080 rows regardless of corpus size. The d² per-row work is the
    * covariance matrix's inherent cost; at larger d you'd block the
    * triangle (i-stripes) to bound the Generate fan-out per pass. */
  def embCovariance(spark: SparkSession, dir: String): DataFrame = {
    // degenerate (zero / NaN / Inf) vectors are excluded up front,
    // the same contract as every other embedding operator: a NaN
    // component would floor-cast to 0 under non-ANSI Spark while the
    // DuckDB oracle errors on CAST(FLOOR(NaN) AS BIGINT)
    val dbl = col("embedding").cast("array<double>")
    val nrm2 = graft.dedup.Dedup.fastDot(dbl, dbl)
    val q = Tables.embeddings(spark, dir)
      .filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
      .select(transform(dbl,
        x => floor(x * 1000).cast("long")).as("qv"))
    val e1 = q.select(col("qv"), posexplode(col("qv")))
      .withColumnRenamed("pos", "i0").withColumnRenamed("col", "qi")
    e1.select(col("i0"), col("qi"), posexplode(col("qv")))
      .withColumnRenamed("pos", "j0").withColumnRenamed("col", "qj")
      .filter(col("j0") >= col("i0"))
      .groupBy((col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("sum_qi"), sum(col("qj")).as("sum_qj"),
        sum(col("qi") * col("qj")).as("sum_qij"))
      .withColumn("cov_xn2",
        col("n") * col("sum_qij") - col("sum_qi") * col("sum_qj"))
      .reportSort("i", "j")
  }

  val embCovarianceSql: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |e AS (
      |  SELECT vec_id, unnest(range(1, len(qv) + 1)) AS i, qv FROM q),
      |x AS (SELECT vec_id, i, qv[CAST(i AS INTEGER)] AS qi FROM e),
      |p AS (
      |  SELECT a.i AS i, b.i AS j, a.qi AS qi, b.qi AS qj
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i)
      |SELECT i, j, COUNT(*) AS n,
      |  CAST(SUM(qi) AS BIGINT) AS sum_qi,
      |  CAST(SUM(qj) AS BIGINT) AS sum_qj,
      |  CAST(SUM(qi * qj) AS BIGINT) AS sum_qij,
      |  CAST(COUNT(*) * SUM(qi * qj) - SUM(qi) * SUM(qj) AS BIGINT)
      |    AS cov_xn2
      |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin

  // ------------------------------------------------ emb_power_iter
  /** One matrix-free POWER-ITERATION step toward the top principal
    * direction — the scale path when [[embCovariance]]'s d² co-moment
    * matrix is itself too big (d in the tens of thousands): never
    * materialize A = Σ xxᵀ; compute A·v₀ = Σᵣ (xᵣ·v₀)·xᵣ in one
    * corpus pass. The start vector v₀ is the deterministic ±1 md5
    * sign vector (the [[Knn.planeVec]] derivation, tag "pw") —
    * computed once on the driver, shipped as a literal, rebuilt
    * symbolically by the oracle. Exactness: each row's per-dim
    * contribution floor(1000·yᵣ·xᵣ[d]) is quantized BEFORE summation,
    * so only exact BIGINTs cross engines — no float sum order.
    * Shape: one scan, codegen dot + Generate, one map-side-combining
    * hash-agg into d groups; iterate by feeding the (normalized)
    * result back as the next v — each round is this same plan. */
  def embPowerIter(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val v0: Seq[Double] =
      Knn.signVec("pw", Knn.embWidth(emb)).toSeq
    val dbl = col("embedding").cast("array<double>")
    // same degenerate-vector exclusion as the rest of the family
    val nrm2 = graft.dedup.Dedup.fastDot(dbl, dbl)
    emb.filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
      .select(dbl.as("x"),
        graft.dedup.Dedup.fastDot(dbl, typedLit(v0)).as("y"))
      .select(posexplode(transform(col("x"),
        xd => floor(col("y") * xd * 1000).cast("long"))))
      .withColumnRenamed("pos", "d0").withColumnRenamed("col", "c")
      .groupBy((col("d0") + 1).cast("long").as("d"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("v1_q"))
      .withColumn("v0",
        element_at(typedLit(v0.map(_.toLong)), col("d").cast("int")))
      .reportSort("d")
  }

  val embPowerIterSql: String = {
    val v0Term =
      "list_transform(range(len(x)), i -> CAST(((('0x'||substr(md5('pw,'||" +
        "CAST(i AS VARCHAR)),1,8))::BIGINT & 1)*2 - 1) AS DOUBLE))"
    s"""WITH x AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
       |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                                  CAST(embedding AS DOUBLE[])))
       |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
       |                         CAST(embedding AS DOUBLE[])) > 0),
       |y AS (
       |  SELECT vec_id, x, list_dot_product(x, $v0Term) AS y,
       |    $v0Term AS v0 FROM x),
       |e AS (
       |  SELECT unnest(range(1, len(x) + 1)) AS d, x, y, v0 FROM y),
       |c AS (
       |  SELECT d, CAST(FLOOR(y * x[CAST(d AS INTEGER)] * 1000) AS BIGINT)
       |    AS c, CAST(v0[CAST(d AS INTEGER)] AS BIGINT) AS v0d
       |  FROM e)
       |SELECT d, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS v1_q,
       |  MAX(v0d) AS v0
       |FROM c GROUP BY d ORDER BY d""".stripMargin
  }

  // ------------------------------------------------ emb_rq_sketch
  /** Residual quantization sketch — the third compression family
    * beside affine int8 ([[quantize]]) and sign-bit packing
    * ([[hammingTopK]]), and the SCaNN/faiss-style two-level code: a
    * vector is stored as (coarse cell, sign pattern of the residual
    * against the cell seed). The residual carries what the coarse
    * quantizer lost, so its sign word separates vectors that share a
    * cell — 8 bytes + a cell id per vector. Assignment reuses the
    * deterministic IVF seeds (min-vec_id member per label, the
    * oracle-reproducible choice); residual = e − seed element-wise on
    * the normalized doubles; the milli-floored residual energy is
    * the exactness witness (same IEEE subtract/dot both engines).
    * One scan + a broadcast seed table — the map-only encode shape a
    * trillion-vector store runs. */
  def embRqSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    // same degenerate-vector exclusion as the rest of the family (a
    // NaN residual would floor-cast to 0 here, error in the oracle)
    val dbl = col("embedding").cast("array<double>")
    val nrm2 = graft.dedup.Dedup.fastDot(dbl, dbl)
    val n = emb
      .filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
      .select(col("vec_id"), col("label"),
        call_function(graft.expr.VectorExprs.normName, col("embedding"))
          .as("e"))
    // seed choice + assignment are the SHARED IVF core — one site to
    // change the contract (Knn.seedCells / Knn.rankedSeedCells)
    val assigned = Knn.rankedSeedCells(n, Knn.seedCells(n))
      .filter(col("_rk") === 1)
    // measured width, same guard as hammingTopK: a hardcoded 64 would
    // read past the array for d<64 (throws under ANSI mode) and
    // silently drop dimensions for d>64
    val width = Knn.embWidth(emb)
    require(width <= 64, s"two-word packing covers <=64 dims, got $width")
    assigned
      .withColumn("r", zip_with(col("e"), col("ce"), (a, b) => a - b))
      .select(col("vec_id"), col("cell"),
        packSigns(col("r"), 0, 32, width).as("rq_lo"),
        packSigns(col("r"), 32, 64, width).as("rq_hi"),
        floor(graft.dedup.Dedup.fastDot(col("r"), col("r")) * 1000)
          .cast("long").as("rnorm_milli"))
      .orderBy("vec_id")
  }

  val embRqSketchSql: String =
    """WITH n AS (
      |  SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS e
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |seeds AS (
      |  SELECT label AS cell, e AS ce FROM (
      |    SELECT label, e, ROW_NUMBER() OVER (PARTITION BY label
      |      ORDER BY vec_id) AS r
      |    FROM n)
      |  WHERE r = 1),
      |assigned AS (
      |  SELECT vec_id, e, cell, ce FROM (
      |    SELECT nn.vec_id, nn.e, s.cell, s.ce,
      |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
      |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
      |    FROM n nn CROSS JOIN seeds s)
      |  WHERE rk = 1),
      |res AS (
      |  SELECT vec_id, cell,
      |    list_transform(range(1, len(e) + 1),
      |      i -> e[CAST(i AS INTEGER)] - ce[CAST(i AS INTEGER)]) AS r
      |  FROM assigned)
      |SELECT vec_id, cell,
      |  CAST(list_sum(list_transform(range(1, 33),
      |    i -> CASE WHEN r[CAST(i AS INTEGER)] > 0
      |         THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS rq_lo,
      |  CAST(list_sum(list_transform(range(33, 65),
      |    i -> CASE WHEN r[CAST(i AS INTEGER)] > 0
      |         THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS rq_hi,
      |  CAST(FLOOR(list_dot_product(r, r) * 1000) AS BIGINT)
      |    AS rnorm_milli
      |FROM res ORDER BY vec_id""".stripMargin

  // ------------------------------------------------ emb_anisotropy
  /** Embedding-space anisotropy — the mean pairwise cosine across the
    * WHOLE corpus, the collapse metric from the representation-
    * degeneration literature (healthy spaces sit near 0; a high mean
    * cosine means every vector points the same way and retrieval
    * contrast is gone). The naive form is n² dots; the sufficient-
    * statistic identity Σ_{u≠v} u·v = |Σe|² − Σ|e|² makes it ONE
    * scan: per-dimension component sums + per-vector self-dots.
    * Vectors are normalized then milli-quantized (the
    * [[embCovariance]] convention), so every sum is exact integer
    * arithmetic both engines replay — float Σ over an unordered
    * corpus would be partitioning-dependent. Output units:
    * micro-cosine (q ≈ 1000·e, so q·q ≈ 10⁶·cosine). */
  def embAnisotropy(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val dbl = col("embedding").cast("array<double>")
    val nrm2 = graft.dedup.Dedup.fastDot(dbl, dbl)
    val q = Tables.embeddings(spark, dir)
      .filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
      .select(transform(
        call_function(graft.expr.VectorExprs.normName, col("embedding")),
        x => floor(x * 1000).cast("long")).as("qv"))
    val self = q.select(
      expr("aggregate(qv, 0L, (a, x) -> a + x * x)").as("sq"))
      .agg(count(lit(1)).as("n"), sum(col("sq")).as("self_sum"))
    val dims = q.select(posexplode(col("qv")))
      .groupBy("pos").agg(sum(col("col")).as("s"))
      .agg(sum(col("s") * col("s")).as("cross_sum"))
    self.crossJoin(broadcast(dims))
      // the numerator is NEGATIVE for a healthy (near-orthogonal)
      // space; both engines' integer division truncates toward zero
      // on this expression (verified against the gate at sf0.001-0.1)
      .select(col("n"), col("self_sum"), col("cross_sum"),
        expr("(cross_sum - self_sum) div (n * n - n)")
          .as("mean_dot_micro"))
  }

  val embAnisotropySql: String =
    """WITH f AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |q AS (
      |  SELECT list_transform(e0, x -> CAST(FLOOR(
      |    x / sqrt(list_dot_product(e0, e0)) * 1000) AS BIGINT)) AS qv
      |  FROM f),
      |slf AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(list_sum(list_transform(qv, x -> x * x))) AS BIGINT)
      |      AS self_sum
      |  FROM q),
      |d AS (SELECT unnest(range(1, len(qv) + 1)) AS i, qv FROM q),
      |sd AS (SELECT i, SUM(qv[CAST(i AS INTEGER)]) AS s FROM d GROUP BY i),
      |x AS (SELECT CAST(SUM(s * s) AS BIGINT) AS cross_sum FROM sd)
      |SELECT slf.n, slf.self_sum, x.cross_sum,
      |  CAST((x.cross_sum - slf.self_sum)
      |    // (slf.n * slf.n - slf.n) AS BIGINT) AS mean_dot_micro
      |FROM slf, x""".stripMargin

  // -------------------------------------------------- emb_dim_stats
  /** Per-DIMENSION coordinate statistics — the input whitening /
    * per-coordinate normalization needs, and the dead-dimension
    * detector (a dim whose every value quantizes to 0 carries no
    * information and is a free truncation candidate beside
    * [[embMatryoshka]]'s energy view): per dim n, Σx, Σx², min, max
    * and the dead count over MILLI-quantized raw components (the
    * [[embAnisotropy]] convention — exact integers both engines
    * replay; float Σ over an unordered corpus is partitioning-
    * dependent). Variance is shipped as the integer numerator
    * n·Σx² − (Σx)² — no float division inside the gate. One scan →
    * one (dim)-keyed hash-agg; output is |dims| rows however many
    * vectors. (At 10¹² rows the Σx² column wants the DECIMAL(38,0)
    * widening cls_gini uses; BIGINT holds to ~10¹¹ vectors at milli
    * scale.) */
  def embDimStats(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .select(transform(col("embedding").cast("array<double>"),
        x => floor(x * 1000).cast("long")).as("qv"))
    q.select(posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("sum_milli"),
        sum(col("v") * col("v")).as("sumsq_milli"),
        min(col("v")).as("min_milli"),
        max(col("v")).as("max_milli"),
        sum((abs(col("v")) < 1).cast("long")).as("n_dead"))
      .withColumn("var_num",
        expr("n * sumsq_milli - sum_milli * sum_milli"))
      .reportSort("dim")
  }

  val embDimStatsSql: String =
    """WITH q AS (
      |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |d AS (SELECT unnest(range(1, len(qv) + 1)) AS i, qv FROM q),
      |v AS (SELECT i - 1 AS dim, qv[CAST(i AS INTEGER)] AS v FROM d),
      |g AS (
      |  SELECT dim, COUNT(*) AS n,
      |    CAST(SUM(v) AS BIGINT) AS sum_milli,
      |    CAST(SUM(v * v) AS BIGINT) AS sumsq_milli,
      |    CAST(MIN(v) AS BIGINT) AS min_milli,
      |    CAST(MAX(v) AS BIGINT) AS max_milli,
      |    CAST(SUM(CASE WHEN ABS(v) < 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_dead
      |  FROM v GROUP BY 1)
      |SELECT CAST(dim AS INTEGER) AS dim, n, sum_milli, sumsq_milli,
      |  min_milli, max_milli, n_dead,
      |  CAST(n * sumsq_milli - sum_milli * sum_milli AS BIGINT)
      |    AS var_num
      |FROM g ORDER BY dim""".stripMargin

  // ---------------------------------------------- knn_recall_binary
  /** Recall audit of the sign-bit Hamming path against the exact
    * baseline — completes the per-method canary set
    * ([[graft.sim.Knn.knnRecall]] covers LSH and IVF): per query, how
    * many of the true cosine top-5 survive in the Hamming top-5. The
    * number that decides whether binary-first retrieval can be the
    * fleet's memory-resident stage. Both operands are the
    * oracle-verified operators unchanged; the audit join runs on
    * ≤ q·k rows. */
  def knnRecallBinary(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val h = hammingTopK(emb, 5)
      .select(col("qid"), col("nid"), lit(1L).as("_m"))
    val b = Knn.bruteForce(emb, emb.filter(col("vec_id") < 10), 5)
      .select("qid", "nid")
    b.join(h, Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("_m"), lit(0L))).as("n_hits"))
      .reportSort("qid")
  }

  val knnRecallBinarySql: String =
    s"""WITH h AS (SELECT * FROM ($embHammingSql) th),
       |b AS (SELECT * FROM (${Knn.knnBruteSql}) tb)
       |SELECT b.qid AS qid, CAST(COUNT(h.nid) AS BIGINT) AS n_hits
       |FROM b LEFT JOIN h ON h.qid = b.qid AND h.nid = b.nid
       |GROUP BY b.qid ORDER BY b.qid""".stripMargin

  // ------------------------------------------------ emb_cosine_hist
  /** PAIRWISE-COSINE DISTRIBUTION — the histogram behind the
    * anisotropy scalar ([[embAnisotropy]] gives the MEAN; collapse
    * diagnosis needs the SHAPE — a bimodal pile-up near 1.0 is
    * cluster duplication, a tight spike anywhere is representation
    * collapse): cosines of a deterministic disjoint pair sample
    * (vec v pairs with v+1 on even ids — ONE co-partitioned
    * equi-join; at scale the same shape runs on any hash-bucket
    * pairing, never all-pairs), binned into 0.1-wide buckets.
    * Vectors are L2-normalized then milli-quantized (the
    * [[embAnisotropy]] convention) so each pair's dot is EXACT
    * integer micro-cosine, and the bucket index shifts by +2e6
    * before dividing so truncating (Spark) and flooring (DuckDB)
    * division agree on the negative half of the range. */
  def embCosineHist(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val dbl = col("embedding").cast("array<double>")
    val nrm2 = graft.dedup.Dedup.fastDot(dbl, dbl)
    val q = Tables.embeddings(spark, dir)
      .filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
      .select(col("vec_id"),
        call_function(graft.expr.VectorExprs.floorScaleName,
          call_function(graft.expr.VectorExprs.normName, col("embedding")),
          lit(1000.0)).as("qv"))
    val a = q.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select((col("vec_id") + 1).as("pid"), col("qv").as("qa"))
    val b = q.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("pid"), col("qv").as("qb"))
    a.join(b, Seq("pid"))
      .select(graft.dedup.Dedup.fastDot(col("qa"), col("qb"))
        .cast("long").as("dot_micro"))
      .select(col("dot_micro"),
        (expr("(dot_micro + 2000000) div 100000") - 20).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        min(col("dot_micro")).as("lo_micro"),
        max(col("dot_micro")).as("hi_micro"))
      .orderBy("bucket")
  }

  val embCosineHistSql: String =
    """WITH f AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |q AS (
      |  SELECT vec_id, list_transform(e0, x -> FLOOR(
      |    x / sqrt(list_dot_product(e0, e0)) * 1000)) AS qv
      |  FROM f),
      |p AS (
      |  SELECT CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot_micro
      |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
      |  WHERE a.vec_id % 2 = 0)
      |SELECT (dot_micro + 2000000) // 100000 - 20 AS bucket,
      |  COUNT(*) AS n_pairs,
      |  CAST(MIN(dot_micro) AS BIGINT) AS lo_micro,
      |  CAST(MAX(dot_micro) AS BIGINT) AS hi_micro
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- emb_hamming_calib
  /** SIGN-HAMMING vs COSINE CALIBRATION — the table that justifies
    * (or vetoes) the 32× binary-quantization memory cut before a
    * fleet adopts it: over the same deterministic disjoint pair
    * sample as [[embCosineHist]], each pair contributes its 64-bit
    * sign-Hamming distance AND its exact integer micro-cosine; the
    * per-Hamming-bucket mean cosine is the empirical curve behind the
    * SimHash identity cos(πh/64) — where the curve stays tight,
    * binary shortlisting is safe at that radius. All-integer: sign
    * packs are two non-negative words, cosines are milli-quantized
    * dots, the mean is an integer division. One co-partitioned
    * equi-join; ≤ 65 output rows at any corpus size. */
  def embHammingCalib(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val width = Knn.embWidth(emb)
    val dbl = col("embedding").cast("array<double>")
    val nrm2 = graft.dedup.Dedup.fastDot(dbl, dbl)
    val q = emb
      .filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
      .select(col("vec_id"),
        call_function(graft.expr.VectorExprs.floorScaleName,
          call_function(graft.expr.VectorExprs.normName, col("embedding")),
          lit(1000.0)).as("qv"),
        packSigns(col("embedding"), 0, 32, width).as("lo"),
        packSigns(col("embedding"), 32, 64, width).as("hi"))
    val a = q.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select((col("vec_id") + 1).as("pid"), col("qv").as("qa"),
        col("lo").as("la"), col("hi").as("ha"))
    val b = q.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("pid"), col("qv").as("qb"),
        col("lo").as("lb"), col("hi").as("hb"))
    a.join(b, Seq("pid"))
      .select(
        (bit_count(expr("la ^ lb")) + bit_count(expr("ha ^ hb")))
          .cast("long").as("hamming"),
        graft.dedup.Dedup.fastDot(col("qa"), col("qb"))
          .cast("long").as("dot_micro"))
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dot_micro")).as("_s"))
      // mean micro-cosine, shifted before the floor-div so the
      // truncating/flooring split never disagrees on negative means
      .select(col("hamming"), col("n_pairs"),
        (expr("(_s + 2000000 * n_pairs) div n_pairs") - 2000000)
          .as("mean_cos_micro"))
      .orderBy("hamming")
  }

  val embHammingCalibSql: String =
    """WITH f AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(e0, x -> FLOOR(
      |      x / sqrt(list_dot_product(e0, e0)) * 1000)) AS qv,
      |    CAST(list_sum(list_transform(range(1, 33),
      |      i -> CASE WHEN e0[i] > 0
      |           THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS lo,
      |    CAST(list_sum(list_transform(range(33, 65),
      |      i -> CASE WHEN e0[i] > 0
      |           THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS hi
      |  FROM f),
      |p AS (
      |  SELECT CAST(bit_count(xor(a.lo, b.lo)) +
      |              bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming,
      |    CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot_micro
      |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
      |  WHERE a.vec_id % 2 = 0)
      |SELECT hamming, COUNT(*) AS n_pairs,
      |  CAST((SUM(dot_micro) + 2000000 * COUNT(*)) // COUNT(*)
      |    - 2000000 AS BIGINT) AS mean_cos_micro
      |FROM p GROUP BY hamming ORDER BY hamming""".stripMargin

  // ------------------------------------------------ emb_fps_coreset
  /** FARTHEST-POINT SAMPLING — the k-means++-style seeding / coreset
    * selector (pick the point farthest from everything chosen so
    * far): 8 rounds of { argmax of the running min-distance, then one
    * map-only relax dmin := min(dmin, d(·, new seed)) }. This is the
    * principled alternative to [[knnIvfPq]]'s first-8-ids codebook
    * seeds, and doubles as the diversity-coreset step of a data
    * pipeline (select maximally-spread exemplars). Per round the
    * driver receives exactly ONE row (the argmax — a bounded collect,
    * same class as the dim probe) whose vector becomes a literal in
    * the next round's relax, so the corpus is only ever scanned
    * map-side; no shuffle beyond the top-1. Distances are the
    * fixed-order ‖v‖² − 2⟨v,s⟩ + ‖s‖² with ‖s‖² carried as the
    * collected graft_dot value, so the oracle replays every double
    * bit-for-bit; ties break on vec_id. dist_micro is the selection
    * radius when picked — the non-increasing curve a capacity planner
    * reads for "how many centroids do I need". */
  def embFpsCoreset(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    import spark.implicits._
    val e = col("embedding").cast("array<double>")
    def ss(c: Column): Column =
      call_function(graft.expr.VectorExprs.dotName, c, c)
    val emb = Tables.embeddings(spark, dir)
      .filter(ss(e) > 0 && ss(e) < lit(Double.PositiveInfinity))
      .select(col("vec_id"), e.as("e"), ss(e).as("ss"))
      .cut
    val first = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("e"), col("ss")).collect().head
    def dTo(vec: Array[Double], ssSeed: Double) =
      col("ss") - lit(2.0) * call_function(graft.expr.VectorExprs.dotName,
        col("e"), typedLit(vec.toSeq)) + lit(ssSeed)
    var cur = emb.withColumn("dmin",
      dTo(first.getSeq[Double](1).toArray, first.getDouble(2)))
    val picks = scala.collection.mutable.ArrayBuffer(
      (0L, first.getLong(0), 0L))
    (1 to 7).foreach { i =>
      val top = cur.orderBy(desc("dmin"), col("vec_id")).limit(1)
        .select(col("vec_id"), col("e"), col("ss"), col("dmin"))
        .collect().head
      picks += ((i.toLong, top.getLong(0),
        math.floor(top.getDouble(3) * 1e6).toLong))
      cur = cur.withColumn("dmin", least(col("dmin"),
        dTo(top.getSeq[Double](1).toArray, top.getDouble(2))))
    }
    picks.toSeq.toDF("rank", "vec_id", "dist_micro").reportSort("rank")
  }

  val embFpsCoresetSql: String = {
    val relax = (1 to 7).map { i =>
      s"""p$i AS (
         |  SELECT vec_id AS pid, e AS pe, dmin AS pd
         |  FROM d${i - 1} ORDER BY dmin DESC, vec_id LIMIT 1),
         |d$i AS (
         |  SELECT v.vec_id, v.e,
         |    LEAST(v.dmin, list_dot_product(v.e, v.e)
         |      - 2 * list_dot_product(v.e, p.pe)
         |      + list_dot_product(p.pe, p.pe)) AS dmin
         |  FROM d${i - 1} v CROSS JOIN p$i p)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to 7).map(i =>
      s"SELECT $i AS rank, pid AS vec_id, " +
        s"CAST(FLOOR(pd * 1000000) AS BIGINT) AS dist_micro FROM p$i")
      .mkString("\n  UNION ALL ")
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                                  CAST(embedding AS DOUBLE[])))
       |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
       |                         CAST(embedding AS DOUBLE[])) > 0),
       |s0 AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 1),
       |d0 AS (
       |  SELECT v.vec_id, v.e,
       |    list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, s.e)
       |      + list_dot_product(s.e, s.e) AS dmin
       |  FROM emb v CROSS JOIN s0 s),
       |$relax
       |SELECT CAST(rank AS BIGINT) AS rank, vec_id, dist_micro FROM (
       |  SELECT 0 AS rank, vec_id, CAST(0 AS BIGINT) AS dist_micro
       |  FROM s0
       |  UNION ALL $rows) t
       |ORDER BY rank""".stripMargin
  }

  // ------------------------------------------------ emb_jl_projection
  /** JOHNSON–LINDENSTRAUSS ±1 PROJECTION AUDIT — the dimensionality
    * crusher a 100 TB ANN pipeline applies BEFORE bucketing (64 dims
    * → 8 at 8× less shuffle weight): each output coordinate is a ±1
    * signed sum of the milli-quantized input dims (sign = md5-parity
    * of (dim, out) — the portable hash, reproducible in any engine),
    * and the audit measures what JL promises, that pair distances
    * survive: for the consecutive-id pair set, ratio = 8·d²proj vs
    * 64·d²orig... concretely proj_d2·1000 div (8·orig_d2), whose
    * concentration around 1000 is the quality gauge. Everything is
    * exact integer arithmetic (signed sums of milli grids), so the
    * histogram hashes identically across engines. One corpus
    * explode, |vecs×8| projection state, pair joins on the id — no
    * all-pairs anywhere. */
  def embJlProjection(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v") * 1000).cast("long").as("m"))
      .cut // corpus-explode frame, 2 consumers
    val sign = when(
      pmod(graft.mask.MaskFunctions.portableHash(
        concat_ws("_", col("dim"), col("j"))), lit(2L)) === 0, 1L)
      .otherwise(-1L)
    val proj = x
      .withColumn("j", explode(sequence(lit(0), lit(7))))
      .groupBy("vec_id", "j")
      .agg(sum(col("m") * sign).as("p"))
    val pa = proj.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select((col("vec_id") + 1).as("pid"), col("j"), col("p").as("qa"))
    val pb = proj.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("pid"), col("j"), col("p").as("qb"))
    val projD2 = pa.join(pb, Seq("pid", "j"))
      .groupBy("pid")
      .agg(sum((col("qa") - col("qb")) * (col("qa") - col("qb")))
        .as("proj_d2"))
    val xa = x.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select((col("vec_id") + 1).as("pid"), col("dim"), col("m").as("ma"))
    val xb = x.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("pid"), col("dim"), col("m").as("mb"))
    val origD2 = xa.join(xb, Seq("pid", "dim"))
      .groupBy("pid")
      .agg(sum((col("ma") - col("mb")) * (col("ma") - col("mb")))
        .as("orig_d2"))
    projD2.join(origD2, Seq("pid"))
      .filter(col("orig_d2") > 0)
      .select(expr("proj_d2 * 1000 div (8 * orig_d2)").as("ratio_pm"))
      .groupBy(expr("ratio_pm div 200").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("ratio_pm")).as("lo_pm"),
        max(col("ratio_pm")).as("hi_pm"))
      .orderBy("bucket")
  }

  val embJlProjectionSql: String =
    """WITH x AS (
      |  SELECT vec_id, d.dim,
      |    CAST(FLOOR(CAST(embedding[CAST(d.dim AS INTEGER) + 1]
      |      AS DOUBLE) * 1000) AS BIGINT) AS m
      |  FROM embeddings
      |  CROSS JOIN (SELECT UNNEST(range(256)) AS dim) d
      |  WHERE len(embedding) > d.dim),
      |pr AS (
      |  SELECT vec_id, j.j,
      |    SUM(m * (CASE WHEN ('0x'||substr(md5(
      |      CAST(x.dim AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)),
      |      1,8))::BIGINT % 2 = 0 THEN 1 ELSE -1 END)) AS p
      |  FROM x CROSS JOIN (SELECT UNNEST(range(8)) AS j) j
      |  GROUP BY 1, 2),
      |pd AS (
      |  SELECT a.vec_id + 1 AS pid,
      |    SUM((a.p - b.p) * (a.p - b.p)) AS proj_d2
      |  FROM pr a JOIN pr b
      |    ON b.vec_id = a.vec_id + 1 AND b.j = a.j
      |  WHERE a.vec_id % 2 = 0 GROUP BY 1),
      |od AS (
      |  SELECT a.vec_id + 1 AS pid,
      |    SUM((a.m - b.m) * (a.m - b.m)) AS orig_d2
      |  FROM x a JOIN x b
      |    ON b.vec_id = a.vec_id + 1 AND b.dim = a.dim
      |  WHERE a.vec_id % 2 = 0 GROUP BY 1),
      |r AS (
      |  SELECT proj_d2 * 1000 // (8 * orig_d2) AS ratio_pm
      |  FROM pd JOIN od ON pd.pid = od.pid
      |  WHERE orig_d2 > 0)
      |SELECT CAST(ratio_pm // 200 AS BIGINT) AS bucket, COUNT(*) AS n_pairs,
      |  CAST(MIN(ratio_pm) AS BIGINT) AS lo_pm,
      |  CAST(MAX(ratio_pm) AS BIGINT) AS hi_pm
      |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin

  // --------------------------------------------- emb_clip_calibration
  /** NORM-CLIP CALIBRATION — the pre-quantization step an embedding
    * server runs before int8 (one outlier norm stretches the scale
    * and crushes everyone else's resolution; clip at p99 and the
    * grid serves the mass): norms land on the milli grid (IEEE sqrt
    * is correctly rounded, so floor(√d·1000) is engine-exact), the
    * p99 comes from the cumulative-histogram rank walk (the
    * `cdc_lag_audit` lo/hi idiom — no corpus sort, the histogram IS
    * the bounded value grid), and the report prices the clip:
    * clipped-vector share and energy lost, both per-mille. One
    * corpus map pass → |distinct milli norms| histogram; everything
    * after runs on that frame. */
  def embClipCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.VectorExprs.register(spark)
    val dbl = col("embedding").cast("array<double>")
    val h = Tables.embeddings(spark, dir)
      .select(floor(sqrt(graft.dedup.Dedup.fastDot(dbl, dbl)) * 1000)
        .cast("long").as("nm"))
      .groupBy("nm").agg(count(lit(1)).as("c"))
      .cut // |milli-norm grid| frame, 3 consumers
    val tot = h.agg(sum(col("c")).as("t"))
    val cum = h.crossJoin(broadcast(tot))
      .withColumn("hi", sum(col("c")).over(Window.orderBy("nm")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("k", expr("(t * 99 + 99) div 100"))
    val p99 = cum.agg(max(when(col("lo") <= col("k") &&
      col("k") <= col("hi"), col("nm"))).as("p99"))
    h.crossJoin(broadcast(p99))
      .agg(sum(col("c")).as("n_vectors"),
        max(col("p99")).as("p99_norm_milli"),
        sum(when(col("nm") > col("p99"), col("c")).otherwise(0L))
          .as("n_clipped"),
        sum(when(col("nm") > col("p99"),
          col("c") * (col("nm") - col("p99"))).otherwise(0L))
          .as("_lost"),
        sum(col("c") * col("nm")).as("_mass"))
      .select(col("n_vectors"), col("p99_norm_milli"),
        col("n_clipped"),
        expr("n_clipped * 1000 div n_vectors").as("clipped_pm"),
        expr("_lost * 1000 div _mass").as("energy_lost_pm"))
  }

  val embClipCalibrationSql: String =
    """WITH h AS (
      |  SELECT CAST(FLOOR(sqrt(list_dot_product(
      |      CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[]))) * 1000) AS BIGINT) AS nm,
      |    COUNT(*) AS c
      |  FROM embeddings GROUP BY 1),
      |t AS (SELECT SUM(c) AS t FROM h),
      |cum AS (
      |  SELECT nm, c,
      |    SUM(c) OVER (ORDER BY nm
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
      |    SUM(c) OVER (ORDER BY nm
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - c + 1 AS lo,
      |    (t * 99 + 99) // 100 AS k
      |  FROM h CROSS JOIN t),
      |p AS (
      |  SELECT MAX(CASE WHEN lo <= k AND k <= hi THEN nm END) AS p99
      |  FROM cum)
      |SELECT CAST(SUM(c) AS BIGINT) AS n_vectors,
      |  CAST(MAX(p99) AS BIGINT) AS p99_norm_milli,
      |  CAST(SUM(CASE WHEN nm > p99 THEN c ELSE 0 END) AS BIGINT)
      |    AS n_clipped,
      |  CAST(SUM(CASE WHEN nm > p99 THEN c ELSE 0 END) * 1000 //
      |    SUM(c) AS BIGINT) AS clipped_pm,
      |  CAST(SUM(CASE WHEN nm > p99 THEN c * (nm - p99) ELSE 0 END)
      |    * 1000 // SUM(c * nm) AS BIGINT) AS energy_lost_pm
      |FROM h CROSS JOIN p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_clip_calibration" -> (embClipCalibration _),
    "emb_jl_projection" -> (embJlProjection _),
    "emb_hamming_calib" -> (embHammingCalib _),
    "emb_silhouette" -> (embSilhouette _),
    "emb_fps_coreset" -> (embFpsCoreset _),
    "emb_cosine_hist" -> (embCosineHist _),
    "knn_recall_binary" -> (knnRecallBinary _),
    "emb_rq_sketch" -> (embRqSketch _),
    "emb_power_iter" -> (embPowerIter _),
    "emb_covariance" -> (embCovariance _),
    "emb_anisotropy" -> (embAnisotropy _),
    "emb_dim_stats" -> (embDimStats _),
    "knn_kmeans_refine" -> (knnKmeansRefine _),
    "emb_outliers" -> (embOutliers _),
    "emb_hamming_topk" -> (embHammingTopK _),
    "emb_drift" -> (embDrift _),
    "knn_ivf_pq" -> (knnIvfPq _),
    "emb_norm_audit" -> (embNormAudit _),
    "emb_dup_vectors" -> (embDupVectors _),
    "emb_quantize" -> (embQuantize _),
    "emb_matryoshka" -> (embMatryoshka _),
    "emb_matryoshka_recall" -> (embMatryoshkaRecall _),
    "emb_pq" -> (embPq _),
    "knn_pq_adc" -> (knnPqAdc _),
    "sql_surface" -> (sqlSurface _))

  val oracles: Map[String, String] = Map(
    "emb_clip_calibration" -> embClipCalibrationSql,
    "emb_jl_projection" -> embJlProjectionSql,
    "emb_hamming_calib" -> embHammingCalibSql,
    "emb_silhouette" -> embSilhouetteSql,
    "emb_fps_coreset" -> embFpsCoresetSql,
    "emb_cosine_hist" -> embCosineHistSql,
    "knn_recall_binary" -> knnRecallBinarySql,
    "emb_rq_sketch" -> embRqSketchSql,
    "emb_power_iter" -> embPowerIterSql,
    "emb_covariance" -> embCovarianceSql,
    "emb_anisotropy" -> embAnisotropySql,
    "emb_dim_stats" -> embDimStatsSql,
    "knn_kmeans_refine" -> knnKmeansRefineSql,
    "emb_outliers" -> embOutliersSql,
    "emb_hamming_topk" -> embHammingSql,
    "emb_drift" -> embDriftSql,
    "emb_norm_audit" -> embNormAuditSql,
    "emb_dup_vectors" -> embDupVectorsSql,
    "emb_quantize" -> embQuantizeSql,
    "emb_matryoshka" -> embMatryoshkaSql,
    "emb_matryoshka_recall" -> embMatryoshkaRecallSql,
    "emb_pq" -> embPqSql,
    "knn_pq_adc" -> knnPqAdcSql,
    "knn_ivf_pq" -> knnIvfPqSql,
    "sql_surface" -> sqlSurfaceSql)
}
