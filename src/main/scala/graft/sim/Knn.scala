package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.dedup.Dedup.fastDot
import graft.expr.VectorExprs
import graft.Syntax._

/** §2.7 similarity search over an embedding column.
  *
  * Every operator normalizes ONCE (codegen graft_normalize) and scores
  * with the codegen dot product — no interpreted HOF in any hot loop.
  *
  *  - brute force: exact top-k, the correctness baseline. O(q·n) dot
  *    products; with the (small) query side broadcast it is
  *    embarrassingly parallel over corpus partitions. Output is
  *    rank-only (no float scores cross the oracle boundary).
  *  - LSH: random-hyperplane signatures → bucket join; probes only
  *    same-signature corpus vectors. Hyperplane signs derive from a
  *    PORTABLE md5-prefix hash computed once on the driver, so the
  *    oracle engine rebuilds identical signatures and the operator is
  *    hash-verified. The 100 TB shape: shuffle on signature, bucket
  *    sizes ≈ n/2^bits.
  *  - centroid (IVF): deterministic cell seeds (the min-vec_id member
  *    per label), probe the nProbe nearest cells only. Seeds are data
  *    points — no float-order-dependent averaging — so the oracle
  *    engine reproduces the assignment bit-for-bit.
  */
object Knn extends QueryModule {

  private def norm(c: Column): Column =
    call_function(VectorExprs.normName, c)

  /** Normalized view (vec_id, label, e) of an embeddings table. */
  private def normalizedWithLabel(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"), norm(col("embedding")).as("e"))

  private val normSqlCte: String =
    """  SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS e
      |  FROM embeddings""".stripMargin

  // ----------------------------------------------------- knn_bruteforce
  def bruteForce(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), norm(col("embedding")).as("qe"))
    // broadcast-join parallelism = corpus-side partitions; a small table
    // arrives as one parquet split, so spread it first
    val c = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("nid"), norm(col("embedding")).as("ne"))
    broadcast(q).join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), fastDot(col("qe"), col("ne")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  /** Session-memoized shared retrieval lists (the [[mutualEdges]]
    * precedent): the exact-brute baseline and the LSH/centroid lists
    * at the default query set are each derived by several audit keys
    * (recall audit, probe sweep, MRR, RRF fusion) on top of being
    * keys themselves — one derivation per (session, corpus), shared
    * by every consumer. Memoized UNSORTED; key tails apply their own
    * deterministic sort. */
  private[graft] def bruteList(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "knnBruteTop5") {
      VectorExprs.register(spark)
      val emb = Tables.embeddings(spark, dir)
      bruteForce(emb, emb.filter(col("vec_id") < 10), 5)
    }

  private[graft] def lshList(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "knnLshTop5") {
      VectorExprs.register(spark)
      val emb = Tables.embeddings(spark, dir)
      lsh(emb, emb.filter(col("vec_id") < 10), 5)
    }

  private[graft] def centroidList(spark: SparkSession, dir: String)
      : DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "knnCentroidTop5") {
      centroidKnnDefault(spark, dir, col("vec_id") < 10, 5)
    }

  def knnBrute(spark: SparkSession, dir: String): DataFrame =
    bruteList(spark, dir).reportSort("qid", "rank")

  val knnBruteSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_dot_product(q.e, c.e) AS c
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY c DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ------------------------------------------------------------ knn_lsh
  /** Deterministic ±1 hyperplane weights from the portable md5-prefix
    * hash of "plane,dim" — computed ONCE on the driver and shipped as
    * array literals, so per-row signature work is pure codegen dots.
    * The oracle engine rebuilds the same planes from the same md5. */
  /** The ONE portable ±1 sign-vector derivation (md5 of "tag,dim",
    * first 4 bytes, parity) — shared by the LSH planes (integer tags)
    * and the power-iteration start vector ("pw"); both SQL oracles
    * rebuild the identical bytes, so this is the single Scala site a
    * portable-hash contract change must touch. */
  private[sim] def signVec(tag: String, width: Int): Array[Double] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(width) { i =>
      val hex = mdig.digest(s"$tag,$i".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
    }
  }

  private[sim] def planeVec(p: Int, width: Int): Array[Double] =
    signVec(p.toString, width)

  /** Embedding width read from the data (a hardcoded width would
    * silently zero-pad or drop dimensions for other embedding sets);
    * vectors are assumed uniform-width per table. */
  private[sim] def embWidth(emb: DataFrame): Int =
    emb.limit(1).select(size(col("embedding"))).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Signature = Σ_p 2^p · [dot(e, plane_p) > 0] over NORMALIZED
    * vectors (signs match the raw projection — normalization is a
    * positive scaling). */
  def lshSignatures(emb: DataFrame, planes: Int): DataFrame = {
    val width = embWidth(emb)
    val e = norm(col("embedding"))
    val sigBits = (0 until planes).map { p =>
      when(fastDot(col("e"), typedLit(planeVec(p, width).toSeq)) > 0,
        lit(1L << p)).otherwise(0L)
    }
    emb.select(col("vec_id"), e.as("e"))
      .select(col("vec_id"), col("e"), sigBits.reduce(_ + _).as("sig"))
  }

  /** Scale knobs: `planes` sets bucket count (2^planes — at corpus
    * scale grow it so buckets stay ~n/2^planes ≫ k), and `probeBits`
    * turns on MULTI-PROBE: the query also searches every bucket within
    * Hamming distance ≤ probeBits of its own signature, recovering the
    * recall that more planes cost without touching the corpus-side
    * layout. XOR masks are enumerated on the driver (Σ_d≤probeBits
    * C(planes,d) of them — bounded) and exploded on the tiny query
    * side; each (query, neighbor) pair still arises exactly once
    * because a corpus vector lives in exactly one bucket. Defaults
    * (5 planes, no extra probes) keep the oracle-verified behavior. */
  def lsh(emb: DataFrame, queries: DataFrame, k: Int, planes: Int = 5,
      probeBits: Int = 0): DataFrame = {
    // 2^planes buckets: pick planes so buckets hold >> k vectors
    // (planes=5 → 32 buckets; near-uniform data fills top-k reliably)
    val sigs = lshSignatures(
      emb.repartition(emb.sparkSession.sparkContext.defaultParallelism), planes)
    val masks: Seq[Long] = {
      def combos(bits: List[Int], d: Int): Seq[Long] =
        if (d == 0) Seq(0L)
        else bits match {
          case Nil => Seq.empty
          case b :: rest =>
            combos(rest, d) ++ combos(rest, d - 1).map(_ | (1L << b))
        }
      (0 to probeBits).flatMap(d => combos((0 until planes).toList, d))
    }
    val qs = lshSignatures(queries, planes)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("sig").as("qsig"))
      .withColumn("_mask", explode(typedLit(masks)))
      .withColumn("psig", col("qsig").bitwiseXOR(col("_mask")))
    broadcast(qs).join(sigs,
        col("psig") === col("sig") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        fastDot(col("qe"), col("e")).as("c"))
      .withColumn("rank", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    lshList(spark, dir).reportSort("qid", "rank")

  /** Oracle mirror of lsh at the defaults (5 planes, k=5): identical
    * plane derivation per dimension, identical normalized dots. */
  val knnLshSql: String = {
    def planeTerm(p: Int): String =
      s"list_transform(range(len(e)), i -> CAST(((('0x'||substr(md5('$p,'||" +
        s"CAST(i AS VARCHAR)),1,8))::BIGINT & 1)*2 - 1) AS DOUBLE))"
    val sigExpr = (0 until 5).map(p =>
      s"(CASE WHEN list_dot_product(e, ${planeTerm(p)}) > 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("\n    + ")
    s"""WITH n AS (
       |$normSqlCte),
       |sigs AS (
       |  SELECT vec_id, e, CAST($sigExpr AS BIGINT) AS sig
       |  FROM n),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_dot_product(q.e, c.e) AS c
       |  FROM sigs q JOIN sigs c ON q.sig = c.sig AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY c DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // ------------------------------------------------------- knn_centroid
  /** IVF cell seeds: the min-vec_id member of each label. Real data
    * points, deterministically chosen — no float-order-dependent mean,
    * so assignments are reproducible anywhere. */
  def seedCells(n: DataFrame): DataFrame =
    n.withColumn("_r",
        row_number().over(Window.partitionBy("label").orderBy("vec_id")))
      .filter(col("_r") === 1)
      .select(col("label").as("cell"), col("e").as("ce"))

  /** Scale knob: `cellGate` decouples the cell count from the label
    * cardinality — seeds become the ~n/gate vectors whose portable
    * id-hash lands on 0 (deterministic, engine-independent), so the
    * classic IVF balance (≈√n cells of ≈√n members) is one
    * gate ≈ √n setting away. Default (None) keeps the label-seeded,
    * oracle-verified behavior. Assignment stays a broadcast of the
    * seed set; at very large cell counts you'd assign via a coarse
    * quantizer instead (documented seam, same plan otherwise). */
  /** Every (vector, seed) pair ranked by cosine per vector — the
    * shared IVF assignment core: _rk = 1 is the cell assignment,
    * _rk ≤ nProbe the probe set. Keeps the seed vector (`ce`) so
    * residual consumers ([[EmbOps.embRqSketch]]) read it; Catalyst
    * prunes it where unused. */
  private[sim] def rankedSeedCells(n: DataFrame, seeds: DataFrame)
      : DataFrame =
    n.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("e"), col("cell"), col("ce"),
        fastDot(col("e"), col("ce")).as("_d"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("_d"), col("cell"))))

  /** Session-memoized default-seed IVF ranking over the whole corpus
    * (vec_id, e, cell, _rk ≤ 3) — the shared front half of every
    * centroid-cell consumer (centroid kNN, probe sweep, rerank, the
    * directed-edge layout build): _rk = 1 is the cell assignment,
    * _rk ≤ p the probe set, and any query subset is a row filter
    * (query-side normalization of a corpus subset is bit-identical to
    * the corpus side's). One normalize + argmax pass per session
    * instead of one per key. */
  private[sim] def rankedCellsDefault(spark: SparkSession, dir: String)
      : DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "knnRankedCells3") {
      VectorExprs.register(spark)
      val emb = Tables.embeddings(spark, dir)
      val n = normalizedWithLabel(
        emb.repartition(emb.sparkSession.sparkContext.defaultParallelism))
      rankedSeedCells(n, seedCells(n)).filter(col("_rk") <= 3)
        .select(col("vec_id"), col("e"), col("cell"), col("_rk"))
    }

  /** [[centroidKnn]] at the default seeds/nProbe riding
    * [[rankedCellsDefault]], the query set given as a vec_id
    * predicate. */
  private[sim] def centroidKnnDefault(spark: SparkSession, dir: String,
      qFilter: Column, k: Int): DataFrame = {
    val rc = rankedCellsDefault(spark, dir)
    val assigned = rc.filter(col("_rk") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    val probes = rc.filter(qFilter)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("cell"))
    probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        fastDot(col("qe"), col("e")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  def centroidKnn(emb: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 3,
      cellGate: Option[Long] = None): DataFrame = {
    val n = normalizedWithLabel(
      emb.repartition(emb.sparkSession.sparkContext.defaultParallelism))
    val seeds = cellGate match {
      case Some(g) => n.filter(
          pmod(graft.mask.MaskFunctions.portableHash(col("vec_id")), lit(g)) === 0L)
        .select(col("vec_id").as("cell"), col("e").as("ce"))
      case None => seedCells(n)
    }
    val assigned = rankedSeedCells(n, seeds)
      .filter(col("_rk") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    val probes = rankedSeedCells(normalizedWithLabel(queries), seeds)
      .filter(col("_rk") <= nProbe)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("cell"))
    probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        fastDot(col("qe"), col("e")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  def knnCentroid(spark: SparkSession, dir: String): DataFrame =
    centroidList(spark, dir).reportSort("qid", "rank")

  /** Oracle mirror of centroidKnn at the defaults (nProbe=3, k=5):
    * same seeds, same argmax assignment, same probe set, same ranks. */
  val knnCentroidSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |seeds AS (
       |  SELECT label AS cell, e AS ce FROM (
       |    SELECT label, e, ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY vec_id) AS r
       |    FROM n)
       |  WHERE r = 1),
       |assigned AS (
       |  SELECT vec_id, e, cell FROM (
       |    SELECT nn.vec_id, nn.e, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s)
       |  WHERE rk = 1),
       |probes AS (
       |  SELECT qid, qe, cell FROM (
       |    SELECT nn.vec_id AS qid, nn.e AS qe, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s WHERE nn.vec_id < 10)
       |  WHERE rk <= 3),
       |scored AS (
       |  SELECT p.qid, a.vec_id AS nid, list_dot_product(p.qe, a.e) AS c
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  WHERE p.qid <> a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY c DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------------- knn_graph
  /** Mutual k-NN GRAPH over the whole corpus — the SemDeDup /
    * semantic-clustering primitive (every vector's top-k inside its
    * probed IVF cells, kept only where both endpoints choose each
    * other). Mutuality is the cheap symmetry filter that turns a noisy
    * directed k-NN relation into clusterable undirected edges. Scale
    * shape: the corpus is its own query set, so candidate generation is
    * the SAME cell-bounded shuffle as [[centroidKnn]] (nProbe cells per
    * vector, never all-pairs), and the mutual check is a self-join on
    * the skinny directed edge list (≤ k·n rows) — both keyed shuffles
    * an AQE plan handles at any corpus size. Feed the edges to
    * [[graft.dedup.Dedup]]'s components to get semantic clusters. */
  /** Memoized mutual-kNN edge set over `embeddings` — shared by
    * `knn_graph` and `knn_graph_clusters` (same session-scoped,
    * layout-fingerprinted memo as the dedup pair sets: the graph is
    * the expensive intermediate, its consumers are cheap). */
  /** DIRECTED top-k edge set (corpus as its own query set, nProbe=3,
    * k=5) — the expensive candidate pass [[mutualEdges]]' symmetry
    * filter, [[knnHubness]]' in-degree audit, and the centrality /
    * triangle keys all read. PERSISTED as a write-once bucketed
    * external table (the q26 layout precedent: the candidate pass is
    * a capital cost, not a per-query cost): the first consumer per
    * source layout pays the centroid probe pass ONCE and writes the
    * ≤ k·n skinny edge rows bucketed+sorted on qid; every later
    * consumer in this session re-attaches the finished layout by DDL
    * (`_SUCCESS` probe) and pays a bucketed SCAN, no candidate join,
    * with qid-keyed consumers (per-query folds, the mutual
    * self-join's build side) riding the bucket layout without an
    * exchange. The layout tag fingerprints the source parquet
    * content, so distinct corpora never collide; the layout itself is
    * session-scoped (see [[graft.Tables.sessionLayoutRoot]]). At
    * 100 TB this is the difference between every graph query paying
    * the IVF probe pass and the pass being a once-per-corpus
    * artifact. */
  /** Algorithm version folded into the layout tag: bump whenever the
    * candidate-generation semantics of [[centroidKnn]] (or the edge
    * schema) change, so a cross-JVM artifact built by OLDER code can
    * never silently re-attach under newer semantics. */
  private val edgeAlgoVersion = "a1"
  private val edgeK = 5
  private val edgeNProbe = 3

  def directedEdges(spark: SparkSession, dir: String): DataFrame = {
    // The layout key must pin EVERYTHING the artifact's content depends
    // on: source bytes (layoutTag) + operator parameters + algorithm
    // version. A key missing any of these re-attaches a stale artifact
    // after a parameter/code change — corrupting every graph consumer.
    val tag =
      s"${Tables.layoutTag(dir)}_k${edgeK}p${edgeNProbe}_$edgeAlgoVersion"
    Tables.attachBucketed(spark, tag, s"knn_edges_$tag",
        "qid BIGINT, rank INT, nid BIGINT", "qid", 8) {
      // corpus-as-queries at the defaults: ride the memoized ranking
      // (pinned to the memo's nProbe=3 probe depth)
      require(edgeNProbe == 3, "memoized ranking carries _rk <= 3 only")
      centroidKnnDefault(spark, dir, lit(true), edgeK)
    }
  }

  def mutualEdges(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.memoized(spark, dir, "knnMutualEdges") {
      val edges = directedEdges(spark, dir)
      val rev = edges.select(col("qid").as("_b"), col("nid").as("_a"),
        col("rank").as("rank_ba"))
      edges.filter(col("qid") < col("nid"))
        .join(rev, col("qid") === col("_a") && col("nid") === col("_b"))
        .select(col("qid").as("a"), col("nid").as("b"),
          col("rank").as("rank_ab"), col("rank_ba"))
    }

  def knnGraph(spark: SparkSession, dir: String): DataFrame =
    mutualEdges(spark, dir).orderBy("a", "b")

  /** [[knnCentroidSql]] without the query-subset filter, plus the
    * mutual self-join: both directions must rank within k. */
  /** Directed corpus-as-its-own-query top-k CTE (nProbe=3, k=5),
    * ending in `k(qid, nid, rank)` — the shared prefix of
    * [[knnGraphSql]] (which closes it with the mutual self-join) and
    * [[knnHubnessSql]] (which aggregates its in-degrees). */
  val knnDirectedCte: String =
    s"""WITH n AS (
       |$normSqlCte),
       |seeds AS (
       |  SELECT label AS cell, e AS ce FROM (
       |    SELECT label, e, ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY vec_id) AS r
       |    FROM n)
       |  WHERE r = 1),
       |assigned AS (
       |  SELECT vec_id, e, cell FROM (
       |    SELECT nn.vec_id, nn.e, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s)
       |  WHERE rk = 1),
       |probes AS (
       |  SELECT qid, qe, cell FROM (
       |    SELECT nn.vec_id AS qid, nn.e AS qe, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s)
       |  WHERE rk <= 3),
       |scored AS (
       |  SELECT p.qid, a.vec_id AS nid, list_dot_product(p.qe, a.e) AS c
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  WHERE p.qid <> a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY c DESC, nid) AS rank
       |  FROM scored),
       |k AS (SELECT qid, nid, rank FROM ranked WHERE rank <= 5)""".stripMargin

  val knnGraphSql: String =
    s"""$knnDirectedCte
       |SELECT f.qid AS a, f.nid AS b,
       |  CAST(f.rank AS INTEGER) AS rank_ab,
       |  CAST(r.rank AS INTEGER) AS rank_ba
       |FROM k f JOIN k r ON r.qid = f.nid AND r.nid = f.qid
       |WHERE f.qid < f.nid
       |ORDER BY a, b""".stripMargin

  // ------------------------------------------------- knn_cell_balance
  /** IVF cell-balance audit — the index-operator's capacity view of
    * the same assignment every probe rides: oversized cells make
    * every probe that touches them scan-heavy (probe cost is the sum
    * of probed members), starved cells waste recall. One row: cell
    * count, member min/max, the straggler factor in per-mille of the
    * mean (max·cells·1000 div vectors — the [[graft.pipeline
    * .CorpusPipeline.pipeShardSkew]] statistic applied to the index),
    * and Σm² (the expected members touched by a size-proportional
    * probe, scaled by n — the quantity cell rebalancing minimizes).
    * One assignment pass → |cells| rows → 1-row fold. */
  def knnCellBalance(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val n = normalizedWithLabel(Tables.embeddings(spark, dir))
    val sizes = rankedSeedCells(n, seedCells(n))
      .filter(col("_rk") === 1)
      .groupBy("cell").agg(count(lit(1)).as("m"))
    sizes.agg(count(lit(1)).as("n_cells"), sum(col("m")).as("n_vectors"),
        max(col("m")).as("max_cell"), min(col("m")).as("min_cell"),
        sum(col("m") * col("m")).as("sum_sq"))
      .withColumn("balance_pm",
        expr("max_cell * n_cells * 1000 div n_vectors"))
  }

  val knnCellBalanceSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |seeds AS (
       |  SELECT label AS cell, e AS ce FROM (
       |    SELECT label, e, ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY vec_id) AS r
       |    FROM n)
       |  WHERE r = 1),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT nn.vec_id, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s)
       |  WHERE rk = 1),
       |s AS (SELECT cell, COUNT(*) AS m FROM assigned GROUP BY 1)
       |SELECT COUNT(*) AS n_cells, CAST(SUM(m) AS BIGINT) AS n_vectors,
       |  CAST(MAX(m) AS BIGINT) AS max_cell,
       |  CAST(MIN(m) AS BIGINT) AS min_cell,
       |  CAST(SUM(m * m) AS BIGINT) AS sum_sq,
       |  CAST(MAX(m) * COUNT(*) * 1000 // SUM(m) AS BIGINT)
       |    AS balance_pm
       |FROM s""".stripMargin

  // ----------------------------------------------- knn_edge_support
  /** EDGE SUPPORT census of the mutual k-NN graph — per edge, how
    * many triangles contain it (|N(a) ∩ N(b)|): the trussness/
    * weak-tie signal [[knnTriangles]]' global count can't give.
    * Support-0 edges are BRIDGES — links between semantic regions
    * that share no common neighbor; dedup clustering across a bridge
    * merges genuinely different content, so the bridge count is the
    * "how aggressive is my components pass" gauge. High-support
    * edges sit inside tight clusters (k-truss cores). Same bounded
    * shape as the triangle census: mutual degree ≤ k by
    * construction, so the wedge join fans out ≤ k per edge endpoint
    * at ANY corpus size, and support ≤ 2(k−1). Output: the
    * |supports|-row histogram (≤ 2k rows) with the bridge row
    * first. */
  def knnEdgeSupport(spark: SparkSession, dir: String): DataFrame = {
    val e = mutualEdges(spark, dir).select(col("a"), col("b"))
      .cut // 3 consumers: wedges, closing set, support-0
    val sym = e.select(col("a").as("u"), col("b").as("x"))
      .unionAll(e.select(col("b").as("u"), col("a").as("x")))
    val wedges = e
      .join(sym.select(col("u").as("a"), col("x")), Seq("a"))
      .filter(col("x") =!= col("b"))
    val closed = wedges
      .join(sym.select(col("u").as("b"), col("x")), Seq("b", "x"),
        "left_semi")
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
    e.join(closed, Seq("a", "b"), "left")
      .withColumn("support", coalesce(col("support"), lit(0L)))
      .groupBy("support").agg(count(lit(1)).as("n_edges"))
      .reportSort("support")
  }

  val knnEdgeSupportSql: String =
    s"""$knnDirectedCte,
       |me AS (
       |  SELECT f.qid AS a, f.nid AS b
       |  FROM k f JOIN k r ON r.qid = f.nid AND r.nid = f.qid
       |  WHERE f.qid < f.nid),
       |sym AS (
       |  SELECT a AS u, b AS x FROM me
       |  UNION ALL SELECT b AS u, a AS x FROM me),
       |w AS (
       |  SELECT me.a, me.b, s.x
       |  FROM me JOIN sym s ON s.u = me.a
       |  WHERE s.x <> me.b),
       |cl AS (
       |  SELECT w.a, w.b, COUNT(*) AS support
       |  FROM w
       |  WHERE EXISTS (SELECT 1 FROM sym s2
       |                WHERE s2.u = w.b AND s2.x = w.x)
       |  GROUP BY 1, 2),
       |sup AS (
       |  SELECT me.a, me.b, COALESCE(cl.support, 0) AS support
       |  FROM me LEFT JOIN cl ON cl.a = me.a AND cl.b = me.b)
       |SELECT CAST(support AS BIGINT) AS support,
       |  COUNT(*) AS n_edges
       |FROM sup GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------- knn_assortativity
  /** DEGREE ASSORTATIVITY of the mutual k-NN graph (Newman 2002) —
    * do well-connected vectors neighbor other well-connected vectors?
    * Positive r: a dense semantic core with a sparse halo (one IVF
    * probe set will be hot); negative r: hub-and-spoke (hubs connect
    * to orphans — the hubness pathology seen from the edge side);
    * near 0: mixing is random. On the SYMMETRIZED edge-endpoint
    * pairs the X and Y marginals coincide, so Pearson's denominator
    * is a single term and the whole statistic is RATIONAL — no
    * square root crosses the engine boundary:
    * r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²), reported per-mille via
    * the signed-safe shift idiom ((num·1000 + K·den) div den − K).
    * Moments lift to DECIMAL(38) (m·Σxy ~ 25·(kn)² overflows int64
    * past ~6e8 vectors). One skinny degree self-join over the
    * memoized mutual edge set; 1-row output. NULL r on a regular
    * graph (den = 0). */
  def knnAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val e = mutualEdges(spark, dir).select(col("a"), col("b"))
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val sym = e.select(col("a").as("x"), col("b").as("y"))
      .unionAll(e.select(col("b").as("x"), col("a").as("y")))
    sym
      .join(deg.select(col("v").as("x"), col("d").as("dx")), Seq("x"))
      .join(deg.select(col("v").as("y"), col("d").as("dy")), Seq("y"))
      .agg(count(lit(1)).as("m"),
        sum(col("dx")).as("sx"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(expr("m div 2").as("n_edges"),
        expr("CAST(CASE WHEN CAST(m AS DECIMAL(38,0)) * sxx - " +
          "CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN NULL ELSE " +
          "((CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0))" +
          " * sx) * 1000 + 2000 * (CAST(m AS DECIMAL(38,0)) * sxx -" +
          " CAST(sx AS DECIMAL(38,0)) * sx))" +
          " div (CAST(m AS DECIMAL(38,0)) * sxx -" +
          " CAST(sx AS DECIMAL(38,0)) * sx) - 2000 END AS BIGINT)")
          .as("r_pm"))
  }

  val knnAssortativitySql: String =
    s"""$knnDirectedCte,
       |me AS (
       |  SELECT f.qid AS a, f.nid AS b
       |  FROM k f JOIN k r ON r.qid = f.nid AND r.nid = f.qid
       |  WHERE f.qid < f.nid),
       |deg AS (
       |  SELECT v, COUNT(*) AS d FROM (
       |    SELECT a AS v FROM me UNION ALL SELECT b AS v FROM me)
       |  GROUP BY 1),
       |sym AS (
       |  SELECT a AS x, b AS y FROM me
       |  UNION ALL SELECT b AS x, a AS y FROM me),
       |mo AS (
       |  SELECT COUNT(*) AS m, SUM(dx.d) AS sx,
       |    SUM(dx.d * dx.d) AS sxx, SUM(dx.d * dy.d) AS sxy
       |  FROM sym JOIN deg dx ON dx.v = sym.x
       |  JOIN deg dy ON dy.v = sym.y)
       |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       |  CAST(CASE WHEN CAST(m AS HUGEINT) * sxx
       |      - CAST(sx AS HUGEINT) * sx = 0 THEN NULL ELSE
       |    ((CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx)
       |      * 1000 + 2000 * (CAST(m AS HUGEINT) * sxx
       |      - CAST(sx AS HUGEINT) * sx))
       |    // (CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
       |    - 2000 END AS BIGINT) AS r_pm
       |FROM mo""".stripMargin

  // ---------------------------------------------------- knn_pagerank
  /** INTEGER PAGERANK over the directed k-NN graph — the global
    * authority score that upgrades [[knnHubness]]' raw in-degree: a
    * vector is central if CENTRAL vectors point at it, which is what
    * a retrieval-quality auditor wants when picking representative
    * exemplars or spotting attractor regions an ANN index over-serves.
    * Fixed 6 damped iterations (d = 0.85) in EXACT integer
    * parts-per-billion: every step is
    * r′ = (150·base + 850·Σ_in (r div out_deg)) div 1000 — floor
    * division at each hop, so BOTH engines walk the identical lattice
    * and the result is hash-verified, not approximately compared
    * (dangling/rounding mass evaporates identically on both sides).
    * Shape is textbook Pregel-on-DataFrames: the edge list is the
    * persisted [[directedEdges]] layout (≤ k·n skinny rows), each
    * iteration is one keyed join + hash-agg — at 1000 executors each
    * superstep is a single shuffle on vec_id, and lineage is cut per
    * step (localCheckpoint) so the plan does not deepen. Output: the
    * top-10 authorities (total-ordered by (rank, vec_id)) with
    * in-degrees. */
  def knnPagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = directedEdges(spark, dir).select("qid", "nid")
    val deg = edges.groupBy("qid").agg(count(lit(1)).as("d"))
    val e = edges.join(deg, Seq("qid")).cut
    val nodes = Tables.embeddings(spark, dir).select(col("vec_id"))
    val base = nodes.agg(expr("1000000000 div COUNT(*)").as("b"))
    var r = nodes.crossJoin(broadcast(base))
      .select(col("vec_id"), col("b").as("r"))
      .cut
    for (_ <- 1 to 6) {
      val contrib = e
        .join(r.withColumnRenamed("vec_id", "qid"), Seq("qid"))
        .select(col("nid"), expr("r div d").as("c"))
        .groupBy("nid").agg(sum(col("c")).as("in_m"))
      // LAZY cut: the iteration count is FIXED (no per-round
      // convergence action), so nothing needs each step materialized
      // eagerly — the lazy checkpoint still truncates the downstream
      // PLAN at each step (no deepening), and the final action
      // materializes the chain without 6 separate driver round-trips
      r = nodes.crossJoin(broadcast(base))
        .join(contrib.withColumnRenamed("nid", "vec_id"),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          expr("(150 * b + 850 * coalesce(in_m, 0)) div 1000").as("r"))
        .cutLazy
    }
    val indeg = edges.groupBy(col("nid")).agg(count(lit(1)).as("in_deg"))
    r.join(indeg.withColumnRenamed("nid", "vec_id"),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("r").as("r_ppb"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      // corpus-proportional top-K: TakeOrderedAndProject, not reportSort
      .orderBy(desc("r_ppb"), col("vec_id")).limit(10)
  }

  /** 6 unrolled superstep CTEs (recursive CTEs disallow the
    * aggregation each step needs) — the identical integer lattice. */
  val knnPagerankSql: String = {
    val steps = (1 to 6).map { i =>
      s"""c$i AS (
         |  SELECT k.nid, SUM(p${i - 1}.r // dg.d) AS in_m
         |  FROM k JOIN dg USING (qid)
         |  JOIN p${i - 1} ON p${i - 1}.vec_id = k.qid
         |  GROUP BY 1),
         |p$i AS (
         |  SELECT nd.vec_id,
         |    (150 * b.b + 850 * COALESCE(c$i.in_m, 0)) // 1000 AS r
         |  FROM nd CROSS JOIN b LEFT JOIN c$i ON c$i.nid = nd.vec_id)"""
        .stripMargin
    }.mkString(",\n")
    s"""$knnDirectedCte,
       |dg AS (SELECT qid, COUNT(*) AS d FROM k GROUP BY 1),
       |nd AS (SELECT vec_id FROM embeddings),
       |b AS (SELECT 1000000000 // COUNT(*) AS b FROM nd),
       |p0 AS (SELECT nd.vec_id, b.b AS r FROM nd CROSS JOIN b),
       |$steps,
       |ind AS (SELECT nid AS vec_id, COUNT(*) AS in_deg FROM k
       |  GROUP BY 1)
       |SELECT p6.vec_id AS vec_id, CAST(p6.r AS BIGINT) AS r_ppb,
       |  CAST(COALESCE(ind.in_deg, 0) AS BIGINT) AS in_deg
       |FROM p6 LEFT JOIN ind ON ind.vec_id = p6.vec_id
       |ORDER BY r_ppb DESC, p6.vec_id LIMIT 10""".stripMargin
  }

  // -------------------------------------------------- emb_twonn_ratio
  /** TwoNN NEIGHBOR-RATIO AUDIT — the intrinsic-dimension probe of
    * Facco et al. (2017): under the local-manifold model the ratio
    * μ = d₂/d₁ of each point's second- to first-neighbor distance is
    * distributed P(μ ≤ x) = 1 − x^(−d) with d the INTRINSIC dimension
    * — so the distribution of μ² (on unit-normalized vectors,
    * d² = 2−2·cos, so μ² = (1−c₂)/(1−c₁)) reads off how "thin" the
    * embedding manifold really is regardless of ambient width: a
    * heavy mass of μ²_pm near 1000 (d₁ ≈ d₂) means a dense/duplicated
    * manifold where ANN recall is hard; f4_pm = P(μ² ≤ 4)·1000
    * estimates 1 − 2^(−d) at x = 2 (≈ 500‰ ⇒ d ≈ 1, 750‰ ⇒ d ≈ 2,
    * 937‰ ⇒ d ≈ 4). Rides the PERSISTED directed-edge layout
    * ([[directedEdges]] rank ≤ 2) with two skinny joins back to the
    * normalized vectors for the cosines — no new candidate pass, no
    * all-pairs anywhere. Exact-duplicate neighbors (c₁ ≥ 1, μ
    * undefined) are counted separately; the μ²_pm median resolves via
    * [[graft.ops.OrderStats.radixRankSelect]]. Float ops are the
    * same IEEE sequence in both engines (dot → 1−c → divide → ×1000
    * → floor), so the audit is hash-verified, not approximate. */
  def embTwonnRatio(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val ed = directedEdges(spark, dir).filter(col("rank") <= 2)
    val n = normalizedWithLabel(Tables.embeddings(spark, dir))
    val mu = ed
      .join(n.select(col("vec_id").as("qid"), col("label"),
        col("e").as("qe")), Seq("qid"))
      .join(n.select(col("vec_id").as("nid"), col("e").as("ne")),
        Seq("nid"))
      .select(col("qid"), col("label"), col("rank"),
        fastDot(col("qe"), col("ne")).as("c"))
      .groupBy("qid", "label")
      .agg(max(when(col("rank") === 1, col("c"))).as("c1"),
        max(when(col("rank") === 2, col("c"))).as("c2"))
      .filter(col("c2").isNotNull)
      .select(col("label"),
        when(col("c1") >= 1.0, lit(null).cast("long"))
          .otherwise(least(
            floor((lit(1.0) - col("c2")) / (lit(1.0) - col("c1"))
              * lit(1000.0)),
            lit(100000L))).as("mu2_pm"))
      .cut // 2 consumers: rollup + median select
    val roll = mu.groupBy("label").agg(
      count(lit(1)).as("n"),
      sum(when(col("mu2_pm").isNull, 1L).otherwise(0L)).as("n_dup"),
      expr("SUM(CASE WHEN mu2_pm <= 4000 THEN 1 ELSE 0 END) * 1000" +
        " div COUNT(*)").as("f4_pm"))
    val med = graft.ops.OrderStats.radixRankSelect(
        mu.filter(col("mu2_pm").isNotNull), Seq("label"), "mu2_pm",
        Seq("p50" -> expr("(n + 1) div 2")))
      .select(col("label"), col("sel_value").as("mu2_p50_pm"))
    roll.join(med, Seq("label")).reportSort("label")
  }

  val embTwonnRatioSql: String =
    s"""$knnDirectedCte,
       |cc AS (
       |  SELECT k2.qid, s.c, k2.rank
       |  FROM (SELECT * FROM ranked WHERE rank <= 2) k2
       |  JOIN scored s ON s.qid = k2.qid AND s.nid = k2.nid),
       |p AS (
       |  SELECT cc.qid, n.label,
       |    MAX(CASE WHEN rank = 1 THEN c END) AS c1,
       |    MAX(CASE WHEN rank = 2 THEN c END) AS c2
       |  FROM cc JOIN n ON n.vec_id = cc.qid
       |  GROUP BY 1, 2
       |  HAVING MAX(CASE WHEN rank = 2 THEN c END) IS NOT NULL),
       |mu AS (
       |  SELECT label,
       |    CASE WHEN c1 >= 1 THEN NULL
       |      ELSE CAST(LEAST(FLOOR((1 - c2) / (1 - c1) * 1000),
       |        100000) AS BIGINT) END AS mu2_pm
       |  FROM p),
       |roll AS (
       |  SELECT label, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN mu2_pm IS NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_dup,
       |    CAST(SUM(CASE WHEN mu2_pm <= 4000 THEN 1 ELSE 0 END) * 1000
       |      // COUNT(*) AS BIGINT) AS f4_pm
       |  FROM mu GROUP BY 1),
       |h AS (
       |  SELECT label, mu2_pm, COUNT(*) AS cnt FROM mu
       |  WHERE mu2_pm IS NOT NULL GROUP BY 1, 2),
       |cum AS (
       |  SELECT label, mu2_pm,
       |    SUM(cnt) OVER (PARTITION BY label ORDER BY mu2_pm) AS hi
       |  FROM h),
       |nv AS (
       |  SELECT label, COUNT(*) AS nv FROM mu
       |  WHERE mu2_pm IS NOT NULL GROUP BY 1),
       |med AS (
       |  SELECT c.label, MIN(c.mu2_pm) AS mu2_p50_pm
       |  FROM nv JOIN cum c
       |    ON c.label = nv.label AND c.hi >= (nv.nv + 1) // 2
       |  GROUP BY 1)
       |SELECT r.label, r.n, r.n_dup, r.f4_pm, m.mu2_p50_pm
       |FROM roll r JOIN med m ON m.label = r.label
       |ORDER BY r.label""".stripMargin

  // ----------------------------------------------------- knn_hubness
  /** Hubness audit of the directed k-NN relation — the
    * high-dimensional pathology (Radovanović et al., JMLR 2010) where
    * a few "hub" vectors appear in everyone's top-k while "orphans"
    * are never retrieved at all: the in-degree DISTRIBUTION of the
    * directed top-5 edges, one row per in-degree d with how many
    * vectors have it, d = 0 (the orphans, invisible to any
    * retrieval) included via a 1-row total probe. Heavy right tail →
    * hubs distorting the mutual graph and every retrieval metric;
    * the |degrees|-row report is what an index operator thresholds.
    * Scale: one hash-agg over the memoized directed edge set
    * (≤ k·n skinny rows), then a histogram of the |nodes|-row
    * in-degree frame — nothing corpus-shaped past the shared
    * candidate pass. */
  def knnHubness(spark: SparkSession, dir: String): DataFrame = {
    val k = directedEdges(spark, dir)
    val indeg = k.groupBy(col("nid")).agg(count(lit(1)).as("d"))
    val hist = indeg.groupBy("d").agg(count(lit(1)).as("n_nodes"))
    val tot = Tables.embeddings(spark, dir)
      .agg(count(lit(1)).as("_n"))
    val chosen = indeg.agg(count(lit(1)).as("_c"))
    val zero = tot.crossJoin(broadcast(chosen))
      .select(lit(0L).as("d"), (col("_n") - col("_c")).as("n_nodes"))
      .filter(col("n_nodes") > 0)
    hist.unionByName(zero).reportSort("d")
  }

  val knnHubnessSql: String =
    s"""$knnDirectedCte,
       |ind AS (SELECT nid, COUNT(*) AS d FROM k GROUP BY 1),
       |h AS (
       |  SELECT CAST(d AS BIGINT) AS d, COUNT(*) AS n_nodes
       |  FROM ind GROUP BY 1),
       |z AS (
       |  SELECT CAST(0 AS BIGINT) AS d,
       |    (SELECT COUNT(*) FROM n) - (SELECT COUNT(*) FROM ind)
       |      AS n_nodes)
       |SELECT d, CAST(n_nodes AS BIGINT) AS n_nodes FROM h
       |UNION ALL
       |SELECT d, CAST(n_nodes AS BIGINT) FROM z WHERE n_nodes > 0
       |ORDER BY d""".stripMargin

  // ---------------------------------------------------- knn_triangles
  /** Triangle census of the mutual k-NN graph — the local-density
    * signal that separates tight semantic clusters (neighbors of
    * neighbors are neighbors) from chains and noise, and the standard
    * smell test on an ANN index's graph quality. Classic distributed
    * triangle counting: with the canonical a<b edge list, a triangle
    * {x<y<z} is counted exactly once as wedge (x,y)+(x,z) closed by
    * edge (y,z) — two equi-joins on the skinny edge list. The usual
    * hub hazard (a degree-d node spawns d² wedges) is structurally
    * absent here: mutual-kNN degree is ≤ k by construction, so wedge
    * fan-out is ≤ k(k−1)/2 per node at ANY corpus size (for general
    * graphs the degree-ordered orientation restores that bound).
    * Output: nodes/edges/wedges/triangles and the global clustering
    * coefficient (3·triangles per wedge, in per-mille). */
  def knnTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = mutualEdges(spark, dir).select(col("a"), col("b"))
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val wedges = e.select(col("a"), col("b").as("x"))
      .join(e.select(col("a"), col("b").as("y")), "a")
      .filter(col("x") < col("y"))
    val closing = e.select(col("a").as("x"), col("b").as("y"))
    val tri = wedges.join(closing, Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(d * (d - 1)) div 2").as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("3 * n_triangles * 1000 div n_wedges").as("clustering_pm"))
  }

  val knnTrianglesSql: String =
    s"""WITH g AS (SELECT a, b FROM ($knnGraphSql) t),
       |deg AS (
       |  SELECT v, COUNT(*) AS d FROM (
       |    SELECT a AS v FROM g UNION ALL SELECT b FROM g) z
       |  GROUP BY v),
       |tri AS (
       |  SELECT COUNT(*) AS n_triangles
       |  FROM g e1 JOIN g e2 ON e2.a = e1.a AND e2.b > e1.b
       |  WHERE EXISTS (SELECT 1 FROM g e3
       |                WHERE e3.a = e1.b AND e3.b = e2.b)),
       |s AS (
       |  SELECT COUNT(*) AS n_nodes,
       |    CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges
       |  FROM deg),
       |ne AS (SELECT COUNT(*) AS n_edges FROM g)
       |SELECT s.n_nodes, ne.n_edges, s.n_wedges,
       |  CAST(tri.n_triangles AS BIGINT) AS n_triangles,
       |  CAST(3 * tri.n_triangles * 1000 // s.n_wedges AS BIGINT)
       |    AS clustering_pm
       |FROM s, ne, tri""".stripMargin

  // -------------------------------------------------------- knn_range
  /** Radius (range) similarity search: ALL neighbors with cosine ≥
    * threshold per query — the retrieval mode leakage/copyright
    * filters need (every match matters, not just the top k).
    * Normalize-once + codegen dot; degenerate (zero/NaN-norm) vectors
    * excluded on BOTH engines up front — NaN orders above any
    * threshold, so an unguarded `>=` would leak undefined-cosine
    * pairs. Query side broadcast over corpus partitions; ids only
    * cross the oracle boundary. At corpus scale the same IVF-cell
    * pruning as `Dedup.embeddingPairs` bounds the candidate set; this
    * is the exact baseline it verifies against. */
  def rangeSearch(emb: DataFrame, queries: DataFrame,
      threshold: Double): DataFrame = {
    val dbl = col("embedding").cast("array<double>")
    val nrm2 = fastDot(dbl, dbl)
    def finite(df: DataFrame) =
      df.filter(nrm2 > lit(0.0) && nrm2 < lit(Double.PositiveInfinity))
    val q = finite(queries)
      .select(col("vec_id").as("qid"), norm(col("embedding")).as("qe"))
    val c = finite(emb)
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("nid"), norm(col("embedding")).as("ne"))
    broadcast(q).join(c, col("qid") =!= col("nid"))
      .filter(fastDot(col("qe"), col("ne")) >= threshold)
      .select("qid", "nid")
  }

  def knnRange(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    rangeSearch(emb, emb.filter(col("vec_id") < 10), 0.2)
      .orderBy("qid", "nid")
  }

  val knnRangeSql: String =
    s"""WITH f AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings
       |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                                  CAST(embedding AS DOUBLE[])))
       |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
       |                         CAST(embedding AS DOUBLE[])) > 0),
       |n AS (
       |  SELECT vec_id,
       |    list_transform(e0, x -> x / sqrt(list_dot_product(e0, e0))) AS e
       |  FROM f)
       |SELECT q.vec_id AS qid, c.vec_id AS nid
       |FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |WHERE q.vec_id < 10 AND list_dot_product(q.e, c.e) >= 0.2
       |ORDER BY qid, nid""".stripMargin

  // ------------------------------------------------ knn_recall_audit
  /** Recall audit of the approximate ANN paths against the exact
    * baseline — THE number an ANN deployment is tuned by: for each
    * query, how many of the true top-k survive in the LSH and IVF
    * (centroid) results. Composes the oracle-verified operators
    * unchanged and reports, per method, the query count, total hits
    * (Σ overlap@k — recall@5 = n_hits/(n_queries·5)) and the worst
    * query's overlap (the tail a p99 SLO cares about, which an
    * average hides). Integers only.
    *
    * Scale shape: each approximate result is ≤ q·k rows, so the audit
    * join is trivia next to the searches themselves — this runs as a
    * continuous canary over a sampled query set in production. */
  def knnRecall(spark: SparkSession, dir: String): DataFrame = {
    // all three lists ride the session memos (already checkpointed —
    // no per-key localCheckpoint, no reportSort coalesce mid-plan)
    val brute = bruteList(spark, dir).select("qid", "nid")
    def audit(method: String, approx: DataFrame): DataFrame =
      brute.join(
          approx.select(col("qid"), col("nid"), lit(1L).as("hit")),
          Seq("qid", "nid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("n_hits"),
          min(col("hits")).as("min_hits"))
        .select(lit(method).as("method"), col("n_queries"),
          col("n_hits"), col("min_hits"))
    audit("centroid", centroidList(spark, dir))
      .unionByName(audit("lsh", lshList(spark, dir)))
      .reportSort("method")
  }

  val knnRecallSql: String =
    s"""WITH brute AS ($knnBruteSql),
       |l AS ($knnLshSql),
       |c AS ($knnCentroidSql),
       |pairs AS (
       |  SELECT 'centroid' AS method, b.qid,
       |    CASE WHEN x.nid IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM brute b LEFT JOIN c x ON b.qid = x.qid AND b.nid = x.nid
       |  UNION ALL
       |  SELECT 'lsh', b.qid,
       |    CASE WHEN y.nid IS NOT NULL THEN 1 ELSE 0 END
       |  FROM brute b LEFT JOIN l y ON b.qid = y.qid AND b.nid = y.nid),
       |perq AS (
       |  SELECT method, qid, SUM(hit) AS hits FROM pairs GROUP BY 1, 2)
       |SELECT method, COUNT(*) AS n_queries,
       |  CAST(SUM(hits) AS BIGINT) AS n_hits,
       |  CAST(MIN(hits) AS BIGINT) AS min_hits
       |FROM perq GROUP BY method ORDER BY method""".stripMargin

  // ------------------------------------------------- knn_probe_sweep
  /** Recall-vs-nProbe tuning curve — THE dial an IVF deployment sets:
    * each extra probed cell buys recall at linear candidate cost, and
    * this table (recall@5 against the exact baseline for nProbe =
    * 1, 2, 3) is how the knee is chosen. Composes the oracle-verified
    * [[centroidKnn]] at each probe count against [[knnBrute]]; every
    * audit join runs on ≤ q·k rows. Recall is monotone in nProbe by
    * construction (probe sets nest) — a non-monotone row means the
    * index is broken, which is why the sweep, not a single point, is
    * the production canary. */
  def knnProbeSweep(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val brute = bruteList(spark, dir).select("qid", "nid")
      // 3 audit consumers — already a checkpointed session memo
    // Probe sets NEST (the same fact the sweep's monotonicity reading
    // relies on), so the three [[centroidKnn]] compositions collapse
    // to ONE candidate pass at the largest probe count with the probe
    // rank kept per candidate; recall@p then re-ranks the SKINNY
    // scored frame filtered to prk ≤ p — identical results (each
    // corpus vector lives in exactly one cell, so a candidate pair
    // appears once, with one probe rank), one IVF pipeline instead of
    // three. The r12-before form re-built normalize/seed/assign/score
    // per probe point (3× the candidate work for nested subsets); the
    // assignment itself now rides the session memo.
    val rc = rankedCellsDefault(spark, dir)
    val assigned = rc.filter(col("_rk") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    val probes = rc.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("cell"),
        col("_rk").as("prk"))
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("prk"), col("vec_id").as("nid"),
        fastDot(col("qe"), col("e")).as("c"))
      .cut // ≤ q·(3 cells' members) skinny rows, 3 consumers
    def audit(p: Int): DataFrame = {
      val knn = scored.filter(col("prk") <= p)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(desc("c"), col("nid"))))
        .filter(col("rank") <= 5)
      brute.join(knn.select(col("qid"), col("nid"), lit(1L).as("hit")),
          Seq("qid", "nid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("n_hits"),
          min(col("hits")).as("min_hits"))
        .select(lit(p).as("n_probe"), col("n_queries"), col("n_hits"),
          col("min_hits"))
    }
    (1 to 3).map(audit).reduce(_.unionByName(_)).reportSort("n_probe")
  }

  val knnProbeSweepSql: String = {
    // the centroid oracle with its probe bound re-templated per point
    def block(p: Int) =
      s"""SELECT $p AS n_probe, COUNT(*) AS n_queries,
         |  CAST(SUM(hits) AS BIGINT) AS n_hits,
         |  CAST(MIN(hits) AS BIGINT) AS min_hits
         |FROM (
         |  SELECT b.qid,
         |    SUM(CASE WHEN x.nid IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM ($knnBruteSql) b
         |  LEFT JOIN (${knnCentroidSql.replace("rk <= 3", s"rk <= $p")}) x
         |    ON b.qid = x.qid AND b.nid = x.nid
         |  GROUP BY b.qid) q$p""".stripMargin
    (1 to 3).map(block).mkString("", "\nUNION ALL\n", "\nORDER BY n_probe")
  }

  // --------------------------------------------------- knn_filtered
  /** FILTERED vector search — top-k under a metadata predicate, the
    * operation every production vector store exposes (tenant/shard/
    * attribute-scoped search). This is the PRE-filter shape: the
    * predicate prunes the corpus BEFORE any dot product (here a plain
    * Catalyst filter the parquet scan can push down), so recall is
    * exact over the qualifying set — unlike post-filtering a top-k',
    * which silently under-fills when the predicate is selective. At
    * scale the same composition holds through the IVF path (filter
    * inside each probed cell); the exact baseline is what the gate
    * verifies. Predicate: even label. */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    bruteForce(emb.filter(col("label") % 2 === 0),
      emb.filter(col("vec_id") < 10), 5).reportSort("qid", "rank")
  }

  val knnFilteredSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    list_dot_product(q.e, c.e) AS c
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10 AND c.label % 2 = 0),
       |ranked AS (
       |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY c DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid
       |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------------- knn_rerank
  /** Two-stage retrieval: a CHEAP quantized shortlist generated INSIDE
    * the IVF probe, then an exact re-rank of only the survivors — the
    * pattern every production ANN stack ends with (the index prunes,
    * the quantized code cheapens the candidate score, the re-ranker
    * restores the true metric). Stage 1 rides the SAME cell machinery
    * as [[centroidKnn]] — deterministic seeds, argmax assignment,
    * nProbe=3 probed cells per query — so candidate generation touches
    * only probed-cell members (≈ nProbe·n/cells rows per query), never
    * the whole corpus, and scores int6-quantized components (⌊64x⌋ —
    * integer-valued doubles, exact in BOTH engines, no float-rounding
    * divergence at the shortlist boundary). Stage 2 re-scores the L=20
    * survivors with the exact normalized dot and keeps top-5,
    * reporting each hit's stage-1 rank (>5 values prove the re-rank
    * actually reorders). At yet larger scale stage 1 swaps the
    * quantized dot for PQ-ADC over the same probed cells
    * ([[EmbOps]]'s knn_ivf_pq) and stage 2 fetches survivors by id —
    * the plan shape here is already that one. */
  def knnRerank(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    // codegen quantizer (graft_floor_scale) — the transform() HOF
    // formulation is CodegenFallback, an interpreted loop in the
    // corpus-side hot path
    def qz(c: Column): Column =
      call_function(VectorExprs.floorScaleName, c, lit(64.0))
    // corpus→cell argmax assignment and query probes both ride the
    // memoized default ranking; the quantized codes attach on top
    val rc = rankedCellsDefault(spark, dir)
    val assigned = rc.filter(col("_rk") === 1)
      .select(col("vec_id").as("nid"), col("e").as("ne"), col("cell"))
      .withColumn("nz", qz(col("ne")))
    val probes = rc.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        qz(col("e")).as("qz"), col("cell"))
    // stage 1: quantized dots over probed-cell members ONLY
    val short = probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        fastDot(col("qz"), col("nz")).as("zc"),
        fastDot(col("qe"), col("ne")).as("c"))
      .withColumn("stage1_rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("zc"), col("nid"))).cast("long"))
      .filter(col("stage1_rank") <= 20)
    short
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("nid"), col("stage1_rank"))
      .reportSort("qid", "rank")
  }

  val knnRerankSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |seeds AS (
       |  SELECT label AS cell, e AS ce FROM (
       |    SELECT label, e, ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY vec_id) AS r
       |    FROM n)
       |  WHERE r = 1),
       |assigned AS (
       |  SELECT nid, ne, cell,
       |    list_transform(ne, x -> CAST(FLOOR(x * 64) AS DOUBLE)) AS nz
       |  FROM (
       |    SELECT nn.vec_id AS nid, nn.e AS ne, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s)
       |  WHERE rk = 1),
       |probes AS (
       |  SELECT qid, qe,
       |    list_transform(qe, x -> CAST(FLOOR(x * 64) AS DOUBLE)) AS qz,
       |    cell
       |  FROM (
       |    SELECT nn.vec_id AS qid, nn.e AS qe, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s WHERE nn.vec_id < 10)
       |  WHERE rk <= 3),
       |s1 AS (
       |  SELECT p.qid, a.nid,
       |    list_dot_product(p.qz, a.nz) AS zc,
       |    list_dot_product(p.qe, a.ne) AS c
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  WHERE p.qid <> a.nid),
       |r1 AS (
       |  SELECT qid, nid, c, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY zc DESC, nid) AS stage1_rank
       |  FROM s1),
       |r2 AS (
       |  SELECT qid, nid, stage1_rank, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY c DESC, nid) AS rank
       |  FROM r1 WHERE stage1_rank <= 20)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid,
       |  CAST(stage1_rank AS BIGINT) AS stage1_rank
       |FROM r2 WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------- knn_loo_label
  /** Leave-one-out 1-NN label agreement — the embedding-quality eval
    * every labeled vector corpus runs before trusting its labels (or
    * its embedding model): for each query, does the nearest OTHER
    * vector share its label? Per label: query count, agreement count,
    * exact per-mille. Evaluation is EXACT by definition (it is the
    * ground truth other ANN ops' recall is measured against), and runs
    * over a deterministic ~10% hash-gated query sample — the standard
    * eval-set shape, so the corpus-side scan is paid once per eval,
    * not per vector; the sample rides the [[bruteForce]] broadcast
    * (queries broadcast, corpus streamed — never the reverse). */
  def knnLooLabel(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val sample = emb.filter(pmod(
      graft.mask.MaskFunctions.portableHash(col("vec_id")), lit(10)) === 0L)
    val lbl = emb.select(col("vec_id"), col("label"))
    bruteForce(emb, sample, 1)
      .join(lbl.select(col("vec_id").as("qid"), col("label").as("q_label")),
        "qid")
      .join(lbl.select(col("vec_id").as("nid"), col("label").as("n_label")),
        "nid")
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("q_label") === col("n_label"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("agree_pm", expr("n_agree * 1000 div n_queries"))
      .reportSort("label")
  }

  val knnLooLabelSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |q AS (
       |  SELECT * FROM n
       |  WHERE ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT
       |    % 10 = 0),
       |scored AS (
       |  SELECT q.vec_id AS qid, q.label AS q_label,
       |    c.vec_id AS nid, c.label AS n_label,
       |    list_dot_product(q.e, c.e) AS c
       |  FROM q JOIN n c ON q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT qid, q_label, n_label, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY c DESC, nid) AS rk
       |  FROM scored)
       |SELECT q_label AS label, COUNT(*) AS n_queries,
       |  CAST(SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_agree,
       |  CAST(SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)
       |    * 1000 // COUNT(*) AS BIGINT) AS agree_pm
       |FROM ranked WHERE rk = 1
       |GROUP BY q_label ORDER BY label""".stripMargin

  // ------------------------------------------------ knn_graph_clusters
  /** Semantic clustering = connected components over the mutual k-NN
    * graph (the SemDeDup shape: mutual-neighbor edges are the
    * conservative "actually similar" relation, and their components
    * are the semantic duplicate groups a curation pipeline keeps one
    * representative of). Pure composition of machinery the repo
    * already owns — [[knnGraph]]'s cell-bounded mutual edges feed
    * [[graft.dedup.Dedup.components]]' pointer-jumping label
    * propagation — so the scale properties are inherited: candidate
    * generation never leaves probed cells, components never exceed
    * O(log d) rounds of combiner-friendly min-aggs. Per cluster: its
    * size, how many distinct TRUE labels it mixes, the modal label's
    * count, and exact purity per-mille — the eval that says whether
    * unsupervised structure recovers the labeling. */
  def knnGraphClusters(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val edges = mutualEdges(spark, dir)
    val lbls = graft.dedup.Dedup.components(
      emb.select(col("vec_id").as("doc_id")),
      edges.select(col("a").as("d1"), col("b").as("d2")))
    lbls.join(emb.select(col("vec_id").as("doc_id"), col("label")),
        "doc_id")
      .groupBy(col("lbl").as("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy("cluster")
      .agg(sum(col("c")).as("n_vectors"),
        count(lit(1)).as("n_labels"), max(col("c")).as("n_top"))
      .withColumn("purity_pm", expr("n_top * 1000 div n_vectors"))
      .orderBy("cluster")
  }

  val knnGraphClustersSql: String =
    s"""WITH RECURSIVE g AS (SELECT * FROM ($knnGraphSql) t),
       |edges AS (
       |  SELECT a AS d1, b AS d2 FROM g
       |  UNION ALL SELECT b AS d1, a AS d2 FROM g),
       |reach(id, lbl) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.d1, r.lbl FROM edges e JOIN reach r ON r.id = e.d2),
       |lbls AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
       |pl AS (
       |  SELECT l.lbl AS cluster, em.label, COUNT(*) AS c
       |  FROM lbls l JOIN embeddings em ON em.vec_id = l.id
       |  GROUP BY 1, 2)
       |SELECT cluster, CAST(SUM(c) AS BIGINT) AS n_vectors,
       |  CAST(COUNT(*) AS BIGINT) AS n_labels,
       |  CAST(MAX(c) AS BIGINT) AS n_top,
       |  CAST(MAX(c) * 1000 // SUM(c) AS BIGINT) AS purity_pm
       |FROM pl GROUP BY cluster ORDER BY cluster""".stripMargin

  // ------------------------------------------------------ knn_dbscan
  /** Density-based clustering (DBSCAN, Ester et al. 1996) on the
    * cosine-neighbor relation — the curation clustering that, unlike
    * k-means/IVF cells, needs no cluster count and leaves genuine
    * outliers UNclustered (the docs a dedup pipeline should keep):
    *   - neighbors: cosine ≥ eps (0.30), generated EXACTLY by
    *     [[graft.dedup.Dedup.embeddingPairs]]' IVF-cell +
    *     triangle-inequality pruning — never all-pairs;
    *   - core: ≥ minPts (3) neighbors, one count over the symmetric
    *     pair list (a combiner-friendly hash-agg on vec_id);
    *   - clusters: connected components over CORE–CORE edges only
    *     (semi-joins keep the skinny edge list skinny), via the
    *     pointer-jumping [[graft.dedup.Dedup.components]] machinery —
    *     density-reachability collapses to connectivity on cores;
    *   - border: non-core with a core neighbor joins its MIN-labeled
    *     adjacent cluster (deterministic tie-break); the rest is
    *     noise (cluster −1).
    * Every stage is a keyed shuffle on ids or a bounded hash-agg; the
    * only iteration is the O(log diameter) component loop. Ids and
    * roles only cross the oracle boundary — the oracle rebuilds the
    * identical neighbor set by brute force and the identical closure
    * by recursive CTE. */
  def knnDbscan(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    // the neighbor set feeds degree, core-edge, and border stages —
    // checkpoint the skinny id-pair list so the cell-pruned candidate
    // generation (normalize + assign + radii + verify) runs ONCE
    val pairs = graft.dedup.Dedup.embeddingPairs(emb, 0.30)
      .select("id1", "id2").cut
    val sym = pairs.select(col("id1").as("v"), col("id2").as("w"))
      .union(pairs.select(col("id2").as("v"), col("id1").as("w")))
    val core = sym.groupBy("v").agg(count(lit(1)).as("_deg"))
      .filter(col("_deg") >= 3L).select(col("v").as("core_id"))
    val coreEdges = pairs
      .join(core.withColumnRenamed("core_id", "id1"), Seq("id1"), "left_semi")
      .join(core.withColumnRenamed("core_id", "id2"), Seq("id2"), "left_semi")
    val coreLbl = graft.dedup.Dedup.components(
        core.select(col("core_id").as("doc_id")),
        coreEdges.select(col("id1").as("d1"), col("id2").as("d2")))
      .select(col("doc_id").as("vec_id"), col("lbl").as("_core_cluster"))
    val borderLbl = sym
      .join(coreLbl.withColumnRenamed("vec_id", "w")
        .withColumnRenamed("_core_cluster", "_c"), Seq("w"))
      .join(core.withColumnRenamed("core_id", "v"), Seq("v"), "left_anti")
      .groupBy(col("v").as("vec_id"))
      .agg(min(col("_c")).as("_border_cluster"))
    emb.select(col("vec_id"))
      .join(coreLbl, Seq("vec_id"), "left")
      .join(borderLbl, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("_core_cluster").isNotNull, lit("core"))
          .when(col("_border_cluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("_core_cluster"), col("_border_cluster"), lit(-1L))
          .as("cluster"))
      .orderBy("vec_id")
  }

  val knnDbscanSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS e
      |  FROM embeddings
      |  WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                  CAST(embedding AS DOUBLE[])))
      |    AND list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |pairs AS (
      |  SELECT a.vec_id AS d1, b.vec_id AS d2
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.e, b.e) >= 0.30),
      |sym AS (SELECT d1 AS v, d2 AS w FROM pairs
      |        UNION ALL SELECT d2, d1 FROM pairs),
      |core AS (SELECT v FROM sym GROUP BY v HAVING COUNT(*) >= 3),
      |ce AS (
      |  SELECT s.v, s.w FROM sym s
      |  JOIN core c1 ON c1.v = s.v JOIN core c2 ON c2.v = s.w),
      |reach(id, lbl) AS (
      |  SELECT v, v FROM core
      |  UNION
      |  SELECT e.v, r.lbl FROM ce e JOIN reach r ON r.id = e.w),
      |lbls AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
      |border AS (
      |  SELECT s.v, MIN(l.lbl) AS lbl
      |  FROM sym s JOIN lbls l ON l.id = s.w
      |  WHERE s.v NOT IN (SELECT v FROM core)
      |  GROUP BY s.v)
      |SELECT em.vec_id,
      |  CASE WHEN lc.lbl IS NOT NULL THEN 'core'
      |       WHEN b.lbl IS NOT NULL THEN 'border'
      |       ELSE 'noise' END AS role,
      |  COALESCE(lc.lbl, b.lbl, -1) AS cluster
      |FROM embeddings em
      |LEFT JOIN lbls lc ON lc.id = em.vec_id
      |LEFT JOIN border b ON b.v = em.vec_id
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------- knn_centrality
  /** Graph centrality over the mutual k-NN graph by EXACT integer
    * mass routing — the PageRank-shaped "which vectors anchor the
    * semantic neighborhood" signal (hub docs make good cluster
    * exemplars; perpetual donors are fringe): every node starts with
    * 1000 milli-units; each of K = 3 rounds sends floor(mass/deg)
    * along every edge and keeps the remainder, so total mass is
    * conserved EXACTLY (Σ = 1000·n, spec-pinned) and no float
    * damping crosses the oracle boundary. Per round: one keyed join
    * (edges × masses on the sender) + one combiner-friendly
    * receiver hash-agg — the [[graft.dedup.Dedup.components]] plan
    * shape, K fixed, lineage cut per round. The graph is the
    * memoized [[mutualEdges]] set; the oracle unrolls the same K
    * rounds over the recursive-CTE-free edge list. */
  def knnCentrality(spark: SparkSession, dir: String): DataFrame = {
    val edges = mutualEdges(spark, dir)
      .select(col("a"), col("b"))
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      .cut
    val deg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("deg"))
      .cut
    var masses = deg.select(col("v"), lit(1000L).as("mass"))
    for (_ <- 1 to 3) {
      val share = masses.join(deg, Seq("v"))
        .select(col("v"), (col("mass") % col("deg")).as("rem"),
          expr("mass div deg").as("out"))
      val incoming = sym
        .join(share.select(col("v").as("a"), col("out")), Seq("a"))
        .groupBy(col("b").as("v")).agg(sum(col("out")).as("inc"))
      // lazy cut — K is fixed, no per-round action (see knnPagerank)
      masses = share.select(col("v"), col("rem"))
        .join(incoming, Seq("v"), "left")
        .select(col("v"),
          (col("rem") + coalesce(col("inc"), lit(0L))).as("mass"))
        .cutLazy
    }
    masses.join(deg, Seq("v"))
      .select(col("v").as("vec_id"), col("deg"), col("mass"))
      .orderBy("vec_id")
  }

  val knnCentralitySql: String = {
    def round(i: Int): String =
      s"""s$i AS (
         |  SELECT m.v, m.mass % d.deg AS rem, m.mass // d.deg AS outm
         |  FROM m${i - 1} m JOIN deg d ON d.v = m.v),
         |i$i AS (
         |  SELECT e.b AS v, SUM(s.outm) AS inc
         |  FROM sym e JOIN s$i s ON s.v = e.a GROUP BY e.b),
         |m$i AS (
         |  SELECT s.v, s.rem + COALESCE(i.inc, 0) AS mass
         |  FROM s$i s LEFT JOIN i$i i ON i.v = s.v)"""
        .stripMargin
    s"""WITH g AS (SELECT a, b FROM ($knnGraphSql) t),
       |sym AS (SELECT a, b FROM g UNION ALL SELECT b, a FROM g),
       |deg AS (SELECT a AS v, COUNT(*) AS deg FROM sym GROUP BY a),
       |m0 AS (SELECT v, 1000 AS mass FROM deg),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT m.v AS vec_id, CAST(d.deg AS BIGINT) AS deg,
       |  CAST(m.mass AS BIGINT) AS mass
       |FROM m3 m JOIN deg d ON d.v = m.v ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------- knn_mrr
  /** MEAN RECIPROCAL RANK of the approximate retrievers — the metric
    * that grades WHERE the true nearest neighbor lands in the
    * approximate list, which recall@k (a set-overlap count) cannot
    * see: an index that returns the true NN at rank 5 every time has
    * perfect recall@5 and terrible MRR. Composes the oracle-verified
    * exact top-1 against the LSH and IVF results; reciprocal ranks
    * stay EXACT integers by the lcm trick (60/rank ∈ {60,30,20,15,12}
    * for k=5, 0 when the true NN is missed), so the mean is a pure
    * integer ratio in per-mille. The audit join is ≤ q·k rows — a
    * production canary beside [[knnRecall]] and [[knnProbeSweep]]. */
  def knnMrr(spark: SparkSession, dir: String): DataFrame = {
    // both audits probe the same exact-brute baseline — the session
    // memo (already checkpointed; the filter over it is trivial)
    val top1 = bruteList(spark, dir).filter(col("rank") === 1)
      .select("qid", "nid")
    def audit(method: String, approx: DataFrame): DataFrame =
      top1.join(
          approx.select(col("qid"), col("nid"),
            col("rank").cast("long").as("arank")),
          Seq("qid", "nid"), "left")
        .select(col("qid"),
          coalesce(expr("60 div arank"), lit(0L)).as("rr60"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("rr60") > 0, 1L).otherwise(0L)).as("n_found"),
          sum(col("rr60")).as("rr60_sum"))
        .select(lit(method).as("method"), col("n_queries"),
          col("n_found"), col("rr60_sum"),
          expr("rr60_sum * 1000 div (60 * n_queries)").as("mrr_pm"))
    audit("centroid", centroidList(spark, dir))
      .unionByName(audit("lsh", lshList(spark, dir)))
      .reportSort("method")
  }

  val knnMrrSql: String =
    s"""WITH brute AS ($knnBruteSql),
       |l AS ($knnLshSql),
       |c AS ($knnCentroidSql),
       |t1 AS (SELECT qid, nid FROM brute WHERE rank = 1),
       |m AS (
       |  SELECT 'centroid' AS method, t1.qid,
       |    COALESCE(60 // CAST(x.rank AS BIGINT), 0) AS rr60
       |  FROM t1 LEFT JOIN c x ON t1.qid = x.qid AND t1.nid = x.nid
       |  UNION ALL
       |  SELECT 'lsh', t1.qid,
       |    COALESCE(60 // CAST(y.rank AS BIGINT), 0)
       |  FROM t1 LEFT JOIN l y ON t1.qid = y.qid AND t1.nid = y.nid)
       |SELECT method, COUNT(*) AS n_queries,
       |  CAST(SUM(CASE WHEN rr60 > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_found,
       |  CAST(SUM(rr60) AS BIGINT) AS rr60_sum,
       |  CAST(SUM(rr60) * 1000 // (60 * COUNT(*)) AS BIGINT) AS mrr_pm
       |FROM m GROUP BY method ORDER BY method""".stripMargin

  // -------------------------------------------------- knn_rrf_fusion
  /** RECIPROCAL-RANK FUSION — the standard hybrid-retrieval combiner
    * (Cormack et al. 2009; how production search fuses two retrieval
    * lists): each (query, candidate) scores Σ_lists ⌊10⁶/(60+rank)⌋
    * over the lists that returned it, so a candidate surfacing in
    * BOTH top-5s outranks either list's idiosyncratic head. The two
    * retrievers fused here are the QUANTIZED pair with decorrelated
    * error modes — PQ-ADC (subspace codebook distortion) and binary
    * sign-Hamming (direction-only distortion) — precisely the case
    * RRF exists for; fusing a strong list with a weak one would only
    * dilute it (measured: centroid@3-probe alone is exact on this
    * fixture). Scores stay exact integers (the floor makes the fusion
    * oracle-replayable with no float ordering hazard); ties break on
    * nid. The panel reports recall@5 of the true nearest neighbor for
    * each source list AND the fused list — the fused row beating both
    * sources is the serving argument for hybrid retrieval. Cost: the
    * fused table is ≤ q·k·2 rows — one hash-agg + one per-query
    * window, nothing rescans the corpus. */
  def knnRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // all three retrieval lists are ≤ q·k rows but EXPENSIVE to derive
    // (PQ codebook + ADC scan; sign-bit Hamming scan; exact brute);
    // the Hamming and brute lists ride the session memos, the PQ list
    // (query-set-specific ADC over the memoized code table) is
    // checkpointed once for its 2 consumers here
    val pq = EmbOps.knnPqAdcFor(spark, dir, col("vec_id") < 10)
      .select("qid", "nid", "rank").cut
    val hm = EmbOps.hammingList(spark, dir).select("qid", "nid", "rank")
    val lists = pq.unionByName(hm)
      .select(col("qid"), col("nid"),
        expr("1000000 div (60 + cast(rank as bigint))").as("pts"))
    val fused = lists.groupBy("qid", "nid")
      .agg(sum(col("pts")).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("score"), col("nid"))))
      .filter(col("rank") <= 5)
    val t1 = bruteList(spark, dir).filter(col("rank") === 1)
      .select(col("qid"), col("nid").as("true_nid"))
    def panel(method: String, list: DataFrame) =
      t1.join(list.select(col("qid").as("lqid"), col("nid").as("lnid")),
          col("qid") === col("lqid") && col("true_nid") === col("lnid"),
          "left_semi")
        .agg(count(lit(1)).as("recall5_hits"))
        .crossJoin(broadcast(t1.agg(count(lit(1)).as("n_queries"))))
        .select(lit(method).as("method"), col("n_queries"),
          col("recall5_hits"),
          expr("recall5_hits * 1000 div n_queries").as("hits_pm"))
    panel("fused", fused)
      .unionByName(panel("hamming", hm))
      .unionByName(panel("pq_adc", pq))
      .reportSort("method")
  }

  val knnRrfFusionSql: String =
    s"""WITH brute AS ($knnBruteSql),
       |pq AS (${EmbOps.knnPqAdcSqlFor("q.vec_id < 10")}),
       |hm AS (${EmbOps.embHammingSql}),
       |pts AS (
       |  SELECT qid, nid, 1000000 // (60 + CAST(rank AS BIGINT)) AS pts
       |  FROM pq
       |  UNION ALL
       |  SELECT qid, nid, 1000000 // (60 + CAST(rank AS BIGINT)) FROM hm),
       |fused AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY SUM(pts) DESC, nid) AS frank
       |    FROM pts GROUP BY qid, nid) f
       |  WHERE frank <= 5),
       |t1 AS (SELECT qid, nid AS true_nid FROM brute WHERE rank = 1),
       |nq AS (SELECT COUNT(*) AS n_queries FROM t1),
       |m AS (
       |  SELECT 'fused' AS method, COUNT(*) AS recall5_hits
       |  FROM t1 WHERE EXISTS (SELECT 1 FROM fused f
       |    WHERE f.qid = t1.qid AND f.nid = t1.true_nid)
       |  UNION ALL
       |  SELECT 'hamming', COUNT(*) FROM t1
       |  WHERE EXISTS (SELECT 1 FROM hm h
       |    WHERE h.qid = t1.qid AND h.nid = t1.true_nid)
       |  UNION ALL
       |  SELECT 'pq_adc', COUNT(*) FROM t1
       |  WHERE EXISTS (SELECT 1 FROM pq p
       |    WHERE p.qid = t1.qid AND p.nid = t1.true_nid))
       |SELECT method, n_queries,
       |  CAST(recall5_hits AS BIGINT) AS recall5_hits,
       |  CAST(recall5_hits * 1000 // n_queries AS BIGINT) AS hits_pm
       |FROM m CROSS JOIN nq ORDER BY method""".stripMargin

  // ------------------------------------------------ knn_edge_overlap
  /** EDGE EMBEDDEDNESS — per mutual-kNN edge, the Jaccard overlap of
    * the two endpoints' neighborhoods (common neighbors / union,
    * endpoints excluded): the graph-denoising signal SemDeDup-style
    * cluster pipelines threshold before trusting an edge (a bridge
    * between unrelated clusters has near-zero embeddedness; an edge
    * inside a dense duplicate blob is near 1000). Rides the
    * PERSISTED directed-edge layout ([[directedEdges]]) and the
    * memoized mutual set: neighbor lists are ≤ k long by mutual-kNN
    * construction, so the per-edge set intersection is the codegen
    * merge-scan over two tiny sorted arrays — never a wedge join.
    * Output is the ≤ 11-row decile histogram. */
  def knnEdgeOverlap(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val e = mutualEdges(spark, dir).select(col("a"), col("b"))
    val adj = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("u"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"),
        count(lit(1)).as("d"))
    e.join(adj.select(col("u"), col("nbrs").as("na"), col("d").as("da")),
        col("a") === col("u")).drop("u")
      .join(adj.select(col("u"), col("nbrs").as("nb"), col("d").as("db")),
        col("b") === col("u")).drop("u")
      .select(col("a"), col("b"), col("da"), col("db"),
        call_function(VectorExprs.intersectName,
          array_remove(col("na"), col("b")),
          array_remove(col("nb"), col("a"))).as("common"))
      .select(
        expr("case when da + db - 2 - common <= 0 then 1000 " +
          "else common * 1000 div (da + db - 2 - common) end")
          .as("overlap_pm"))
      .groupBy(expr("overlap_pm div 100").as("decile"))
      .agg(count(lit(1)).as("n_edges"),
        min(col("overlap_pm")).as("lo_pm"),
        max(col("overlap_pm")).as("hi_pm"))
      .orderBy("decile")
  }

  val knnEdgeOverlapSql: String =
    s"""$knnDirectedCte,
       |mut AS (
       |  SELECT f.qid AS a, f.nid AS b
       |  FROM k f JOIN k r ON r.qid = f.nid AND r.nid = f.qid
       |  WHERE f.qid < f.nid),
       |adj AS (
       |  SELECT a AS u, b AS v FROM mut
       |  UNION ALL SELECT b, a FROM mut),
       |deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY u),
       |ov AS (
       |  SELECT m.a, m.b, da.d AS dd1, db.d AS dd2,
       |    (SELECT COUNT(*) FROM adj x1 JOIN adj x2 ON x1.v = x2.v
       |     WHERE x1.u = m.a AND x2.u = m.b
       |       AND x1.v <> m.a AND x1.v <> m.b) AS common
       |  FROM mut m
       |  JOIN deg da ON da.u = m.a
       |  JOIN deg db ON db.u = m.b),
       |pm AS (
       |  SELECT CASE WHEN dd1 + dd2 - 2 - common <= 0 THEN 1000
       |    ELSE common * 1000 // (dd1 + dd2 - 2 - common) END
       |    AS overlap_pm
       |  FROM ov)
       |SELECT CAST(overlap_pm // 100 AS BIGINT) AS decile,
       |  COUNT(*) AS n_edges,
       |  CAST(MIN(overlap_pm) AS BIGINT) AS lo_pm,
       |  CAST(MAX(overlap_pm) AS BIGINT) AS hi_pm
       |FROM pm GROUP BY 1 ORDER BY decile""".stripMargin

  // ------------------------------------------- knn_tombstone_audit
  /** TOMBSTONE-DEBT AUDIT for the IVF index — what "delete" means to
    * an inverted-file ANN structure (vectors aren't removed, they're
    * tombstoned; probes still SCAN them, recall doesn't benefit, and
    * the per-cell live fraction decides when a cell must compact):
    * under a deterministic 10% delete set (vec_id % 10), each cell
    * of the same seed assignment every probe rides reports its
    * before/deleted/live census and live per-mille, plus the
    * compact-when-below-800‰ policy verdict. One assignment pass →
    * |cells| rows; at 100 TB the audit reads the index manifest,
    * never the vectors. */
  def knnTombstoneAudit(spark: SparkSession, dir: String): DataFrame = {
    VectorExprs.register(spark)
    val n = normalizedWithLabel(Tables.embeddings(spark, dir))
    rankedSeedCells(n, seedCells(n))
      .filter(col("_rk") === 1)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_before"),
        sum(when(pmod(col("vec_id"), lit(10L)) === 0, 1L)
          .otherwise(0L)).as("n_deleted"))
      .select(col("cell"), col("n_before"), col("n_deleted"),
        (col("n_before") - col("n_deleted")).as("n_live"),
        expr("(n_before - n_deleted) * 1000 div n_before")
          .as("live_pm"))
      .withColumn("compact", col("live_pm") < 800)
      .reportSort("cell")
  }

  val knnTombstoneAuditSql: String =
    s"""WITH n AS (
       |$normSqlCte),
       |seeds AS (
       |  SELECT label AS cell, e AS ce FROM (
       |    SELECT label, e, ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY vec_id) AS r
       |    FROM n)
       |  WHERE r = 1),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT nn.vec_id, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY nn.vec_id
       |        ORDER BY list_dot_product(nn.e, s.ce) DESC, s.cell) AS rk
       |    FROM n nn CROSS JOIN seeds s)
       |  WHERE rk = 1),
       |c AS (
       |  SELECT cell, COUNT(*) AS n_before,
       |    SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
       |      AS n_deleted
       |  FROM assigned GROUP BY 1)
       |SELECT cell, n_before, CAST(n_deleted AS BIGINT) AS n_deleted,
       |  CAST(n_before - n_deleted AS BIGINT) AS n_live,
       |  CAST((n_before - n_deleted) * 1000 // n_before AS BIGINT)
       |    AS live_pm,
       |  (n_before - n_deleted) * 1000 // n_before < 800 AS compact
       |FROM c ORDER BY cell""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_tombstone_audit" -> (knnTombstoneAudit _),
    "knn_edge_overlap" -> (knnEdgeOverlap _),
    "knn_rrf_fusion" -> (knnRrfFusion _),
    "knn_mrr" -> (knnMrr _),
    "knn_dbscan" -> (knnDbscan _),
    "knn_centrality" -> (knnCentrality _),
    "knn_graph_clusters" -> (knnGraphClusters _),
    "knn_loo_label" -> (knnLooLabel _),
    "knn_rerank" -> (knnRerank _),
    "knn_filtered" -> (knnFiltered _),
    "knn_graph" -> (knnGraph _),
    "knn_triangles" -> (knnTriangles _),
    "knn_edge_support" -> (knnEdgeSupport _),
    "knn_assortativity" -> (knnAssortativity _),
    "knn_pagerank" -> (knnPagerank _),
    "emb_twonn_ratio" -> (embTwonnRatio _),
    "knn_hubness" -> (knnHubness _),
    "knn_cell_balance" -> (knnCellBalance _),
    "knn_probe_sweep" -> (knnProbeSweep _),
    "knn_bruteforce" -> (knnBrute _),
    "knn_lsh" -> (knnLsh _),
    "knn_range" -> (knnRange _),
    "knn_recall_audit" -> (knnRecall _),
    "knn_centroid" -> (knnCentroid _))

  /** All three are oracle-verified: brute force and centroid are plain
    * float math; lsh's planes derive from the portable md5-prefix hash
    * both engines compute identically. */
  val oracles: Map[String, String] = Map(
    "knn_tombstone_audit" -> knnTombstoneAuditSql,
    "knn_edge_overlap" -> knnEdgeOverlapSql,
    "knn_dbscan" -> knnDbscanSql,
    "knn_centrality" -> knnCentralitySql,
    "knn_graph_clusters" -> knnGraphClustersSql,
    "knn_loo_label" -> knnLooLabelSql,
    "knn_rerank" -> knnRerankSql,
    "knn_filtered" -> knnFilteredSql,
    "knn_graph" -> knnGraphSql,
    "knn_triangles" -> knnTrianglesSql,
    "knn_edge_support" -> knnEdgeSupportSql,
    "knn_assortativity" -> knnAssortativitySql,
    "knn_pagerank" -> knnPagerankSql,
    "emb_twonn_ratio" -> embTwonnRatioSql,
    "knn_hubness" -> knnHubnessSql,
    "knn_cell_balance" -> knnCellBalanceSql,
    "knn_probe_sweep" -> knnProbeSweepSql,
    "knn_bruteforce" -> knnBruteSql,
    "knn_lsh" -> knnLshSql,
    "knn_range" -> knnRangeSql,
    "knn_recall_audit" -> knnRecallSql,
    "knn_rrf_fusion" -> knnRrfFusionSql,
    "knn_mrr" -> knnMrrSql,
    "knn_centroid" -> knnCentroidSql)
}
