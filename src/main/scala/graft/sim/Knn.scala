package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.dedup.Dedup.cosine

/** §2.7 similarity search over an embedding column.
  *
  *  - brute force: exact top-k, the correctness baseline. O(q·n) dot
  *    products; with the query side broadcast it is embarrassingly
  *    parallel over corpus partitions and fine up to ~1M×k per
  *    executor-hour. Output is rank-only (no float scores cross the
  *    oracle boundary).
  *  - LSH: random-hyperplane signatures → bucket join; probes only
  *    same-signature corpus vectors. The 100 TB shape: shuffle on
  *    signature, bucket sizes ≈ n/2^bits.
  *  - centroid (IVF): k-means-style cells (here: deterministic
  *    label-mean centroids), probe the nProbe nearest cells only.
  */
object Knn extends QueryModule {

  // ----------------------------------------------------- knn_bruteforce
  def bruteForce(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // broadcast-join parallelism = corpus-side partitions; a small table
    // arrives as one parquet split, so spread it first
    val c = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val w = Window.partitionBy("qid").orderBy(desc("c"), col("nid"))
    broadcast(q).join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qe"), col("ne")).as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteForce(emb, emb.filter(col("vec_id") < 10), 5).orderBy("qid", "rank")
  }

  val knnBruteSql: String =
    """WITH scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS c
      |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10),
      |ranked AS (
      |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
      |    ORDER BY c DESC, nid) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INTEGER) AS rank, nid
      |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // ------------------------------------------------------------ knn_lsh
  /** Random-hyperplane LSH: hyperplane weights are deterministic ±1
    * derived from xxhash64(plane, dim); vectors sharing a signature are
    * candidate neighbors. Rows-only check; KnnSpec pins recall vs brute
    * force. */
  def lshSignatures(emb: DataFrame, planes: Int): DataFrame = {
    // Index range follows the data — a hardcoded width would silently
    // zero-pad or drop dimensions for other embedding widths.
    val dims = sequence(lit(0), size(col("embedding")) - 1)
    val sigBits = (0 until planes).map { p =>
      // sum_i e[i] * (±1 from hash(p,i)) > 0 → bit p
      val proj = aggregate(
        zip_with(col("embedding"), dims, (x, i) =>
          x.cast("double") *
            when(xxhash64(lit(p), i).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }
    emb.select(col("vec_id"), col("embedding"),
      sigBits.reduce(_ + _).as("sig"))
  }

  def lsh(emb: DataFrame, queries: DataFrame, k: Int, planes: Int = 5): DataFrame = {
    // 2^planes buckets: pick planes so buckets hold >> k vectors
    // (planes=5 → 32 buckets; near-uniform data fills top-k reliably)
    val sigs = lshSignatures(
      emb.repartition(emb.sparkSession.sparkContext.defaultParallelism), planes)
    val qs = lshSignatures(queries, planes)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("sig").as("qsig"))
    val w = Window.partitionBy("qid").orderBy(desc("c"), col("vec_id"))
    broadcast(qs).join(sigs,
        col("qsig") === col("sig") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qe"), col("embedding")).as("c"))
      .withColumn("rank", row_number().over(Window.partitionBy("qid")
        .orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    lsh(emb, emb.filter(col("vec_id") < 10), 5).orderBy("qid", "rank")
  }

  // ------------------------------------------------------- knn_centroid
  /** IVF shape: assign vectors to cells (deterministic centroids = mean
    * per label), probe the nProbe closest cells per query. Rows-only
    * check; KnnSpec pins recall vs brute force. */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("cell"),
        transform(col("pm"), x => x.getField("m")).as("centroid"))

  def centroidKnn(emb: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 3): DataFrame = {
    val cents = centroids(emb)
    val assigned = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(col("embedding"), col("centroid")).as("cc"))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cc"), col("cell"))))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("cell"), cosine(col("embedding"), col("centroid")).as("cc"))
      .withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cc"), col("cell"))))
      .filter(col("r") <= nProbe)
      .select("qid", "qe", "cell")
    probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qe"), col("embedding")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("c"), col("nid"))))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  def knnCentroid(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    centroidKnn(emb, emb.filter(col("vec_id") < 10), 5).orderBy("qid", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce" -> (knnBrute _),
    "knn_lsh" -> (knnLsh _),
    "knn_centroid" -> (knnCentroid _))

  /** lsh/centroid use xxhash64-derived planes / Spark-side argmax cell
    * assignment → rows-only checks; KnnSpec pins their recall against
    * the oracle-verified brute force. */
  val oracles: Map[String, String] = Map(
    "knn_bruteforce" -> knnBruteSql)
}
