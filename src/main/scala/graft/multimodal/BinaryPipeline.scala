package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** §2.9 multimodal plumbing: opaque binary columns + typed metadata.
  *
  * The Spark-side machinery — binary column schema, metadata
  * extraction, partition-batched feature extraction — is real and
  * tested; the actual media DECODE step is stubbed deterministically
  * (image/audio codecs aren't in this environment). The seam is
  * [[decodeStub]]: swap it for a real codec (e.g. javacv / a Python
  * `mapInPandas` stage on a cluster with PIL/ffmpeg) and nothing else
  * changes.
  *
  * Scale notes: binaries stay opaque until the last possible stage
  * (no shuffle ever carries decoded frames); feature extraction is a
  * map-only `mapPartitions` so one task amortizes per-batch codec
  * setup across its whole partition.
  */
object BinaryPipeline extends QueryModule {

  /** Synthesize a binary "media" column from text (deterministic stand-
    * in for real image/audio payloads): 4-byte magic + UTF-8 body. */
  def withBlob(docs: DataFrame): DataFrame =
    docs.withColumn("blob", encode(concat(lit("IMG0"), col("text")), "UTF-8"))

  // ------------------------------------------------- mm_binary_meta
  /** Typed metadata extraction from the opaque binary: magic, byte
    * size, and stub-decoded dimensions (deterministic fake in lieu of
    * a real header parse). */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val size = length(col("blob"))
    withBlob(Tables.documents(spark, dir))
      .select(col("doc_id"),
        substring(hex(col("blob")), 1, 8).as("magic"),
        size.as("size_bytes"),
        (lit(64) + size % 577).as("fake_w"),
        (lit(64) + (size * 31) % 577).as("fake_h"))
      .orderBy("doc_id")
  }

  val mmBinaryMetaSql: String =
    """SELECT doc_id,
      |  substr(hex(encode('IMG0' || text)), 1, 8) AS magic,
      |  CAST(octet_length(encode('IMG0' || text)) AS INTEGER) AS size_bytes,
      |  CAST(64 + octet_length(encode('IMG0' || text)) % 577 AS INTEGER) AS fake_w,
      |  CAST(64 + (octet_length(encode('IMG0' || text)) * 31) % 577 AS INTEGER) AS fake_h
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------- partition-batched feature path
  /** STUB decoder: a real implementation would parse the codec header
    * and decode pixels/samples here. Deterministic fake: 4 features
    * derived from byte content so tests can pin behavior. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var a = 0; var b = 0
    var i = 0
    while (i < bytes.length) { a = (a + (bytes(i) & 0xff)) % 997; b = (b ^ (bytes(i) & 0xff)) + i; i += 1 }
    Array(bytes.length.toFloat, a.toFloat, (b % 1013).toFloat,
      if (bytes.length > 4) (bytes(4) & 0xff).toFloat else 0f)
  }

  /** Partition-batched feature extraction over (id, blob) rows — the
    * `mapPartitions` shape a real codec plugs into (per-partition
    * setup once, streamed batches, no driver involvement). */
  def extractFeatures(rows: Dataset[(Long, Array[Byte])]): Dataset[(Long, Array[Float])] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition codec init would go here (once per task)
      it.map { case (id, bytes) => (id, decodeStub(bytes)) }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql)
}
