package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.cdc.Envelope
import graft.classify.DataClassLibrary
import graft.mask.RuleEngine

/** End-to-end streaming CDC pipeline: envelope JSON stream → typed
  * parse → per-op routing → classify + mask → sink.
  *
  * This is the reference's whole runtime re-expressed as one
  * Structured Streaming plan (reference: Main.java consumes change
  * events one at a time and pipes them through generated per-table
  * scripts; here the same parse→classify→mask flow is a declarative
  * plan the engine incrementalizes). Every function works identically
  * on a batch frame; StreamingSpec drives them through MemoryStream.
  */
object CdcStream {

  /** Parse an envelope JSON stream (column `value`) into typed change
    * rows: (op, ts_ms, table, <row fields>). Deletes carry only
    * `before` (reference: Main.java:173-177), so the row struct is
    * op-dependent. */
  def changes(envelopeJson: DataFrame, rowSchema: StructType): DataFrame = {
    val parsed = Envelope.parse(envelopeJson, col("value"), rowSchema)
    val row = when(col("op") === "d", col("before")).otherwise(col("after"))
    parsed.select(col("op"), col("ts_ms"), col("table"), row.as("row"))
      .select(col("op"), col("ts_ms"), col("table"), col("row.*"))
  }

  /** Live change-stream tail — the reference's actual deployment mode
    * is an embedded Debezium engine tailing the database and pushing
    * JSON change events (reference: Main.java:159-177
    * `DebeziumEngine.create(Json.class)`). The Spark-native equivalent
    * is a streaming source of envelope JSON records feeding the SAME
    * declarative parse→classify→mask plan:
    *  - production: `liveTail(spark, "kafka", Map("kafka.bootstrap.
    *    servers" -> ..., "subscribe" -> topic))` — Debezium's standard
    *    transport (the kafka connector jars are not in this sandbox,
    *    so tests drive the socket/file variants);
    *  - in-sandbox live tail: `liveTail(spark, "socket", Map("host" ->
    *    h, "port" -> p))` against a real TCP server
    *    (StreamingSpec);
    *  - replay: `format("json")` over an envelope JSONL directory.
    * Every variant yields one string `value` column (kafka's binary
    * value is cast), so downstream plans are source-agnostic. */
  def liveTail(spark: SparkSession, format: String,
      options: Map[String, String]): DataFrame =
    spark.readStream.format(format).options(options).load()
      .select(col("value").cast("string").as("value"))

  /** Avro change-stream tail — Debezium's OTHER wire format: with a
    * schema registry, connectors serialize envelopes as Avro, not
    * JSON. Streams a directory of Avro object-container files (the
    * file-landing equivalent of an Avro-encoded topic; the kafka
    * variant swaps the source, not the decode) and decodes each
    * container executor-side. A [[org.apache.avro.generic.GenericData]]
    * record prints as canonical JSON, so the decoded stream feeds the
    * SAME envelope plan ([[changes]]/[[maskedChanges]]) as every other
    * transport — one `value` column, source-agnostic downstream.
    * Micro-batch reads land whole containers (binaryFile); the BATCH
    * path for huge containers is the splittable
    * [[graft.sources.BinaryFormats.readAvro]]. */
  def avroTail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // binaryFile's schema is fixed but file streaming sources still
    // demand it explicitly
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binarySchema).load(dir)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val rdr = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(bytes),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try {
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (rdr.hasNext) buf += rdr.next().toString
          buf
        } finally rdr.close()
      }
      .toDF("value")
  }

  /** Keyed change parsing for sources that carry the record key beside
    * the value (kafka: `key`/`value` columns). The upsert key is NOT
    * configured — it is DISCOVERED per record from the key JSON's
    * schema (Envelope.keyField; reference Main.java:183-189 parses
    * record.key() the same way) and its value extracted dynamically. */
  def changesKeyed(kv: DataFrame, rowSchema: StructType): DataFrame = {
    val parsed = Envelope.parse(
      kv.select(col("key").cast("string").as("_key"),
        col("value").cast("string").as("value")),
      col("value"), rowSchema,
      Envelope.keyField(col("_key")).as("key_field"),
      Envelope.keyValue(col("_key")).as("key_value"))
    val row = when(col("op") === "d", col("before")).otherwise(col("after"))
    parsed
      .select(col("op"), col("ts_ms"), col("table"), col("src_schema"),
        col("key_field"), col("key_value"), row.as("row"))
      .select(col("op"), col("ts_ms"), col("table"), col("src_schema"),
        col("key_field"), col("key_value"), col("row.*"))
  }

  /** Latest-change-wins reduction over the DISCOVERED key: the state a
    * keyed target holds after applying the batch (deletes drop the
    * key). Mirrors the reference's /UPDATE=(key)//DELETE=(key) routing
    * (Main.java:477-498) without any configured key. Latest-wins is
    * scoped per TARGET TABLE — the stream is mixed-table/mixed-source
    * (changesKeyed carries src_schema and table), and the reference
    * routes per table, so id=1 in `customer` must never collapse with
    * id=1 in `orders`. */
  def upsertDiscovered(keyed: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("src_schema", "table", "key_field", "key_value")
      .orderBy(desc("ts_ms"))
    keyed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .filter(col("op") =!= "d")
      .drop("_rn")
  }

  /** Full pipeline: parse, then classify-and-mask by the rule library.
    * Metadata columns (op/ts_ms/table) match no data class, so they
    * pass through untouched; classified row columns get their class's
    * default rule — consistently across every micro-batch, which is
    * what makes masked replication referentially stable. */
  def maskedChanges(
      envelopeJson: DataFrame,
      rowSchema: StructType,
      lib: DataClassLibrary,
      setResolver: String => Seq[String] = _ => Seq.empty): DataFrame =
    RuleEngine.maskTable(changes(envelopeJson, rowSchema), lib, setResolver)
}
