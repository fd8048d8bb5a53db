package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style change-event envelope support.
  *
  * The reference consumes JSON change events shaped
  * `{schema, payload: {op: c|u|d, before, after, source: {db|keyspace|
  * schema, table}, ts_ms, ddl?}}` (reference:
  * /root/reference/src/main/java/Main.java:159-319). Here the envelope
  * is a typed struct: `wrap` serializes rows into that JSON (for tests
  * and interop), `parse` turns a JSON-string column back into typed
  * columns with `from_json` — both codegen'd, no driver-side JSON.
  *
  * Connector dialects: MySQL publishes the logical schema as
  * `source.db`, Vitess as `source.keyspace`, everything else as
  * `source.schema` (reference: Main.java:71-80 getSchema switches on
  * connector.class). Instead of configuring the connector class, parse
  * reads all three and resolves `src_schema` to the first present —
  * config-free and correct for mixed-source streams.
  */
object Envelope {

  /** Envelope schema for a given row payload schema. */
  def schema(row: StructType): StructType =
    StructType(Seq(StructField("payload", StructType(Seq(
      StructField("before", row),
      StructField("after", row),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("keyspace", StringType),
        StructField("schema", StringType),
        StructField("table", StringType)))),
      StructField("op", StringType),
      StructField("ts_ms", LongType))))))

  /** Build an envelope JSON column from typed before/after structs. */
  def wrap(before: Column, after: Column, db: String, table: String,
      op: Column, tsMs: Column): Column =
    to_json(struct(struct(
      before.as("before"), after.as("after"),
      struct(lit(db).as("db"), lit(table).as("table")).as("source"),
      op.as("op"), tsMs.as("ts_ms")).as("payload")))

  /** Parse an envelope JSON column into (before, after, db, table, op,
    * ts_ms, src_schema) typed columns; `src_schema` is the
    * dialect-resolved logical schema (db | keyspace | schema). Extra
    * `keep` columns (e.g. a record key) are evaluated against the
    * input frame and carried through. */
  def parse(df: DataFrame, jsonCol: Column, row: StructType,
      keep: Column*): DataFrame =
    df.withColumn("_env", from_json(jsonCol, schema(row)))
      .select(Seq(
        col("_env.payload.before").as("before"),
        col("_env.payload.after").as("after"),
        col("_env.payload.source.db").as("db"),
        col("_env.payload.source.table").as("table"),
        col("_env.payload.op").as("op"),
        col("_env.payload.ts_ms").as("ts_ms"),
        coalesce(col("_env.payload.source.db"),
          col("_env.payload.source.keyspace"),
          col("_env.payload.source.schema")).as("src_schema")) ++ keep: _*)

  /** Discover the primary-key FIELD NAME from a change-record key JSON
    * `{schema: {fields: [{field: "..."}]}, payload: {...}}` — the
    * reference parses record.key() the same way instead of requiring
    * key configuration (Main.java:183-189; it reads "Schema", Debezium
    * emits "schema" — both are accepted here). Null when the record
    * has no key. */
  def keyField(keyJson: Column): Column =
    coalesce(
      get_json_object(keyJson, "$.schema.fields[0].field"),
      get_json_object(keyJson, "$.Schema.fields[0].field"))

  /** The discovered key's VALUE (as a string) from the key JSON
    * payload: the payload object is read as a map so the field name
    * can be dynamic per record — no static path, no config. */
  def keyValue(keyJson: Column): Column =
    element_at(
      from_json(get_json_object(keyJson, "$.payload"),
        MapType(StringType, StringType)),
      keyField(keyJson))
}
