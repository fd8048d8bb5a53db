package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style change-event envelope support.
  *
  * The reference consumes JSON change events shaped
  * `{schema, payload: {op: c|u|d, before, after, source: {db|schema,
  * table}, ts_ms, ddl?}}` (reference:
  * /root/reference/src/main/java/Main.java:159-319). Here the envelope
  * is a typed struct: `wrap` serializes rows into that JSON (for tests
  * and interop), `parse` turns a JSON-string column back into typed
  * columns with `from_json` — both codegen'd, no driver-side JSON.
  */
object Envelope {

  /** Envelope schema for a given row payload schema. */
  def schema(row: StructType): StructType =
    StructType(Seq(StructField("payload", StructType(Seq(
      StructField("before", row),
      StructField("after", row),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
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
    * ts_ms) typed columns appended to the frame. */
  def parse(df: DataFrame, jsonCol: Column, row: StructType): DataFrame =
    df.withColumn("_env", from_json(jsonCol, schema(row)))
      .select(
        col("_env.payload.before").as("before"),
        col("_env.payload.after").as("after"),
        col("_env.payload.source.db").as("db"),
        col("_env.payload.source.table").as("table"),
        col("_env.payload.op").as("op"),
        col("_env.payload.ts_ms").as("ts_ms"))
}
