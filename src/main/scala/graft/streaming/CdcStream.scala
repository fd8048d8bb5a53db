package graft.streaming

import org.apache.spark.sql.DataFrame
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
