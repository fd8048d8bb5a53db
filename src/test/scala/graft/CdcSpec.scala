package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.Envelope
import graft.streaming.CdcStream
import graft.classify.Libraries

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("envelope round-trip preserves op, source, and row payload") {
    val df = Seq((1L, "alice", "c"), (2L, "bob", "u"), (3L, "eve", "d"))
      .toDF("id", "name", "op")
    val json = df.select(Envelope.wrap(
      struct(col("id"), col("name")), struct(col("id"), col("name")),
      "db1", "t1", col("op"), lit(1700000000000L)).as("value"))
    val parsed = Envelope.parse(json, col("value"), rowSchema)
    val rows = parsed.select(col("after.id"), col("after.name"), col("op"),
      col("db"), col("table")).as[(Long, String, String, String, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "alice", "c", "db1", "t1"),
      (2L, "bob", "u", "db1", "t1"),
      (3L, "eve", "d", "db1", "t1")))
  }

  test("CdcStream.changes routes deletes through `before`") {
    val df = Seq((1L, "alice")).toDF("id", "name")
    val json = df.select(Envelope.wrap(
      struct(col("id"), col("name")),
      lit(null).cast(rowSchema),
      "db1", "t1", lit("d"), lit(0L)).as("value"))
    val ch = CdcStream.changes(json, rowSchema)
    val r = ch.select("op", "id", "name").as[(String, Long, String)].head()
    assert(r == ("d", 1L, "alice"))
  }

  test("maskedChanges masks classified columns consistently per batch") {
    val df = Seq((1L, "Customer#7"), (2L, "Customer#7")).toDF("c_custkey", "c_name")
    val json = df.select(Envelope.wrap(
      lit(null).cast(df.schema), struct(col("c_custkey"), col("c_name")),
      "db1", "customer", lit("c"), lit(0L)).as("value"))
    val masked = CdcStream.maskedChanges(json, df.schema, Libraries.default,
      { case "nation-names" => Seq("P1", "P2", "P3"); case _ => Seq.empty })
    val names = masked.select("c_name").as[String].collect()
    assert(names.toSet.size == 1, "same input must mask to same pseudonym")
    assert(Seq("P1", "P2", "P3").contains(names.head))
  }

  test("snapshot apply: last op wins, trailing delete drops the key") {
    // hand-built changelog: u1 insert→update, u2 insert→delete
    val log = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 10.0, "signup", "c"),
      (2L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, 20.0, "purchase", "u"),
      (3L, Timestamp.valueOf("2024-01-01 00:30:00"), 2L, 5.0, "signup", "c"),
      (4L, Timestamp.valueOf("2024-01-01 02:00:00"), 2L, 0.0, "error", "d"))
      .toDF("event_id", "ts", "user_id", "value", "event_type", "op")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val snap = log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).filter(col("op") =!= "d")
      .select("user_id", "value")
    val res = snap.as[(Long, Double)].collect().toMap
    assert(res == Map(1L -> 20.0))
  }
}
