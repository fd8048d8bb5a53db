package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming runtime coverage: the same EventStreams transforms that
  * pass the batch DuckDB oracles, driven through MemoryStream with
  * watermarks — proving they are genuinely incremental plans. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sample = Seq(
    (1L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
    (2L, ts("2024-01-01 00:40:00"), 1L, "click", 2.0),
    (3L, ts("2024-01-01 01:10:00"), 2L, "purchase", 3.0),
    (4L, ts("2024-01-01 01:20:00"), 2L, "purchase", 4.0),
    (5L, ts("2024-01-01 03:00:00"), 1L, "click", 5.0))

  private def runStream(input: Seq[(Long, Timestamp, Long, String, Double)],
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    mem.addData(input: _*)
    val stream = f(mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "10 minutes"))
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { mem.addData(); q.processAllAvailable() } finally q.stop()
    spark.table(name)
  }

  test("anomaly gate scores micro-batches against broadcast reference") {
    // the deployment shape strAnomaly documents: the oracle-verified
    // batch median/MAD frame is the broadcast REFERENCE STATE, and
    // each micro-batch scores its events against it — flags must be
    // identical whichever micro-batch an event arrives in
    implicit val sql = spark.sqlContext
    val events = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 10.00),
      (2L, ts("2024-01-01 00:02:00"), 1L, "click", 10.02),
      (3L, ts("2024-01-01 00:03:00"), 2L, "click", 10.04),
      (4L, ts("2024-01-01 00:04:00"), 2L, "click", 99.99),
      (5L, ts("2024-01-01 00:05:00"), 3L, "view", 5.00),
      (6L, ts("2024-01-01 00:06:00"), 3L, "view", 5.02),
      (7L, ts("2024-01-01 00:07:00"), 1L, "view", 4.98),
      (8L, ts("2024-01-01 00:08:00"), 2L, "view", 80.00))
    def typ1(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val byType = events.groupBy(_._4)
      .map { case (t, es) => t -> es.map(e => math.round(e._5 * 100)) }
    val ref = byType.map { case (t, vs) =>
      val med = typ1(vs)
      (t, med, typ1(vs.map(v => math.abs(v - med))))
    }.toSeq.toDF("event_type", "median_cents", "mad_cents")
    val flags = byType.flatMap { case (t, _) =>
      val med = typ1(byType(t))
      val mad = typ1(byType(t).map(v => math.abs(v - med)))
      events.filter(_._4 == t).map(e =>
        e._1 -> (math.abs(math.round(e._5 * 100) - med) > 3 * mad))
    }
    val got = scala.collection.concurrent.TrieMap[Long, Boolean]()
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batch.join(broadcast(ref), "event_type")
            .select(col("event_id"),
              (abs((col("value").cast(
                org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
                .cast("long") - col("median_cents")) >
                lit(3L) * col("mad_cents")).as("anom"))
            .collect().foreach(r => got.put(r.getLong(0), r.getBoolean(1)))
          ()
      }.start()
    try {
      mem.addData(events.take(4): _*); q.processAllAvailable()
      mem.addData(events.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == flags,
      s"streamed flags $got != batch reference flags $flags")
    assert(flags(4L) && flags(8L) && !flags(1L))
  }

  test("streaming retention facts aggregate to the batch cohort table") {
    // multi-day events split across micro-batches in event-time order;
    // the per-user (cohort, offset-bitmask) state must emit each
    // (user, cohort, offset) exactly once, so COUNT(*) over facts ==
    // the batch table's COUNT(DISTINCT user_id)
    implicit val sql = spark.sqlContext
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0),
      (3L, ts("2024-01-02 08:00:00"), 1L, "view", 1.0),
      (4L, ts("2024-01-02 09:00:00"), 3L, "click", 1.0),
      (5L, ts("2024-01-03 08:00:00"), 1L, "click", 1.0),
      (6L, ts("2024-01-03 09:00:00"), 2L, "view", 1.0),
      (7L, ts("2024-01-03 10:00:00"), 1L, "view", 1.0), // same (u,off): no new fact
      (8L, ts("2024-01-12 08:00:00"), 1L, "click", 1.0)) // offset 11 > 7: dropped
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.retentionUpdates(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("ret_facts")
      .outputMode("append").start()
    try {
      mem.addData(events.take(3): _*); q.processAllAvailable()
      mem.addData(events.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ret_facts")
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    val batch = graft.streaming.EventStreams.retention(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    assert(batch(("2024-01-01", 0L)) == 2L && batch(("2024-01-01", 2L)) == 2L)
    assert(!batch.contains(("2024-01-01", 11L)), "offsets past 7 must drop")
  }

  test("streaming transition facts aggregate to the batch lag counts") {
    implicit val sql = spark.sqlContext
    // within-batch disorder (event 3 arrives before 2 in the feed) must
    // be restored by the (ts, event_id) sort; across batches the chain
    // must continue from the stored last event (user 1: view -> click
    // spans the batch boundary)
    val b1 = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 00:03:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 00:02:00"), 1L, "view", 1.0),
      (10L, ts("2024-01-01 00:01:00"), 2L, "view", 1.0))
    val b2 = Seq(
      (4L, ts("2024-01-01 00:04:00"), 1L, "click", 1.0),
      (11L, ts("2024-01-01 00:05:00"), 2L, "purchase", 1.0))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.transitionUpdates(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("trans_facts")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("trans_facts")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = graft.streaming.EventStreams.transitions(
        (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // the cross-boundary pair must exist
    assert(batch(("view", "click")) == 1L)
  }

  test("tumbling agg over MemoryStream matches the batch plan") {
    // append-mode emission needs the watermark to pass: send a late
    // high-ts record in a second batch so earlier windows close
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = EventStreams.tumblingAgg(mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "1 minute"))
    val q = stream.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    mem.addData((99L, ts("2024-01-01 09:00:00"), 9L, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling")
      .filter(col("window_start") < ts("2024-01-01 04:00:00"))
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    val batch = EventStreams.tumblingAgg(
      sample.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("stream-static enrichment joins each micro-batch to the dim snapshot") {
    implicit val sql = spark.sqlContext
    val dim = Seq((2L, "BUILDING"), (3L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = EventStreams.staticEnrich(mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"), dim)
      .select("event_id", "user_id", "c_mktsegment")
    val q = stream.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    // user 1 -> key 2 (BUILDING), user 2 -> key 3 (MACHINERY),
    // user 9 -> key 10 (no dim row: inner join drops it)
    mem.addData(sample: _*)
    q.processAllAvailable()
    mem.addData((99L, ts("2024-01-01 09:00:00"), 9L, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich")
      .as[(Long, Long, String)].collect().toSet
    val batch = EventStreams.staticEnrich(
      (sample :+ ((99L, ts("2024-01-01 09:00:00"), 9L, "click", 0.0)))
        .toDF("event_id", "ts", "user_id", "event_type", "value"), dim)
      .select("event_id", "user_id", "c_mktsegment")
      .as[(Long, Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && !streamed.exists(_._2 == 9L))
  }

  test("streaming dedup with watermark emits one row per key") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
    val q = stream.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup").select("user_id", "event_type")
      .as[(Long, String)].collect().toSeq
    assert(rows.sorted == Seq((1L, "click"), (2L, "purchase")))
  }

  test("streaming CDC upsert sink converges to the batch snapshot") {
    import org.apache.spark.sql.types._
    import graft.cdc.Envelope
    import graft.streaming.CdcStream
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    // changelog: id=1 c→u, id=2 c→d, id=3 c — expected final {1→20, 3→5}
    val log = Seq((1L, 10.0, "c", 1L), (2L, 1.0, "c", 2L),
      (1L, 20.0, "u", 3L), (2L, 0.0, "d", 4L), (3L, 5.0, "c", 5L))
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String, Long)]
    val envelopes = mem.toDF().toDF("id", "v", "op", "seq")
      .select(Envelope.wrap(
        struct(col("id"), col("v")), struct(col("id"), col("v")),
        "db", "t", col("op"), col("seq")).as("value"))
    val changes = CdcStream.changes(envelopes, rowSchema)
    // keyed target maintained across micro-batches (the /UPDATE,
    // /DELETE, /APPEND routing the reference applies per op)
    val target = scala.collection.concurrent.TrieMap[Long, Double]()
    val q = changes.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.select("op", "ts_ms", "id", "v").collect()
          .sortBy(_.getLong(1)).foreach { r =>
            if (r.getString(0) == "d") target.remove(r.getLong(2))
            else target.put(r.getLong(2), r.getDouble(3))
          }
        ()
      }
      .start()
    // two micro-batches: target must survive and stay keyed across them
    mem.addData(log.take(2): _*)
    q.processAllAvailable()
    assert(target.toMap == Map(1L -> 10.0, 2L -> 1.0))
    mem.addData(log.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    assert(target.toMap == Map(1L -> 20.0, 3L -> 5.0))
  }

  test("incremental dedup streams: each micro-batch probes the standing corpus") {
    // the streaming form of dedup_incremental: incoming docs arrive on
    // a stream and are near-dup-checked against the STANDING corpus
    // only (stream-side sets are per-batch; the standing side would be
    // a precomputed bucketed table in production) — existing×existing
    // is never recomputed, and results accumulate across micro-batches
    import graft.dedup.Dedup
    val standing = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "one two three four five six seven"),
      (3L, "fr", "un deux trois quatre cinq six sept"))
      .toDF("doc_id", "lang", "text")
    val incoming = Seq(
      (10L, "en", "zeta epsilon delta gamma beta alpha"),
      (11L, "en", "completely different words here entirely"),
      (12L, "fr", "sept six cinq quatre trois deux un"))
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val got = scala.collection.concurrent.TrieMap[(Long, Long), Boolean]()
    val q = mem.toDF().toDF("doc_id", "lang", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.expr.VectorExprs.register(batch.sparkSession)
        Dedup.ngramJaccardAgainst(batch.toDF(), standing, 0.9)
          .select("new_doc", "old_doc").collect()
          .foreach(r => got.put((r.getLong(0), r.getLong(1)), true))
        ()
      }
      .start()
    mem.addData(incoming.take(1): _*)
    q.processAllAvailable()
    assert(got.keySet == Set((10L, 1L)))
    mem.addData(incoming.drop(1): _*)
    q.processAllAvailable()
    q.stop()
    // the unique doc matches nothing; the fr permutation matches its
    // standing original; no existing×existing pair ever appears
    assert(got.keySet == Set((10L, 1L), (12L, 3L)))
  }

  test("file-stream CDC: masked replication from a JSONL envelope directory") {
    import org.apache.spark.sql.types._
    import graft.cdc.Envelope
    import graft.streaming.CdcStream
    import graft.classify.Libraries
    val rowSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    // land a batch of envelope JSONL files (the change-stream hand-off)
    val batch = Seq((1L, "Customer#1", "c"), (2L, "Customer#2", "c"))
      .toDF("c_custkey", "c_name", "op")
      .select(Envelope.wrap(lit(null).cast(rowSchema),
        struct(col("c_custkey"), col("c_name")),
        "db", "customer", col("op"), lit(1L)).as("value"))
    batch.coalesce(1).write.mode("overwrite").text(dir.toString)
    val stream = spark.readStream.text(dir.toString)
    val masked = CdcStream.maskedChanges(stream, rowSchema, Libraries.default,
      { case "nation-names" => Seq("P1", "P2", "P3"); case _ => Seq.empty })
    val q = masked.writeStream.format("memory").queryName("filecdc")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("filecdc").select("op", "c_custkey", "c_name")
      .as[(String, Long, String)].collect().sortBy(_._2)
    assert(rows.length == 2)
    assert(rows.forall { case (op, _, name) =>
      op == "c" && Seq("P1", "P2", "P3").contains(name) })
  }

  test("file-stream CDC: Avro-encoded envelopes feed the same masked plan") {
    import org.apache.spark.sql.types._
    import graft.streaming.CdcStream
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val rowSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType)))
    val avro = new Schema.Parser().parse(
      """{"type":"record","name":"Env","fields":[{"name":"payload","type":
        |{"type":"record","name":"P","fields":[
        |{"name":"before","type":["null",{"type":"record","name":"R","fields":[
        |  {"name":"c_custkey","type":"long"},{"name":"c_name","type":"string"}]}],
        |  "default":null},
        |{"name":"after","type":["null","R"],"default":null},
        |{"name":"source","type":{"type":"record","name":"S","fields":[
        |  {"name":"db","type":"string"},{"name":"table","type":"string"}]}},
        |{"name":"op","type":"string"},{"name":"ts_ms","type":"long"}]}}]}"""
        .stripMargin)
    val pS = avro.getField("payload").schema()
    val rS = pS.getField("before").schema().getTypes.get(1)
    val sS = pS.getField("source").schema()
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-stream")
    def envelope(op: String, key: Long, name: String): GenericRecord = {
      val row = new GenericData.Record(rS)
      row.put("c_custkey", key); row.put("c_name", name)
      val src = new GenericData.Record(sS)
      src.put("db", "db"); src.put("table", "customer")
      val p = new GenericData.Record(pS)
      p.put(if (op == "d") "before" else "after", row)
      p.put("source", src); p.put("op", op); p.put("ts_ms", 1L)
      val e = new GenericData.Record(avro)
      e.put("payload", p)
      e
    }
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
      .create(avro, new java.io.File(dir.toFile, "b0.avro"))
    w.append(envelope("c", 1L, "Customer#1"))
    w.append(envelope("u", 2L, "Customer#2"))
    w.append(envelope("d", 3L, "Customer#3"))
    w.close()
    val out = CdcStream.changes(CdcStream.avroTail(spark, dir.toString), rowSchema)
    val q = out.writeStream.format("memory").queryName("avrocdc")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("avrocdc").select("op", "c_custkey", "c_name")
      .as[(String, Long, String)].collect().sortBy(_._2)
    assert(rows.toSeq == Seq(("c", 1L, "Customer#1"),
      ("u", 2L, "Customer#2"), ("d", 3L, "Customer#3")))
  }

  test("stream-stream interval join matches the batch plan") {
    implicit val sql = spark.sqlContext
    // signups: u1@00:00, u2@02:00; purchases: u1@01:00 (in), u1 next
    // day (out), u2@01:00 (before signup, out), u2@03:00 (in)
    val signups = Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L),
      (11L, ts("2024-01-01 02:00:00"), 2L))
    val purchases = Seq(
      (20L, ts("2024-01-01 01:00:00"), 1L),
      (21L, ts("2024-01-02 01:00:00"), 1L),
      (22L, ts("2024-01-01 01:00:00"), 2L),
      (23L, ts("2024-01-01 03:00:00"), 2L))
    def toDF(rows: Seq[(Long, Timestamp, Long)], mem: MemoryStream[(Long, Timestamp, Long)]) =
      mem.toDF().toDF("event_id", "ts", "user_id").withWatermark("ts", "1 hour")
    val memS = MemoryStream[(Long, Timestamp, Long)]
    val memP = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.intervalJoin(toDF(signups, memS), toDF(purchases, memP))
    val q = joined.writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    memS.addData(signups: _*)
    memP.addData(purchases: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ivjoin")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val batch = EventStreams.intervalJoin(
      signups.toDF("event_id", "ts", "user_id"),
      purchases.toDF("event_id", "ts", "user_id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(streamed == batch)
    assert(batch == Seq((1L, 10L, 20L), (2L, 11L, 23L)))
  }

  test("left-outer interval join emits null rows once the watermark passes") {
    implicit val sql = spark.sqlContext
    // u1 signs up and purchases inside 24h (inner row, immediate);
    // u3 signs up and never purchases (outer null row — emitted ONLY
    // after both watermarks pass signup_ts + 24h)
    val signups = Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L),
      (12L, ts("2024-01-01 00:30:00"), 3L))
    val purchases = Seq((20L, ts("2024-01-01 01:00:00"), 1L))
    def toDF(mem: MemoryStream[(Long, Timestamp, Long)]) =
      mem.toDF().toDF("event_id", "ts", "user_id").withWatermark("ts", "1 hour")
    val memS = MemoryStream[(Long, Timestamp, Long)]
    val memP = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.intervalJoinOuter(toDF(memS), toDF(memP))
    val q = joined.writeStream.format("memory").queryName("ivouter")
      .outputMode("append").start()
    try {
      memS.addData(signups: _*)
      memP.addData(purchases: _*)
      q.processAllAvailable()
      // outer results need the watermark to advance past the interval
      // end AND a further trigger to evict state — push far-future
      // flush rows (users 8/9, excluded from the assertion) until the
      // null row lands
      var round = 0
      def relevant() = spark.table("ivouter")
        .filter(col("user_id") < 5).count()
      while (round < 6 && relevant() < 2) {
        memS.addData((2000L + round, ts(s"2024-02-0${round + 1} 00:00:00"), 8L))
        memP.addData((1000L + round, ts(s"2024-02-0${round + 1} 00:00:00"), 9L))
        q.processAllAvailable()
        round += 1
      }
    } finally q.stop()
    val streamed = spark.table("ivouter").filter(col("user_id") < 5)
      .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(streamed == Seq((1L, 10L, Some(20L)), (3L, 12L, None)),
      s"unexpected outer-join stream output: $streamed")
  }

  test("streaming per-table routing to a partitioned file sink") {
    // the reference routes every change to its own per-table target
    // (generated per-table scripts); Spark-side the same routing is
    // partitionBy on the PARSED table name — one declarative sink,
    // table-split storage layout
    import org.apache.spark.sql.types._
    import graft.streaming.CdcStream
    implicit val sql = spark.sqlContext
    val rowSchema = StructType(Seq(StructField("id", LongType)))
    def env(id: Long, t: String) =
      s"""{"payload":{"after":{"id":$id},"source":{"db":"d","table":"$t"},"op":"c","ts_ms":$id}}"""
    val mem = MemoryStream[String]
    val out = java.nio.file.Files.createTempDirectory("graft-routed").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-routed-ck").toString
    val q = CdcStream.changes(mem.toDF().toDF("value"), rowSchema)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt)
      .partitionBy("table")
      .start()
    mem.addData(env(1, "customer"), env(2, "orders"), env(3, "customer"))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(out).select("table", "id")
      .as[(String, Long)].collect().toSet
    assert(back == Set(("customer", 1L), ("orders", 2L), ("customer", 3L)))
    // the layout IS per-table: partition directories on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("table=")).toSet
    assert(dirs == Set("table=customer", "table=orders"))
  }

  test("socket live-tail: masked replication from a real TCP change feed") {
    // the reference's deployment mode is a LIVE tail (embedded Debezium
    // engine, Main.java:159-177); in-sandbox the live transport is a
    // real TCP socket feeding the same parse→classify→mask plan (in
    // production the same pipeline reads format("kafka"))
    import org.apache.spark.sql.types._
    import graft.cdc.Envelope
    import graft.streaming.CdcStream
    import graft.classify.Libraries
    val rowSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType)))
    val payload = Seq((1L, "Customer#1", "c"), (2L, "Customer#2", "u"))
      .toDF("c_custkey", "c_name", "op")
      .select(Envelope.wrap(lit(null).cast(rowSchema),
        struct(col("c_custkey"), col("c_name")),
        "db", "customer", col("op"), lit(1L)).as("value"))
      .as[String].collect()
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        payload.foreach(out.println)
        out.flush()
        Thread.sleep(30000) // keep the connection open while the test reads
        sock.close()
      } catch { case _: Throwable => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    val tail = CdcStream.liveTail(spark, "socket",
      Map("host" -> "127.0.0.1", "port" -> port.toString))
    val masked = CdcStream.maskedChanges(tail, rowSchema, Libraries.default,
      { case "nation-names" => Seq("P1", "P2", "P3"); case _ => Seq.empty })
    val q = masked.writeStream.format("memory").queryName("livecdc")
      .outputMode("append").start()
    try {
      // live source: poll until both records have flowed through
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("livecdc").count() < 2 &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(200)
      }
      val rows = spark.table("livecdc").select("op", "c_custkey", "c_name")
        .as[(String, Long, String)].collect().sortBy(_._2)
      assert(rows.length == 2, s"got ${rows.length} rows from the live tail")
      assert(rows.map(_._1).toSeq == Seq("c", "u"))
      assert(rows.forall { case (_, _, name) =>
        Seq("P1", "P2", "P3").contains(name) }, "names must be masked")
    } finally {
      q.stop()
      server.close()
    }
  }

  test("streaming queue depth (literal Lindley recursion in fMGWS " +
      "state) matches the batch max-plus scan on real events") {
    import graft.streaming.Stateful
    implicit val sql = spark.sqlContext
    // real sf0.001 events, fed in two per-key time-ordered batches
    // (the documented arrival contract)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp"),
        col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (e._2.getTime, e._1))
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val typed = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .as[Stateful.EventRow]
    val q = Stateful.queueDepthUpdates(typed)
      .writeStream.format("memory").queryName("queue_depth")
      .outputMode("update").start()
    mem.addData(first.toSeq: _*)
    q.processAllAvailable()
    mem.addData(second.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("queue_depth")
      .as[Stateful.QueueDepth].collect()
      .groupBy(_.event_type).map { case (k, v) => k -> v.maxBy(_.n) }
    val batch = EventStreams.strQueueDepth(spark, sfDir).collect()
    batch.foreach { r =>
      val s = streamed(r.getAs[String]("grp"))
      assert(s.n === r.getAs[Long]("n"))
      assert(s.w_max_ms === r.getAs[Long]("w_max_ms"))
      assert(s.w_mean_ms === r.getAs[Long]("w_mean_ms"))
      assert(s.busy_pm === r.getAs[Long]("busy_pm"))
    }
  }

  test("flatMapGroupsWithState carries running totals across micro-batches") {
    import graft.streaming.Stateful
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val typed = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .as[Stateful.EventRow]
    val q = Stateful.runningTotals(typed)
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    mem.addData(sample.take(3): _*)
    q.processAllAvailable()
    val mid = spark.table("running").as[Stateful.UserRunning]
      .collect().map(s => s.user_id -> s).toMap
    assert(mid(1L).n == 2 && math.abs(mid(1L).total - 3.0) < 1e-9)
    mem.addData(sample.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    // update mode appends a new row per key per batch: latest wins
    val fin = spark.table("running").as[Stateful.UserRunning].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n) }
    assert(fin(1L).n == 3 && math.abs(fin(1L).total - 8.0) < 1e-9)
    assert(fin(2L).n == 2 && math.abs(fin(2L).total - 7.0) < 1e-9)
  }

  test("transformWithState (RocksDB store) matches the flatMapGroupsWithState totals") {
    import graft.streaming.Stateful
    implicit val sql = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val typed = mem.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .as[Stateful.EventRow]
      val q = Stateful.runningTotalsTws(typed)
        .writeStream.format("memory").queryName("running_tws")
        .outputMode("update").start()
      try {
        mem.addData(sample.take(3): _*)
        q.processAllAvailable()
        mem.addData(sample.drop(3): _*)
        q.processAllAvailable()
      } finally q.stop()
      val fin = spark.table("running_tws").as[Stateful.UserRunning].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n) }
      assert(fin(1L).n == 3 && math.abs(fin(1L).total - 8.0) < 1e-9)
      assert(fin(2L).n == 2 && math.abs(fin(2L).total - 7.0) < 1e-9)
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("event-time timers close idle sessions and clear their state") {
    import graft.streaming.Stateful
    implicit val sql = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val typed = mem.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "10 seconds")
        .as[Stateful.EventRow]
      val q = Stateful.idleSessions(typed, gapMs = 30000L)
        .writeStream.format("memory").queryName("idle_sessions")
        .outputMode("append").start()
      try {
        mem.addData(
          (1L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0),
          (2L, ts("2024-01-01 09:00:10"), 1L, "click", 2.0),
          (3L, ts("2024-01-01 09:00:05"), 2L, "click", 3.0))
        q.processAllAvailable()
        // watermark still behind both timers → nothing closed yet
        assert(spark.table("idle_sessions").count() == 0)
        // two watermark advances: the first carries the watermark past
        // the timers, the second runs a batch under it so they fire
        mem.addData((9L, ts("2024-01-01 09:10:00"), 9L, "click", 0.0))
        q.processAllAvailable()
        mem.addData((10L, ts("2024-01-01 09:20:00"), 9L, "click", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("idle_sessions").as[Stateful.ClosedSession]
        .collect().filter(_.user_id < 9).map(s => s.user_id -> s).toMap
      assert(rows(1L).n_events == 2 &&
        rows(1L).last_ts_ms == ts("2024-01-01 09:00:10").getTime)
      assert(rows(2L).n_events == 1 &&
        rows(2L).last_ts_ms == ts("2024-01-01 09:00:05").getTime)
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("sessionization over MemoryStream matches the batch session_window plan") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = EventStreams.sessionize(mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "1 minute"))
    val q = stream.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    mem.addData((99L, ts("2024-01-01 09:00:00"), 9L, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions")
      .filter(col("user_id") < 9)
      .orderBy("user_id", "session_start")
      .as[(Timestamp, Long, Long, Timestamp)].collect().toSeq
    val batch = EventStreams.sessionize(
      sample.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("user_id", "session_start")
      .as[(Timestamp, Long, Long, Timestamp)].collect().toSeq
    assert(streamed == batch)
    // user 1: events at 00:05 and 00:40 are >30m apart → separate
    // sessions, plus 03:00 → three sessions total
    assert(batch.count(_._2 == 1L) == 3)
  }

  test("DDL drift: mid-stream column-add dispatches to both version targets without restart") {
    // the reference reacts to DDL by regenerating the job
    // (Main.java:293-309); here one running query keeps consuming and
    // routes each record by ITS OWN payload field set to the matching
    // per-version plan
    import org.apache.spark.sql.types._
    import graft.streaming.CdcStream
    implicit val sql = spark.sqlContext
    val v1 = StructType(Seq(StructField("id", LongType)))
    val v2 = StructType(Seq(StructField("id", LongType),
      StructField("tier", StringType)))
    def env1(id: Long) =
      s"""{"payload":{"after":{"id":$id},"source":{"db":"d","table":"t"},"op":"c","ts_ms":$id}}"""
    def env2(id: Long, tier: String) =
      s"""{"payload":{"after":{"id":$id,"tier":"$tier"},"source":{"db":"d","table":"t"},"op":"c","ts_ms":$id}}"""
    val mem = MemoryStream[String]
    val got1 = scala.collection.concurrent.TrieMap[Long, Long]()
    val got2 = scala.collection.concurrent.TrieMap[Long, String]()
    val q = mem.toDF().toDF("value").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val routed = CdcStream.dispatchByVersion(
          batch.toDF(), Seq(1L -> v1, 2L -> v2)).toMap
        routed(1L).select(col("after.id")).collect()
          .foreach(r => got1.put(r.getLong(0), r.getLong(0)))
        routed(2L).select(col("after.id"), col("after.tier")).collect()
          .foreach(r => got2.put(r.getLong(0), r.getString(1)))
        ()
      }
      .start()
    // pre-DDL batch: v1 shape only
    mem.addData(env1(1), env1(2))
    q.processAllAvailable()
    assert(got1.keySet == Set(1L, 2L) && got2.isEmpty)
    // the DDL lands mid-stream: the SAME query now sees v2 records
    // (and one more v1 straggler) and routes both without a restart
    mem.addData(env2(3, "gold"), env1(4), env2(5, "basic"))
    q.processAllAvailable()
    q.stop()
    assert(got1.keySet == Set(1L, 2L, 4L))
    assert(got2.toMap == Map(3L -> "gold", 5L -> "basic"))
  }

  test("kafka tail: option validation, classpath gate, and transport fallback") {
    import graft.streaming.CdcStream
    // canonical option map for a Debezium topic
    val opts = CdcStream.kafkaOptions("broker1:9092,broker2:9092",
      "cdc.public.customer", "latest", Map("maxOffsetsPerTrigger" -> "5000"))
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "cdc.public.customer")
    assert(opts("startingOffsets") == "latest")
    assert(opts("failOnDataLoss") == "false")
    assert(opts("maxOffsetsPerTrigger") == "5000")
    // misconfiguration fails at plan time with clear messages
    assert(intercept[IllegalArgumentException] {
      CdcStream.kafkaOptions("", "topic")
    }.getMessage.contains("bootstrapServers"))
    assert(intercept[IllegalArgumentException] {
      CdcStream.kafkaOptions("b:9092", "t",
        extra = Map("subscribePattern" -> "cdc.*"))
    }.getMessage.contains("mutually"))
    // this sandbox has no kafka connector jars: the gate must say so
    assert(!CdcStream.kafkaAvailable)
    assert(intercept[UnsupportedOperationException] {
      CdcStream.kafkaTail(spark, "b:9092", "t")
    }.getMessage.contains("spark-sql-kafka"))
    // with a fallback transport the same call yields a streaming tail
    val df = CdcStream.kafkaTail(spark, "b:9092", "t",
      fallback = Some(("rate", Map("rowsPerSecond" -> "1"))))
    assert(df.isStreaming && df.columns.toSeq == Seq("value"))
  }

  test("streaming CEP facts equal the batch pair set across batch splits") {
    implicit val sql = spark.sqlContext
    // signup in b1, error + purchase in b2, second purchase in b3 —
    // the open-signup state must survive every boundary, the error
    // must suppress only pairs it sits strictly inside, and the
    // 7-day window must expire user 4's stale signup
    val b1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup", 1.0),
      (2L, ts("2024-01-01 00:00:00"), 2L, "signup", 1.0),
      (10L, ts("2024-01-01 00:00:00"), 4L, "signup", 1.0))
    val b2 = Seq(
      (3L, ts("2024-01-02 00:00:00"), 1L, "purchase", 1.0),
      (4L, ts("2024-01-02 00:00:00"), 2L, "error", 1.0),
      (5L, ts("2024-01-03 00:00:00"), 2L, "purchase", 1.0))
    val b3 = Seq(
      (6L, ts("2024-01-04 00:00:00"), 1L, "purchase", 1.0),
      (11L, ts("2024-01-20 00:00:00"), 4L, "purchase", 1.0))
    val all = b1 ++ b2 ++ b3
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.cepMatchUpdates(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("cep_facts")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("cep_facts")
      .groupBy("user_id").agg(count(lit(1)).as("n_matches"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.streaming.EventStreams.cepPattern(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_matches")).toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // user 1 converts twice (both purchases in window, no error);
    // user 2's error suppresses; user 4's signup expired
    assert(batch == Map(1L -> 2L))
  }

  test("windowed KMV sketches merge across micro-batches to the batch estimate") {
    implicit val sql = spark.sqlContext
    val k = 64
    // three 6-hour windows: sub-k (exact path), exactly k, and >> k
    // (estimate path); the last window arrives split across batches
    // with overlapping users (distinct-merge must dedup)
    def evs(hour: Int, users: Range, base: Long) = users.map { u =>
      (base + u, ts(f"2024-01-01 ${hour}%02d:30:00"), u.toLong, "view", 1.0)
    }
    val all = evs(1, 0 until 30, 1000) ++ evs(7, 100 until 164, 2000) ++
      evs(13, 1000 until 1200, 3000) ++ evs(14, 1000 until 1100, 4000)
    val state = scala.collection.concurrent.TrieMap[Timestamp,
      scala.collection.immutable.SortedSet[Long]]()
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          // per-batch KMV partials (≤ k hashes per window leave the
          // batch) merged into the running sketch: k smallest of a
          // union = k smallest of (k-smallest(A) ∪ k-smallest(B))
          batch.select(
              window(col("ts"), "6 hours").getField("start").as("w"),
              graft.mask.MaskFunctions.portableHash(col("user_id"))
                .as("h"))
            .distinct().collect().foreach { r =>
              val merged = state.getOrElse(r.getTimestamp(0),
                scala.collection.immutable.SortedSet.empty[Long]) +
                r.getLong(1)
              state.put(r.getTimestamp(0), merged.take(k))
            }
          ()
      }.start()
    try {
      all.grouped(120).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val expected = graft.streaming.EventStreams.distinctWindowed(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
      .map(r => r.getTimestamp(0) -> r.getAs[Long]("est_users")).toMap
    val got = state.map { case (w, s) =>
      w -> (if (s.size < k) s.size.toLong
            else (63L * 4294967296L) / s.last)
    }.toMap
    assert(got == expected, s"merged sketch $got != batch $expected")
    assert(expected.size == 3)
  }

  test("concurrency peaks merge across micro-batches via shard partials") {
    implicit val sql = spark.sqlContext
    // per-shard partial = (delta sum, max prefix) over the shard's
    // deltas in (t, d) order; segments combine associatively:
    // total = sA + sB, maxPrefix = max(mpA, sA + mpB). Batches only
    // ADD deltas to a shard's multiset, so the state is the per-shard
    // delta list and the fold replays the batch decomposition.
    val shardW = 3600000000L
    val events = (0 until 300).map { i =>
      (4000L + i, ts(f"2024-01-01 ${i / 25}%02d:${(i * 7) % 60}%02d:00"),
        i.toLong % 40, "view", 1.0)
    }
    val state = scala.collection.concurrent.TrieMap[Long,
      Vector[(Long, Long)]]()
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val deltas = batch.select(col("event_id"),
              expr("unix_micros(cast(ts as timestamp))").as("s"))
            .collect().flatMap { r =>
              val st = r.getLong(1)
              val en = st + (60L + r.getLong(0) % 600L) * 1000000L
              Seq((st, 1L), (en, -1L))
            }
          deltas.foreach { case (t, d) =>
            val sh = t / shardW
            state.put(sh, state.getOrElse(sh, Vector.empty) :+ (t, d))
          }
          ()
      }.start()
    try {
      events.grouped(80).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // fold shard partials in shard order, tracking the global carry;
    // r9 semantics: every window is seeded with the concurrency
    // carried in at its start, and the spine is gap-free between the
    // first and last delta window
    val windowPeak = scala.collection.mutable.Map[Long, Long]()
    val windowEntry = scala.collection.mutable.Map[Long, Long]()
    var carry = 0L
    state.toSeq.sortBy(_._1).foreach { case (sh, ds) =>
      var run = 0L
      ds.sortBy(identity).foreach { case (t, d) =>
        val wb = t / 21600000000L
        windowEntry.getOrElseUpdate(wb, carry + run)
        run += d
        windowPeak(wb) = math.max(
          windowPeak.getOrElse(wb, Long.MinValue), carry + run)
      }
      carry += ds.map(_._2).sum
    }
    (windowPeak.keys.min to windowPeak.keys.max).foreach { wb =>
      val entry = windowEntry.getOrElse(wb,
        // delta-less window: carried value = entry of the next
        // reporting window (no deltas in between change it)
        windowEntry.toSeq.filter(_._1 > wb).minBy(_._1)._2)
      windowPeak(wb) = math.max(windowPeak.getOrElse(wb, Long.MinValue),
        entry)
    }
    val batchOut = graft.streaming.EventStreams.concurrency(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
      .map(r => r.getAs[java.time.LocalDateTime](0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L /
        21600000000L -> r.getAs[Long]("max_concurrent")).toMap
    assert(windowPeak.toMap == batchOut,
      s"merged shard partials ${windowPeak.toMap} != batch $batchOut")
    assert(batchOut.values.max > 1L)
  }

  test("rate-limit trailing counts equal the batch RANGE frame " +
      "across micro-batches and timestamp ties") {
    implicit val sql = spark.sqlContext
    // user 1: 7 events inside one 24 h window (violations at c>5),
    // two of them simultaneous (RANGE peers — both must count 4);
    // user 2: events 25 h apart (window expiry between batches)
    val b1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 02:00:00"), 1L, "click", 1.0),
      (20L, ts("2024-01-01 00:00:00"), 2L, "view", 1.0))
    val b2 = Seq(
      (4L, ts("2024-01-01 03:00:00"), 1L, "click", 1.0),
      (5L, ts("2024-01-01 03:00:00"), 1L, "view", 1.0),
      (6L, ts("2024-01-01 04:00:00"), 1L, "click", 1.0),
      (21L, ts("2024-01-02 01:30:00"), 2L, "view", 1.0))
    val b3 = Seq(
      (7L, ts("2024-01-01 05:00:00"), 1L, "click", 1.0),
      (8L, ts("2024-01-02 02:30:00"), 1L, "click", 1.0),
      (22L, ts("2024-01-03 03:00:00"), 2L, "view", 1.0))
    val all = b1 ++ b2 ++ b3
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.rateLimitUpdates(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("rate_counts")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("rate_counts")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("c") > 5, 1L).otherwise(0L)).as("n_violations"),
        max(col("c")).as("max_window_count"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val batch = graft.streaming.EventStreams.rateLimit(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // the tie pair must both have counted the whole peer group, and
    // user 1's burst must actually violate
    assert(batch("click")._2 >= 1L)
  }

  test("seasonal-error day counts merge additively across " +
      "micro-batches") {
    implicit val sql = spark.sqlContext
    // state = per-(type, day) count — the canonical streaming agg:
    // batches only ADD, so the fold is plain addition and the MASE
    // panel is a pure function of the merged state.
    val events = (0 until 400).map { i =>
      val day = (i * 13) % 20 // gappy: some days never hit per type
      (9000L + i, ts(f"2024-01-${day + 1}%02d 06:00:00"),
        i.toLong % 9, Seq("view", "click", "error")(i % 3), 1.0)
    }
    val state = scala.collection.concurrent.TrieMap[(String, Long), Long]()
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batch.groupBy(col("event_type"),
              expr("unix_micros(cast(ts as timestamp)) div 86400000000")
                .as("day"))
            .count().collect().foreach { r =>
              val k = (r.getString(0), r.getLong(1))
              state.put(k, state.getOrElse(k, 0L) + r.getLong(2))
            }
          ()
      }.start()
    try {
      events.grouped(90).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // panel from the merged state
    val expected = state.toSeq.groupBy(_._1._1).map { case (t, rows) =>
      val byDay = rows.map { case ((_, d), c) => d -> c }.toMap
      val days = byDay.keys.min to byDay.keys.max
      val series = days.map(d => byDay.getOrElse(d, 0L))
      val usable = (7 until series.length).map { i =>
        (math.abs(series(i) - series(i - 7)),
          math.abs(series(i) - series(i - 1)))
      }
      val e7 = usable.map(_._1).sum
      val e1 = usable.map(_._2).sum
      t -> (usable.length.toLong, e7, e1)
    }
    val batchOut = EventStreams.seasonalError(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("abs_err7"),
          r.getAs[Long]("abs_err1")))).toMap
    assert(expected == batchOut)
    assert(batchOut.values.exists(_._2 > 0))
  }

  test("CEP negation pattern folds per-user state across micro-batches") {
    implicit val sql = spark.sqlContext
    // the incremental form of cepPattern: per-user event lists are the
    // state a transformWithState operator would hold (bounded by the
    // 7-day window's retention); batches only APPEND to a user's
    // multiset, and the match/negation computation is a pure function
    // of the final per-user state — so the fold replays the batch
    // semantics exactly, micro-batch boundaries invisible.
    val events = (0 until 30).flatMap { u =>
      val m = u % 3
      val base = Seq(
        (5000L + u * 10, ts(f"2024-01-${1 + m}%02d 08:00:00"),
          u.toLong, "signup", 1.0),
        (5001L + u * 10, ts(f"2024-01-${2 + m}%02d 09:30:00"),
          u.toLong, "purchase", 1.0))
      val extra = if (u % 3 == 0)
        Seq((5002L + u * 10, ts(f"2024-01-${3 + m}%02d 10:00:00"),
          u.toLong, "purchase", 1.0)) else Seq.empty
      val err = if (u % 4 == 0)
        Seq((5003L + u * 10, ts(f"2024-01-${1 + m}%02d 20:00:00"),
          u.toLong, "error", 1.0)) else Seq.empty
      base ++ extra ++ err
    }
    val state = scala.collection.concurrent.TrieMap[Long,
      Vector[(String, Long)]]()
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batch.select(col("user_id"), col("event_type"),
              expr("unix_micros(cast(ts as timestamp))"))
            .collect().foreach { r =>
              val u = r.getLong(0)
              state.put(u, state.getOrElse(u, Vector.empty) :+
                (r.getString(1), r.getLong(2)))
            }
          ()
      }.start()
    try {
      events.grouped(23).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val win = 604800000000L
    val folded = state.flatMap { case (u, evs) =>
      val ss = evs.collect { case ("signup", t) => t }
      val ps = evs.collect { case ("purchase", t) => t }
      val es = evs.collect { case ("error", t) => t }
      val matches = for {
        s <- ss; p <- ps
        if p > s && p <= s + win && !es.exists(e => e > s && e < p)
      } yield (s, p)
      if (matches.isEmpty) None
      else Some(u -> (matches.size.toLong, matches.map(_._1).min,
        matches.map(_._2).min))
    }.toMap
    val batchOut = EventStreams.cepPattern(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_signup_us"),
          r.getAs[Long]("first_purchase_us"))).toMap
    assert(folded == batchOut,
      s"folded CEP state $folded != batch $batchOut")
    // the scenario exercises both arms: some users negated by an
    // in-between error, some with multiple matches
    assert(batchOut.values.exists(_._1 > 1L))
    assert((0 until 30).exists(u => u % 4 == 0 &&
      !batchOut.contains(u.toLong)))
  }

  test("active-user coverage deltas fold to the exact batch " +
      "DAU/WAU/MAU across micro-batches") {
    implicit val sql = spark.sqlContext
    // user 1's day-2 activity arrives in a LATER batch than days 1
    // and 3 — a middle insertion that must merge two standing islands
    // (the retraction path); user 2 has a gap wider than every
    // window; duplicates are re-sent to prove delta idempotence.
    def at(day: Int) = ts(f"2024-01-${day}%02d 10:00:00")
    val b1 = Seq(
      (1L, at(1), 1L, "click", 1.0),
      (2L, at(3), 1L, "click", 1.0),
      (3L, at(1), 2L, "view", 1.0))
    val b2 = Seq(
      (4L, at(2), 1L, "click", 1.0),  // bridges days 1 and 3 for w=1
      (5L, at(28), 2L, "view", 1.0),  // far gap: separate island (w<=7)
      (6L, at(3), 1L, "click", 1.0))  // duplicate day: must emit nothing
    val b3 = Seq(
      (7L, at(15), 1L, "click", 1.0),
      (8L, at(28), 2L, "view", 1.0))  // duplicate again
    val all = b1 ++ b2 ++ b3
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.activeUserDeltas(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("coverage_deltas")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val deltas = spark.table("coverage_deltas")
      .groupBy("w", "day").agg(sum(col("delta")).as("d"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .filter(_._2 != 0L).toMap
    val batch = EventStreams.activeUsers(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
    def folded(w: Int, day: Long): Long =
      deltas.collect { case ((`w`, d), v) if d <= day => v }.sum
    batch.foreach { case (day, (dau, wau, mau)) =>
      assert(folded(1, day) == dau, s"day $day dau")
      assert(folded(7, day) == wau, s"day $day wau")
      assert(folded(30, day) == mau, s"day $day mau")
    }
    // the merge actually happened: w=1 has exactly one +1 on user 1's
    // bridged [1..3] run start and none inside it
    val w1 = deltas.collect { case ((1, d), v) => d -> v }
    val day1 = all.map(_ => 0) // anchor: 2024-01-01's epoch day
    val d0 = batch.map(_._1).min
    assert(w1.toMap.get(d0 + 1).forall(_ <= 0L) &&
      w1.toMap.get(d0 + 2).forall(_ <= 0L),
      s"bridged island must not keep interior starts: $w1")
  }

  test("streamed coverage deltas fold to the exact batch stickiness " +
      "per-mille panel") {
    implicit val sql = spark.sqlContext
    // activity shaped so dau/mau actually varies: a burst, a quiet
    // stretch inside the 30-day window, and a second cohort joining
    // late — split across three micro-batches with a duplicate resend
    def at(day: Int) = ts(f"2024-02-${day}%02d 11:00:00")
    val b1 = (1 to 5).map(d => (d.toLong, at(d), 1L, "click", 1.0)) ++
      Seq((10L, at(1), 2L, "view", 1.0))
    val b2 = Seq((11L, at(12), 2L, "view", 1.0),
      (12L, at(3), 1L, "click", 1.0), // duplicate day: no-op
      (13L, at(20), 3L, "click", 1.0))
    val b3 = Seq((14L, at(21), 3L, "click", 1.0),
      (15L, at(25), 1L, "click", 1.0))
    val all = b1 ++ b2 ++ b3
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.activeUserDeltas(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("stick_deltas")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = graft.streaming.Stateful.stickinessFromDeltas(
        spark.table("stick_deltas"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val batch = EventStreams.stickiness(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(streamed == batch,
      s"folded stickiness panel\n$streamed\n!= batch\n$batch")
    // the fixture is non-degenerate: the ratio moves and mau > dau
    assert(batch.map(_._4).distinct.size > 2)
    assert(batch.exists(r => r._3 > r._2))
  }

  test("streamed (type, day) counts fold to the exact batch " +
      "Mann-Kendall trend panel") {
    implicit val sql = spark.sqlContext
    // one rising type (count = day), one falling, one flat with ties —
    // S must see all three regimes from the folded state alone
    val events = (0 until 12).flatMap { day =>
      def mk(t: String, n: Int, base: Long) = (0 until n).map { j =>
        (base + day * 20 + j, ts(f"2024-03-${day + 1}%02d 0$j:10:00"),
          j.toLong, t, 1.0)
      }
      mk("up", day + 1, 90000L) ++ mk("down", 13 - day, 91000L) ++
        mk("flat", 3, 92000L)
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.typeDayCounts(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("type_day_counts")
      .outputMode("update").start()
    try {
      events.grouped(47).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // update mode appends revisions; counts are monotone → final = max
    val streamed = spark.table("type_day_counts")
      .groupBy("event_type", "day").agg(max(col("count")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // fold the |types × days| frame into the exact S census
    val expected = streamed.keys.map(_._1).toSeq.distinct.sorted.map { t =>
      val days = streamed.collect { case ((`t`, d), c) => (d, c) }
        .toSeq.sortBy(_._1)
      val pairs = for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield java.lang.Long.signum(days(j)._2 - days(i)._2)
      (t, days.length.toLong, pairs.map(_.toLong).sum,
        pairs.count(_ > 0).toLong, pairs.count(_ < 0).toLong,
        pairs.count(_ == 0).toLong)
    }
    val batch = EventStreams.mannKendall(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(expected == batch,
      s"folded MK census\n$expected\n!= batch\n$batch")
    // fixture is non-degenerate: all three verdicts appear
    val verdicts = EventStreams.mannKendall(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getAs[String]("trend")).toSet
    assert(verdicts == Set("rising", "falling", "flat"))
  }

  test("streamed day counts fold to the exact batch CUSUM " +
      "change-point panel") {
    implicit val sql = spark.sqlContext
    // regime change: ~3 events/day for 10 days, then ~9/day — the
    // CUSUM extremum must land at the shift whichever micro-batch
    // carried the rows. The streamed state is ONLY the per-day count
    // (bounded by the day range); the |days|-sized panel is a pure
    // function of it.
    val events = (0 until 20).flatMap { day =>
      val n = if (day < 10) 2 else 7
      (0 until n).map { j =>
        (7000L + day * 10 + j, ts(f"2024-02-${day + 1}%02d 0$j:00:00"),
          j.toLong, "view", 1.0)
      }
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.dayCounts(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("day_counts")
      .outputMode("update").start()
    try {
      events.grouped(35).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // update mode appends every revision; the count is monotone, so
    // the final state per day is the max
    val streamed = spark.table("day_counts")
      .groupBy("day").agg(max(col("count")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fold the streamed frame into the panel
    val lo = streamed.keys.min
    val hi = streamed.keys.max
    val series = (lo to hi).map(d => d -> streamed.getOrElse(d, 0L))
    val nd = series.length.toLong
    val tot = series.map(_._2).sum
    var run = 0L
    val cusum = series.map { case (d, c) =>
      run += c * nd - tot; (d, c, run)
    }
    val m = cusum.map(t => math.abs(t._3)).max
    val expected = cusum.map { case (d, c, cu) =>
      d -> ((c, cu, math.abs(cu) == m))
    }.toMap
    val batchOut = EventStreams.changePoints(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map { r =>
        val day = r.getAs[java.time.LocalDateTime]("day_start")
          .toEpochSecond(java.time.ZoneOffset.UTC) / 86400
        day -> ((r.getAs[Long]("c"), r.getAs[Long]("cusum"),
          r.getAs[Boolean]("is_peak")))
      }.toMap
    assert(expected == batchOut,
      s"folded panel $expected != batch $batchOut")
    // the peak lands at the regime shift, not an endpoint
    val peakDay = batchOut.collect { case (d, (_, _, true)) => d }.min
    assert(peakDay > lo && peakDay < hi)
  }

  test("event-time-timer debounce emits exactly the batch-persisted " +
      "transitions") {
    import graft.streaming.Stateful
    implicit val sql = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // u1: click flaps to view in 10 s, view persists (next change
      // 45 min later), error persists via timer; u2: one state, one
      // repeat — persists via timer; u3: flap ACROSS batches, then
      // the replacement persists via timer
      val b1 = Seq(
        (1L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 09:00:10"), 1L, "view", 1.0),
        (4L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0),
        (6L, ts("2024-01-01 09:00:00"), 3L, "click", 1.0))
      val b2 = Seq(
        (3L, ts("2024-01-01 09:45:00"), 1L, "error", 1.0),
        (5L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0),
        (7L, ts("2024-01-01 09:05:00"), 3L, "view", 1.0))
      // watermark pushes so the standing timers fire
      val b3 = Seq((90L, ts("2024-01-01 14:00:00"), 9L, "click", 0.0))
      val b4 = Seq((91L, ts("2024-01-01 18:00:00"), 9L, "click", 0.0))
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val q = Stateful.debounceUpdates(
          mem.toDF()
            .toDF("event_id", "ts", "user_id", "event_type", "value")
            .withWatermark("ts", "10 seconds")
            .as[Stateful.EventRow])
        .writeStream.format("memory").queryName("debounced")
        .outputMode("append").start()
      try {
        Seq(b1, b2, b3, b4).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("debounced")
        .filter(col("user_id") < 9)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // driver replay of the batch rule: a change persists iff the
      // next CHANGE is more than the hold later (or never comes)
      val hold = 1800000000L
      val all = (b1 ++ b2).filter(_._3 < 9)
      val expected = all.groupBy(_._3).flatMap { case (u, evs) =>
        val ordered = evs.sortBy(e => (e._2.getTime, e._1))
        val changes = ordered.foldLeft(List.empty[(String, Long)]) {
          case (acc, (_, t, _, tpe, _)) =>
            val us = t.getTime * 1000L
            if (acc.headOption.forall(_._1 != tpe)) (tpe, us) :: acc
            else acc
        }.reverse
        changes.zipAll(changes.drop(1).map(Some(_)), null, None).collect {
          case ((st, us), nxt: Option[(String, Long)] @unchecked)
            if nxt.forall(_._2 - us > hold) => (u, st, us)
        }
      }.toSet
      assert(streamed == expected,
        s"streamed $streamed != batch-persisted $expected")
      // both flap arms exercised: a within-batch flap and a
      // cross-batch flap were suppressed
      assert(!streamed.exists(c => c._1 == 1L && c._2 == "click"))
      assert(!streamed.exists(c => c._1 == 3L && c._2 == "click"))
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streamed value histogram folds to the exact batch p95 panel") {
    implicit val sql = spark.sqlContext
    // heavy-tailed values across two 6h windows, tie-heavy on purpose
    // (rank selection must pick the same value both ways)
    val events = (0 until 300).map { i =>
      val h = if (i % 2 == 0) 1 else 8 // two 6h buckets
      val v = Seq(1.00, 1.00, 2.50, 2.50, 9.99, 50.0)(i % 6)
      (8000L + i, ts(f"2024-03-01 0$h:${i % 60}%02d:00"),
        i.toLong % 5, "view", v)
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = graft.streaming.Stateful.windowCentsCounts(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Stateful.EventRow])
      .writeStream.format("memory").queryName("cents_hist")
      .outputMode("update").start()
    try {
      events.grouped(70).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // counts are monotone; the final state per cell is the max update
    val hist = spark.table("cents_hist")
      .groupBy("w_us", "cents").agg(max(col("count")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val folded = hist.groupBy(_._1._1).map { case (w, cells) =>
      val sorted = cells.toSeq.map { case ((_, c), n) => (c, n) }
        .sortBy(_._1)
      val n = sorted.map(_._2).sum
      val k = (n * 95 + 99) / 100
      var cum = 0L
      val p95 = sorted.collectFirst {
        case (c, cnt) if { cum += cnt; cum >= k } => c
      }.get
      w -> ((n, p95))
    }
    val batch = EventStreams.windowP95(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(folded == batch, s"folded $folded != batch $batch")
    assert(batch.size == 2 && batch.values.exists(_._2 == 5000L))
  }

  test("checkpointed state survives a query restart (file source)") {
    // the recovery contract a production CDC pipeline leans on: stop
    // the query, restart from the same checkpoint, and the stateful
    // aggregation continues from recovered state instead of
    // recounting — the file source replays only unseen files.
    val base = java.nio.file.Files.createTempDirectory("graft-restart")
    val inDir = base.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    val ckpt = base.resolve("ckpt").toString
    def writeFile(name: String, rows: Seq[(Long, Long)]): Unit = {
      val body = rows.map { case (id, u) =>
        s"""{"event_id":$id,"user_id":$u}""" }.mkString("\n")
      java.nio.file.Files.writeString(inDir.resolve(name), body)
    }
    val schema = "event_id LONG, user_id LONG"
    val state = scala.collection.concurrent.TrieMap[Long, Long]()
    def run(): Unit = {
      val q = spark.readStream.schema(schema).json(inDir.toString)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            // idempotent UPSERT keyed on user_id — replay-safe
            batch.collect().foreach(r => state.put(r.getLong(0), r.getLong(1)))
            ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    writeFile("a.json", Seq((1L, 1L), (2L, 1L), (3L, 2L)))
    run()
    assert(state.toMap == Map(1L -> 2L, 2L -> 1L))
    // second run: NEW files only are replayed, counts CONTINUE from
    // the recovered state (1 -> 3, not 1 -> 1)
    writeFile("b.json", Seq((4L, 1L), (5L, 3L)))
    run()
    assert(state.toMap == Map(1L -> 3L, 2L -> 1L, 3L -> 1L),
      s"restart must resume from checkpointed counts, got $state")
  }

  test("streamed per-shard maxima fold to the exact batch watermark-" +
      "skew panel, and the wide form agrees with the batch form") {
    implicit val sql = spark.sqlContext
    // 3 windows; shard = user_id % 8; one shard (user 7) lags hard in
    // window 2 and is absent from window 3 (n_shards must drop)
    val events = (0 until 240).map { i =>
      val h = (i % 3) * 6 + 1
      val u = if (i % 10 == 9 && i % 3 == 1) 7L else (i % 7).toLong
      (9000L + i, ts(f"2024-05-01 $h%02d:${i % 50}%02d:${i % 60}%02d"),
        u, "view", 1.0)
    }.filterNot { case (_, tsv, u, _, _) =>
      // shard 7 never speaks in the last window
      u == 7L && tsv.toLocalDateTime.getHour >= 13
    }
    val df = events.toDF("event_id", "ts", "user_id", "event_type",
      "value")
    // 1) the streaming-compatible wide form ≡ the two-agg batch form
    val batch = EventStreams.watermarkSkew(df)
      .collect().map(r => r.getAs[Timestamp]("window_start") ->
        ((r.getAs[Long]("n_shards"), r.getAs[Long]("n_events"),
          r.getAs[Long]("skew_us"), r.getAs[Long]("wm_us"),
          r.getAs[Long]("laggard_shard")))).toMap
    val wide = EventStreams.watermarkSkewWide(df)
      .collect().map(r => r.getAs[Timestamp]("window_start") ->
        ((r.getAs[Long]("n_shards"), r.getAs[Long]("n_events"),
          r.getAs[Long]("skew_us"), r.getAs[Long]("wm_us"),
          r.getAs[Long]("laggard_shard")))).toMap
    assert(wide == batch, s"wide $wide != batch $batch")
    // 2) streamed in update mode, the final update per window is the
    // complete panel (n_events is monotone — take its argmax row)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventStreams.watermarkSkewWide(mem.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("wm_skew")
      .outputMode("update").start()
    try {
      events.grouped(60).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val folded = spark.table("wm_skew").collect()
      .groupBy(_.getAs[Timestamp]("window_start"))
      .map { case (w, rows) =>
        val last = rows.maxBy(_.getAs[Long]("n_events"))
        w -> ((last.getAs[Long]("n_shards"), last.getAs[Long]("n_events"),
          last.getAs[Long]("skew_us"), last.getAs[Long]("wm_us"),
          last.getAs[Long]("laggard_shard")))
      }
    assert(folded == batch, s"folded $folded != batch $batch")
    assert(batch.size == 3 && batch.values.map(_._1).toSet.size >= 2,
      "fixture must exercise a shard-count drop across windows")
  }
}
