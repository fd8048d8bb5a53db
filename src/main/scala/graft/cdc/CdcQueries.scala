package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}
import graft.mask.MaskFunctions
import graft.Syntax._

/** §2.2 CDC/replication operators.
  *
  * The `events` table stands in for a change stream: event_type maps to
  * the Debezium op codes the reference switches on (reference:
  * /root/reference/src/main/java/Main.java:171-177 — `c`reate, `u`pdate,
  * `d`elete), keyed by user_id, ordered by (ts, event_id).
  *
  * Scale notes: snapshot-apply is one shuffle on the key + a window
  * (state per key, AQE-coalesced); at 100 TB the changelog would be
  * bucketed by key so compaction is shuffle-free. Routing is a
  * map-only pass (no shuffle until the per-target aggregation).
  */
object CdcQueries extends QueryModule {

  /** event_type → Debezium op code. */
  private def opCol: Column =
    when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .otherwise("u")

  private val opSql =
    "CASE WHEN event_type = 'signup' THEN 'c' WHEN event_type = 'error' THEN 'd' ELSE 'u' END"

  /** Epoch micros of ts. ts is NTZ (see Tables.events); unix_micros
    * needs an instant, and the NTZ→LTZ cast is identity under the UTC
    * session tz. */
  private def tsMicros: Column = unix_micros(col("ts").cast(TimestampType))

  /** Canonical changelog view of events. */
  def changeLog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("event_type"), opCol.as("op"))

  /** Events scan spread across the cluster before a serde-heavy wire
    * stage (JSON envelope wrap/parse, json_object_keys inventory). At
    * bench SF the corpus arrives as ONE parquet split, so the whole
    * wire stage otherwise runs in a single task (measured 1–2.3 s of
    * single-thread serde per envelope key, warm); the keyed
    * repartition is exempt from AQE coalescing and its width follows
    * the cluster — no local constant. At 100 TB the source's natural
    * splits already provide this parallelism and the skinny pre-serde
    * exchange is noise next to the serde itself (the winnowing-digest
    * precedent: width-pin only where per-partition compute ≫ task
    * overhead). */
  private def wireEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .repartition(
        spark.sparkContext.defaultParallelism, col("event_id"))
      .withColumn("ts_us", tsMicros)

  // --------------------------------------------- cdc_parse_envelope
  /** Full envelope round-trip: rows → Debezium-style JSON → typed parse.
    * Exercises the ingest path end-to-end (wrap exists for tests/
    * interop; production ingest starts at `parse`). */
  def parseEnvelope(spark: SparkSession, dir: String): DataFrame = {
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val ev = wireEvents(spark, dir)
    val after = struct(col("event_id"), col("user_id"), col("value"))
    val json = Envelope.wrap(lit(null).cast(rowSchema), after, "graft", "events",
      opCol, expr("ts_us div 1000"))
    val parsed = Envelope.parse(ev.select(json.as("j")), col("j"), rowSchema)
    parsed.select(col("after.event_id").as("event_id"), col("op"),
      col("after.user_id").as("user_id"), col("after.value").as("value"),
      col("table").as("source_table"))
      .orderBy("event_id")
  }

  val parseEnvelopeSql: String =
    s"""SELECT event_id, $opSql AS op, user_id, value,
       |  'events' AS source_table
       |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------- cdc_temporal_repair
  /** Debezium sends temporals as numbers; repair them to typed values
    * (reference: DateTimeConversionUtil.java:22-37 — epoch-days → date,
    * micros-of-day → time, epoch-millis → datetime). The numeric columns
    * are derived from ts, round-tripped through the converters. */
  def temporalRepair(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", tsMicros)
    val epochDay = datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
    val microsOfDay = expr("ts_us % 86400000000")
    val epochMillis = expr("ts_us div 1000")
    ev.select(col("event_id"),
      MaskFunctions.epochDayToDate(epochDay).as("rep_date"),
      MaskFunctions.microsOfDayToTime(microsOfDay).as("rep_time"),
      MaskFunctions.epochMillisToTimestamp(epochMillis).as("rep_ts"))
      .orderBy("event_id")
  }

  val temporalRepairSql: String =
    """SELECT event_id,
      |  CAST(ts AS DATE) AS rep_date,
      |  lpad(CAST((epoch_us(ts) % 86400000000) // 3600000000 AS VARCHAR), 2, '0') || ':' ||
      |  lpad(CAST((epoch_us(ts) % 3600000000) // 60000000 AS VARCHAR), 2, '0') || ':' ||
      |  lpad(CAST((epoch_us(ts) % 60000000) // 1000000 AS VARCHAR), 2, '0') || '.' ||
      |  lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') AS rep_time,
      |  make_timestamp((epoch_us(ts) // 1000) * 1000) AS rep_ts
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------ cdc_wire_type_repair
  /** Debezium wire-type repair: the reference forces
    * decimal.handling.mode=string and binary.handling.mode=base64
    * (reference: Main.java:143-144), so numerics arrive as strings and
    * binary as base64 text. Round-trips both through the wire encoding
    * and repairs to typed columns. */
  def wireTypeRepair(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val wireDecimal = col("value").cast(DecimalType(18, 2)).cast("string")
    val wireBinary = base64(encode(col("event_type"), "UTF-8"))
    ev.select(col("event_id"), wireDecimal.as("v_wire"), wireBinary.as("b_wire"))
      .select(col("event_id"),
        col("v_wire").cast(DecimalType(18, 2)).cast("double").as("v_typed"),
        decode(unbase64(col("b_wire")), "UTF-8").as("b_typed"))
      .orderBy("event_id")
  }

  val wireTypeRepairSql: String =
    """SELECT event_id,
      |  CAST(CAST(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS v_typed,
      |  decode(from_base64(to_base64(encode(event_type)))) AS b_typed
      |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------- cdc_snapshot_apply
  /** Changelog → current state: latest change per key wins; a trailing
    * delete removes the key. One shuffle + per-key window. */
  def snapshotApply(spark: SparkSession, dir: String): DataFrame =
    applyLog(changeLog(spark, dir))
      .select(col("user_id"), col("value"), col("event_id").as("last_event_id"))
      .orderBy("user_id")

  /** Latest row per key (including deletes — callers filter). */
  private def latestPerKey(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    log.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  private def applyLog(log: DataFrame): DataFrame =
    latestPerKey(log).filter(col("op") =!= "d")

  val snapshotApplySql: String =
    s"""WITH log AS (SELECT event_id, ts, user_id, value, $opSql AS op FROM events),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |             ORDER BY ts DESC, event_id DESC) AS rn FROM log)
       |SELECT user_id, value, event_id AS last_event_id
       |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin

  // --------------------------------------------- cdc_log_compact
  /** Kafka-style log compaction with tombstone GC — the retention
    * semantics a compacted CDC topic applies between the wire and the
    * warehouse (`cleanup.policy=compact` + `delete.retention.ms`):
    * keep the LATEST record per key, keep a delete marker (tombstone)
    * only while younger than the GC horizon — long enough for every
    * consumer to observe the delete — then drop it. Differs from
    * [[snapshotApply]] exactly by the retained-tombstone window, which
    * is what lets a late-joining consumer distinguish "deleted
    * recently" from "never existed". One per-key window + a one-row
    * broadcast horizon; the value column passes through untouched (no
    * float arithmetic crosses the oracle). */
  def logCompact(spark: SparkSession, dir: String): DataFrame = {
    val log = changeLog(spark, dir).withColumn("ts_us", tsMicros)
    val horizon = log.agg(
      (max(col("ts_us")) - lit(7L * 86400000000L)).as("_hz"))
    latestPerKey(log).crossJoin(broadcast(horizon))
      .filter(col("op") =!= "d" || col("ts_us") >= col("_hz"))
      .select(col("user_id"),
        col("op"),
        when(col("op") === "d", lit(null).cast("double"))
          .otherwise(col("value")).as("value"),
        col("event_id").as("last_event_id"),
        (col("op") === "d").as("is_tombstone"))
      .orderBy("user_id")
  }

  val logCompactSql: String =
    s"""WITH log AS (SELECT event_id, ts, epoch_us(ts) AS ts_us, user_id,
       |               value, $opSql AS op FROM events),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |             ORDER BY ts DESC, event_id DESC) AS rn FROM log),
       |h AS (SELECT MAX(ts_us) - 7 * 86400000000 AS hz FROM log)
       |SELECT user_id, op,
       |  CASE WHEN op = 'd' THEN NULL ELSE value END AS value,
       |  event_id AS last_event_id, op = 'd' AS is_tombstone
       |FROM ranked, h
       |WHERE rn = 1 AND (op <> 'd' OR ts_us >= hz)
       |ORDER BY user_id""".stripMargin

  // ----------------------------------- cdc_incremental_snapshot
  /** DBLog-style incremental snapshot merge — the algorithm behind
    * Debezium's ad-hoc/incremental snapshots (the reference's engine
    * embeds Debezium, whose re-snapshot path is exactly this): the
    * table is snapshotted in KEY-RANGE CHUNKS while the change stream
    * keeps flowing; each chunk read is bracketed by a watermark, and a
    * chunk row is superseded when a change for its key arrives after
    * the chunk's watermark. The merged result must equal latest-per-key
    * over snapshot ∪ changelog (CdcSpec pins that invariant against
    * [[snapshotApply]]); the audit here reports, per chunk, how many
    * keys survived, were superseded in-flight, were created only after
    * their chunk was read, or ended deleted.
    *
    * Chunk watermarks derive deterministically from the log's time
    * bounds (integer micros arithmetic — engine-exact). Scale shape:
    * one tiny bounds agg broadcast everywhere, then ONE shuffle on the
    * key — the per-key window and the per-key flag aggregation share
    * the same hash partitioning (the agg groups by the window's
    * partition key, so Catalyst reuses the exchange) — then a
    * |chunks|-row audit agg. At 100 TB nothing holds more than a key's
    * events in memory at once. */
  def incrementalSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val log = changeLog(spark, dir).withColumn("ts_us", tsMicros)
    val bounds = log.agg(min(col("ts_us")).as("tmin"),
      max(col("ts_us")).as("tmax"),
      max(expr("user_id div 100")).as("cmax"))
    val e = log.crossJoin(broadcast(bounds))
      .withColumn("chunk_id", expr("user_id div 100"))
      .withColumn("wm",
        expr("tmin + ((chunk_id + 1) * (tmax - tmin)) div (cmax + 2)"))
    val w = Window.partitionBy("user_id").orderBy(desc("ts_us"), desc("event_id"))
    val perUser = e.withColumn("_rn", row_number().over(w))
      .groupBy("user_id")
      .agg(max(col("chunk_id")).as("chunk_id"),
        max(when(col("_rn") === 1, col("event_id"))).as("final_event_id"),
        max(when(col("_rn") === 1, col("op"))).as("final_op"),
        max(when(col("ts_us") <= col("wm"), 1).otherwise(0)).as("has_snap"),
        max(when(col("ts_us") > col("wm"), 1).otherwise(0)).as("has_after"))
    val live = col("final_op") =!= "d"
    perUser.groupBy("chunk_id")
      .agg(sum(when(live, 1L).otherwise(0L)).as("n_live"),
        sum(when(!live, 1L).otherwise(0L)).as("n_deleted"),
        sum(when(live && col("has_snap") === 1 && col("has_after") === 1,
          1L).otherwise(0L)).as("n_superseded"),
        sum(when(live && col("has_snap") === 0, 1L).otherwise(0L))
          .as("n_stream_only"),
        sum(when(live, col("final_event_id")).otherwise(0L))
          .as("final_id_sum"))
      .orderBy("chunk_id")
  }

  val incrementalSnapshotSql: String =
    s"""WITH log AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, $opSql AS op
       |  FROM events),
       |b AS (SELECT MIN(ts_us) AS tmin, MAX(ts_us) AS tmax,
       |        MAX(user_id // 100) AS cmax FROM log),
       |e AS (
       |  SELECT l.*, l.user_id // 100 AS chunk_id,
       |    b.tmin + ((l.user_id // 100 + 1) * (b.tmax - b.tmin))
       |      // (b.cmax + 2) AS wm
       |  FROM log l CROSS JOIN b),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY ts_us DESC, event_id DESC) AS rn FROM e),
       |u AS (
       |  SELECT user_id, MAX(chunk_id) AS chunk_id,
       |    MAX(CASE WHEN rn = 1 THEN event_id END) AS final_event_id,
       |    MAX(CASE WHEN rn = 1 THEN op END) AS final_op,
       |    MAX(CASE WHEN ts_us <= wm THEN 1 ELSE 0 END) AS has_snap,
       |    MAX(CASE WHEN ts_us > wm THEN 1 ELSE 0 END) AS has_after
       |  FROM r GROUP BY user_id)
       |SELECT chunk_id,
       |  CAST(SUM(CASE WHEN final_op <> 'd' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_live,
       |  CAST(SUM(CASE WHEN final_op = 'd' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_deleted,
       |  CAST(SUM(CASE WHEN final_op <> 'd' AND has_snap = 1
       |      AND has_after = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_superseded,
       |  CAST(SUM(CASE WHEN final_op <> 'd' AND has_snap = 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stream_only,
       |  CAST(SUM(CASE WHEN final_op <> 'd' THEN final_event_id
       |      ELSE 0 END) AS BIGINT) AS final_id_sum
       |FROM u GROUP BY chunk_id ORDER BY chunk_id""".stripMargin

  // ------------------------------------------------- cdc_gap_audit
  /** Replication completeness audit: the change stream's event ids are
    * a (gapless-by-contract) sequence, so missing ids = dropped
    * changes — the first check a replication target runs after
    * catch-up. Blocked by id range (10k per block) so the audit
    * LOCALIZES loss: per block, observed count, expected span count,
    * and the missing delta, plus the block's min/max for gap
    * triangulation. One map-side-combining agg; output is
    * |id-range|/10k rows regardless of corpus size. All exact
    * integers. */
  def gapAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), expr("event_id div 10000").as("block"))
      .groupBy("block")
      .agg(count(lit(1)).as("n_seen"),
        min(col("event_id")).as("id_min"),
        max(col("event_id")).as("id_max"))
      .withColumn("n_expected", expr("id_max - id_min + 1"))
      .withColumn("n_missing", expr("n_expected - n_seen"))
      .orderBy("block")

  val gapAuditSql: String =
    """SELECT event_id // 10000 AS block, COUNT(*) AS n_seen,
      |  MIN(event_id) AS id_min, MAX(event_id) AS id_max,
      |  MAX(event_id) - MIN(event_id) + 1 AS n_expected,
      |  MAX(event_id) - MIN(event_id) + 1 - COUNT(*) AS n_missing
      |FROM events GROUP BY 1 ORDER BY block""".stripMargin

  // --------------------------------------------- cdc_upsert_target
  /** Keyed APPEND/UPDATE/DELETE application against an existing target
    * (reference: Main.java:477-498 routes ops to /APPEND, /UPDATE=(key),
    * /DELETE=(key)). Baseline = state from the first half of the month;
    * the second half's changes are applied onto it. */
  def upsertTarget(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val log = changeLog(spark, dir)
    val baseline = applyLog(log.filter(col("ts") < cut))
      .select(col("user_id"), col("value").as("base_value"))
    val delta = latestPerKey(log.filter(col("ts") >= cut))
      .select(col("user_id"), col("value").as("delta_value"), col("op"))
    baseline.join(delta, Seq("user_id"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "d")
      .select(col("user_id"),
        coalesce(col("delta_value"), col("base_value")).as("value"),
        when(col("op").isNull, "kept")
          .when(col("base_value").isNull, "inserted")
          .otherwise("updated").as("src"))
      .orderBy("user_id")
  }

  val upsertTargetSql: String =
    s"""WITH log AS (SELECT event_id, ts, user_id, value, $opSql AS op FROM events),
       |base_ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM log WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
       |baseline AS (SELECT user_id, value AS base_value
       |  FROM base_ranked WHERE rn = 1 AND op <> 'd'),
       |delta_ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM log WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
       |delta AS (SELECT user_id, value AS delta_value, op
       |  FROM delta_ranked WHERE rn = 1)
       |SELECT COALESCE(b.user_id, d.user_id) AS user_id,
       |  COALESCE(d.delta_value, b.base_value) AS value,
       |  CASE WHEN d.op IS NULL THEN 'kept'
       |       WHEN b.user_id IS NULL THEN 'inserted'
       |       ELSE 'updated' END AS src
       |FROM baseline b FULL OUTER JOIN delta d ON b.user_id = d.user_id
       |WHERE d.op IS NULL OR d.op <> 'd'
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------- cdc_scd2_history
  /** Type-2 history build from the changelog: every upsert becomes a
    * version row with a validity interval; the next change (including
    * a delete) closes it. One shuffle on the key + a per-key window —
    * the standard warehouse-replication companion to snapshot apply. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changeLog(spark, dir)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .filter(col("op") =!= "d")
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  val scd2HistorySql: String =
    s"""WITH log AS (SELECT event_id, ts, user_id, value, $opSql AS op FROM events),
       |v AS (SELECT *, LEAD(ts) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS valid_to FROM log)
       |SELECT user_id, event_id, value, ts AS valid_from, valid_to,
       |  valid_to IS NULL AS is_current
       |FROM v WHERE op <> 'd'
       |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ---------------------------------------------- cdc_route_tables
  /** Per-table routing with postfix naming + exclude list (reference:
    * Main.java:129-135 targetNamePostfix; conf `table.exclude.list` in
    * /root/reference/conf/config.properties:8). Map-only until the
    * final per-target agg. */
  def routeTables(spark: SparkSession, dir: String): DataFrame = {
    val route = when(col("event_type") === "signup", "users")
      .when(col("event_type") === "purchase", "orders_feed")
      .when(col("event_type") === "error", "errors")
      .otherwise("activity")
    Tables.events(spark, dir)
      .withColumn("_tbl", route)
      .filter(!col("_tbl").rlike("^(?:.*err.*)$"))
      .groupBy(concat(col("_tbl"), lit("_masked")).as("target_table"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .reportSort("target_table")
  }

  val routeTablesSql: String =
    """WITH routed AS (
      |  SELECT *, CASE WHEN event_type = 'signup' THEN 'users'
      |                 WHEN event_type = 'purchase' THEN 'orders_feed'
      |                 WHEN event_type = 'error' THEN 'errors'
      |                 ELSE 'activity' END AS tbl
      |  FROM events)
      |SELECT tbl || '_masked' AS target_table, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM routed WHERE NOT regexp_matches(tbl, '^(?:.*err.*)$')
      |GROUP BY tbl ORDER BY target_table""".stripMargin

  // ---------------------------------------------- cdc_schema_drift
  /** Structure-change capture: drift-ish events land in an append-only
    * log keyed by day (reference: Main.java:293-309 appends DDL events
    * to schemaChangeEventLog). 'error' events stand in for DDL; the
    * props JSON payload is parsed for the reported version. */
  def schemaDrift(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_ddl"),
        max(get_json_object(col("props"), "$.k").cast("int")).as("max_k"))
      .reportSort("day")

  val schemaDriftSql: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_ddl,
      |  MAX(CAST(props->>'k' AS INTEGER)) AS max_k
      |FROM events WHERE event_type = 'error'
      |GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin

  // ------------------------------------------------- cdc_ivm_merge
  /** INCREMENTAL VIEW MAINTENANCE — the aggregate-materialized-view
    * delta merge that lets a replication target keep `SELECT dim,
    * COUNT(*), SUM(x)` current WITHOUT rescanning history (the
    * technique behind every warehouse MV refresh; the reference's
    * /APPEND / /UPDATE / /DELETE routing, Main.java:477-498, is the
    * row-level form — this is its aggregate-level composition): the
    * order stream splits at its midpoint date into a BASE epoch and a
    * CDC tail (inserts = the tail; deletes = base keys ≡ 3 (mod 10);
    * updates = base keys ≡ 7 (mod 10), +1.00 on the price), every op
    * melts to its (Δcount, Δrevenue) contribution — insert (+1, +v),
    * delete (−1, −v_old), update (0, v_new − v_old) — and the merge
    * is one dimension-sized hash-agg + outer join against the base
    * MV. The oracle computes the FINAL state by full recompute, so
    * the green hash IS the IVM-equals-recompute theorem for this
    * view class. One corpus scan feeds base MV and delta melt (the
    * checkpointed 4-column projection); everything after is
    * |dim|-sized. */
  def ivmMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
        col("o_orderpriority").as("prio"), col("o_orderkey").as("key"),
        unix_micros(col("o_orderdate").cast(TimestampType)).as("t"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .cut
    val bounds = o.agg((min(col("t")) + max(col("t"))).as("mid2"))
    val tagged = o.crossJoin(broadcast(bounds))
      .withColumn("tail", col("t") * 2 > col("mid2"))
    val base = tagged.filter(!col("tail"))
    val baseMv = base.groupBy("prio")
      .agg(count(lit(1)).as("n_base"), sum(col("cents")).as("rev_base"))
    // op melt: one row per delta with its (dn, drev) contribution
    val inserts = tagged.filter(col("tail"))
      .select(col("prio"), lit("c").as("op"), lit(1L).as("dn"),
        col("cents").as("drev"))
    val deletes = base.filter(pmod(col("key"), lit(10)) === 3)
      .select(col("prio"), lit("d").as("op"), lit(-1L).as("dn"),
        (-col("cents")).as("drev"))
    val updates = base.filter(pmod(col("key"), lit(10)) === 7)
      .select(col("prio"), lit("u").as("op"), lit(0L).as("dn"),
        lit(100L).as("drev"))
    val delta = inserts.unionByName(deletes).unionByName(updates)
      .groupBy("prio")
      .agg(sum(when(col("op") === "c", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("op") === "d", 1L).otherwise(0L)).as("n_del"),
        sum(when(col("op") === "u", 1L).otherwise(0L)).as("n_upd"),
        sum(col("dn")).as("dn"), sum(col("drev")).as("drev"))
    baseMv.join(delta, Seq("prio"), "full_outer")
      .select(col("prio"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_ins"), lit(0L)).as("n_ins"),
        coalesce(col("n_del"), lit(0L)).as("n_del"),
        coalesce(col("n_upd"), lit(0L)).as("n_upd"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_final"),
        (coalesce(col("rev_base"), lit(0L)) +
          coalesce(col("drev"), lit(0L))).as("rev_final_cents"))
      .reportSort("prio")
  }

  /** Full-recompute oracle: applies deletes/updates to the base set,
    * unions the tail, and aggregates the FINAL state directly — what
    * the IVM merge must equal. */
  val ivmMergeSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio, o_orderkey AS key,
      |    epoch_us(o_orderdate) AS t,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |b AS (SELECT MIN(t) + MAX(t) AS mid2 FROM o),
      |base AS (SELECT * FROM o, b WHERE t * 2 <= mid2),
      |tail AS (SELECT * FROM o, b WHERE t * 2 > mid2),
      |final AS (
      |  SELECT prio, CASE WHEN key % 10 = 7 THEN cents + 100
      |                    ELSE cents END AS cents
      |  FROM base WHERE key % 10 <> 3
      |  UNION ALL SELECT prio, cents FROM tail),
      |fagg AS (
      |  SELECT prio, COUNT(*) AS n_final,
      |    CAST(SUM(cents) AS BIGINT) AS rev_final_cents
      |  FROM final GROUP BY 1),
      |bagg AS (SELECT prio, COUNT(*) AS n_base FROM base GROUP BY 1),
      |ops AS (
      |  SELECT prio,
      |    CAST(SUM(CASE WHEN src = 'c' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_ins,
      |    CAST(SUM(CASE WHEN src = 'd' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_del,
      |    CAST(SUM(CASE WHEN src = 'u' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_upd
      |  FROM (
      |    SELECT prio, 'c' AS src FROM tail
      |    UNION ALL SELECT prio, 'd' FROM base WHERE key % 10 = 3
      |    UNION ALL SELECT prio, 'u' FROM base WHERE key % 10 = 7)
      |  GROUP BY 1)
      |SELECT f.prio,
      |  COALESCE(bagg.n_base, 0) AS n_base,
      |  COALESCE(ops.n_ins, 0) AS n_ins,
      |  COALESCE(ops.n_del, 0) AS n_del,
      |  COALESCE(ops.n_upd, 0) AS n_upd,
      |  f.n_final, f.rev_final_cents
      |FROM fagg f
      |LEFT JOIN bagg ON bagg.prio = f.prio
      |LEFT JOIN ops ON ops.prio = f.prio
      |ORDER BY f.prio""".stripMargin

  // ----------------------------------------------- cdc_compat_audit
  /** SCHEMA-REGISTRY COMPATIBILITY AUDIT — the classification a
    * registry performs before admitting a new schema version
    * (BACKWARD / FORWARD / FULL / NONE), run over the OBSERVED field
    * inventory of the wire rather than declared schemas: the stream
    * splits into four time epochs (the drifting-producer model of
    * [[driftDispatch]], extended), each epoch's payload carries a
    * different field set (user_id dropped late; event_type absent →
    * sometimes-present → always-present), and a field counts as
    * REQUIRED in an epoch iff it appears in EVERY record (optional if
    * in some — presence inferred from `json_object_keys` over the
    * actual JSON bytes, so the audit also exercises the serializer's
    * null-omission path). Transition classes then follow the registry
    * rules: backward-compatible (a new-schema reader replays old
    * data) iff every new-REQUIRED field was old-REQUIRED;
    * forward-compatible iff the mirror holds. The three transitions
    * come out FULL (optional add), FORWARD (optional→required
    * tightening), BACKWARD (required drop) — all four field events
    * exercised. Shape: one wire scan → (epoch, field) hash-agg on a
    * ≤4·|fields| frame; everything downstream is dimension-sized.
    * Reference: Main.java:293-309 captures the DDL stream this audit
    * would gate. */
  def compatAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = wireEvents(spark, dir)
    val bounds = ev.agg(min(col("ts_us")).as("tmin"),
      max(col("ts_us")).as("tmax"))
    val eps = ev.crossJoin(broadcast(bounds))
      .withColumn("ep", least(lit(3L),
        expr("(ts_us - tmin) * 4 div (tmax - tmin + 1)")))
    // per-epoch payload shape (nulls vanish through to_json):
    //   e0 {id, user, value}  e1 + event_type on purchases only
    //   e2 event_type always  e3 drops user_id
    val after = struct(
      col("event_id"),
      when(col("ep") <= 2, col("user_id")).as("user_id"),
      col("value"),
      when(col("ep") === 1 && col("event_type") === "purchase",
        col("event_type"))
        .when(col("ep") >= 2, col("event_type")).as("event_type"))
    val wire = eps.select(col("ep"), to_json(after).as("payload"))
    val pres = wire.select(col("ep"),
        explode(expr("json_object_keys(payload)")).as("field"))
      .groupBy("ep", "field").agg(count(lit(1)).as("pres"))
    val totals = eps.groupBy("ep").agg(count(lit(1)).as("n"))
    val inv = pres.join(broadcast(totals), Seq("ep"))
      .select(col("ep"), col("field"), (col("pres") === col("n")).as("req"))
    val old = inv.select(col("ep").as("from_ep"), col("field"),
      col("req").as("req_old"))
    val neu = inv.select((col("ep") - 1).as("from_ep"), col("field"),
      col("req").as("req_new"))
    old.join(neu, Seq("from_ep", "field"), "full_outer")
      .filter(col("from_ep").between(0, 2))
      .groupBy("from_ep")
      .agg(
        sum(when(col("req_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("req_new").isNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(coalesce(col("req_new"), lit(false)) &&
          !coalesce(col("req_old"), lit(false)), 1L).otherwise(0L))
          .as("back_breaks"),
        sum(when(coalesce(col("req_old"), lit(false)) &&
          !coalesce(col("req_new"), lit(false)), 1L).otherwise(0L))
          .as("fwd_breaks"))
      .select(col("from_ep"), (col("from_ep") + 1).as("to_ep"),
        col("n_added"), col("n_dropped"),
        col("back_breaks"), col("fwd_breaks"),
        when(col("back_breaks") === 0 && col("fwd_breaks") === 0, "FULL")
          .when(col("back_breaks") === 0, "BACKWARD")
          .when(col("fwd_breaks") === 0, "FORWARD")
          .otherwise("NONE").as("compat"))
      .reportSort("from_ep")
  }

  val compatAuditSql: String =
    """WITH b AS (
      |  SELECT MIN(epoch_us(ts)) AS tmin, MAX(epoch_us(ts)) AS tmax
      |  FROM events),
      |e AS (
      |  SELECT LEAST(3, (epoch_us(ts) - tmin) * 4 // (tmax - tmin + 1))
      |    AS ep, event_type
      |  FROM events CROSS JOIN b),
      |t AS (SELECT ep, COUNT(*) AS n FROM e GROUP BY 1),
      |inv AS (
      |  SELECT ep, 'event_id' AS field, COUNT(*) AS pres FROM e GROUP BY ep
      |  UNION ALL SELECT ep, 'value', COUNT(*) FROM e GROUP BY ep
      |  UNION ALL SELECT ep, 'user_id', COUNT(*) FROM e
      |    WHERE ep <= 2 GROUP BY ep
      |  UNION ALL SELECT ep, 'event_type', COUNT(*) FROM e
      |    WHERE (ep = 1 AND event_type = 'purchase') OR ep >= 2
      |    GROUP BY ep),
      |r AS (SELECT inv.ep, field, pres = t.n AS req
      |      FROM inv JOIN t ON inv.ep = t.ep),
      |j AS (
      |  SELECT COALESCE(o.ep, nn.ep - 1) AS from_ep,
      |    o.req AS req_old, nn.req AS req_new
      |  FROM r o FULL JOIN r nn
      |    ON nn.ep = o.ep + 1 AND nn.field = o.field),
      |g AS (
      |  SELECT from_ep,
      |    CAST(SUM(CASE WHEN req_old IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_added,
      |    CAST(SUM(CASE WHEN req_new IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_dropped,
      |    CAST(SUM(CASE WHEN COALESCE(req_new, false)
      |      AND NOT COALESCE(req_old, false) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS back_breaks,
      |    CAST(SUM(CASE WHEN COALESCE(req_old, false)
      |      AND NOT COALESCE(req_new, false) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS fwd_breaks
      |  FROM j WHERE from_ep BETWEEN 0 AND 2 GROUP BY 1)
      |SELECT from_ep, from_ep + 1 AS to_ep, n_added, n_dropped,
      |  back_breaks, fwd_breaks,
      |  CASE WHEN back_breaks = 0 AND fwd_breaks = 0 THEN 'FULL'
      |       WHEN back_breaks = 0 THEN 'BACKWARD'
      |       WHEN fwd_breaks = 0 THEN 'FORWARD'
      |       ELSE 'NONE' END AS compat
      |FROM g ORDER BY from_ep""".stripMargin

  // ---------------------------------------------- cdc_drift_dispatch
  /** Schema-version dispatch after a mid-stream DDL — the batch form
    * of [[graft.streaming.CdcStream.dispatchByVersion]] (the streaming
    * form is driven by StreamingSpec): events after the stream's
    * midpoint watermark carry an ADDED column (the drifted v2 shape),
    * and the dispatcher routes every record by its OWN payload field
    * set — [[graft.streaming.CdcStream.schemaVersion]] probes the
    * record's JSON keys, never the timestamp — into per-version typed
    * parse plans, unioned into one audit. The reference handles drift
    * by regenerating the job per column set (Main.java:293-309); here
    * both shapes flow through one plan with no restart.
    *
    * Scale shape: ONE pass over the wire — the superset-schema parse
    * plus per-record version tag of
    * [[graft.streaming.CdcStream.parseTagged]] decodes every version
    * in a single map-only scan (a filtered parse per version would
    * re-read the stream V times); the only shuffle is the 2-row audit
    * agg. The oracle recomputes the v1/v2 split arithmetically from
    * the midpoint. */
  def driftDispatch(spark: SparkSession, dir: String): DataFrame = {
    val v1 = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val v2 = StructType(v1.fields :+ StructField("event_type", StringType))
    val ev = wireEvents(spark, dir)
    val bounds = ev.agg(min(col("ts_us")).as("tmin"),
      max(col("ts_us")).as("tmax"))
    val drifted = ev.crossJoin(broadcast(bounds))
      .withColumn("_v2", col("ts_us") * 2 > col("tmin") + col("tmax"))
    val after1 = struct(col("event_id"), col("user_id"), col("value"))
    val after2 = struct(col("event_id"), col("user_id"), col("value"),
      col("event_type"))
    val json = when(col("_v2"),
      Envelope.wrap(lit(null).cast(v2), after2, "graft", "events",
        opCol, expr("ts_us div 1000")))
      .otherwise(Envelope.wrap(lit(null).cast(v1), after1, "graft",
        "events", opCol, expr("ts_us div 1000")))
    val wire = drifted.select(json.as("value"))
    val parsed = graft.streaming.CdcStream
      .parseTagged(wire, Seq(1L -> v1, 2L -> v2))
      .select(col("schema_version"),
        col("after.event_id").as("event_id"),
        when(col("schema_version") === 2L, col("after.event_type"))
          .otherwise(lit(null).cast(StringType)).as("event_type"))
    parsed.groupBy("schema_version")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(when(col("event_type").isNotNull, 1L).otherwise(0L))
          .as("n_typed"))
      .reportSort("schema_version")
  }

  val driftDispatchSql: String =
    """WITH b AS (
      |  SELECT MIN(epoch_us(ts)) + MAX(epoch_us(ts)) AS mid2 FROM events),
      |v AS (
      |  SELECT event_id,
      |    CASE WHEN 2 * epoch_us(ts) > b.mid2 THEN 2 ELSE 1 END AS ver
      |  FROM events CROSS JOIN b)
      |SELECT CAST(ver AS BIGINT) AS schema_version, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(CASE WHEN ver = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_typed
      |FROM v GROUP BY ver ORDER BY schema_version""".stripMargin

  // ------------------------------------------------ cdc_dlq_route
  /** Dead-letter routing for malformed change events: records whose
    * envelope JSON fails the typed parse (from_json → null payload)
    * are split to a DLQ instead of poisoning the pipeline — the
    * declarative analog of the reference's per-record parse try/catch
    * (Main.java:166-185 wraps every record parse and logs failures).
    * Corruption here is synthesized deterministically (every 7th
    * record's wire JSON is truncated) so the oracle can recompute the
    * split arithmetically while Spark routes through the REAL JSON
    * parser. */
  def dlqRoute(spark: SparkSession, dir: String): DataFrame = {
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val ev = wireEvents(spark, dir)
    val after = struct(col("event_id"), col("user_id"), col("value"))
    val json = Envelope.wrap(lit(null).cast(rowSchema), after, "graft",
      "events", opCol, expr("ts_us div 1000"))
    val wire = when(col("event_id") % 7 === 0, substring(json, 1, 20))
      .otherwise(json)
    val parsed = Envelope.parse(ev.select(wire.as("j")), col("j"), rowSchema)
    parsed
      .select(when(col("op").isNull, "dlq").otherwise("ok").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .reportSort("status")
  }

  val dlqRouteSql: String =
    """SELECT CASE WHEN event_id % 7 = 0 THEN 'dlq' ELSE 'ok' END AS status,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY status""".stripMargin

  // ------------------------------------------ cdc_changed_columns
  /** Changed-column-set extraction per update — the reference
    * generates one routing script per (table, op, COLUMN SET)
    * (Main.java:446-521 keys its script cache on the column list), so
    * the engine must know exactly which fields an update touched. The
    * set is computed GENERICALLY from the parsed before/after structs
    * (null-safe <=> per field of the row schema), never from knowledge
    * of the generator; updates are synthesized so both value-drift and
    * key-rewrite cases occur. */
  def changedColumns(spark: SparkSession, dir: String): DataFrame = {
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val ev = wireEvents(spark, dir)
    val before = struct(col("event_id"), col("user_id"), col("value"))
    val after = struct(col("event_id"),
      when(col("event_id") % 5 === 0, col("user_id") + 1)
        .otherwise(col("user_id")).as("user_id"),
      when(col("event_id") % 3 =!= 0, col("value") + lit(1.5))
        .otherwise(col("value")).as("value"))
    val json = Envelope.wrap(before, after, "graft", "events", lit("u"),
      expr("ts_us div 1000"))
    val parsed = Envelope.parse(ev.select(json.as("j")), col("j"), rowSchema)
    // generic diff over the row schema: field name iff before != after
    // (concat_ws skips the nulls of unchanged fields)
    val changed = concat_ws(",", rowSchema.fieldNames.toSeq.map(f =>
      when(!(col(s"before.$f") <=> col(s"after.$f")), lit(f))): _*)
    parsed.select(col("table").as("source_table"), changed.as("changed_cols"))
      .groupBy("source_table", "changed_cols")
      .agg(count(lit(1)).as("n_events"))
      .reportSort("changed_cols")
  }

  // The IS NOT NULL guards mirror the Spark side's null-safe <=> diff:
  // NULL + 1.5 IS NULL, so a NULL field is UNCHANGED on both engines.
  val changedColumnsSql: String =
    """SELECT 'events' AS source_table,
      |  concat_ws(',',
      |    CASE WHEN event_id % 5 = 0 AND user_id IS NOT NULL
      |      THEN 'user_id' END,
      |    CASE WHEN event_id % 3 <> 0 AND value IS NOT NULL
      |      THEN 'value' END) AS changed_cols,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY 1, 2 ORDER BY changed_cols""".stripMargin

  // ------------------------------------------------- cdc_ooo_audit
  /** Out-of-order-arrival audit: replay the changelog in COMMIT order
    * (event_id) and measure, per key, how often EVENT time regresses
    * and by how much — the number every watermark/allowed-lateness
    * setting should be derived from, and a standing data-quality
    * check on any CDC feed (a clock-skewed producer shows up as a
    * per-key regression spike). Window partitioned by user_id —
    * high cardinality, so per-partition sorts stay small at any
    * scale; exact integer microseconds end to end. */
  def oooAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), tsMicros.as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("us") < col("prev"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("us") < col("prev"), col("prev") - col("us")))
          .as("max_regress_us"))
      .orderBy("user_id")
  }

  val oooAuditSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY event_id) AS prev
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN us < prev THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late,
      |  MAX(CASE WHEN us < prev THEN prev - us END) AS max_regress_us
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------------- cdc_lag_audit
  /** Replication-lag percentile audit — THE dashboard number a CDC
    * deployment is operated by (how far behind the source is each op
    * path?). Lag is modeled as a deterministic per-event jitter
    * (portable md5-prefix hash of event_id, mod 5 s) so the audit is
    * engine-reproducible; the mechanics are the production ones:
    * exact p50/p95/max per op via the value-histogram selection
    * ([[graft.ops.OrderStats]]) — a map-side-combining (op, lag)
    * count, ranks located in cumulative sums, so windows only ever
    * see the ≤ |ops|×5000-row histogram, never the changelog. */
  def lagAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats._
    val rank95 = ceil(col("n").cast("double") * 0.95)
    val lags = changeLog(spark, dir).select(col("op"),
      pmod(MaskFunctions.portableHash(col("event_id")), lit(5000L))
        .as("lag_ms"))
    cumulativeHistogram(lags, Seq("op"), "lag_ms")
      .groupBy("op")
      .agg(max(col("n")).as("n"),
        max(when(holdsRank(midRank1), col("lag_ms"))).as("p50_lag_ms"),
        max(when(holdsRank(rank95), col("lag_ms"))).as("p95_lag_ms"),
        max(col("lag_ms")).as("max_lag_ms"))
      .reportSort("op")
  }

  val lagAuditSql: String =
    s"""WITH l AS (
       |  SELECT $opSql AS op,
       |    ('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,8))::BIGINT
       |      % 5000 AS lag_ms
       |  FROM events),
       |h AS (SELECT op, lag_ms, COUNT(*) AS c FROM l GROUP BY 1, 2),
       |cum AS (
       |  SELECT op, lag_ms, c,
       |    SUM(c) OVER (PARTITION BY op ORDER BY lag_ms) AS hi,
       |    SUM(c) OVER (PARTITION BY op ORDER BY lag_ms) - c + 1 AS lo,
       |    SUM(c) OVER (PARTITION BY op) AS n
       |  FROM h)
       |SELECT op, CAST(MAX(n) AS BIGINT) AS n,
       |  CAST(MAX(CASE WHEN lo <= (n + 1) // 2 AND (n + 1) // 2 <= hi
       |    THEN lag_ms END) AS BIGINT) AS p50_lag_ms,
       |  CAST(MAX(CASE WHEN lo <= CEIL(n * 0.95) AND CEIL(n * 0.95) <= hi
       |    THEN lag_ms END) AS BIGINT) AS p95_lag_ms,
       |  CAST(MAX(lag_ms) AS BIGINT) AS max_lag_ms
       |FROM cum GROUP BY op ORDER BY op""".stripMargin

  // ------------------------------------------------- cdc_reconcile
  /** Replication reconciliation by bucketed checksums — the
    * pt-table-checksum audit every CDC deployment runs to answer "has
    * the target drifted from the source?" WITHOUT shipping rows: keys
    * hash into a fixed bucket count, each side reports per-bucket row
    * count + summed row checksum, and only bucket-level mismatches
    * (then drill-down) cross the wire. The target here is the applied
    * state with deterministic injected drift (~1% rows dropped, ~1%
    * values corrupted, gated on the row hash so both engines inject
    * identically); the audit must and does flag exactly those buckets.
    * Shape at 100 TB: a map pass (row hash) + one combiner-friendly
    * 16-row agg per side + a 16-row join — reconciliation cost is
    * independent of table width and ships O(buckets), not O(rows). */
  def reconcile(spark: SparkSession, dir: String): DataFrame = {
    def repr: Column = concat_ws("|", col("user_id"),
      col("value").cast(DecimalType(18, 2)).cast("string"), col("event_id"))
    val state = applyLog(changeLog(spark, dir))
      .select(col("user_id"), col("value"), col("event_id"))
    val src = state.withColumn("rh", MaskFunctions.portableHash(repr))
    val target = src
      .filter(pmod(col("rh"), lit(97L)) =!= 0L)
      .withColumn("value",
        when(pmod(col("rh"), lit(89L)) === 0L, -col("value"))
          .otherwise(col("value")))
      .withColumn("rh", MaskFunctions.portableHash(repr))
    def bucketAgg(df: DataFrame, rows: String, sum_ : String): DataFrame = df
      .groupBy(pmod(MaskFunctions.portableHash(col("user_id")), lit(16L))
        .as("bucket"))
      .agg(count(lit(1)).as(rows), sum(col("rh")).as(sum_))
    bucketAgg(src, "src_rows", "src_checksum")
      .join(bucketAgg(target, "tgt_rows", "tgt_checksum"),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        coalesce(col("tgt_rows"), lit(0L)).as("tgt_rows"),
        (coalesce(col("src_rows"), lit(0L)) -
          coalesce(col("tgt_rows"), lit(0L))).as("rows_delta"),
        (coalesce(col("src_checksum"), lit(0L)) ===
          coalesce(col("tgt_checksum"), lit(0L))).as("checksum_match"))
      .reportSort("bucket")
  }

  val reconcileSql: String = {
    def repr(v: String) =
      s"user_id || '|' || CAST(CAST($v AS DECIMAL(18,2)) AS VARCHAR) || '|' || event_id"
    def h(e: String) = s"(('0x'||substr(md5($e),1,8))::BIGINT)"
    s"""WITH log AS (SELECT event_id, ts, user_id, value, $opSql AS op FROM events),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |             ORDER BY ts DESC, event_id DESC) AS rn FROM log),
       |state AS (SELECT user_id, value, event_id
       |          FROM ranked WHERE rn = 1 AND op <> 'd'),
       |src AS (SELECT user_id, value, event_id,
       |          ${h(repr("value"))} AS rh FROM state),
       |tgt0 AS (SELECT user_id,
       |           CASE WHEN rh % 89 = 0 THEN -value ELSE value END AS value,
       |           event_id
       |         FROM src WHERE rh % 97 <> 0),
       |tgt AS (SELECT user_id, value, event_id,
       |          ${h(repr("value"))} AS rh FROM tgt0),
       |sa AS (SELECT ${h("CAST(user_id AS VARCHAR)")} % 16 AS bucket, COUNT(*) AS src_rows,
       |         CAST(SUM(rh) AS BIGINT) AS src_checksum FROM src GROUP BY 1),
       |ta AS (SELECT ${h("CAST(user_id AS VARCHAR)")} % 16 AS bucket, COUNT(*) AS tgt_rows,
       |         CAST(SUM(rh) AS BIGINT) AS tgt_checksum FROM tgt GROUP BY 1)
       |SELECT COALESCE(sa.bucket, ta.bucket) AS bucket,
       |  COALESCE(src_rows, 0) AS src_rows,
       |  COALESCE(tgt_rows, 0) AS tgt_rows,
       |  COALESCE(src_rows, 0) - COALESCE(tgt_rows, 0) AS rows_delta,
       |  COALESCE(src_checksum, 0) = COALESCE(tgt_checksum, 0)
       |    AS checksum_match
       |FROM sa FULL JOIN ta ON sa.bucket = ta.bucket
       |ORDER BY bucket""".stripMargin
  }

  // ------------------------------------------------ cdc_txn_assemble
  /** Transaction assembly from an interleaved change stream — the
    * consumer-side mirror of Debezium's transaction-metadata topic
    * (BEGIN/END markers carrying the event count a sink needs before
    * it can apply a transaction atomically). Events are grouped into
    * commit units (here: the 1-hour commit window of their
    * microsecond timestamp — deterministic, so the oracle regroups
    * identically), and each unit reports what an exactly-once applier
    * consumes: event count, tables touched, distinct keys, the
    * boundary event ids in stream order, and the commit span. One
    * hash-agg over (txn_id) after a map-side window id — at 100 TB
    * this is a single combiner-friendly shuffle keyed on the commit
    * unit, never a sort of the whole stream; the in-window ordering
    * rides row_number over (txn, ts, event_id), whose partitions are
    * commit-unit-sized by construction. */
  def txnAssemble(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).withColumn("ts_us", tsMicros)
      .withColumn("txn_id", expr("ts_us div 3600000000"))
    val w = Window.partitionBy("txn_id").orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("_rn", row_number().over(w))
      .groupBy("txn_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_tables"),
        countDistinct(col("user_id")).as("n_keys"),
        min_by(col("event_id"), col("_rn")).as("first_event_id"),
        max_by(col("event_id"), col("_rn")).as("last_event_id"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"))
      .reportSort("txn_id")
  }

  val txnAssembleSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, user_id, epoch_us(ts) AS ts_us,
      |    epoch_us(ts) // 3600000000 AS txn_id
      |  FROM events),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY txn_id
      |        ORDER BY ts_us, event_id) AS rn FROM e)
      |SELECT txn_id, COUNT(*) AS n_events,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_tables,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
      |  arg_min(event_id, rn) AS first_event_id,
      |  arg_max(event_id, rn) AS last_event_id,
      |  MAX(ts_us) - MIN(ts_us) AS span_us
      |FROM r GROUP BY txn_id ORDER BY txn_id""".stripMargin

  // ------------------------------------------------ cdc_conflict_lww
  /** Multi-master conflict resolution by last-write-wins with a site
    * priority tie-break — the merge rule an active-active replication
    * topology needs when the same key is written on two sites (the
    * reference replicates one source; this is the multi-source
    * composition of its upsert-by-latest shape, Main.java:481-512).
    * Site B's feed is synthesized from the same events (every 3rd key,
    * ts shifted on odd keys, same-ts CONFLICT on even keys), so the
    * oracle can recompute the winner set arithmetically. Winner per
    * key = max by (ts, site_priority): one combiner-friendly
    * max-of-struct hash-agg — NOT a per-key ranking window — so a
    * hot key partial-aggregates map-side; the audit is a |sites|-row
    * fold on top. */
  def conflictLww(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(spark, dir).withColumn("ts_us", tsMicros)
    def cents(c: Column): Column =
      (c.cast(DecimalType(18, 2)) * 100).cast("long")
    val a = ev.select(col("event_id").as("k"), col("ts_us"),
      lit(1L).as("prio"), lit("a").as("site"),
      cents(col("value")).as("cents"))
    val b = ev.filter(col("event_id") % 3 === 0)
      .select(col("event_id").as("k"),
        (col("ts_us") + when(col("event_id") % 2 === 0, 0L)
          .otherwise(3600000000L)).as("ts_us"),
        lit(2L).as("prio"), lit("b").as("site"),
        (cents(col("value")) * 2).as("cents"))
    val won = a.unionByName(b)
      .groupBy("k")
      .agg(max(struct(col("ts_us"), col("prio"), col("site"),
        col("cents"))).as("w"),
        count(lit(1)).as("n_versions"))
    won.groupBy(col("w.site").as("site"))
      .agg(count(lit(1)).as("n_wins"),
        sum(when(col("n_versions") > 1, 1L).otherwise(0L))
          .as("n_conflicts"),
        sum(col("w.cents")).as("cents_sum"))
      .reportSort("site")
  }

  val conflictLwwSql: String =
    """WITH a AS (
      |  SELECT event_id AS k, epoch_us(ts) AS ts_us, 1 AS prio,
      |    'a' AS site,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (
      |  SELECT event_id, epoch_us(ts) + CASE WHEN event_id % 2 = 0
      |      THEN 0 ELSE 3600000000 END,
      |    2, 'b',
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 2
      |  FROM events WHERE event_id % 3 = 0),
      |m AS (SELECT * FROM a UNION ALL SELECT * FROM b),
      |r AS (
      |  SELECT k, site, cents,
      |    ROW_NUMBER() OVER (PARTITION BY k
      |      ORDER BY ts_us DESC, prio DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY k) AS nv
      |  FROM m)
      |SELECT site, COUNT(*) AS n_wins,
      |  CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_conflicts,
      |  CAST(SUM(cents) AS BIGINT) AS cents_sum
      |FROM r WHERE rn = 1 GROUP BY site ORDER BY site""".stripMargin

  // --------------------------------------- cdc_replay_idempotence
  /** Exactly-once APPLY over an at-least-once wire — the
    * crash-recovery contract every CDC consumer must honor: after a
    * restart the transport REPLAYS a window of already-delivered
    * events (synthesized deterministically here: every 5th offset is
    * redelivered), and the target must converge to the same state as
    * a single clean delivery. The idempotent apply is ONE
    * high-cardinality hash-agg keyed on the source offset
    * (event_id) — the scale shape: no sort, no window, map-side
    * combine collapses most duplicates before the shuffle. The audit
    * reports per op: delivered vs applied counts and the exact cents
    * checksum BOTH ways — the delivered−applied gap is precisely the
    * corruption a non-idempotent consumer would have written. */
  def replayIdempotence(spark: SparkSession, dir: String): DataFrame = {
    val log = changeLog(spark, dir)
      .select(col("event_id"), col("op"),
        floor(col("value") * 100).cast("long").as("cents"))
    val wire = log.unionAll(log.filter(col("event_id") % 5 === 0))
    val delivered = wire.groupBy("op")
      .agg(count(lit(1)).as("n_delivered"),
        sum(col("cents")).as("delivered_cents"))
    val applied = wire.groupBy("event_id")
      .agg(max(col("op")).as("op"), max(col("cents")).as("cents"))
      .groupBy("op")
      .agg(count(lit(1)).as("n_applied"),
        sum(col("cents")).as("applied_cents"))
    delivered.join(applied, "op")
      .select(col("op"), col("n_delivered"), col("n_applied"),
        (col("n_delivered") - col("n_applied")).as("n_dup_deliveries"),
        col("delivered_cents"), col("applied_cents"))
      .reportSort("op")
  }

  val replayIdempotenceSql: String =
    s"""WITH log AS (
       |  SELECT event_id, $opSql AS op,
       |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
       |wire AS (
       |  SELECT * FROM log
       |  UNION ALL SELECT * FROM log WHERE event_id % 5 = 0),
       |d AS (
       |  SELECT op, COUNT(*) AS n_delivered, SUM(cents)
       |    AS delivered_cents
       |  FROM wire GROUP BY op),
       |a0 AS (
       |  SELECT event_id, MAX(op) AS op, MAX(cents) AS cents
       |  FROM wire GROUP BY event_id),
       |a AS (
       |  SELECT op, COUNT(*) AS n_applied, SUM(cents) AS applied_cents
       |  FROM a0 GROUP BY op)
       |SELECT d.op, CAST(n_delivered AS BIGINT) AS n_delivered,
       |  CAST(n_applied AS BIGINT) AS n_applied,
       |  CAST(n_delivered - n_applied AS BIGINT) AS n_dup_deliveries,
       |  CAST(delivered_cents AS BIGINT) AS delivered_cents,
       |  CAST(applied_cents AS BIGINT) AS applied_cents
       |FROM d JOIN a ON d.op = a.op ORDER BY d.op""".stripMargin

  // ---------------------------------------------- cdc_e2e_replicate
  /** The reference's WHOLE loop as one dataflow (Main.java:159-521:
    * consume change events → repair → apply → classify-driven mask →
    * route to targets), composed from the verified pieces: the
    * changelog goes through the REAL envelope wire (wrap → JSON →
    * typed parse), collapses to current state per key (latest wins,
    * trailing deletes drop), sensitive columns are masked with the
    * keyed rules (identifier → portable-hash pseudonym, financial →
    * integer-cents blur — exact arithmetic, no float noise), and the
    * surviving rows route per op class to their `_masked` targets.
    * Per target: row count, exact masked-cents total, and the
    * pseudonym checksum a downstream reconciler would verify. The
    * oracle replays the same latest-state/mask/route chain without
    * the wire (the envelope round-trip is identity, proven by
    * cdc_parse_envelope). ONE shuffle for the per-key window + one
    * 2-row hash-agg: the plan a 100 TB replication tick runs. */
  def cdcE2eReplicate(spark: SparkSession, dir: String): DataFrame = {
    val rowSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val ev = wireEvents(spark, dir)
    val json = Envelope.wrap(lit(null).cast(rowSchema),
      struct(col("event_id"), col("user_id"), col("value")),
      "graft", "events", opCol, expr("ts_us div 1000"))
    val parsed = Envelope.parse(ev.select(json.as("j")), col("j"), rowSchema)
      .select(col("after.event_id").as("event_id"),
        col("after.user_id").as("user_id"),
        col("after.value").as("value"), col("op"), col("ts_ms"))
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts_ms"), desc("event_id"))
    val state = parsed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).filter(col("op") =!= "d")
    val key = col("user_id").cast("string")
    state.select(
        when(col("op") === "c", "users_masked")
          .otherwise("activity_masked").as("target_table"),
        MaskFunctions.portableHash(key).as("pseudonym"),
        (floor(col("value") * 100).cast("long") +
          pmod(MaskFunctions.portableHash(concat(key, lit(":blur"))),
            lit(2001L)) - 1000L).as("masked_cents"))
      .groupBy("target_table")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("masked_cents")).as("masked_cents_sum"),
        sum(col("pseudonym")).as("pseudonym_checksum"))
      .reportSort("target_table")
  }

  val cdcE2eReplicateSql: String =
    s"""WITH log AS (
       |  SELECT event_id, epoch_us(ts) // 1000 AS ts_ms, user_id, value,
       |    $opSql AS op
       |  FROM events),
       |latest AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts_ms DESC, event_id DESC) AS rn FROM log),
       |live AS (SELECT * FROM latest WHERE rn = 1 AND op <> 'd'),
       |m AS (
       |  SELECT CASE WHEN op = 'c' THEN 'users_masked'
       |              ELSE 'activity_masked' END AS target_table,
       |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT
       |      AS pseudonym,
       |    CAST(FLOOR(value * 100) AS BIGINT) +
       |      ('0x'||substr(md5(CAST(user_id AS VARCHAR)||':blur'),1,8))
       |        ::BIGINT % 2001 - 1000 AS masked_cents
       |  FROM live)
       |SELECT target_table, COUNT(*) AS n_rows,
       |  CAST(SUM(masked_cents) AS BIGINT) AS masked_cents_sum,
       |  CAST(SUM(pseudonym) AS BIGINT) AS pseudonym_checksum
       |FROM m GROUP BY target_table ORDER BY target_table""".stripMargin

  // ------------------------------------------------ cdc_sparse_patch
  /** Partial-update (sparse patch) reconstruction — the wire format
    * where an update carries ONLY the changed columns and everything
    * else arrives NULL (MongoDB oplog / JSON-merge-patch style, vs
    * the full-row images [[snapshotApply]] assumes): current row
    * state = per key, per COLUMN, the value at the highest sequence
    * where that column was present. The patch feed derives
    * deterministically from `events` (each column present on its own
    * id-modulus schedule, so presence patterns interleave). The whole
    * reconstruction is ONE combiner-friendly hash-agg on the key —
    * `max_by(col, seq) FILTER (col IS NOT NULL)` per column, no
    * window, no self-join — the shape that survives a billion-key
    * keyspace (partial aggregation eats most patches map-side). */
  def sparsePatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id").as("seq"),
        when(pmod(col("event_id"), lit(3)) =!= 0, col("value"))
          .as("c_val"),
        when(pmod(col("event_id"), lit(4)) =!= 0,
          concat(lit("s"), pmod(col("event_id"), lit(5)).cast("string")))
          .as("c_status"))
      .groupBy("user_id")
      .agg(
        expr("max_by(c_val, seq) FILTER (WHERE c_val IS NOT NULL)")
          .as("val"),
        expr("max_by(c_status, seq) FILTER (WHERE c_status IS NOT NULL)")
          .as("status"),
        max(col("seq")).as("last_seq"),
        count(lit(1)).as("n_patches"),
        count(col("c_val")).as("n_val_patches"),
        count(col("c_status")).as("n_status_patches"))
      .orderBy("user_id")

  val sparsePatchSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS seq,
      |    CASE WHEN event_id % 3 <> 0 THEN value END AS c_val,
      |    CASE WHEN event_id % 4 <> 0
      |      THEN 's' || CAST(event_id % 5 AS VARCHAR) END AS c_status
      |  FROM events)
      |SELECT user_id,
      |  max_by(c_val, seq) FILTER (WHERE c_val IS NOT NULL) AS val,
      |  max_by(c_status, seq) FILTER (WHERE c_status IS NOT NULL)
      |    AS status,
      |  CAST(MAX(seq) AS BIGINT) AS last_seq,
      |  COUNT(*) AS n_patches,
      |  COUNT(c_val) AS n_val_patches,
      |  COUNT(c_status) AS n_status_patches
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------ cdc_before_chain
  /** BEFORE-IMAGE CHAIN audit — the replication-integrity invariant
    * Debezium consumers rely on: every update's `before` image must
    * equal the PREVIOUS event's `after` image for the same key
    * (reference op semantics: Main.java:171-177's `u` rows carry
    * both sides). The changelog's before images are synthesized with
    * a deterministic corruption (every 97th event carries a STALE
    * before — the value from two steps back, the classic
    * double-delivery symptom), and the audit recovers exactly the
    * genuinely inconsistent ones by comparing each provided before
    * against the per-key lag-1 reconstruction. One shuffle (the
    * per-user_id window, bounded per key); the per-day rollup is a
    * map-side-combining hash-agg over the window output. Null-safe
    * equality (`IS DISTINCT FROM`) so a missing before where history
    * exists counts as a break too. */
  def beforeChain(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("event_id"))
    val vm = expr("cast(floor(value * 1000) as long)")
    val l = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), opCol.as("op"),
        tsMicros.as("_us"), vm.as("vm"))
      .withColumn("expected", lag(col("vm"), 1).over(w))
      .withColumn("provided",
        when(col("event_id") % 97 === 0, lag(col("vm"), 2).over(w))
          .otherwise(lag(col("vm"), 1).over(w)))
      .filter(col("op") === "u" && col("expected").isNotNull)
    l.groupBy(expr("_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(!(col("provided") <=> col("expected")), 1L)
          .otherwise(0L)).as("n_breaks"))
      .withColumn("break_pm", expr("n_breaks * 1000 div n_checked"))
      .reportSort("day")
  }

  val beforeChainSql: String =
    s"""WITH b AS (
       |  SELECT event_id, user_id, $opSql AS op, epoch_us(ts) AS us,
       |    CAST(FLOOR(value * 1000) AS BIGINT) AS vm
       |  FROM events),
       |l AS (
       |  SELECT event_id, us, op,
       |    LAG(vm, 1) OVER w AS expected,
       |    CASE WHEN event_id % 97 = 0 THEN LAG(vm, 2) OVER w
       |         ELSE LAG(vm, 1) OVER w END AS provided
       |  FROM b
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       |SELECT us // 86400000000 AS day, COUNT(*) AS n_checked,
       |  CAST(SUM(CASE WHEN provided IS DISTINCT FROM expected
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks,
       |  CAST(SUM(CASE WHEN provided IS DISTINCT FROM expected
       |           THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
       |    AS break_pm
       |FROM l WHERE op = 'u' AND expected IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ cdc_resurrection
  /** KEY-RESURRECTION audit — deletes followed by a later create on
    * the SAME key (the Debezium tombstone + re-insert pattern): a
    * consumer that compacted the tombstone away will silently merge
    * two distinct entity lifetimes, so replication monitoring counts
    * them. Detected per key with one lag window (was the previous op
    * for this user a delete when a create arrives?), rolled up per
    * day with the delete/create volumes for rate context. Same
    * single-shuffle shape as [[beforeChain]] — the per-key window is
    * bounded per key, the day roll-up is a map-side-combining
    * hash-agg. */
  def resurrection(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("event_id"))
    val l = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), opCol.as("op"),
        tsMicros.as("_us"))
      .withColumn("_prev", lag(col("op"), 1).over(w))
    l.groupBy(expr("_us div 86400000000").as("day"))
      .agg(
        sum(when(col("op") === "c", 1L).otherwise(0L)).as("n_creates"),
        sum(when(col("op") === "d", 1L).otherwise(0L)).as("n_deletes"),
        sum(when(col("op") === "c" && col("_prev") === "d", 1L)
          .otherwise(0L)).as("n_resurrections"))
      .reportSort("day")
  }

  val resurrectionSql: String =
    s"""WITH b AS (
       |  SELECT event_id, user_id, $opSql AS op, epoch_us(ts) AS us
       |  FROM events),
       |l AS (
       |  SELECT us, op, LAG(op, 1) OVER w AS prev
       |  FROM b
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       |SELECT us // 86400000000 AS day,
       |  CAST(SUM(CASE WHEN op = 'c' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_creates,
       |  CAST(SUM(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_deletes,
       |  CAST(SUM(CASE WHEN op = 'c' AND prev = 'd' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_resurrections
       |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ cdc_shard_router
  /** HASH-MOD SHARD ROUTER — the parallel-replication step up
    * from per-table routing: change events fan out across 16 target
    * shards keyed by md5(user_id) mod 16 (NOT consistent hashing:
    * changing the shard count remaps nearly every key — elastic
    * resharding needs a ring or jump-hash), so one key's entire
    * history lands
    * on ONE shard (per-key ordering survives the fan-out — the
    * property that lets each shard apply its slice independently).
    * The audit reports, per shard, the event and distinct-key load
    * plus its deviation from the ideal 1/16 in per-mille — the
    * balance check that decides whether the hash needs salting before
    * a backfill. The hash is the portable md5 prefix (identical
    * BIGINT in any engine), so shard assignment itself is
    * hash-verified, not just the counts. One hash-agg; the distinct
    * per shard rides the same shuffle. */
  def shardRouter(spark: SparkSession, dir: String): DataFrame = {
    val n = 16L
    val routed = Tables.events(spark, dir)
      .withColumn("shard",
        pmod(MaskFunctions.portableHash(col("user_id")), lit(n)))
    val per = routed.groupBy("shard")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_keys"))
    val tot = per.agg(sum(col("n_events")).as("_t"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_events"), col("n_keys"),
        expr("n_events * 16000 div _t").as("load_pm"))
      .reportSort("shard")
  }

  val shardRouterSql: String =
    """WITH routed AS (
      |  SELECT ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT
      |      % 16 AS shard, user_id
      |  FROM events),
      |per AS (
      |  SELECT shard, COUNT(*) AS n_events,
      |    COUNT(DISTINCT user_id) AS n_keys
      |  FROM routed GROUP BY shard),
      |t AS (SELECT SUM(n_events) AS tt FROM per)
      |SELECT shard, n_events, n_keys,
      |  CAST(n_events * 16000 // tt AS BIGINT) AS load_pm
      |FROM per CROSS JOIN t ORDER BY shard""".stripMargin

  // --------------------------------------------- cdc_soft_delete
  /** SOFT-DELETE REWRITE — Debezium's `ExtractNewRecordState` SMT
    * with `delete.handling.mode=rewrite`: instead of dropping deleted
    * keys (as [[snapshotApply]] does) or keeping raw tombstones (as
    * [[logCompact]] does), every key stays in the target with a
    * `__deleted` flag, and a deleted row carries its BEFORE-IMAGE
    * value — the last non-delete value the key held — so the
    * warehouse can audit what was removed. The before-image is an
    * `ignoreNulls` last() over the key's history (exactly the
    * envelope `before` field the wire would carry,
    * reference: Main.java:171-177 op switch); one shuffle on the key,
    * both windows share its partitioning. */
  def softDelete(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val log = changeLog(spark, dir)
      .withColumn("_before",
        last(when(col("op") =!= "d", col("value")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    latestPerKey(log)
      .select(col("user_id"),
        when(col("op") === "d", col("_before")).otherwise(col("value"))
          .as("value"),
        (col("op") === "d").as("__deleted"),
        col("event_id").as("last_event_id"))
      .orderBy("user_id")
  }

  val softDeleteSql: String =
    s"""WITH log AS (
       |  SELECT event_id, ts, user_id, value, $opSql AS op FROM events),
       |b AS (
       |  SELECT *,
       |    LAST_VALUE(CASE WHEN op <> 'd' THEN value END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS before_val,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM log)
       |SELECT user_id,
       |  CASE WHEN op = 'd' THEN before_val ELSE value END AS value,
       |  op = 'd' AS __deleted, event_id AS last_event_id
       |FROM b WHERE rn = 1 ORDER BY user_id""".stripMargin

  // --------------------------------------------- cdc_heartbeat
  /** CONNECTOR-LIVENESS audit — the `heartbeat.interval.ms` question
    * asked of the data instead of the wire (a silent shard is either
    * a dead connector or a genuinely idle source; the lag-to-head
    * separates them): per key-hash shard, event count, lag of the
    * shard's last event behind the stream head, and the longest
    * SILENT-HOUR run on the shard's hour spine (gaps-and-islands over
    * the |shards × hours| frame — the corpus collapses to that frame
    * in one hash-agg, so the runs analysis is bounded by the time
    * range at any corpus size). Stalled = silent for > 6 h at head.
    * Complements [[graft.streaming.EventStreams.outageWindows]],
    * which audits GLOBAL minute-level silences — this one is per
    * replication shard, the unit a CDC operator restarts. */
  def heartbeat(spark: SparkSession, dir: String): DataFrame = {
    val n = 8L
    val ev = Tables.events(spark, dir)
      .select(pmod(MaskFunctions.portableHash(col("user_id")), lit(n))
        .as("shard"), (tsMicros.cast("long")).as("us"))
    val perHour = ev
      .groupBy(col("shard"), expr("us div 3600000000").as("h"))
      .agg(count(lit(1)).as("c"), max(col("us")).as("_mx"))
      // |shards × hours| frame with four consumers (head, spine,
      // silent anti-join, per-shard rollup): pin it — the corpus is
      // scanned once at any SF
      .cut
    val head = perHour.agg(max(col("_mx")).as("head_us"),
      min(expr("_mx div 3600000000")).as("_h0"),
      max(expr("_mx div 3600000000")).as("_h1"))
    // silent hours per shard = spine anti-join, runs by the island trick
    val spine = head.select(explode(sequence(col("_h0"), col("_h1")))
      .as("h")).crossJoin(
        perHour.select(col("shard")).distinct())
    val silent = spine.join(perHour, Seq("shard", "h"), "left_anti")
    val wSh = Window.partitionBy("shard").orderBy("h")
    val runs = silent
      .withColumn("k", col("h") - row_number().over(wSh))
      .groupBy("shard", "k").agg(count(lit(1)).as("run_h"))
      .groupBy("shard").agg(max(col("run_h")).as("max_silent_h"))
    val per = perHour.groupBy("shard")
      .agg(sum(col("c")).as("n_events"), max(col("_mx")).as("last_us"))
    per.join(runs, Seq("shard"), "left").crossJoin(broadcast(head))
      .select(col("shard"), col("n_events"),
        (col("head_us") - col("last_us")).as("lag_us"),
        coalesce(col("max_silent_h"), lit(0L)).as("max_silent_h"),
        (col("head_us") - col("last_us") > 6L * 3600000000L)
          .as("stalled"))
      .reportSort("shard")
  }

  val heartbeatSql: String =
    """WITH ev AS (
      |  SELECT ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT
      |      % 8 AS shard,
      |    epoch_us(ts) AS us
      |  FROM events),
      |ph AS (SELECT shard, us // 3600000000 AS h, COUNT(*) AS c,
      |         MAX(us) AS mx
      |       FROM ev GROUP BY 1, 2),
      |hd AS (SELECT MAX(mx) AS head_us,
      |         MIN(mx // 3600000000) AS h0,
      |         MAX(mx // 3600000000) AS h1 FROM ph),
      |spine AS (
      |  SELECT s.shard, r.h
      |  FROM (SELECT DISTINCT shard FROM ph) s,
      |       (SELECT UNNEST(range(h0, h1 + 1)) AS h FROM hd) r),
      |silent AS (
      |  SELECT spine.shard, spine.h FROM spine
      |  LEFT JOIN ph ON ph.shard = spine.shard AND ph.h = spine.h
      |  WHERE ph.h IS NULL),
      |runs AS (
      |  SELECT shard,
      |    h - ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h) AS k
      |  FROM silent),
      |mr AS (SELECT shard, MAX(cnt) AS max_silent_h FROM (
      |         SELECT shard, k, COUNT(*) AS cnt FROM runs
      |         GROUP BY shard, k) GROUP BY shard),
      |per AS (SELECT shard, SUM(c) AS n_events, MAX(mx) AS last_us
      |        FROM ph GROUP BY shard)
      |SELECT per.shard, CAST(per.n_events AS BIGINT) AS n_events,
      |  CAST(hd.head_us - per.last_us AS BIGINT) AS lag_us,
      |  CAST(COALESCE(mr.max_silent_h, 0) AS BIGINT) AS max_silent_h,
      |  hd.head_us - per.last_us > 6 * 3600000000 AS stalled
      |FROM per LEFT JOIN mr ON mr.shard = per.shard CROSS JOIN hd
      |ORDER BY per.shard""".stripMargin

  // ------------------------------------------------- cdc_pk_change
  /** PRIMARY-KEY CHANGE handling — the replication edge case a naive
    * upsert target silently corrupts: when a row's key itself changes,
    * the wire carries it as an atomic (delete @ old key, create @ new
    * key) pair (Debezium's `__debezium.newkey` protocol), and the
    * applier must keep the pair ORDERED (delete first) or a replay
    * resurrects the old identity. Every event_id ≡ 0 (mod 101) is
    * deterministically designated a key migration (old = user_id,
    * new = user_id + 10,000,000); the operator expands the atomic
    * pair with an intra-event sub-sequence tie-break, applies the
    * expanded log (latest per key, tombstones drop), and audits: how
    * many migrations, how many migrated identities are live, and how
    * many OLD identities survive anyway because a later ordinary
    * change re-created them — the out-of-order hazard the audit
    * exists to expose. Shape: map-only expansion (union of two
    * projections), one per-key window — the snapshotApply cost. */
  def pkChange(spark: SparkSession, dir: String): DataFrame = {
    val log = changeLog(spark, dir).withColumn("ts_us", tsMicros)
    val off = 10000000L
    val isPk = col("event_id") % 101 === 0
    val normal = log.filter(!isPk)
      .select(col("user_id").as("key"), col("op"), col("ts_us"),
        col("event_id"), lit(0).as("sub"))
    val pkDel = log.filter(isPk)
      .select(col("user_id").as("key"), lit("d").as("op"), col("ts_us"),
        col("event_id"), lit(0).as("sub"))
    val pkNew = log.filter(isPk)
      .select((col("user_id") + off).as("key"), lit("c").as("op"),
        col("ts_us"), col("event_id"), lit(1).as("sub"))
    val expanded = normal.unionByName(pkDel).unionByName(pkNew)
    val w = Window.partitionBy("key")
      .orderBy(desc("ts_us"), desc("event_id"), desc("sub"))
    val live = expanded
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "d")
      .select(col("key"))
    val migrated = log.filter(isPk).select(col("user_id").as("old_key"))
      .distinct()
    live
      .crossJoin(broadcast(
        log.filter(isPk).agg(count(lit(1)).as("n_pk_changes"))))
      .join(migrated, col("key") === col("old_key"), "left")
      .agg(max(col("n_pk_changes")).as("n_pk_changes"),
        count(lit(1)).as("n_live_total"),
        sum(when(col("key") >= off, 1L).otherwise(0L))
          .as("n_live_migrated"),
        sum(when(col("old_key").isNotNull, 1L).otherwise(0L))
          .as("n_old_keys_resurrected"))
  }

  val pkChangeSql: String =
    s"""WITH log AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us, user_id,
       |    $opSql AS op
       |  FROM events),
       |expanded AS (
       |  SELECT user_id AS key, op, ts_us, event_id, 0 AS sub
       |  FROM log WHERE event_id % 101 <> 0
       |  UNION ALL
       |  SELECT user_id, 'd', ts_us, event_id, 0
       |  FROM log WHERE event_id % 101 = 0
       |  UNION ALL
       |  SELECT user_id + 10000000, 'c', ts_us, event_id, 1
       |  FROM log WHERE event_id % 101 = 0),
       |live AS (
       |  SELECT key FROM (
       |    SELECT key, op, ROW_NUMBER() OVER (PARTITION BY key
       |      ORDER BY ts_us DESC, event_id DESC, sub DESC) AS rn
       |    FROM expanded) z
       |  WHERE rn = 1 AND op <> 'd'),
       |mig AS (
       |  SELECT DISTINCT user_id AS old_key FROM log
       |  WHERE event_id % 101 = 0),
       |npk AS (
       |  SELECT COUNT(*) AS n_pk_changes FROM log
       |  WHERE event_id % 101 = 0)
       |SELECT CAST(npk.n_pk_changes AS BIGINT) AS n_pk_changes,
       |  COUNT(*) AS n_live_total,
       |  CAST(SUM(CASE WHEN key >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_live_migrated,
       |  CAST(SUM(CASE WHEN mig.old_key IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_old_keys_resurrected
       |FROM live CROSS JOIN npk
       |LEFT JOIN mig ON live.key = mig.old_key
       |GROUP BY npk.n_pk_changes""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_pk_change" -> (pkChange _),
    "cdc_soft_delete" -> (softDelete _),
    "cdc_heartbeat" -> (heartbeat _),
    "cdc_shard_router" -> (shardRouter _),
    "cdc_resurrection" -> (resurrection _),
    "cdc_before_chain" -> (beforeChain _),
    "cdc_sparse_patch" -> (sparsePatch _),
    "cdc_e2e_replicate" -> (cdcE2eReplicate _),
    "cdc_replay_idempotence" -> (replayIdempotence _),
    "cdc_conflict_lww" -> (conflictLww _),
    "cdc_txn_assemble" -> (txnAssemble _),
    "cdc_reconcile" -> (reconcile _),
    "cdc_lag_audit" -> (lagAudit _),
    "cdc_ooo_audit" -> (oooAudit _),
    "cdc_changed_columns" -> (changedColumns _),
    "cdc_dlq_route" -> (dlqRoute _),
    "cdc_parse_envelope" -> (parseEnvelope _),
    "cdc_temporal_repair" -> (temporalRepair _),
    "cdc_wire_type_repair" -> (wireTypeRepair _),
    "cdc_incremental_snapshot" -> (incrementalSnapshot _),
    "cdc_gap_audit" -> (gapAudit _),
    "cdc_snapshot_apply" -> (snapshotApply _),
    "cdc_upsert_target" -> (upsertTarget _),
    "cdc_scd2_history" -> (scd2History _),
    "cdc_route_tables" -> (routeTables _),
    "cdc_schema_drift" -> (schemaDrift _),
    "cdc_drift_dispatch" -> (driftDispatch _),
    "cdc_compat_audit" -> (compatAudit _),
    "cdc_ivm_merge" -> (ivmMerge _),
    "cdc_log_compact" -> (logCompact _))

  val oracles: Map[String, String] = Map(
    "cdc_pk_change" -> pkChangeSql,
    "cdc_soft_delete" -> softDeleteSql,
    "cdc_heartbeat" -> heartbeatSql,
    "cdc_shard_router" -> shardRouterSql,
    "cdc_resurrection" -> resurrectionSql,
    "cdc_before_chain" -> beforeChainSql,
    "cdc_sparse_patch" -> sparsePatchSql,
    "cdc_e2e_replicate" -> cdcE2eReplicateSql,
    "cdc_replay_idempotence" -> replayIdempotenceSql,
    "cdc_conflict_lww" -> conflictLwwSql,
    "cdc_txn_assemble" -> txnAssembleSql,
    "cdc_reconcile" -> reconcileSql,
    "cdc_lag_audit" -> lagAuditSql,
    "cdc_ooo_audit" -> oooAuditSql,
    "cdc_changed_columns" -> changedColumnsSql,
    "cdc_dlq_route" -> dlqRouteSql,
    "cdc_parse_envelope" -> parseEnvelopeSql,
    "cdc_temporal_repair" -> temporalRepairSql,
    "cdc_wire_type_repair" -> wireTypeRepairSql,
    "cdc_incremental_snapshot" -> incrementalSnapshotSql,
    "cdc_gap_audit" -> gapAuditSql,
    "cdc_snapshot_apply" -> snapshotApplySql,
    "cdc_upsert_target" -> upsertTargetSql,
    "cdc_scd2_history" -> scd2HistorySql,
    "cdc_route_tables" -> routeTablesSql,
    "cdc_schema_drift" -> schemaDriftSql,
    "cdc_drift_dispatch" -> driftDispatchSql,
    "cdc_compat_audit" -> compatAuditSql,
    "cdc_ivm_merge" -> ivmMergeSql,
    "cdc_log_compact" -> logCompactSql)
}
