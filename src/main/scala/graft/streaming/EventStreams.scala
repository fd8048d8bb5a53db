package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryModule, Tables}
import graft.Syntax._

/** §2.5 streaming analytics.
  *
  * Every transform here is a plain DataFrame function usable on BOTH a
  * batch frame and a `readStream` frame — the Structured Streaming
  * model (same declarative plan, incrementalized by the engine). The
  * driver-verified queries run them in batch against DuckDB oracles;
  * StreamingSpec runs the same transforms through MemoryStream with
  * watermarks and checks agreement with the batch results.
  *
  * Scale: windowed aggs keep state per (key, window) bounded by the
  * watermark; session windows keep state per active key only; dedup
  * state is bounded by the watermark horizon.
  */
object EventStreams extends QueryModule {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  // ------------------------------------------------ str_tumbling_agg
  /** Tumbling 1h windows per event type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("total"))

  def strTumbling(spark: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables.events(spark, dir))
      .orderBy("window_start", "event_type")

  val strTumblingSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------- str_sliding_agg
  /** Sliding windows: 1h length, 30m slide (each event lands in 2). */
  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"), col("cnt"), col("n_users"))

  def strSliding(spark: SparkSession, dir: String): DataFrame =
    slidingAgg(Tables.events(spark, dir)).reportSort("window_start")

  val strSlidingSql: String =
    """SELECT make_timestamp(s * 1800000000) AS window_start,
      |  COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS n_users
      |FROM (SELECT unnest([epoch_us(ts) // 1800000000,
      |                     epoch_us(ts) // 1800000000 - 1]) AS s,
      |             user_id
      |      FROM events) t
      |GROUP BY s ORDER BY window_start""".stripMargin

  // -------------------------------------------------- str_sessionize
  /** Gap-based session windows (30m) per user — built-in session_window
    * keeps state per active session only. */
  def sessionize(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("last_ts"))

  def strSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir)).orderBy("user_id", "session_start")

  val strSessionizeSql: String =
    """WITH marks AS (
      |  SELECT user_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marks)
      |SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events,
      |  MAX(ts) AS last_ts
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // --------------------------------------------- str_dedup_watermark
  /** Deterministic first-occurrence dedup per (user_id, event_type).
    * The streaming form is dropDuplicates after withWatermark (state
    * bounded by the horizon) — StreamingSpec drives that; batch keeps
    * the deterministic window form for the oracle. */
  def dedupFirst(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
  }

  def strDedup(spark: SparkSession, dir: String): DataFrame =
    dedupFirst(Tables.events(spark, dir)).orderBy("user_id", "event_type")

  val strDedupSql: String =
    """SELECT user_id, event_type, event_id, ts FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // ------------------------------------------------- str_asof_join
  /** As-of join: each purchase event enriched with the customer's most
    * recent order at-or-before event time. Composed from builtins
    * (join + per-event window); at 100 TB: range-bucket both sides on
    * (key, time-bucket) so each event probes one sorted bucket instead
    * of the full order history. */
  def asofJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id")
    val o = orders.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val w = Window.partitionBy("event_id")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    e.join(o, col("user_id") === col("o_custkey") &&
        col("o_orderdate").cast("timestamp_ntz") <= col("ts"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
  }

  def strAsof(spark: SparkSession, dir: String): DataFrame =
    asofJoin(Tables.events(spark, dir), Tables.orders(spark, dir))
      .orderBy("event_id")

  /** The SAME as-of semantics through the custom plan node
    * ([[graft.plans.AsOfJoinExec]] — co-partitioned streaming merge,
    * O(1) per-task state): third implementation, same oracle as the
    * window form and the state-array lookup. */
  def strAsofExec(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.register(spark)
    val e = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("o_ots"),
        col("o_orderdate"))
    graft.plans.AsOfJoin(e, o,
      keys = "user_id" -> "o_custkey", times = "ts" -> "o_ots",
      tie = "o_orderkey")
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  val strAsofSql: String =
    """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      |  WHERE e.event_type = 'purchase') t
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ------------------------------------------------ str_asof_lookup
  /** The SCALE-PATH as-of join: the right side compacts into ONE row
    * per key holding time-sorted state arrays; each left row probes
    * them with a codegen'd binary search (graft_asof_index). One
    * equi-join shuffle on the key, O(log n) per probe — no per-event
    * window, no candidate explosion. Cross-validated against the same
    * oracle as the window-based [[asofJoin]]. */
  def asofStateLookup(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t_us"))
    // state per key: entries sorted by (time, id) ascending — the
    // binary search returns the LAST entry <= t, i.e. latest time with
    // the highest id on time ties (same semantics as the window form)
    val state = orders
      .select(col("o_custkey"),
        struct(unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
          col("o_orderkey").as("id")).as("entry"))
      .groupBy("o_custkey")
      .agg(array_sort(collect_list(col("entry"))).as("entries"))
      .select(col("o_custkey"),
        transform(col("entries"), x => x.getField("t")).as("times"),
        transform(col("entries"), x => x.getField("id")).as("ids"))
    val idx = call_function(graft.expr.VectorExprs.asofName, col("times"), col("t_us"))
    e.join(state, col("user_id") === col("o_custkey"))
      .withColumn("_i", idx)
      .filter(col("_i") >= 0)
      .select(col("event_id"), col("user_id"),
        element_at(col("ids"), col("_i") + 1).as("o_orderkey"),
        timestamp_micros(element_at(col("times"), col("_i") + 1))
          .cast("timestamp_ntz").as("o_orderdate"))
  }

  def strAsofLookup(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.VectorExprs.register(spark)
    asofStateLookup(Tables.events(spark, dir), Tables.orders(spark, dir))
      .orderBy("event_id")
  }

  // ---------------------------------------------- str_interval_join
  /** Stream-stream time-interval join: every signup joined with the
    * same user's purchases in the following 24h. As a streaming plan
    * this is Spark's watermarked stream-stream inner join — the
    * time-range predicate bounds both sides' state (each side holds
    * only rows inside watermark + 24h); StreamingSpec drives the same
    * function through two MemoryStream inputs and checks agreement
    * with this batch form. One shuffle on user_id. */
  def intervalJoin(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups.select(col("user_id"), col("ts").as("signup_ts"),
      col("event_id").as("signup_id"))
    val p = purchases.select(col("user_id").as("uid2"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
    s.join(p, col("user_id") === col("uid2") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") < col("signup_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  def strIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    intervalJoin(ev.filter(col("event_type") === "signup"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "signup_id", "purchase_id")
  }

  val strIntervalJoinSql: String =
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
      |FROM events s JOIN events p ON p.user_id = s.user_id
      | AND s.event_type = 'signup' AND p.event_type = 'purchase'
      | AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 24 HOUR
      |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin

  // ---------------------------------------------- str_static_enrich
  /** Stream-static dimension enrichment — the standard "join the
    * stream to a slowly-changing dim snapshot" op. The join is
    * STATELESS on the stream side (append-safe): Spark re-reads the
    * static relation per micro-batch and broadcasts it, so at 100 TB
    * of stream the only moving cost is the dim broadcast, never stream
    * state. The key maps user_id into the dim's key space so every SF
    * resolves (custkeys 1..100 exist at every scale factor). */
  def staticEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim),
      pmod(col("user_id"), lit(100L)) + 1 === col("c_custkey"))

  def strStaticEnrich(spark: SparkSession, dir: String): DataFrame =
    staticEnrich(Tables.events(spark, dir),
      Tables.customer(spark, dir).select("c_custkey", "c_mktsegment"))
      .groupBy(col("event_type"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .reportSort("event_type", "c_mktsegment")

  val strStaticEnrichSql: String =
    """SELECT event_type, c_mktsegment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id % 100 + 1 = c_custkey
      |GROUP BY event_type, c_mktsegment
      |ORDER BY event_type, c_mktsegment""".stripMargin

  // ---------------------------------------------- str_topk_windowed
  /** Windowed top-k: the leading event types of every tumbling hour.
    * The windowed-agg + per-window rank composition every monitoring
    * pipeline runs; Spark's WindowGroupLimit pushes the rank<=k filter
    * into the sort so per-window state stays k rows. (In streaming
    * mode the same plan runs per closed window once the watermark
    * passes; the driver verifies the batch-equivalent form.) */
  def topkWindowed(events: DataFrame, k: Int): DataFrame = {
    val counts = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"))
    val w = Window.partitionBy("window_start")
      .orderBy(desc("cnt"), col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  def strTopkWindowed(spark: SparkSession, dir: String): DataFrame =
    topkWindowed(Tables.events(spark, dir), 2)
      .reportSort("window_start", "rnk")

  val strTopkWindowedSql: String =
    """SELECT window_start, event_type, cnt, CAST(rnk AS INTEGER) AS rnk
      |FROM (
      |  SELECT date_trunc('hour', ts) AS window_start, event_type,
      |    COUNT(*) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
      |      ORDER BY COUNT(*) DESC, event_type) AS rnk
      |  FROM events GROUP BY 1, 2) t
      |WHERE rnk <= 2 ORDER BY window_start, rnk""".stripMargin

  // --------------------------------------------- str_interval_outer
  /** LEFT OUTER stream-stream interval join: every signup with its
    * 24h purchases, signups with NONE kept with null purchase ids —
    * the funnel/abandonment query. As a streaming plan this is
    * Spark's watermarked left-outer stream-stream join (null rows
    * emit once the watermark passes the interval's end, and the same
    * time-range predicate bounds both sides' state); this batch form
    * is the driver-verified semantics. */
  def intervalJoinOuter(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups.select(col("user_id"), col("ts").as("signup_ts"),
      col("event_id").as("signup_id"))
    val p = purchases.select(col("user_id").as("uid2"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
    s.join(p, col("user_id") === col("uid2") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") < col("signup_ts") + expr("INTERVAL 24 HOURS"),
        "left_outer")
      .select(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  def strIntervalOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    intervalJoinOuter(ev.filter(col("event_type") === "signup"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "signup_id", "purchase_id")
  }

  val strIntervalOuterSql: String =
    """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
      |FROM (SELECT * FROM events WHERE event_type = 'signup') s
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = s.user_id
      | AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 24 HOUR
      |ORDER BY s.user_id, signup_id, purchase_id NULLS FIRST""".stripMargin

  // -------------------------------------------------- str_funnel
  /** Ordered conversion funnel view → click → purchase: a user is at
    * stage k when each step's FIRST qualifying event strictly follows
    * the previous step's (the classic product-analytics funnel, not a
    * mere per-type count — ordering is the semantic content). Three
    * user-keyed aggs chained by joins, everything partitioned on
    * user_id (high cardinality, scale-safe); exact integer
    * microseconds, no session state needed in batch. The same
    * stage-1/2 frames run incrementally under streaming (each is an
    * agg + join the engine maintains); the batch form is the oracle-
    * verified contract. */
  def strFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val c = ev.join(v, "user_id")
      .filter(col("event_type") === "click" && col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val p = ev.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    val s1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"))
    val s2 = c.agg(count(lit(1)).as("n_users"))
      .select(lit("2_view_click").as("stage"), col("n_users"))
    val s3 = p.agg(count(lit(1)).as("n_users"))
      .select(lit("3_view_click_purchase").as("stage"), col("n_users"))
    s1.unionAll(s2).unionAll(s3).reportSort("stage")
  }

  val strFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS t1 FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
      |SELECT * FROM (
      |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      |  UNION ALL SELECT '2_view_click', COUNT(*) FROM c
      |  UNION ALL SELECT '3_view_click_purchase', COUNT(*) FROM p)
      |ORDER BY stage""".stripMargin

  // ------------------------------------------------ str_retention
  /** Cohort retention — the product-analytics table behind every
    * "day-N retention" chart: each user's cohort is their FIRST-seen
    * day, and (cohort_day, day_offset) counts the distinct users seen
    * again `offset` days later (offset 0 = cohort size). Shape at
    * 100 TB: one user-keyed min-agg (high-cardinality hash agg), one
    * join back co-partitioned on user_id, one (cohort, offset)-keyed
    * distinct-count — no windows, no low-cardinality partitions; the
    * offset cap bounds output at |days|·8 rows. */
  def retention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts").cast("date").as("day"))
    val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  def strRetention(spark: SparkSession, dir: String): DataFrame =
    retention(Tables.events(spark, dir))
      .orderBy("cohort_day", "day_offset")

  val strRetentionSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e
      |      GROUP BY user_id)
      |SELECT cohort_day,
      |  CAST(e.day - c.cohort_day AS BIGINT) AS day_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN c USING (user_id)
      |WHERE e.day - c.cohort_day <= 7
      |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------- str_transitions
  /** Per-user event-type transition counts — the first-order Markov
    * view of user behavior (what follows what), the input to
    * next-action models and anomaly scoring. Each user's events are
    * ordered by (ts, event_id) — a UNIQUE key, so lag() is
    * deterministic — and consecutive (prev → next) type pairs are
    * counted globally. The window partitions on user_id (high
    * cardinality: scale-safe); output is |types|² rows. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  def strTransitions(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables.events(spark, dir))
      .reportSort("from_type", "to_type")

  val strTransitionsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type AS from_type, event_type AS to_type,
      |  COUNT(*) AS n
      |FROM o WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin

  // ------------------------------------------------- str_anomaly
  /** Robust anomaly detection per event type — the median/MAD gate
    * (immune to the very outliers it hunts, unlike mean/stddev): an
    * event is anomalous when its |value − median| exceeds 3×MAD, all
    * in exact integer cents via the value-histogram selection
    * ([[graft.ops.OrderStats]] — windows only ever see the bounded
    * (type, cents) histogram, never event rows). Per type: n, median,
    * MAD, anomaly count, the worst deviation. The same median/MAD
    * frame is what a streaming deployment would broadcast as
    * reference state and compare per micro-batch. */
  def strAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats._
    import org.apache.spark.sql.types.DecimalType
    val vals = Tables.events(spark, dir).select(col("event_type"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
        .as("cents"))
    val med = cumulativeHistogram(vals, Seq("event_type"), "cents")
      .groupBy("event_type")
      .agg(min(when(holdsRank(midRank1), col("cents")))
        .as("median_cents"))
    val dev = vals.join(broadcast(med), "event_type")
      .select(col("event_type"), col("median_cents"),
        abs(col("cents") - col("median_cents")).as("dev"))
    val mad = cumulativeHistogram(dev.select("event_type", "dev"),
        Seq("event_type"), "dev")
      .groupBy("event_type")
      .agg(min(when(holdsRank(midRank1), col("dev"))).as("mad_cents"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("median_cents")).as("median_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > lit(3L) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_anomalies"),
        max(col("dev")).as("max_dev"))
      .reportSort("event_type")
  }

  val strAnomalySql: String =
    """WITH v AS (
      |  SELECT event_type AS g,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |h AS (SELECT g, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
      |ch AS (SELECT g, cents, c,
      |         CAST(SUM(c) OVER (PARTITION BY g ORDER BY cents)
      |           AS BIGINT) AS hi
      |       FROM h),
      |n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY g),
      |med AS (
      |  SELECT ch.g,
      |    MIN(CASE WHEN hi - c + 1 <= (n.n + 1) // 2
      |          AND (n.n + 1) // 2 <= hi THEN cents END) AS median_cents
      |  FROM ch JOIN n ON ch.g = n.g GROUP BY ch.g),
      |d AS (SELECT v.g, m.median_cents,
      |        ABS(v.cents - m.median_cents) AS dev
      |      FROM v JOIN med m ON v.g = m.g),
      |h2 AS (SELECT g, dev, COUNT(*) AS c FROM d GROUP BY 1, 2),
      |ch2 AS (SELECT g, dev, c,
      |          CAST(SUM(c) OVER (PARTITION BY g ORDER BY dev)
      |            AS BIGINT) AS hi
      |        FROM h2),
      |mad AS (
      |  SELECT ch2.g,
      |    MIN(CASE WHEN hi - c + 1 <= (n.n + 1) // 2
      |          AND (n.n + 1) // 2 <= hi THEN dev END) AS mad_cents
      |  FROM ch2 JOIN n ON ch2.g = n.g GROUP BY ch2.g)
      |SELECT d.g AS event_type, COUNT(*) AS n,
      |  CAST(MAX(d.median_cents) AS BIGINT) AS median_cents,
      |  CAST(MAX(mad.mad_cents) AS BIGINT) AS mad_cents,
      |  CAST(SUM(CASE WHEN d.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_anomalies,
      |  CAST(MAX(d.dev) AS BIGINT) AS max_dev
      |FROM d JOIN mad ON d.g = mad.g
      |GROUP BY d.g ORDER BY event_type""".stripMargin

  // ------------------------------------------------ str_cep_pattern
  /** Complex-event pattern with NEGATION — "signup followed by a
    * purchase within 7 days with NO error strictly between" — the CEP
    * shape (A → B within T, ¬C between) that a funnel can't express:
    * the absence condition is the semantic content (an error between
    * the two invalidates the conversion). Batch form: the candidate
    * (signup, purchase) pairs come from a user-keyed join bounded by
    * the 7-day window (high-cardinality user_id partitioning, the
    * time bound caps per-user fan-out), and the negation is ONE
    * left-anti join against the user's errors inside each candidate
    * interval — no per-user sequence collect, no window over raw
    * events. Streaming form: the same three keyed frames under
    * watermarked interval joins. Emits per converting user the match
    * count and first matched pair. */
  def cepPattern(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val win = 7L * 24 * 3600 * 1000000L
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("us").as("s_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("_eu"), col("us").as("e_us"))
    val cand = s.join(p, Seq("user_id"))
      .filter(col("p_us") > col("s_us") && col("p_us") <= col("s_us") + win)
    cand.join(err,
        col("_eu") === col("user_id") && col("e_us") > col("s_us") &&
          col("e_us") < col("p_us"), "left_anti")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("s_us")).as("first_signup_us"),
        min(col("p_us")).as("first_purchase_us"))
      .orderBy("user_id")
  }

  def strCepPattern(spark: SparkSession, dir: String): DataFrame =
    cepPattern(Tables.events(spark, dir))

  val strCepPatternSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s AS (SELECT user_id, us AS s_us FROM e
      |      WHERE event_type = 'signup'),
      |p AS (SELECT user_id, us AS p_us FROM e
      |      WHERE event_type = 'purchase'),
      |err AS (SELECT user_id, us AS e_us FROM e
      |        WHERE event_type = 'error'),
      |m AS (
      |  SELECT s.user_id, s_us, p_us
      |  FROM s JOIN p ON p.user_id = s.user_id
      |    AND p_us > s_us AND p_us <= s_us + 604800000000
      |  WHERE NOT EXISTS (SELECT 1 FROM err
      |    WHERE err.user_id = s.user_id
      |      AND e_us > s_us AND e_us < p_us))
      |SELECT user_id, COUNT(*) AS n_matches,
      |  CAST(MIN(s_us) AS BIGINT) AS first_signup_us,
      |  CAST(MIN(p_us) AS BIGINT) AS first_purchase_us
      |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------- str_distinct_windowed
  /** Windowed distinct-cardinality SKETCH — the streaming form of the
    * q31 KMV sketch: per 6-hour tumbling window, the k=64 smallest
    * distinct portable user-id hashes estimate the distinct-user
    * count ((k−1)·2³²/h_k), beside the exact count and exact
    * per-mille error. This is the shape a stream keeps when exact
    * windowed COUNT(DISTINCT) state would be unbounded: the sketch is
    * MERGEABLE (k smallest of a union = k smallest of the per-task k
    * smallest — the WindowGroupLimit applies rank ≤ k map-side, so
    * each task forwards ≤ k hashes per window) and the estimator is
    * deterministic integer math the oracle replays bit-for-bit. */
  def distinctWindowed(events: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = events.select(
        window(col("ts"), "6 hours").getField("start").as("window_start"),
        graft.mask.MaskFunctions.portableHash(col("user_id")).as("h"))
      .distinct()
    val w = Window.partitionBy("window_start").orderBy("h")
    val sk = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("window_start")
      .agg(max(when(col("rn") === k, col("h"))).as("hk"),
        count(lit(1)).as("n_kept"))
    val exact = d.groupBy("window_start")
      .agg(count(lit(1)).as("exact_users"))
    sk.join(exact, "window_start")
      .select(col("window_start"),
        when(col("n_kept") < k, col("exact_users"))
          .otherwise(expr(s"(${k - 1} * 4294967296) div hk"))
          .as("est_users"),
        col("exact_users"))
      .withColumn("err_pm",
        expr("abs(est_users - exact_users) * 1000 div exact_users"))
      .reportSort("window_start")
  }

  def strDistinctWindowed(spark: SparkSession, dir: String): DataFrame =
    distinctWindowed(Tables.events(spark, dir))

  val strDistinctWindowedSql: String =
    """WITH d AS (
      |  SELECT DISTINCT epoch_us(ts) // 21600000000 AS wb,
      |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT
      |      AS h
      |  FROM events),
      |r AS (
      |  SELECT wb, h,
      |    ROW_NUMBER() OVER (PARTITION BY wb ORDER BY h) AS rn
      |  FROM d),
      |sk AS (
      |  SELECT wb, MAX(CASE WHEN rn = 64 THEN h END) AS hk,
      |    COUNT(*) AS n_kept
      |  FROM r WHERE rn <= 64 GROUP BY wb),
      |ex AS (SELECT wb, COUNT(*) AS exact_users FROM d GROUP BY wb)
      |SELECT make_timestamp(sk.wb * 21600000000) AS window_start,
      |  CAST(CASE WHEN sk.n_kept < 64 THEN ex.exact_users
      |       ELSE (63 * 4294967296) // sk.hk END AS BIGINT) AS est_users,
      |  CAST(ex.exact_users AS BIGINT) AS exact_users,
      |  CAST(abs((CASE WHEN sk.n_kept < 64 THEN ex.exact_users
      |        ELSE (63 * 4294967296) // sk.hk END) - ex.exact_users)
      |    * 1000 // ex.exact_users AS BIGINT) AS err_pm
      |FROM sk JOIN ex ON sk.wb = ex.wb ORDER BY window_start""".stripMargin

  // ------------------------------------------------ str_lateness_audit
  /** Out-of-orderness profile — the measurement that SETS a stream's
    * watermark delay (guess too low → dropped events, too high →
    * state bloat): with arrival order proxied by event_id, an event's
    * lateness is (max event-time seen so far) − (its own event-time).
    * The running max uses the repo's two-level decomposition — local
    * prefix-max within contiguous event_id shards + an exclusive
    * prefix-max over the ≤|shards| per-shard maxes (deliberate
    * single-partition window) — so no window spans the raw feed; the
    * oracle IS the naive global running max, proving the
    * decomposition exact. Per 6 h event-time window: event count, the
    * worst lateness, and how many events a 1 h watermark would have
    * dropped. */
  def latenessAudit(events: DataFrame, shardWidth: Long = 1024L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col("event_id"), col("ts"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("_sh", expr(s"event_id div $shardWidth"))
    val pre = Window.partitionBy(pmod(col("_mx"), lit(1))).orderBy("_sh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("_sh").agg(max(col("us")).as("_mx"))
      .withColumn("_off", max(col("_mx")).over(pre))
      .select("_sh", "_off")
    val local = Window.partitionBy("_sh").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("_lm", max(col("us")).over(local))
      .join(broadcast(offsets), Seq("_sh"))
      .withColumn("late_us",
        greatest(col("_lm"), coalesce(col("_off"), col("_lm"))) - col("us"))
      // window() on the NTZ ts keeps the bucket NTZ (timestamp_micros
      // would re-type it LTZ and diverge from the oracle's
      // make_timestamp)
      .withColumn("window_start",
        window(col("ts"), "6 hours").getField("start"))
      .groupBy("window_start")
      .agg(count(lit(1)).as("n"), max(col("late_us")).as("max_late_us"),
        sum(when(col("late_us") > 3600000000L, 1L).otherwise(0L))
          .as("n_late_1h"))
      .reportSort("window_start")
  }

  def strLatenessAudit(spark: SparkSession, dir: String): DataFrame =
    latenessAudit(Tables.events(spark, dir))

  val strLatenessAuditSql: String =
    """WITH b AS (SELECT event_id, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT us, MAX(us) OVER (ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
      |  FROM b)
      |SELECT make_timestamp((us // 21600000000) * 21600000000)
      |    AS window_start,
      |  COUNT(*) AS n, CAST(MAX(sm - us) AS BIGINT) AS max_late_us,
      |  CAST(SUM(CASE WHEN sm - us > 3600000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_late_1h
      |FROM m GROUP BY 1 ORDER BY window_start""".stripMargin

  // ------------------------------------------------ str_concurrency
  /** Peak-concurrency gauge over event intervals — the capacity
    * number (max simultaneous sessions/connections) a stream SLO is
    * provisioned from. Each event opens an interval [ts, ts + dur)
    * (dur deterministic in the id, standing in for a session-length
    * column); the classic sweep turns intervals into ±1 deltas and
    * the concurrency at any instant is the running sum in (t, delta)
    * order (−1 sorts first: an interval ending exactly when another
    * starts never overlaps it). The running sum uses the repo's
    * two-level prefix decomposition — local window inside contiguous
    * 1 h time shards + exclusive prefix over the ≤|shards| per-shard
    * delta sums — so no window spans the feed; the oracle IS the
    * naive global running sum. Ties (equal (t, delta)) permute only
    * within equal-delta runs, whose running-sum multiset is
    * order-independent, so the per-window MAX is well-defined on both
    * engines.
    *
    * TRUE peak semantics (r9): a window's peak is NOT just the max at
    * its own delta instants — concurrency carried in from earlier
    * intervals counts too (a window whose first in-window event is an
    * interval END previously underreported, and a window fully
    * spanned by open intervals emitted no row at all). Each window is
    * therefore seeded with its carried-in running sum (the exclusive
    * prefix of per-window delta totals — |windows| rows), and a
    * window SPINE from the first to the last delta window guarantees
    * every window in range reports, delta-less ones at exactly the
    * carried concurrency. Per 6 h window: interval starts and the
    * true peak concurrency over the whole window span. */
  def concurrency(events: DataFrame, shardWidth: Long = 3600000000L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("s"))
      .withColumn("e",
        col("s") + (lit(60L) + pmod(col("event_id"), lit(600L))) * 1000000L)
    val deltas = base.select(col("s").as("t"), lit(1L).as("d"))
      .union(base.select(col("e").as("t"), lit(-1L).as("d")))
      .withColumn("_sh", expr(s"t div $shardWidth"))
    val pre = Window.partitionBy(pmod(col("_c"), lit(1))).orderBy("_sh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas.groupBy("_sh").agg(sum(col("d")).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(pre), lit(0L)))
      .select("_sh", "_off")
    val local = Window.partitionBy("_sh").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perWin = deltas.withColumn("_run", sum(col("d")).over(local))
      .join(broadcast(offsets), Seq("_sh"))
      .withColumn("run", col("_off") + col("_run"))
      .groupBy(expr("t div 21600000000").as("wb"))
      .agg(sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        max(col("run")).as("_mx"), sum(col("d")).as("_sd"))
    // window spine: every 6 h bucket between the first and last delta
    // reports (bounded by the time RANGE / 6 h, not the corpus)
    val spine = perWin.agg(min(col("wb")).as("_lo"), max(col("wb")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("wb"))
    val carryW = Window.partitionBy(pmod(col("wb"), lit(1))).orderBy("wb")
      .rowsBetween(Window.unboundedPreceding, -1)
    spine.join(perWin, Seq("wb"), "left")
      .withColumn("_carry", coalesce(sum(col("_sd")).over(carryW), lit(0L)))
      .select(timestamp_micros(col("wb") * 21600000000L)
          .cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("window_start"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"),
        greatest(coalesce(col("_mx"), col("_carry")), col("_carry"))
          .as("max_concurrent"))
      .reportSort("window_start")
  }

  // ------------------------------------------------ str_outage_windows
  /** Feed-outage detection — the silence gaps that mean the PIPELINE
    * was down, as opposed to [[latenessAudit]]'s late data: collapse
    * the stream to per-minute activity counts (map-side combine — the
    * only corpus-sized pass), span a minute spine from first to last
    * activity, and the empty-minute runs (gaps-and-islands on the
    * spine's anti-join) are the outages, reported per day. Every
    * post-collapse structure is bounded by the TIME RANGE in minutes,
    * never the event count — the single-partition island window runs
    * over empty minutes only (the deliberate pmod marker). */
  def outageWindows(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = events.select(
        expr("unix_micros(cast(ts as timestamp)) div 60000000").as("m"))
      .groupBy("m").agg(count(lit(1)).as("n"))
    val spine = m.agg(min(col("m")).as("_lo"), max(col("m")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("m"))
    val empty = spine.join(m, Seq("m"), "left_anti")
    val w = Window.partitionBy(pmod(col("m"), lit(1))).orderBy("m")
    empty.withColumn("k", col("m") - row_number().over(w))
      .groupBy("k")
      .agg(min(col("m")).as("start_m"), count(lit(1)).as("len_min"))
      .groupBy(expr("start_m div 1440").as("_day"))
      .agg(count(lit(1)).as("n_outages"),
        sum(col("len_min")).as("silent_min"),
        max(col("len_min")).as("max_outage_min"))
      .select(timestamp_micros(col("_day") * 86400000000L)
          .cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("day_start"),
        col("n_outages"), col("silent_min"), col("max_outage_min"))
      .reportSort("day_start")
  }

  // -------------------------------------------------- str_burstiness
  /** Traffic burstiness (Fano factor) per day — the dispersion index
    * capacity planning reads next to [[outageWindows]]' silences: over
    * the day's minute spine (zeros INCLUDED — skipping empty minutes
    * silently deflates the variance), the per-minute count variance
    * over its mean, in per-mille. ≈1000 is Poisson-like arrivals;
    * far above means bursts, far below means rate-limited/clocked
    * traffic. Everything after the minute collapse is bounded by the
    * time range; the statistic is the exact integer identity
    * (N·Σc² − (Σc)²)·1000 div (N·Σc), no float moments. */
  def burstiness(events: DataFrame): DataFrame = {
    val m = events.select(
        expr("unix_micros(cast(ts as timestamp)) div 60000000").as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
    val spine = m.agg(min(col("m")).as("_lo"), max(col("m")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("m"))
    spine.join(m, Seq("m"), "left")
      .select(col("m"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(expr("m div 1440").as("_day"))
      .agg(count(lit(1)).as("n_minutes"), sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("_s2"))
      .filter(col("n_events") > 0)
      .select(timestamp_micros(col("_day") * 86400000000L)
          .cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("day_start"),
        col("n_minutes"), col("n_events"),
        expr("""(n_minutes * _s2 - n_events * n_events) * 1000
                div (n_minutes * n_events)""").as("fano_pm"))
      .reportSort("day_start")
  }

  def strBurstiness(spark: SparkSession, dir: String): DataFrame =
    burstiness(Tables.events(spark, dir))

  val strBurstinessSql: String =
    """WITH m AS (
      |  SELECT epoch_us(ts) // 60000000 AS m, COUNT(*) AS c
      |  FROM events GROUP BY 1),
      |sp AS (
      |  SELECT unnest(range((SELECT MIN(m) FROM m),
      |                      (SELECT MAX(m) FROM m) + 1)) AS m),
      |f AS (
      |  SELECT sp.m, COALESCE(mm.c, 0) AS c
      |  FROM sp LEFT JOIN m mm ON sp.m = mm.m),
      |d AS (
      |  SELECT m // 1440 AS day, COUNT(*) AS n_minutes,
      |    CAST(SUM(c) AS BIGINT) AS n_events,
      |    CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM f GROUP BY 1)
      |SELECT make_timestamp(day * 86400000000) AS day_start,
      |  n_minutes, n_events,
      |  CAST((n_minutes * s2 - n_events * n_events) * 1000
      |    // (n_minutes * n_events) AS BIGINT) AS fano_pm
      |FROM d WHERE n_events > 0 ORDER BY day_start""".stripMargin

  def strOutageWindows(spark: SparkSession, dir: String): DataFrame =
    outageWindows(Tables.events(spark, dir))

  val strOutageWindowsSql: String =
    """WITH m AS (
      |  SELECT epoch_us(ts) // 60000000 AS m, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |sp AS (
      |  SELECT unnest(range((SELECT MIN(m) FROM m),
      |                      (SELECT MAX(m) FROM m) + 1)) AS m),
      |e AS (
      |  SELECT sp.m FROM sp LEFT JOIN m ON sp.m = m.m
      |  WHERE m.m IS NULL),
      |i AS (SELECT m, m - ROW_NUMBER() OVER (ORDER BY m) AS k FROM e),
      |o AS (SELECT MIN(m) AS start_m, COUNT(*) AS len_min
      |      FROM i GROUP BY k)
      |SELECT make_timestamp((start_m // 1440) * 86400000000)
      |    AS day_start,
      |  COUNT(*) AS n_outages,
      |  CAST(SUM(len_min) AS BIGINT) AS silent_min,
      |  CAST(MAX(len_min) AS BIGINT) AS max_outage_min
      |FROM o GROUP BY 1 ORDER BY day_start""".stripMargin

  def strConcurrency(spark: SparkSession, dir: String): DataFrame =
    concurrency(Tables.events(spark, dir))

  val strConcurrencySql: String =
    """WITH b AS (SELECT event_id, epoch_us(ts) AS s FROM events),
      |i AS (SELECT s, s + (60 + event_id % 600) * 1000000 AS e FROM b),
      |d AS (SELECT s AS t, 1 AS dd FROM i
      |      UNION ALL SELECT e, -1 FROM i),
      |r AS (
      |  SELECT t, dd, SUM(dd) OVER (ORDER BY t, dd
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM d),
      |pw AS (
      |  SELECT t // 21600000000 AS wb,
      |    SUM(CASE WHEN dd = 1 THEN 1 ELSE 0 END) AS n_starts,
      |    MAX(run) AS mx, SUM(dd) AS sd
      |  FROM r GROUP BY 1),
      |sp AS (
      |  SELECT unnest(range((SELECT MIN(wb) FROM pw),
      |                      (SELECT MAX(wb) FROM pw) + 1)) AS wb),
      |c AS (
      |  SELECT sp.wb, pw.n_starts, pw.mx,
      |    COALESCE(SUM(pw.sd) OVER (ORDER BY sp.wb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS carry
      |  FROM sp LEFT JOIN pw ON sp.wb = pw.wb)
      |SELECT make_timestamp(wb * 21600000000) AS window_start,
      |  CAST(COALESCE(n_starts, 0) AS BIGINT) AS n_starts,
      |  CAST(GREATEST(COALESCE(mx, carry), carry) AS BIGINT)
      |    AS max_concurrent
      |FROM c ORDER BY window_start""".stripMargin

  // ---------------------------------------------- str_running_slope
  /** RUNNING OLS TREND per event type — the evolving slope of daily
    * volume vs day index through each day, i.e. what a "trend watch"
    * panel plots while [[strMannKendall]] only answers yes/no at the
    * end: slope_d = (nΣdy − ΣdΣy)/(nΣd² − (Σd)²) over days ≤ d,
    * every Σ a CUMULATIVE integer moment (four prefix sums share one
    * window pass over the calendar-bounded (type, day) frame — the
    * frame is fixed by the horizon, not by SF, so these windows are
    * constant-size like the runs test's). Slope ships ×10⁶
    * (micro-events/day) through the sign-decomposed floor division
    * (negate-then-divide — both engines identical). NULL on day 1
    * (variance 0). Output: one row per (type, day). */
  def strRunningSlope(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("y"))
    val w = Window.partitionBy("grp").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("n", count(lit(1)).over(w))
      .withColumn("sd", sum(col("day")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sdy", sum(col("day") * col("y")).over(w))
      .withColumn("sdd", sum(col("day") * col("day")).over(w))
      .select(col("grp"), col("day"), col("y"), col("n").as("n_days"),
        expr("CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * sdd -" +
          " CAST(sd AS DECIMAL(38,0)) * sd = 0 THEN NULL" +
          " WHEN CAST(n AS DECIMAL(38,0)) * sdy -" +
          " CAST(sd AS DECIMAL(38,0)) * sy >= 0 THEN" +
          " (CAST(n AS DECIMAL(38,0)) * sdy - CAST(sd AS DECIMAL(38,0))" +
          " * sy) * 1000000 div (CAST(n AS DECIMAL(38,0)) * sdd -" +
          " CAST(sd AS DECIMAL(38,0)) * sd)" +
          " ELSE -((CAST(sd AS DECIMAL(38,0)) * sy -" +
          " CAST(n AS DECIMAL(38,0)) * sdy) * 1000000 div" +
          " (CAST(n AS DECIMAL(38,0)) * sdd -" +
          " CAST(sd AS DECIMAL(38,0)) * sd)) END AS BIGINT)")
          .as("slope_micro"))
      .reportSort("grp", "day")
  }

  val strRunningSlopeSql: String =
    """WITH d AS (
      |  SELECT event_type AS grp,
      |    epoch_us(ts) // 86400000000 AS day, COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT grp, day, y,
      |    COUNT(*) OVER w AS n, SUM(day) OVER w AS sd,
      |    SUM(y) OVER w AS sy, SUM(day * y) OVER w AS sdy,
      |    SUM(day * day) OVER w AS sdd
      |  FROM d
      |  WINDOW w AS (PARTITION BY grp ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT grp, day, CAST(y AS BIGINT) AS y,
      |  CAST(n AS BIGINT) AS n_days,
      |  CAST(CASE WHEN n * sdd - sd * sd = 0 THEN NULL
      |    WHEN n * sdy - sd * sy >= 0 THEN
      |      (CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy)
      |      * 1000000 // (CAST(n AS HUGEINT) * sdd
      |      - CAST(sd AS HUGEINT) * sd)
      |    ELSE -((CAST(sd AS HUGEINT) * sy - CAST(n AS HUGEINT) * sdy)
      |      * 1000000 // (CAST(n AS HUGEINT) * sdd
      |      - CAST(sd AS HUGEINT) * sd)) END AS BIGINT)
      |    AS slope_micro
      |FROM c ORDER BY grp, day""".stripMargin

  // ------------------------------------------------ str_sax_symbols
  /** SAX SYMBOLIZATION (Lin/Keogh 2003 — Piecewise Aggregate
    * Approximation + alphabet mapping), the time-series indexing
    * primitive: each event type's value stream collapses to 6-hour
    * PAA segment means, and each segment maps to a 4-letter alphabet
    * by the TYPE'S OWN quartile breakpoints — the representation
    * motif mining, anomaly shingling, and cheap similarity all run
    * on (a symbol stream is string-joinable; raw floats are not).
    * Classic SAX assumes Gaussian breakpoints; the distribution-free
    * form here cuts at the empirical quartiles via
    * [[graft.ops.OrderStats.radixRankSelect]] — domain-capped
    * passes, no per-type sort. Shape: one corpus hash-agg to the
    * calendar-bounded (type, segment) PAA frame; everything after is
    * |types×segments|-sized. Output: the per-(type, symbol) census
    * with each symbol's mean range — R12fOpsSpec pins the quartile
    * balance (each symbol holds n/4 ± 1 segments under distinct
    * means) and the breakpoint semantics. */
  def strSaxSymbols(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val paa = Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        expr("unix_micros(cast(ts as timestamp)) div 21600000000")
          .as("seg"),
        floor(col("value") * 100).cast("long").as("c"))
      .groupBy("grp", "seg")
      .agg(expr("sum(c) div count(1)").as("m"))
      .cut // 2 consumers: breakpoint select + symbolize
    val bp = OrderStats.radixRankSelect(
        paa.select(col("grp"), col("m")), Seq("grp"), "m",
        Seq("p25" -> expr("(n + 1) div 4"),
          "p50" -> expr("(n + 1) div 2"),
          "p75" -> expr("(3 * (n + 1)) div 4")))
      .groupBy("grp")
      .agg(max(when(col("sel") === "p25", col("sel_value"))).as("b25"),
        max(when(col("sel") === "p50", col("sel_value"))).as("b50"),
        max(when(col("sel") === "p75", col("sel_value"))).as("b75"))
    paa.join(broadcast(bp), Seq("grp"))
      .withColumn("symbol",
        when(col("m") <= col("b25"), "a")
          .when(col("m") <= col("b50"), "b")
          .when(col("m") <= col("b75"), "c")
          .otherwise("d"))
      .groupBy("grp", "symbol")
      .agg(count(lit(1)).as("n_segments"),
        min(col("m")).as("min_mean_c"),
        max(col("m")).as("max_mean_c"))
      .reportSort("grp", "symbol")
  }

  val strSaxSymbolsSql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |    epoch_us(ts) // 21600000000 AS seg,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS c
      |  FROM events),
      |paa AS (
      |  SELECT grp, seg, CAST(SUM(c) // COUNT(*) AS BIGINT) AS m
      |  FROM v GROUP BY 1, 2),
      |h AS (SELECT grp, m, COUNT(*) AS cnt FROM paa GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, m,
      |    SUM(cnt) OVER (PARTITION BY grp ORDER BY m) AS hi
      |  FROM h),
      |n AS (SELECT grp, COUNT(*) AS n FROM paa GROUP BY 1),
      |bp AS (
      |  SELECT n.grp,
      |    MIN(CASE WHEN hi >= (n + 1) // 4 THEN m END) AS b25,
      |    MIN(CASE WHEN hi >= (n + 1) // 2 THEN m END) AS b50,
      |    MIN(CASE WHEN hi >= (3 * (n + 1)) // 4 THEN m END) AS b75
      |  FROM n JOIN cum ON cum.grp = n.grp GROUP BY 1),
      |s AS (
      |  SELECT paa.grp,
      |    CASE WHEN m <= b25 THEN 'a' WHEN m <= b50 THEN 'b'
      |      WHEN m <= b75 THEN 'c' ELSE 'd' END AS symbol, m
      |  FROM paa JOIN bp ON bp.grp = paa.grp)
      |SELECT grp, symbol, COUNT(*) AS n_segments,
      |  CAST(MIN(m) AS BIGINT) AS min_mean_c,
      |  CAST(MAX(m) AS BIGINT) AS max_mean_c
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------ str_queue_depth
  /** QUEUE-DEPTH / BACKLOG AUDIT — the Lindley recursion
    * W₁ = 0, Wₙ = max(0, Wₙ₋₁ + sₙ₋₁ − aₙ) for a single-server FIFO
    * queue per event type (service demand sₙ = value-proportional
    * work, aₙ = inter-arrival gap): the waiting-work each arrival
    * finds, i.e. what a consumer-lag dashboard plots per partition.
    * The textbook recursion is sequential; the SCALE rewrite is the
    * max-plus prefix identity Wₙ = Sₙ − min_{k≤n} Sₖ with
    * Sₙ = Σ_{i≤n} (sᵢ₋₁ − aᵢ) — BOTH terms are prefix scans, so the
    * whole queue resolves with [[graft.ops.OrderStats
    * .twoLevelRunningSum]] + [[graft.ops.OrderStats
    * .twoLevelStrictPrefixMin]] over day shards: no per-type
    * corpus-length window anywhere (the lag that feeds sᵢ₋₁/aᵢ runs
    * per (type, day) with a |types×days| boundary handoff — the
    * calendar bounds the offsets frame, day width bounds each local
    * sort). Integer milliseconds end-to-end; the mean lifts to
    * DECIMAL(38) (Σw of a saturated queue is unbounded in SF·horizon).
    * Output per type: arrivals, max/mean/p95 backlog (p95 via
    * [[graft.ops.OrderStats.radixRankSelect]] — no rank window), and
    * the busy fraction (arrivals that queued, per-mille). */
  def strQueueDepth(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val e = Tables.events(spark, dir)
      .select(col("event_type").as("grp"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp)) div 1000").as("t_ms"),
        (floor(col("value") * 100) * 200).cast("long").as("s_ms"))
      .withColumn("_day", expr("t_ms div 86400000"))
    val wd = Window.partitionBy(col("grp"), col("_day"))
      .orderBy(col("t_ms"), col("event_id"))
    val base = e
      .withColumn("_pt", lag(col("t_ms"), 1).over(wd))
      .withColumn("_ps", lag(col("s_ms"), 1).over(wd))
    // boundary handoff: a day's first arrival takes its predecessor
    // from the previous PRESENT day's last row, resolved on the
    // calendar-bounded |types×days| frame — never a per-type window
    val bnd = e.groupBy("grp", "_day")
      .agg(max(struct(col("t_ms"), col("event_id"), col("s_ms")))
        .as("_l"))
      .withColumn("_plt", lag(col("_l.t_ms"), 1)
        .over(Window.partitionBy("grp").orderBy("_day")))
      .withColumn("_pls", lag(col("_l.s_ms"), 1)
        .over(Window.partitionBy("grp").orderBy("_day")))
      .select(col("grp"), col("_day"), col("_plt"), col("_pls"))
    val x = base.join(bnd, Seq("grp", "_day"))
      .withColumn("_prevT", coalesce(col("_pt"), col("_plt")))
      .withColumn("_prevS", coalesce(col("_ps"), col("_pls")))
      .withColumn("x", when(col("_prevT").isNull, 0L)
        .otherwise(col("_prevS") - (col("t_ms") - col("_prevT"))))
      .select("grp", "event_id", "t_ms", "_day", "x")
    val s = OrderStats.twoLevelRunningSum(x, Seq("grp"),
      Seq(col("_day")), Seq(col("t_ms"), col("event_id")),
      col("x"), "s")
    val w = OrderStats.twoLevelStrictPrefixMin(s, Seq("grp"),
        Seq(col("_day")), Seq(col("t_ms"), col("event_id")),
        col("s"), "m")
      .withColumn("w_ms",
        col("s") - least(coalesce(col("m"), col("s")), col("s")))
      .select(col("grp"), col("w_ms"))
      .cut // 2 consumers: moment rollup + p95 select
    val roll = w.groupBy("grp").agg(
      count(lit(1)).as("n"),
      max(col("w_ms")).as("w_max_ms"),
      expr("CAST(SUM(CAST(w_ms AS DECIMAL(38,0))) div COUNT(*)" +
        " AS BIGINT)").as("w_mean_ms"),
      expr("SUM(CASE WHEN w_ms > 0 THEN 1 ELSE 0 END) * 1000" +
        " div COUNT(*)").as("busy_pm"))
    val p95 = OrderStats.radixRankSelect(w, Seq("grp"), "w_ms",
        Seq("p95" -> expr("(19 * n + 19) div 20")))
      .select(col("grp"), col("sel_value").as("w_p95_ms"))
    roll.join(p95, Seq("grp")).reportSort("grp")
  }

  val strQueueDepthSql: String =
    """WITH e AS (
      |  SELECT event_type AS grp, event_id,
      |    epoch_us(ts) // 1000 AS t_ms,
      |    CAST(FLOOR(value * 100) AS BIGINT) * 200 AS s_ms
      |  FROM events),
      |l AS (
      |  SELECT grp, event_id, t_ms,
      |    LAG(t_ms) OVER (PARTITION BY grp ORDER BY t_ms, event_id)
      |      AS pt,
      |    LAG(s_ms) OVER (PARTITION BY grp ORDER BY t_ms, event_id)
      |      AS ps
      |  FROM e),
      |x AS (
      |  SELECT grp, event_id, t_ms,
      |    CASE WHEN pt IS NULL THEN 0
      |      ELSE ps - (t_ms - pt) END AS x
      |  FROM l),
      |s AS (
      |  SELECT grp, event_id, t_ms,
      |    SUM(x) OVER (PARTITION BY grp ORDER BY t_ms, event_id) AS s
      |  FROM x),
      |w AS (
      |  SELECT grp,
      |    CAST(s - MIN(s) OVER (PARTITION BY grp
      |      ORDER BY t_ms, event_id) AS BIGINT) AS w_ms
      |  FROM s),
      |roll AS (
      |  SELECT grp, COUNT(*) AS n, MAX(w_ms) AS w_max_ms,
      |    CAST(SUM(CAST(w_ms AS HUGEINT)) // COUNT(*) AS BIGINT)
      |      AS w_mean_ms,
      |    CAST(SUM(CASE WHEN w_ms > 0 THEN 1 ELSE 0 END) * 1000
      |      // COUNT(*) AS BIGINT) AS busy_pm
      |  FROM w GROUP BY 1),
      |h AS (
      |  SELECT grp, w_ms, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, w_ms,
      |    SUM(c) OVER (PARTITION BY grp ORDER BY w_ms) AS hi
      |  FROM h),
      |p95 AS (
      |  SELECT r.grp, MIN(c.w_ms) AS w_p95_ms
      |  FROM roll r JOIN cum c
      |    ON c.grp = r.grp AND c.hi >= (19 * r.n + 19) // 20
      |  GROUP BY 1)
      |SELECT r.grp, r.n, r.w_max_ms, r.w_mean_ms, r.busy_pm,
      |  p.w_p95_ms
      |FROM roll r JOIN p95 p ON p.grp = r.grp ORDER BY r.grp""".stripMargin

  // ------------------------------------------------ str_interarrival
  /** Inter-arrival gap quantile panel — the tail-latency/engagement
    * statistic (p50/p95 of the gap between a user's successive events
    * of the same type) an SLO dashboard plots per feed. Gaps come from
    * a lag window partitioned by (user, type) — bounded per key, never
    * per type alone — and the panel resolves through
    * [[graft.ops.OrderStats.radixRankSelect]]: both quantiles in the
    * same two domain-capped passes, no per-type ranking of the gap
    * stream (the corpus-sized partition a naive `percentile` window
    * would build). Second-granularity gaps keep the radix domain
    * bounded by the time range. */
  def interarrival(events: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("_us"), col("event_id"))
    val gaps = events
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("_us"))
      .withColumn("gap_s",
        expr("(_us - lag(_us) over (partition by user_id, event_type " +
          "order by _us, event_id)) div 1000000"))
      .filter(col("gap_s").isNotNull)
      .select(col("event_type"), col("gap_s"))
    graft.ops.OrderStats.radixRankSelect(gaps, Seq("event_type"),
        "gap_s", Seq(
        "p50" -> expr("(n + 1) div 2"),
        "p95" -> expr("(19 * n + 19) div 20")))
      .select(col("event_type"), col("n"),
        col("sel").as("quantile"), col("sel_value").as("gap_s"))
      .reportSort("event_type", "quantile")
  }

  def strInterarrival(spark: SparkSession, dir: String): DataFrame =
    interarrival(Tables.events(spark, dir))

  val strInterarrivalSql: String =
    """WITH b AS (
      |  SELECT event_type, user_id, event_id, epoch_us(ts) AS us
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |    (us - LAG(us) OVER (PARTITION BY user_id, event_type
      |       ORDER BY us, event_id)) // 1000000 AS gap_s
      |  FROM b),
      |v AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
      |h AS (
      |  SELECT event_type, gap_s, COUNT(*) AS c FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, gap_s,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s) AS hi
      |  FROM h),
      |n AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1),
      |r AS (
      |  SELECT event_type, n, unnest(['p50','p95']) AS quantile,
      |    unnest([(n+1)//2, (19*n+19)//20]) AS k
      |  FROM n)
      |SELECT r.event_type, r.n, r.quantile, MIN(c.gap_s) AS gap_s
      |FROM r JOIN cum c
      |  ON c.event_type = r.event_type AND c.hi >= r.k
      |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin

  // ----------------------------------------------- str_active_users
  /** DAU / WAU / MAU — exact rolling-distinct actives, the engagement
    * triple every product dashboard leads with, and the textbook
    * trap at scale: a naive trailing `COUNT(DISTINCT)` re-scans a
    * w-day window PER DAY (w× the corpus, and not incrementally
    * maintainable). The COVERAGE-INTERVAL rewrite is linear: a user
    * active on day a contributes to the w-day count on days
    * [a, a+w−1]; union those per-user intervals (islands via the
    * per-user lag — two intervals merge iff the next active day is
    * ≤ w after the previous), emit ±1 sweep deltas at island
    * endpoints, and ONE prefix sum over the |days| spine reads off
    * every day's exact count. One shuffle on user_id carries all
    * three window widths (1/7/30 share the sorted per-user days);
    * everything after is |days|-sized. */
  def activeUsers(events: DataFrame): DataFrame =
    activeUsersCore(events).reportSort("day")

  private def activeUsersCore(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .distinct()
    val byUser = Window.partitionBy("user_id").orderBy("day")
    val spine = ud.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(expr("sequence(_d0, _d1)")).as("day"))
    def deltas(w: Int, name: String): DataFrame = {
      val islands = ud
        .withColumn("_new",
          when(col("day") - lag(col("day"), 1).over(byUser) <= w, 0)
            .otherwise(1))
        .withColumn("_isl", sum(col("_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("_isl"))
        .agg(min(col("day")).as("s"), (max(col("day")) + (w - 1)).as("e"))
      islands.select(col("s").as("day"), lit(1L).as("d"))
        .unionByName(islands.select((col("e") + 1).as("day"),
          lit(-1L).as("d")))
        .groupBy("day").agg(sum(col("d")).as("delta"))
        .withColumn("_m", lit(name))
    }
    val all = deltas(1, "dau").unionByName(deltas(7, "wau"))
      .unionByName(deltas(30, "mau"))
    val cum = Window.partitionBy(col("_m"), pmod(col("day"), lit(1L)))
      .orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val counts = all
      .withColumn("c", sum(col("delta")).over(cum))
      .select(col("_m"), col("day"), col("c"))
    def onSpine(name: String): DataFrame = {
      // forward-fill the sweep value onto spine days with no delta:
      // the count at day d is the last sweep value at or before d
      val sweep = counts.filter(col("_m") === name)
        .select(col("day").as("_sd"), col("c"))
      spine.join(sweep, col("_sd") === col("day"), "left")
        .select(col("day"),
          coalesce(col("c"),
            last(col("c"), ignoreNulls = true).over(
              Window.partitionBy(pmod(col("day"), lit(1L)))
                .orderBy("day")
                .rowsBetween(Window.unboundedPreceding, 0)))
            .as(name))
    }
    onSpine("dau")
      .join(onSpine("wau"), "day")
      .join(onSpine("mau"), "day")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
  }

  def strActiveUsers(spark: SparkSession, dir: String): DataFrame =
    activeUsers(Tables.events(spark, dir))

  // ----------------------------------------------- str_stickiness
  /** DAU/MAU STICKINESS — the engagement-quality ratio product teams
    * track above raw actives (how much of the monthly audience shows
    * up daily): exact per-mille dau·1000 div mau on every day of the
    * spine, plus the running 7-day peak stickiness (the
    * dashboard's "best recent day" readout). Entirely derived from
    * [[activeUsers]]' coverage-interval counts — the corpus-linear
    * pass is shared; this adds only |days|-frame arithmetic and a
    * 7-row window on the spine. */
  def stickiness(events: DataFrame): DataFrame = {
    val au = activeUsersCore(events)
    au.select(col("day"), col("dau"), col("mau"),
        when(col("mau") > 0, expr("dau * 1000 div mau")).otherwise(0L)
          .as("stickiness_pm"))
      .withColumn("peak7_pm", max(col("stickiness_pm")).over(
        Window.partitionBy(pmod(col("day"), lit(1L))).orderBy("day")
          .rowsBetween(-6, 0)))
      .reportSort("day")
  }

  def strStickiness(spark: SparkSession, dir: String): DataFrame =
    stickiness(Tables.events(spark, dir))

  val strStickinessSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |sp AS (
      |  SELECT unnest(generate_series(
      |    (SELECT MIN(day) FROM ud), (SELECT MAX(day) FROM ud))) AS day),
      |c AS (
      |  SELECT sp.day,
      |    (SELECT COUNT(DISTINCT user_id) FROM ud
      |     WHERE ud.day = sp.day) AS dau,
      |    (SELECT COUNT(DISTINCT user_id) FROM ud
      |     WHERE ud.day BETWEEN sp.day - 29 AND sp.day) AS mau
      |  FROM sp),
      |s AS (
      |  SELECT day, CAST(dau AS BIGINT) AS dau, CAST(mau AS BIGINT) AS mau,
      |    CAST(CASE WHEN mau > 0 THEN dau * 1000 // mau ELSE 0 END
      |      AS BIGINT) AS stickiness_pm
      |  FROM c)
      |SELECT day, dau, mau, stickiness_pm,
      |  CAST(MAX(stickiness_pm) OVER (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS peak7_pm
      |FROM s ORDER BY day""".stripMargin

  val strActiveUsersSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |sp AS (
      |  SELECT unnest(generate_series(
      |    (SELECT MIN(day) FROM ud), (SELECT MAX(day) FROM ud))) AS day)
      |SELECT sp.day,
      |  CAST((SELECT COUNT(DISTINCT user_id) FROM ud
      |        WHERE ud.day = sp.day) AS BIGINT) AS dau,
      |  CAST((SELECT COUNT(DISTINCT user_id) FROM ud
      |        WHERE ud.day BETWEEN sp.day - 6 AND sp.day) AS BIGINT)
      |    AS wau,
      |  CAST((SELECT COUNT(DISTINCT user_id) FROM ud
      |        WHERE ud.day BETWEEN sp.day - 29 AND sp.day) AS BIGINT)
      |    AS mau
      |FROM sp ORDER BY sp.day""".stripMargin

  // ------------------------------------------------- str_attribution
  /** TOUCH ATTRIBUTION — which click gets credit for a purchase, the
    * marketing-analytics question with two canonical answers
    * (last-touch: the click immediately before; first-touch: the
    * earliest click in the attribution window): both computed in ONE
    * per-user pass with two conditional window aggregates — last
    * touch is `max(CASE click THEN ts END)` over the preceding-rows
    * frame, first touch is `min(CASE click THEN ts END)` over a 7-day
    * RANGE frame — no self-join of purchases against clicks, no
    * per-purchase re-scan. Per day: purchases, attributed purchases
    * (any click within 7 d), and how often the two models agree
    * (first == last ⇔ exactly one candidate touch) — the
    * model-sensitivity gauge. Windows are user-bounded; the day
    * roll-up is a map-side-combining hash-agg. */
  def attribution(events: DataFrame): DataFrame = {
    val week = 7L * 86400000000L
    val byRows = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val byRange = Window.partitionBy(col("user_id")).orderBy(col("_us"))
      .rangeBetween(-week, 0)
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("_us"))
    val clickUs = when(col("event_type") === "click", col("_us"))
    base
      .withColumn("last_click", max(clickUs).over(byRows))
      .withColumn("first_click_7d", min(clickUs).over(byRange))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        col("last_click").isNotNull &&
          col("last_click") >= col("_us") - week)
      .groupBy(expr("_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attributed") &&
          (col("first_click_7d") <=> col("last_click")), 1L)
          .otherwise(0L)).as("n_models_agree"))
      .withColumn("attributed_pm",
        expr("n_attributed * 1000 div n_purchases"))
      .reportSort("day")
  }

  def strAttribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(spark, dir))

  val strAttributionSql: String =
    """WITH b AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |w AS (
      |  SELECT user_id, event_id, event_type, us,
      |    MAX(CASE WHEN event_type = 'click' THEN us END) OVER (
      |      PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS last_click,
      |    MIN(CASE WHEN event_type = 'click' THEN us END) OVER (
      |      PARTITION BY user_id ORDER BY us
      |      RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |      AS first_click_7d
      |  FROM b),
      |p AS (
      |  SELECT us // 86400000000 AS day,
      |    CASE WHEN last_click IS NOT NULL
      |           AND last_click >= us - 604800000000
      |         THEN 1 ELSE 0 END AS attributed,
      |    CASE WHEN last_click IS NOT NULL
      |           AND last_click >= us - 604800000000
      |           AND first_click_7d IS NOT DISTINCT FROM last_click
      |         THEN 1 ELSE 0 END AS agree
      |  FROM w WHERE event_type = 'purchase')
      |SELECT day, COUNT(*) AS n_purchases,
      |  CAST(SUM(attributed) AS BIGINT) AS n_attributed,
      |  CAST(SUM(agree) AS BIGINT) AS n_models_agree,
      |  CAST(SUM(attributed) * 1000 // COUNT(*) AS BIGINT)
      |    AS attributed_pm
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------- str_conversion_lag
  /** TIME-TO-CONVERT cohort panel — the growth metric behind every
    * activation dashboard: for each user, the gap between their FIRST
    * signup and the first purchase strictly after it, rolled up by
    * signup-day cohort with p50/p90 through
    * [[graft.ops.OrderStats.radixRankSelect]] (both quantiles of all
    * cohorts in the same two domain-capped passes — never a per-cohort
    * sort). The user-level reduction is two min-aggregates and one
    * join keyed on user_id (bounded per key); everything after is
    * |converted users| sized. Unconverted users simply drop out —
    * the panel is over realized conversions, the censoring-aware
    * variant would carry an open-interval row. */
  def conversionLag(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("_us"))
    val signup = base.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("_us")).as("s_us"))
    val firstBuy = base.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("_us") > col("s_us"))
      .groupBy("user_id").agg(min(col("_us")).as("p_us"),
        max(col("s_us")).as("s_us"))
    val gaps = firstBuy.select(
      expr("s_us div 86400000000").as("cohort_day"),
      expr("(p_us - s_us) div 1000000").as("gap_s"))
    graft.ops.OrderStats.radixRankSelect(gaps, Seq("cohort_day"),
        "gap_s", Seq(
        "p50" -> expr("(n + 1) div 2"),
        "p90" -> expr("(9 * n + 9) div 10")))
      .select(col("cohort_day"), col("n").as("n_converted"),
        col("sel").as("quantile"), col("sel_value").as("gap_s"))
      .orderBy("cohort_day", "quantile")
  }

  def strConversionLag(spark: SparkSession, dir: String): DataFrame =
    conversionLag(Tables.events(spark, dir))

  val strConversionLagSql: String =
    """WITH b AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s AS (
      |  SELECT user_id, MIN(us) AS s_us FROM b
      |  WHERE event_type = 'signup' GROUP BY 1),
      |p AS (
      |  SELECT b.user_id, MIN(b.us) AS p_us, MAX(s.s_us) AS s_us
      |  FROM b JOIN s ON b.user_id = s.user_id
      |  WHERE b.event_type = 'purchase' AND b.us > s.s_us
      |  GROUP BY 1),
      |g AS (
      |  SELECT s_us // 86400000000 AS cohort_day,
      |    (p_us - s_us) // 1000000 AS gap_s
      |  FROM p),
      |h AS (SELECT cohort_day, gap_s, COUNT(*) AS c FROM g
      |      GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_day, gap_s,
      |    SUM(c) OVER (PARTITION BY cohort_day ORDER BY gap_s) AS hi
      |  FROM h),
      |n AS (SELECT cohort_day, COUNT(*) AS n FROM g GROUP BY 1),
      |r AS (
      |  SELECT cohort_day, n, unnest(['p50','p90']) AS quantile,
      |    unnest([(n+1)//2, (9*n+9)//10]) AS k
      |  FROM n)
      |SELECT r.cohort_day, r.n AS n_converted, r.quantile,
      |  MIN(c.gap_s) AS gap_s
      |FROM r JOIN cum c
      |  ON c.cohort_day = r.cohort_day AND c.hi >= r.k
      |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin

  // -------------------------------------------------- str_ewma_smooth
  /** EWMA smoothing with DYADIC decay (α = 1/2) — the exponential
    * moving average every monitoring stack runs over a metric stream,
    * stated so the oracle compares EXACTLY: weights are powers of two
    * (2³¹ for the newest point down to 2⁰ at lag 31, a 32-step
    * truncation whose dropped tail is < 2⁻³² of the mass), values are
    * integer milli-units, so each smoothed point is one exact BIGINT
    * dot product — no float accumulation order, no libm pow. The 32
    * lags all ride ONE window per user (bounded per key, one shuffle
    * on user_id); at 100 TB the same shape runs as a
    * mapGroupsWithState fold keeping a single running sum instead of
    * 32 lags. Reported per event type: points smoothed, the summed
    * and the max smoothed value (milli-units, weight-normalized by
    * integer division over the weights actually present at the
    * stream head). Value headroom: |vm|·2³² must stay inside BIGINT —
    * milli-scaled metrics up to ~2·10⁹ are safe; bigger metrics drop
    * the scale factor (documented seam). */
  def ewmaSmooth(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("event_id"))
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("_us"),
      expr("cast(floor(value * 1000) as long)").as("vm"))
    def term(j: Int): Column = {
      val wt = 1L << (31 - j)
      if (j == 0) col("vm") * wt
      else coalesce(lag(col("vm"), j).over(w) * wt, lit(0L))
    }
    def wterm(j: Int): Column = {
      val wt = 1L << (31 - j)
      if (j == 0) lit(wt)
      else when(lag(col("vm"), j).over(w).isNotNull, wt).otherwise(0L)
    }
    base
      .withColumn("s", (0 until 32).map(term).reduce(_ + _))
      .withColumn("wt", (0 until 32).map(wterm).reduce(_ + _))
      .withColumn("ewma_milli", expr("s div wt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("ewma_milli")).as("ewma_milli_sum"),
        max(col("ewma_milli")).as("ewma_milli_max"))
      .reportSort("event_type")
  }

  def strEwmaSmooth(spark: SparkSession, dir: String): DataFrame =
    ewmaSmooth(Tables.events(spark, dir))

  val strEwmaSmoothSql: String = {
    val terms = (0 until 32).map { j =>
      val wt = 1L << (31 - j)
      if (j == 0) s"vm * $wt"
      else s"COALESCE(LAG(vm, $j) OVER w * $wt, 0)"
    }.mkString(" + ")
    val wterms = (0 until 32).map { j =>
      val wt = 1L << (31 - j)
      if (j == 0) s"$wt"
      else s"CASE WHEN LAG(vm, $j) OVER w IS NOT NULL THEN $wt ELSE 0 END"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
       |    CAST(FLOOR(value * 1000) AS BIGINT) AS vm
       |  FROM events),
       |e AS (
       |  SELECT event_type,
       |    ($terms) AS s,
       |    ($wterms) AS wt
       |  FROM b
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
       |SELECT event_type, COUNT(*) AS n,
       |  CAST(SUM(s // wt) AS BIGINT) AS ewma_milli_sum,
       |  CAST(MAX(s // wt) AS BIGINT) AS ewma_milli_max
       |FROM e GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------- str_topk_drift
  /** Trending-drift gauge — how much of yesterday's top-5 event types
    * survives in today's (the rank-churn statistic a monitoring page
    * plots to catch feed-mix shifts that totals hide): per day the
    * top-5 types by count (deterministic name tie-break), consecutive
    * days joined on membership → shared count and per-mille overlap
    * of the union. Everything past the (day, type) collapse is
    * bounded by |days|·|types|; the top-5 rank window partitions by
    * day over that collapsed frame, never the corpus. */
  def topkDrift(events: DataFrame): DataFrame = {
    val counts = events.select(
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"),
        col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("c"))
    val top = counts
      .withColumn("_r", row_number().over(
        Window.partitionBy("day").orderBy(desc("c"), col("event_type"))))
      .filter(col("_r") <= 5)
      .select(col("day"), col("event_type"))
    val prev = top.select((col("day") + 1).as("day"),
      col("event_type").as("_pt"))
    val shared = top.join(prev,
        top("day") === prev("day") && col("event_type") === col("_pt"))
      .groupBy(top("day")).agg(count(lit(1)).as("n_shared"))
    val sizes = top.groupBy("day").agg(count(lit(1)).as("n_top"))
    val prevSizes = sizes.select((col("day") + 1).as("day"),
      col("n_top").as("_np"))
    sizes.join(prevSizes, "day")
      .join(shared, Seq("day"), "left")
      .select(timestamp_micros(col("day") * 86400000000L)
          .cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("day_start"),
        col("n_top"), col("_np").as("n_prev"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        expr("""coalesce(n_shared, 0) * 1000
                div (n_top + _np - coalesce(n_shared, 0))""")
          .as("overlap_pm"))
      .reportSort("day_start")
  }

  def strTopkDrift(spark: SparkSession, dir: String): DataFrame =
    topkDrift(Tables.events(spark, dir))

  val strTopkDriftSql: String =
    """WITH c AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT day, event_type FROM (
      |    SELECT day, event_type, ROW_NUMBER() OVER (PARTITION BY day
      |      ORDER BY c DESC, event_type) AS r
      |    FROM c)
      |  WHERE r <= 5),
      |sh AS (
      |  SELECT a.day, COUNT(*) AS n_shared
      |  FROM t a JOIN t p
      |    ON p.day = a.day - 1 AND p.event_type = a.event_type
      |  GROUP BY 1),
      |sz AS (SELECT day, COUNT(*) AS n_top FROM t GROUP BY 1)
      |SELECT make_timestamp(s.day * 86400000000) AS day_start,
      |  s.n_top, p.n_top AS n_prev,
      |  CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
      |  CAST(COALESCE(sh.n_shared, 0) * 1000
      |    // (s.n_top + p.n_top - COALESCE(sh.n_shared, 0)) AS BIGINT)
      |    AS overlap_pm
      |FROM sz s JOIN sz p ON p.day = s.day - 1
      |LEFT JOIN sh ON sh.day = s.day
      |ORDER BY day_start""".stripMargin

  // ----------------------------------------------- str_change_points
  /** Level-shift detection (CUSUM) on the daily event-count series —
    * the regime-change monitor beside [[burstiness]]' dispersion and
    * [[outageWindows]]' silences: over the zero-filled day spine, the
    * cumulative sum of (D·cᵢ − T) (each day's count against the mean,
    * scaled by D = #days so the statistic stays an exact integer —
    * no float mean), whose extremum marks the most likely change
    * point. Everything after the day collapse is bounded by the time
    * range; the |days| frame is localCheckpoint-ed so its two
    * consumers (extremum probe + report) never re-scan the corpus. */
  def changePoints(events: DataFrame): DataFrame = {
    val d = events.select(
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val spine = d.agg(min(col("day")).as("_lo"), max(col("day")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("day"))
    val f = spine.join(d, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val t = f.agg(count(lit(1)).as("_nd"), sum(col("c")).as("_tot"))
    val w = Window.partitionBy(pmod(col("day"), lit(1))).orderBy("day")
    val cu = f.crossJoin(broadcast(t))
      .withColumn("cusum",
        sum(col("c") * col("_nd") - col("_tot")).over(w))
      .cut
    val mx = cu.agg(max(abs(col("cusum"))).as("_m"))
    cu.crossJoin(broadcast(mx))
      .select(timestamp_micros(col("day") * 86400000000L)
          .cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("day_start"),
        col("c"), col("cusum"),
        (abs(col("cusum")) === col("_m")).as("is_peak"))
      .reportSort("day_start")
  }

  // ----------------------------------------------- str_burn_rate
  /** MULTI-WINDOW ERROR-BUDGET BURN RATE — the SRE alerting classic
    * (fast-burn alerts need BOTH a short and a long window hot, or a
    * brief spike pages at 3 am while a slow leak never does): the
    * error share of each 6 h window, expressed as a per-mille BURN
    * vs the stream's own global error share (self-calibrating — no
    * configured SLO constant to drift), plus the hottest 1 h burn
    * inside the window; alert = 6 h burn ≥ 1500‰ AND some 1 h burn ≥
    * 2000‰. Shape: one corpus scan → |hours| hash-agg; the 6 h
    * rollup, the global budget, and the alert rule all ride that
    * pinned bounded frame. Exact integer ppm/per-mille throughout. */
  def burnRate(events: DataFrame): DataFrame = {
    val hours = events.select(
        expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("h"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("e"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), sum(col("e")).as("n_err"))
      .cut
    val glob = hours.agg(sum(col("n")).as("gn"),
      sum(col("n_err")).as("ge"))
    // burn vs global share with integer cross-products: burn_pm =
    // 1000 · (err/n) / (ge/gn) = err·gn·1000 div (n·ge)
    val perHour = hours.crossJoin(broadcast(glob))
      .select((col("h") - (col("h") % 6)).as("w6"), col("h"),
        col("n"), col("n_err"), col("gn"), col("ge"),
        expr("n_err * gn * 1000 div (n * ge)").as("burn_1h_pm"))
    perHour.groupBy("w6")
      .agg(sum(col("n")).as("n"), sum(col("n_err")).as("n_err"),
        max(col("burn_1h_pm")).as("max_burn_1h_pm"),
        max(col("gn")).as("_gn"), max(col("ge")).as("_ge"))
      .select(col("w6").cast("long").as("window6h"),
        col("n"), col("n_err"),
        expr("n_err * 1000000 div n").as("err_ppm"),
        expr("n_err * _gn * 1000 div (n * _ge)").as("burn_6h_pm"),
        col("max_burn_1h_pm"))
      .withColumn("alert",
        col("burn_6h_pm") >= 1500 && col("max_burn_1h_pm") >= 2000)
      .reportSort("window6h")
  }

  def strBurnRate(spark: SparkSession, dir: String): DataFrame =
    burnRate(Tables.events(spark, dir))

  val strBurnRateSql: String =
    """WITH hrs AS (
      |  SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n,
      |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS n_err
      |  FROM events GROUP BY 1),
      |g AS (SELECT SUM(n) AS gn, SUM(n_err) AS ge FROM hrs),
      |ph AS (
      |  SELECT h - (h % 6) AS w6, n, n_err,
      |    n_err * gn * 1000 // (n * ge) AS burn_1h_pm
      |  FROM hrs, g),
      |w AS (
      |  SELECT w6, SUM(n) AS n, SUM(n_err) AS n_err,
      |    MAX(burn_1h_pm) AS max_burn_1h_pm
      |  FROM ph GROUP BY w6)
      |SELECT CAST(w6 AS BIGINT) AS window6h,
      |  CAST(n AS BIGINT) AS n, CAST(n_err AS BIGINT) AS n_err,
      |  CAST(n_err * 1000000 // n AS BIGINT) AS err_ppm,
      |  CAST(n_err * gn * 1000 // (n * ge) AS BIGINT) AS burn_6h_pm,
      |  CAST(max_burn_1h_pm AS BIGINT) AS max_burn_1h_pm,
      |  n_err * gn * 1000 // (n * ge) >= 1500
      |    AND max_burn_1h_pm >= 2000 AS alert
      |FROM w, g ORDER BY window6h""".stripMargin

  // ----------------------------------------------- str_mann_kendall
  /** MANN–KENDALL monotonic-trend test per event type — the
    * distribution-free companion to [[changePoints]] (CUSUM finds a
    * level SHIFT; Mann–Kendall asks whether the whole series drifts
    * monotonically): S = Σ_{i<j} sign(cⱼ − cᵢ) over the daily count
    * series, exact integers, with the concordant/discordant/tie
    * census the variance formula needs. The corpus collapses to the
    * |types × days| frame in ONE hash-agg; the pair join is a self-
    * join of THAT frame (bounded by the time range squared — ~130 k
    * pairs per type at a year of days — never by corpus size).
    * Verdict: rising / falling / flat by sign(S) with a |S| >
    * n(n−1)/10 materiality gate (a tenth of the maximum attainable
    * S). */
  def mannKendall(events: DataFrame): DataFrame = {
    val d = events.select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .cut
    val pairs = d.as("a").join(d.as("b"),
      col("a.event_type") === col("b.event_type") &&
        col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        signum(col("b.c") - col("a.c")).cast("long").as("sgn"))
    pairs.groupBy("event_type")
      .agg(sum(col("sgn")).as("s_stat"),
        sum(when(col("sgn") > 0, 1L).otherwise(0L)).as("n_concordant"),
        sum(when(col("sgn") < 0, 1L).otherwise(0L)).as("n_discordant"),
        sum(when(col("sgn") === 0, 1L).otherwise(0L)).as("n_tie"))
      .join(d.groupBy("event_type").agg(count(lit(1)).as("n_days")),
        Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        col("n_concordant"), col("n_discordant"), col("n_tie"),
        when(col("s_stat") * 10 > col("n_days") * (col("n_days") - 1),
          "rising")
          .when(col("s_stat") * -10 > col("n_days") * (col("n_days") - 1),
            "falling")
          .otherwise("flat").as("trend"))
      .reportSort("event_type")
  }

  def strMannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendall(Tables.events(spark, dir))

  val strMannKendallSql: String =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type,
      |    CAST(SIGN(b.c - a.c) AS BIGINT) AS sgn
      |  FROM d a JOIN d b
      |    ON a.event_type = b.event_type AND a.day < b.day),
      |s AS (
      |  SELECT event_type, SUM(sgn) AS s_stat,
      |    SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS n_concordant,
      |    SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS n_discordant,
      |    SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS n_tie
      |  FROM p GROUP BY event_type),
      |nd AS (SELECT event_type, COUNT(*) AS n_days FROM d GROUP BY 1)
      |SELECT s.event_type, nd.n_days,
      |  CAST(s.s_stat AS BIGINT) AS s_stat,
      |  CAST(s.n_concordant AS BIGINT) AS n_concordant,
      |  CAST(s.n_discordant AS BIGINT) AS n_discordant,
      |  CAST(s.n_tie AS BIGINT) AS n_tie,
      |  CASE WHEN s.s_stat * 10 > nd.n_days * (nd.n_days - 1)
      |       THEN 'rising'
      |       WHEN s.s_stat * -10 > nd.n_days * (nd.n_days - 1)
      |       THEN 'falling' ELSE 'flat' END AS trend
      |FROM s JOIN nd USING (event_type)
      |ORDER BY event_type""".stripMargin

  def strChangePoints(spark: SparkSession, dir: String): DataFrame =
    changePoints(Tables.events(spark, dir))

  val strChangePointsSql: String =
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1),
      |sp AS (
      |  SELECT unnest(range((SELECT MIN(day) FROM d),
      |                      (SELECT MAX(day) FROM d) + 1)) AS day),
      |f AS (
      |  SELECT sp.day, COALESCE(d.c, 0) AS c
      |  FROM sp LEFT JOIN d ON sp.day = d.day),
      |t AS (SELECT COUNT(*) AS nd, SUM(c) AS tot FROM f),
      |cu AS (
      |  SELECT day, c, SUM(c * t.nd - t.tot) OVER (ORDER BY day)
      |    AS cusum
      |  FROM f CROSS JOIN t),
      |mx AS (SELECT MAX(ABS(cusum)) AS m FROM cu)
      |SELECT make_timestamp(day * 86400000000) AS day_start,
      |  CAST(c AS BIGINT) AS c, CAST(cusum AS BIGINT) AS cusum,
      |  (ABS(cusum) = mx.m) AS is_peak
      |FROM cu CROSS JOIN mx ORDER BY day_start""".stripMargin

  // -------------------------------------------- str_seasonal_error
  /** SEASONAL-NAIVE FORECAST ERROR (the MASE decomposition) — the
    * "is this series actually predictable, and does weekly
    * seasonality help" gauge every capacity/forecast pipeline runs
    * before fitting anything: per event type, the lag-7
    * seasonal-naive forecast's absolute error is summed against the
    * lag-1 naive error on a GAP-FREE daily spine (missing days count
    * 0 — skipping them would silently compare non-adjacent days).
    * `mase_e6` = 1e6 · Σ|err₇| / Σ|err₁| stays exact-integer
    * (non-negative operands, so Spark `div` ≡ DuckDB `//`): below
    * 1e6 the weekly pattern beats persistence. Shape: one events
    * scan → (type, day) hash-agg; the spine and lags live on the
    * tiny per-type day frame — windows all type-partitioned. */
  def seasonalError(events: DataFrame): DataFrame = {
    val d = events.select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val spine = d.groupBy("event_type")
      .agg(min(col("day")).as("_lo"), max(col("day")).as("_hi"))
      .select(col("event_type"),
        explode(sequence(col("_lo"), col("_hi"))).as("day"))
    val f = spine.join(d, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    f.withColumn("l7", lag(col("c"), 7).over(w))
      .withColumn("l1", lag(col("c"), 1).over(w))
      .filter(col("l7").isNotNull && col("l1").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("c") - col("l7"))).as("abs_err7"),
        sum(abs(col("c") - col("l1"))).as("abs_err1"))
      .withColumn("mase_e6", when(col("abs_err1") > 0,
        expr("abs_err7 * 1000000 div abs_err1")))
      .reportSort("event_type")
  }

  def strSeasonalError(spark: SparkSession, dir: String): DataFrame =
    seasonalError(Tables.events(spark, dir))

  val strSeasonalErrorSql: String =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
      |      FROM d GROUP BY 1),
      |sp AS (SELECT event_type, unnest(range(lo, hi + 1)) AS day
      |       FROM b),
      |f AS (
      |  SELECT sp.event_type, sp.day, COALESCE(d.c, 0) AS c
      |  FROM sp LEFT JOIN d
      |    ON sp.event_type = d.event_type AND sp.day = d.day),
      |l AS (
      |  SELECT event_type, c,
      |    LAG(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7,
      |    LAG(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1
      |  FROM f)
      |SELECT event_type, COUNT(*) AS n_days,
      |  CAST(SUM(ABS(c - l7)) AS BIGINT) AS abs_err7,
      |  CAST(SUM(ABS(c - l1)) AS BIGINT) AS abs_err1,
      |  CASE WHEN SUM(ABS(c - l1)) > 0
      |    THEN CAST(SUM(ABS(c - l7)) * 1000000 // SUM(ABS(c - l1))
      |      AS BIGINT) END AS mase_e6
      |FROM l WHERE l7 IS NOT NULL AND l1 IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------- str_interpolate
  /** LINEAR-INTERPOLATION RECONSTRUCTION AUDIT — gap repair with a
    * built-in quality measurement: every 5th day of each type's
    * daily revenue series is deterministically HELD OUT
    * ((7·day + len(type)) mod 5 = 2 — replayable in any engine, and
    * never two adjacent days), the held days are re-estimated by
    * linear interpolation between their nearest VISIBLE neighbors,
    * and the audit reports the exact reconstruction error — the
    * number a pipeline needs before trusting interpolation to fill
    * real telemetry gaps. Exact integers throughout: the
    * interpolated milli-value is (v_prev·(d_next−d) +
    * v_next·(d−d_prev))·1000 div (d_next−d_prev) — every operand
    * non-negative (revenues are sums of positive cents), so
    * truncating and flooring division agree. The neighbor lookup is
    * the forward-fill pattern run both directions
    * (last/first IGNORE NULLS over the type-partitioned spine). */
  def strInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir).select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum(col("cents")).as("v"))
    val spine = d.groupBy("event_type")
      .agg(min(col("day")).as("_lo"), max(col("day")).as("_hi"))
      .select(col("event_type"),
        explode(sequence(col("_lo"), col("_hi"))).as("day"))
    val f = spine.join(d, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("v"), lit(0L)).as("v"))
      .withColumn("held",
        pmod(col("day") * 7 + length(col("event_type")), lit(5)) === 2)
      .withColumn("vis_v", when(!col("held"), col("v")))
      .withColumn("vis_d", when(!col("held"), col("day")))
    val before = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(1, Window.unboundedFollowing)
    f.withColumn("vp", last(col("vis_v"), ignoreNulls = true).over(before))
      .withColumn("dp", last(col("vis_d"), ignoreNulls = true).over(before))
      .withColumn("vn", first(col("vis_v"), ignoreNulls = true).over(after))
      .withColumn("dn", first(col("vis_d"), ignoreNulls = true).over(after))
      .filter(col("held") && col("vp").isNotNull && col("vn").isNotNull)
      .withColumn("interp_milli", expr(
        "(vp * (dn - day) + vn * (day - dp)) * 1000 div (dn - dp)"))
      .withColumn("err_milli", abs(col("v") * 1000 - col("interp_milli")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_held"),
        sum(col("v") * 1000).as("true_milli"),
        sum(col("err_milli")).as("abs_err_milli"),
        max(col("err_milli")).as("max_err_milli"))
      .reportSort("event_type")
  }

  val strInterpolateSql: String =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
      |      FROM d GROUP BY 1),
      |sp AS (SELECT event_type, unnest(range(lo, hi + 1)) AS day
      |       FROM b),
      |f AS (
      |  SELECT sp.event_type, sp.day, COALESCE(d.v, 0) AS v,
      |    (sp.day * 7 + LENGTH(sp.event_type)) % 5 = 2 AS held
      |  FROM sp LEFT JOIN d
      |    ON sp.event_type = d.event_type AND sp.day = d.day),
      |n AS (
      |  SELECT *,
      |    LAST_VALUE(CASE WHEN NOT held THEN v END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
      |    LAST_VALUE(CASE WHEN NOT held THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dp,
      |    FIRST_VALUE(CASE WHEN NOT held THEN v END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn,
      |    FIRST_VALUE(CASE WHEN NOT held THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS dn
      |  FROM f),
      |e AS (
      |  SELECT event_type, v,
      |    ABS(v * 1000 - (vp * (dn - day) + vn * (day - dp)) * 1000
      |      // (dn - dp)) AS err_milli
      |  FROM n
      |  WHERE held AND vp IS NOT NULL AND vn IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n_held,
      |  CAST(SUM(v * 1000) AS BIGINT) AS true_milli,
      |  CAST(SUM(err_milli) AS BIGINT) AS abs_err_milli,
      |  CAST(MAX(err_milli) AS BIGINT) AS max_err_milli
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------- str_rate_limit
  /** SLIDING-WINDOW RATE-LIMIT AUDIT — replay a token-bucket-style
    * policy ("≤ 5 events per user per trailing 24 h") over the event
    * log and report, per event type, how often and how hard it would
    * have fired: the capacity-planning / abuse-detection readout that
    * decides a production limit before it is enforced. The trailing
    * count is ONE event-time RANGE frame per user (partition key =
    * user_id, the high-cardinality axis — state per task is bounded by
    * one user's 24 h of events, never the stream); violations and the
    * distinct-offender count are plain hash-aggs on top. RANGE (not
    * ROWS) makes simultaneous events peers in both engines, so the
    * audit is deterministic under timestamp ties. */
  def strRateLimit(spark: SparkSession, dir: String): DataFrame =
    rateLimit(Tables.events(spark, dir))

  def rateLimit(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val limit = 5L
    val b = events.select(col("user_id"),
      col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-86399999999L, Window.currentRow)
    val counted = b.withColumn("c", count(lit(1)).over(w))
    counted.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("c") > limit, 1L).otherwise(0L)).as("n_violations"),
        max(col("c")).as("max_window_count"),
        countDistinct(when(col("c") > limit, col("user_id")))
          .as("n_offending_users"))
      .reportSort("event_type")
  }

  val strRateLimitSql: String =
    """WITH b AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |w AS (
      |  SELECT user_id, event_type,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY us
      |      RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW) AS c
      |  FROM b)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN c > 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violations,
      |  CAST(MAX(c) AS BIGINT) AS max_window_count,
      |  COUNT(DISTINCT CASE WHEN c > 5 THEN user_id END)
      |    AS n_offending_users
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------- str_window_p95
  /** Exact per-window tail latency (p95) — the SLO gauge every
    * monitoring pipeline publishes, in the only shape that scales:
    * values widen to exact integer cents, ONE (window, value)
    * hash-agg collapses the stream to its per-window value histogram
    * (map-side combining — the corpus-sized pass), and the rank
    * selection (smallest value whose cumulative count reaches
    * ⌈0.95·n⌉) runs inside windows over the DISTINCT-value frame —
    * never a per-row sort. In streaming deployment the histogram is
    * the watermark-bounded state and the selection is the per-trigger
    * fold; here the batch form pins the exact answer. */
  def windowP95(events: DataFrame): DataFrame = {
    val ev = events.select(
      (expr("unix_micros(cast(ts as timestamp)) div 21600000000") *
        21600000000L).as("w_us"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
        .as("cents"))
    val h = ev.groupBy("w_us", "cents").agg(count(lit(1)).as("c"))
    val byW = Window.partitionBy("w_us").orderBy("cents")
    h.withColumn("cum", sum(col("c")).over(
        byW.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("w_us")))
      .filter(col("cum") >= expr("(n * 95 + 99) div 100"))
      .groupBy("w_us", "n")
      .agg(min(col("cents")).as("p95_cents"))
      .select(col("w_us"), col("n"), col("p95_cents"))
      .reportSort("w_us")
  }

  def strWindowP95(spark: SparkSession, dir: String): DataFrame =
    windowP95(Tables.events(spark, dir))

  val strWindowP95Sql: String =
    """WITH h AS (
      |  SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS w_us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT w_us, cents, c,
      |    SUM(c) OVER (PARTITION BY w_us ORDER BY cents) AS cum,
      |    SUM(c) OVER (PARTITION BY w_us) AS n
      |  FROM h)
      |SELECT w_us, CAST(n AS BIGINT) AS n,
      |  CAST(MIN(cents) AS BIGINT) AS p95_cents
      |FROM r WHERE cum >= (n * 95 + 99) // 100
      |GROUP BY w_us, n ORDER BY w_us""".stripMargin

  // --------------------------------------------------- str_debounce
  /** ALERT DEBOUNCE — the flapping filter between a state-change
    * detector and a pager: a per-user state transition only COUNTS if
    * the new state persists ≥ 30 min (the next change comes later, or
    * never) — rapid A→B→A flaps collapse instead of paging twice.
    * Two user-bounded window passes (lag to find changes, lead over
    * the changes-only frame to test persistence); the per-state
    * rollup reports the flap rate that tells an operator whether the
    * threshold is right. Deterministic (ts, event_id) ordering makes
    * the change sequence oracle-exact. */
  def debounce(events: DataFrame, holdUs: Long = 1800000000L): DataFrame = {
    val byU = Window.partitionBy("user_id")
      .orderBy("us", "event_id")
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val changes = base
      .withColumn("_prev", lag(col("event_type"), 1).over(byU))
      .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
    val persisted = changes
      .withColumn("_nxt", lead(col("us"), 1).over(byU))
      .withColumn("_hold",
        col("_nxt").isNull || col("_nxt") - col("us") > holdUs)
    persisted.groupBy(col("event_type").as("state"))
      .agg(count(lit(1)).as("n_changes"),
        sum(when(col("_hold"), 1L).otherwise(0L)).as("n_persisted"))
      .withColumn("flap_pm",
        expr("(n_changes - n_persisted) * 1000 div n_changes"))
      .reportSort("state")
  }

  def strDebounce(spark: SparkSession, dir: String): DataFrame =
    debounce(Tables.events(spark, dir))

  val strDebounceSql: String =
    """WITH b AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |lg AS (
      |  SELECT *, LAG(event_type) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id) AS prev
      |  FROM b),
      |ch AS (
      |  SELECT user_id, event_id, event_type, us FROM lg
      |  WHERE prev IS NULL OR prev <> event_type),
      |p AS (
      |  SELECT event_type,
      |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS nxt, us
      |  FROM ch)
      |SELECT event_type AS state, COUNT(*) AS n_changes,
      |  CAST(SUM(CASE WHEN nxt IS NULL OR nxt - us > 1800000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_persisted,
      |  CAST((COUNT(*) - SUM(CASE WHEN nxt IS NULL OR nxt - us >
      |    1800000000 THEN 1 ELSE 0 END)) * 1000 // COUNT(*) AS BIGINT)
      |    AS flap_pm
      |FROM p GROUP BY 1 ORDER BY state""".stripMargin

  // --------------------------------------------- str_watermark_skew
  /** PER-SHARD WATERMARK SKEW — the "one slow partition holds the
    * whole watermark" audit every multi-partition streaming job needs
    * (Spark's global watermark is the MIN across input partitions, so
    * a single stalled shard delays every downstream window close):
    * shards stand in as `user_id % 8`, each (window, shard) reports
    * its high-water event time, and the window row carries the skew
    * (fast shard minus slow shard), the effective global watermark,
    * and WHICH shard held it back (min-encoded as hi·8+shard — one
    * aggregate, deterministic tie-break to the smallest shard id).
    * Two mergeable hash-aggs, output at window grain — state at
    * 100 TB is |windows × shards|, never events. */
  def watermarkSkew(events: DataFrame): DataFrame = {
    val e = events.select(
      window(col("ts"), "6 hours").getField("start").as("window_start"),
      pmod(col("user_id"), lit(8L)).as("shard"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    e.groupBy("window_start", "shard")
      .agg(max(col("us")).as("hi"), count(lit(1)).as("n"))
      .groupBy("window_start")
      .agg(count(lit(1)).as("n_shards"),
        sum(col("n")).as("n_events"),
        (max(col("hi")) - min(col("hi"))).as("skew_us"),
        min(col("hi") * 8 + col("shard")).as("_enc"))
      .select(col("window_start"), col("n_shards"), col("n_events"),
        col("skew_us"),
        expr("_enc div 8").as("wm_us"),
        expr("_enc % 8").as("laggard_shard"))
      .reportSort("window_start")
  }

  def strWatermarkSkew(spark: SparkSession, dir: String): DataFrame =
    watermarkSkew(Tables.events(spark, dir))

  /** Streaming-compatible reshape of [[watermarkSkew]]: the per-shard
    * maxima land in ONE wide aggregate (8 conditional `max` columns —
    * Structured Streaming forbids stacked aggregations, so the
    * two-level batch form can't stream), and skew / global watermark /
    * laggard derive row-locally with null-skipping greatest/least
    * (an absent shard contributes nothing, matching the batch
    * grouping). Same output contract as the batch form; StreamingSpec
    * pins agreement and folds micro-batch updates to the final
    * panel. */
  def watermarkSkewWide(events: DataFrame): DataFrame = {
    val e = events.select(
      window(col("ts"), "6 hours").getField("start").as("window_start"),
      pmod(col("user_id"), lit(8L)).as("shard"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val aggCols = (0 until 8).map(s =>
      max(when(col("shard") === s, col("us"))).as(s"h$s")) :+
      count(lit(1)).as("n_events")
    val wide = e.groupBy("window_start")
      .agg(aggCols.head, aggCols.tail: _*)
    val hs = (0 until 8).map(s => col(s"h$s"))
    val enc = (0 until 8).map(s => col(s"h$s") * 8 + lit(s.toLong))
    wide.select(col("window_start"),
      hs.map(h => when(h.isNotNull, 1L).otherwise(0L))
        .reduce(_ + _).as("n_shards"),
      col("n_events"),
      (greatest(hs: _*) - least(hs: _*)).as("skew_us"),
      // >> 3, not /8: the encoded micros exceed double's 2^53 grid
      shiftright(least(enc: _*), 3).as("wm_us"),
      pmod(least(enc: _*), lit(8L)).as("laggard_shard"))
  }

  val strWatermarkSkewSql: String =
    """WITH e AS (
      |  SELECT make_timestamp((epoch_us(ts) // 21600000000)
      |      * 21600000000) AS window_start,
      |    user_id % 8 AS shard, epoch_us(ts) AS us
      |  FROM events),
      |s AS (
      |  SELECT window_start, shard, MAX(us) AS hi, COUNT(*) AS n
      |  FROM e GROUP BY 1, 2)
      |SELECT window_start, COUNT(*) AS n_shards,
      |  CAST(SUM(n) AS BIGINT) AS n_events,
      |  CAST(MAX(hi) - MIN(hi) AS BIGINT) AS skew_us,
      |  CAST(MIN(hi * 8 + shard) // 8 AS BIGINT) AS wm_us,
      |  CAST(MIN(hi * 8 + shard) % 8 AS BIGINT) AS laggard_shard
      |FROM s GROUP BY 1 ORDER BY window_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_watermark_skew" -> (strWatermarkSkew _),
    "str_window_p95" -> (strWindowP95 _),
    "str_stickiness" -> (strStickiness _),
    "str_debounce" -> (strDebounce _),
    "str_rate_limit" -> (strRateLimit _),
    "str_seasonal_error" -> (strSeasonalError _),
    "str_interpolate" -> (strInterpolate _),
    "str_running_slope" -> (strRunningSlope _),
    "str_sax_symbols" -> (strSaxSymbols _),
    "str_queue_depth" -> (strQueueDepth _),
    "str_interarrival" -> (strInterarrival _),
    "str_ewma_smooth" -> (strEwmaSmooth _),
    "str_conversion_lag" -> (strConversionLag _),
    "str_active_users" -> (strActiveUsers _),
    "str_attribution" -> (strAttribution _),
    "str_change_points" -> (strChangePoints _),
    "str_mann_kendall" -> (strMannKendall _),
    "str_burn_rate" -> (strBurnRate _),
    "str_topk_drift" -> (strTopkDrift _),
    "str_concurrency" -> (strConcurrency _),
    "str_outage_windows" -> (strOutageWindows _),
    "str_burstiness" -> (strBurstiness _),
    "str_lateness_audit" -> (strLatenessAudit _),
    "str_distinct_windowed" -> (strDistinctWindowed _),
    "str_cep_pattern" -> (strCepPattern _),
    "str_anomaly" -> (strAnomaly _),
    "str_retention" -> (strRetention _),
    "str_transitions" -> (strTransitions _),
    "str_funnel" -> (strFunnel _),
    "str_interval_outer" -> (strIntervalOuter _),
    "str_topk_windowed" -> (strTopkWindowed _),
    "str_static_enrich" -> (strStaticEnrich _),
    "str_interval_join" -> (strIntervalJoin _),
    "str_asof_lookup" -> (strAsofLookup _),
    "str_tumbling_agg" -> (strTumbling _),
    "str_sliding_agg" -> (strSliding _),
    "str_sessionize" -> (strSessionize _),
    "str_dedup_watermark" -> (strDedup _),
    "str_asof_join" -> (strAsof _),
    "str_asof_exec" -> (strAsofExec _))

  val oracles: Map[String, String] = Map(
    "str_watermark_skew" -> strWatermarkSkewSql,
    "str_window_p95" -> strWindowP95Sql,
    "str_stickiness" -> strStickinessSql,
    "str_debounce" -> strDebounceSql,
    "str_rate_limit" -> strRateLimitSql,
    "str_seasonal_error" -> strSeasonalErrorSql,
    "str_interpolate" -> strInterpolateSql,
    "str_running_slope" -> strRunningSlopeSql,
    "str_sax_symbols" -> strSaxSymbolsSql,
    "str_queue_depth" -> strQueueDepthSql,
    "str_interarrival" -> strInterarrivalSql,
    "str_ewma_smooth" -> strEwmaSmoothSql,
    "str_conversion_lag" -> strConversionLagSql,
    "str_active_users" -> strActiveUsersSql,
    "str_attribution" -> strAttributionSql,
    "str_change_points" -> strChangePointsSql,
    "str_mann_kendall" -> strMannKendallSql,
    "str_burn_rate" -> strBurnRateSql,
    "str_topk_drift" -> strTopkDriftSql,
    "str_concurrency" -> strConcurrencySql,
    "str_outage_windows" -> strOutageWindowsSql,
    "str_burstiness" -> strBurstinessSql,
    "str_lateness_audit" -> strLatenessAuditSql,
    "str_distinct_windowed" -> strDistinctWindowedSql,
    "str_cep_pattern" -> strCepPatternSql,
    "str_anomaly" -> strAnomalySql,
    "str_retention" -> strRetentionSql,
    "str_transitions" -> strTransitionsSql,
    "str_funnel" -> strFunnelSql,
    "str_interval_outer" -> strIntervalOuterSql,
    "str_topk_windowed" -> strTopkWindowedSql,
    "str_static_enrich" -> strStaticEnrichSql,
    "str_interval_join" -> strIntervalJoinSql,
    "str_asof_lookup" -> strAsofSql, // same oracle as the window form
    "str_tumbling_agg" -> strTumblingSql,
    "str_sliding_agg" -> strSlidingSql,
    "str_sessionize" -> strSessionizeSql,
    "str_dedup_watermark" -> strDedupSql,
    "str_asof_join" -> strAsofSql,
    "str_asof_exec" -> strAsofSql)
}
