package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Arbitrary-stateful streaming via typed
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the escape hatch
  * for semantics windowed aggregation can't express (cross-batch
  * running state, custom eviction). State lives per key in the state
  * store, bounded by timeouts at scale.
  */
object Stateful {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  /** Event-time micros matching `unix_micros(ts)` exactly —
    * `getTime` alone truncates sub-millisecond precision, so window
    * membership near a boundary would diverge from the batch RANGE
    * frame for events carrying non-zero micro components. */
  @inline def eventMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Running per-user event count + value total, updated each
    * micro-batch and carried across batches in the state store.
    * Emits the updated state for every key seen in the batch. */
  def runningTotals(events: Dataset[EventRow]): Dataset[UserRunning] = {
    implicit val stateEnc = Encoders.product[UserRunning]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          Iterator(next)
      }
  }

  // ------------------------------------------- streaming queue depth
  /** Per-type Lindley state: previous arrival (ms), its service
    * demand, current backlog, plus the running audit moments. */
  final case class QueueState(lastT: Long, lastS: Long, w: Long,
      n: Long, wMax: Long, wSum: Long, busy: Long)

  final case class QueueDepth(event_type: String, n: Long,
      w_max_ms: Long, w_mean_ms: Long, busy_pm: Long)

  /** STREAMING form of the batch queue-depth audit
    * ([[EventStreams.strQueueDepth]]): where batch rewrites the
    * Lindley recursion as a max-plus prefix scan, the streaming form
    * runs the recursion LITERALLY — per key the state is O(1) (last
    * arrival, its service demand, current backlog, audit moments),
    * the natural shape for `flatMapGroupsWithState`. Within a
    * micro-batch rows sort by (event-time, id); across batches
    * arrival must respect per-key time order (the SCD2 contract —
    * what a watermark provides upstream). StreamingSpec pins exact
    * agreement with the batch scan on the same events. */
  def queueDepthUpdates(events: Dataset[EventRow]): Dataset[QueueDepth] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val stateEnc = Encoders.product[QueueState]
    implicit val outEnc = Encoders.product[QueueDepth]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[QueueState, QueueDepth](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[EventRow],
            state: org.apache.spark.sql.streaming.GroupState[QueueState]) =>
          val sorted = rows.toSeq
            .sortBy(e => (eventMicros(e.ts), e.event_id))
          var st = state.getOption
            .getOrElse(QueueState(-1L, 0L, 0L, 0L, 0L, 0L, 0L))
          sorted.foreach { e =>
            val t = eventMicros(e.ts) / 1000L
            val s = math.floor(e.value * 100).toLong * 200L
            val w =
              if (st.lastT < 0) 0L
              else math.max(0L, st.w + st.lastS - (t - st.lastT))
            st = QueueState(t, s, w, st.n + 1,
              math.max(st.wMax, w), st.wSum + w,
              st.busy + (if (w > 0) 1L else 0L))
          }
          state.update(st)
          Iterator(QueueDepth(g, st.n, st.wMax,
            st.wSum / st.n, st.busy * 1000L / st.n))
      }
  }

  // -------------------------------------------------- streaming SCD2
  final case class ChangeRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, value: Double, op: String)

  final case class Scd2Closed(user_id: Long, event_id: Long, value: Double,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Per-key SCD2 state: the currently-open version (public — encoder
    * codegen must reach the accessors). */
  final case class Scd2Open(event_id: Long, value: Double,
      ts: java.sql.Timestamp, stillOpen: Boolean)

  /** INCREMENTAL SCD type-2 maintenance — the CDC-target pattern the
    * batch [[graft.cdc.CdcQueries.scd2History]] builds in one pass,
    * here maintained change-by-change across micro-batches: per key
    * the state holds the currently-open version; each arriving change
    * CLOSES it (emitting the finished validity interval, with deletes
    * closing-without-reopening) and non-deletes open the next version.
    * Emitted rows are exactly the batch history's `valid_to IS NOT
    * NULL` rows (CdcSpec pins that), and the open rows live only in
    * the state store — O(1) state per key, the scale contract.
    * Within a micro-batch, rows sort by (ts, event_id); ACROSS
    * batches arrival must respect event order per key (upstream
    * watermark reordering — cdc_ooo_audit measures how much a real
    * feed needs). */
  def scd2Closed(changes: Dataset[ChangeRow]): Dataset[Scd2Closed] = {
    implicit val stateEnc = Encoders.product[Scd2Open]
    implicit val outEnc = Encoders.product[Scd2Closed]
    implicit val keyEnc = Encoders.scalaLong
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2Open, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[ChangeRow], state: GroupState[Scd2Open]) =>
          // order by TRUE event time (micros) — ms-truncated getTime
          // would tie same-millisecond events and fall back to
          // event_id, diverging from the batch frame's micros order
          val ordered = rows.toSeq.sortBy(c => (eventMicros(c.ts), c.event_id))
          var open = state.getOption.filter(_.stillOpen)
          val out = Seq.newBuilder[Scd2Closed]
          ordered.foreach { c =>
            open.foreach { o =>
              out += Scd2Closed(uid, o.event_id, o.value, o.ts, c.ts)
            }
            open = if (c.op != "d")
              Some(Scd2Open(c.event_id, c.value, c.ts, stillOpen = true))
            else None
          }
          state.update(open.getOrElse(Scd2Open(0L, 0.0, null, stillOpen = false)))
          out.result().iterator
      }
  }

  // ------------------------------------------- streaming retention
  /** One retention fact per (user, cohort, offset). */
  final case class RetentionFact(user_id: Long, cohort_day: java.sql.Date,
      day_offset: Long)

  /** Per-user retention state: cohort as epoch-day plus a bitmask of
    * the ≤8 offsets already emitted — 12 bytes per user, the bounded-
    * state contract (public — encoder codegen reaches accessors). */
  final case class RetentionState(cohortDay: Int, emitted: Long)

  /** INCREMENTAL cohort retention — the streaming form of
    * [[EventStreams.strRetention]]'s batch table: per user the state
    * store holds (cohort epoch-day, emitted-offset bitmask), and each
    * micro-batch emits exactly one fact per NEW (cohort, offset ≤ 7)
    * pair, so a downstream `COUNT(*)` per (cohort_day, day_offset)
    * over the emitted stream IS the batch table's
    * `COUNT(DISTINCT user_id)` — the distinct is enforced by the
    * bitmask, not a shuffle. Cohort = first-SEEN day: agreement with
    * the batch min() is exact when a user's earliest day arrives in
    * their first batch (event-time-ordered feeds); a later-arriving
    * earlier day re-bases the cohort for FUTURE facts but append mode
    * cannot retract already-emitted ones — the same horizon contract
    * scd2Closed documents. */
  def retentionUpdates(events: Dataset[EventRow]): Dataset[RetentionFact] = {
    implicit val stateEnc = Encoders.product[RetentionState]
    implicit val outEnc = Encoders.product[RetentionFact]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow],
            state: GroupState[RetentionState]) =>
          val days = rows.map(e =>
            e.ts.toLocalDateTime.toLocalDate.toEpochDay.toInt).toSeq
          val prev = state.getOption
          val cohort = math.min(prev.map(_.cohortDay)
            .getOrElse(Int.MaxValue), days.min)
          var emitted = prev match {
            case Some(s) if s.cohortDay == cohort => s.emitted
            case _ => 0L // first sight, or a re-base: offsets restart
          }
          val out = Seq.newBuilder[RetentionFact]
          days.sorted.foreach { d =>
            val off = d - cohort
            if (off >= 0 && off <= 7 && (emitted & (1L << off)) == 0L) {
              emitted |= 1L << off
              out += RetentionFact(uid,
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(cohort.toLong)),
                off.toLong)
            }
          }
          state.update(RetentionState(cohort, emitted))
          out.result().iterator
      }
  }

  // ----------------------------------------- streaming transitions
  final case class TransitionFact(user_id: Long, from_type: String,
      to_type: String)

  /** Per-user last event: (type, unix-micros, event_id) — O(1) state. */
  final case class LastEvent(tpe: String, us: Long, eventId: Long)

  /** INCREMENTAL first-order transitions — the streaming form of
    * [[EventStreams.strTransitions]]: state is each user's LAST event
    * in (ts, event_id) order; a micro-batch sorts its own rows by
    * that key, emits the (prev → next) pair chain starting from the
    * stored last, and leaves the new last behind. `COUNT(*)` per
    * (from_type, to_type) over the emitted facts equals the batch
    * lag()-window counts when per-user arrival respects event order
    * across batches (within a batch any order is fine — the sort
    * restores it), the scd2Closed horizon contract again. */
  def transitionUpdates(events: Dataset[EventRow]): Dataset[TransitionFact] = {
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val outEnc = Encoders.product[TransitionFact]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[LastEvent]) =>
          val ordered = rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[TransitionFact]
          ordered.foreach { e =>
            last.foreach(l => out += TransitionFact(uid, l.tpe, e.event_type))
            last = Some(LastEvent(e.event_type,
              eventMicros(e.ts), e.event_id))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  // ---------------------------------------------- streaming CEP
  final case class CepMatch(user_id: Long, s_us: Long, p_us: Long)

  /** One open signup: its micros plus the first error seen after it
    * (MaxValue sentinel = none yet). Public — encoder codegen. */
  final case class OpenSignup(sUs: Long, errUs: Long)
  final case class CepState(signups: List[OpenSignup])

  /** INCREMENTAL CEP with negation — the streaming form of
    * [[EventStreams.strCepPattern]] (signup → purchase ≤ 7 d, no
    * error strictly between): state per user is the list of OPEN
    * signups, each carrying the first error micros after it. An
    * error flags every older open signup; a purchase emits a match
    * for every open signup within the window whose first error (if
    * any) is not strictly inside (s, p); signups older than the
    * window are pruned on every event, so state is bounded by the
    * per-user signup rate × 7 d — the CEP engine contract. Ties are
    * handled by value, not arrival order (errUs ≥ p_us does not
    * suppress), so the facts equal the batch pair set whenever
    * per-user arrival respects event-time order across batches
    * (within a batch the (ts, event_id) sort restores it). */
  final case class RateCount(user_id: Long, event_type: String, c: Long)
  final case class RateState(times: List[Long])

  /** Streaming form of the trailing-window rate-limit audit: per-user
    * state holds only the timestamps inside the newest event's
    * trailing window (pruned every batch — bounded by one user's 24 h
    * of traffic, the same bound the batch RANGE frame has per task).
    * Simultaneous events are RANGE-frame PEERS: each member of a
    * same-timestamp group counts the whole group, so the streamed
    * counts equal the batch window exactly under timestamp ties. */
  def rateLimitUpdates(events: Dataset[EventRow],
      winUs: Long = 86399999999L): Dataset[RateCount] = {
    implicit val stateEnc = Encoders.product[RateState]
    implicit val outEnc = Encoders.product[RateCount]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RateState, RateCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[RateState]) =>
          val ordered = rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id))
          var times = state.getOption.map(_.times).getOrElse(Nil)
          val out = Seq.newBuilder[RateCount]
          ordered.groupBy(e => eventMicros(e.ts)).toSeq.sortBy(_._1)
            .foreach { case (us, peers) =>
              times = times.filter(_ >= us - winUs)
              val c = times.size.toLong + peers.size
              peers.foreach(e => out += RateCount(uid, e.event_type, c))
              times = List.fill(peers.size)(us) ::: times
            }
          state.update(RateState(times))
          out.result().iterator
      }
  }

  def cepMatchUpdates(events: Dataset[EventRow],
      winUs: Long = 7L * 24 * 3600 * 1000000L): Dataset[CepMatch] = {
    implicit val stateEnc = Encoders.product[CepState]
    implicit val outEnc = Encoders.product[CepMatch]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[CepState]) =>
          val ordered = rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id))
          var open = state.getOption.map(_.signups).getOrElse(Nil)
          val out = Seq.newBuilder[CepMatch]
          ordered.foreach { e =>
            val us = eventMicros(e.ts)
            open = open.filter(_.sUs + winUs >= us) // prune expired
            e.event_type match {
              case "signup" => open = OpenSignup(us, Long.MaxValue) :: open
              case "error" => open = open.map { s =>
                  if (s.sUs < us && us < s.errUs) s.copy(errUs = us) else s
                }
              case "purchase" => open.foreach { s =>
                  if (us > s.sUs && us <= s.sUs + winUs && s.errUs >= us)
                    out += CepMatch(uid, s.sUs, us)
                }
              case _ => ()
            }
          }
          state.update(CepState(open))
          out.result().iterator
      }
  }

  // ---------------------------------- streaming DAU/WAU/MAU deltas
  /** One sweep-delta change: the w-day active count at `day` moves by
    * `delta` (±1). Folding all emitted deltas per (w, day) and
    * prefix-summing over the day spine reproduces the exact batch
    * coverage counts. */
  final case class CoverageDelta(w: Int, day: Long, delta: Long)
  /** One per-user coverage island for window w: active days whose
    * consecutive gaps are ≤ w cover [cs, ce] contiguously. */
  final case class Island(cs: Long, ce: Long)
  final case class CoverageState(w1: List[Island], w7: List[Island],
      w30: List[Island])

  /** INCREMENTAL exact DAU/WAU/MAU — the streaming form of
    * [[EventStreams.activeUsers]]' coverage-interval rewrite: per-user
    * state is the coverage-island set per window width; a newly active
    * day inserts the interval [a, a+w−1], and only when coverage
    * actually CHANGES (the day isn't already covered end-to-end) does
    * the operator emit sweep-delta changes — retractions for absorbed
    * islands, an addition for the merged one. Downstream, the w-day
    * active count is an additive fold of deltas (a keyed streaming
    * sum), never a trailing re-scan: the incrementally-maintained
    * dashboard counter. A re-seen active day is a NO-OP (zero
    * emissions), so replays are idempotent on the folded counts.
    * State is bounded by islands per user (≤ active bursts, pruned in
    * production by finalizing islands older than the watermark minus
    * the widest window). */
  def activeUserDeltas(events: Dataset[EventRow]): Dataset[CoverageDelta] = {
    implicit val stateEnc = Encoders.product[CoverageState]
    implicit val outEnc = Encoders.product[CoverageDelta]
    implicit val keyEnc = Encoders.scalaLong
    def insert(islands: List[Island], a: Long, w: Int,
        out: scala.collection.mutable.Builder[CoverageDelta, _])
        : List[Island] = {
      val ns = a
      val ne = a + w - 1
      val (overlap, rest) =
        islands.partition(i => ns <= i.ce + 1 && ne >= i.cs - 1)
      val covered = overlap.exists(i => i.cs <= ns && ne <= i.ce)
      if (covered) islands
      else {
        val cs = (ns :: overlap.map(_.cs)).min
        val ce = (ne :: overlap.map(_.ce)).max
        overlap.foreach { i =>
          out += CoverageDelta(w, i.cs, -1L)
          out += CoverageDelta(w, i.ce + 1, 1L)
        }
        out += CoverageDelta(w, cs, 1L)
        out += CoverageDelta(w, ce + 1, -1L)
        Island(cs, ce) :: rest
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CoverageState, CoverageDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[EventRow], state: GroupState[CoverageState]) =>
          var st = state.getOption.getOrElse(CoverageState(Nil, Nil, Nil))
          val out = Seq.newBuilder[CoverageDelta]
          rows.map(e => Math.floorDiv(eventMicros(e.ts), 86400000000L))
            .toSeq.distinct.sorted
            .foreach { a =>
              st = CoverageState(
                insert(st.w1, a, 1, out),
                insert(st.w7, a, 7, out),
                insert(st.w30, a, 30, out))
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** STICKINESS panel as a PURE function of [[activeUserDeltas]]'
    * emitted deltas — the streaming form of
    * [[EventStreams.stickiness]]: the stream maintains only the
    * additive (w, day) coverage-delta state; per trigger this
    * |days|-sized fold (two prefix sums over the day spine, exact
    * per-mille ratio, a 7-row peak window) reproduces the exact batch
    * panel. The spine is recovered from the w=1 deltas themselves
    * (min start day .. max end-marker − 1 ≡ the active-day range), so
    * no second corpus pass exists anywhere. */
  def stickinessFromDeltas(deltas: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.Syntax._
    val byDay = deltas.filter(col("w").isin(1, 30))
      .groupBy("w", "day").agg(sum(col("delta")).as("d"))
      .cut // tiny (|days|-bounded); read by three frames
    val spine = byDay.filter(col("w") === 1)
      .agg(min(col("day")).as("_d0"), (max(col("day")) - 1).as("_d1"))
      .select(explode(expr("sequence(_d0, _d1)")).as("day"))
    // bounded prefix sums: the non-foldable constant key keeps the
    // window partitioned (the repo-wide convention for |days| frames)
    def counts(w: Int, name: String) = {
      val sweep = byDay.filter(col("w") === w)
        .select(col("day").as("_sd"), col("d"))
      spine.join(sweep, col("_sd") === col("day"), "left")
        .select(col("day"), coalesce(col("d"), lit(0L)).as("_dd"))
        .withColumn(name, sum(col("_dd")).over(
          Window.partitionBy(pmod(col("day"), lit(1L))).orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("day"), col(name))
    }
    counts(1, "dau").join(counts(30, "mau"), "day")
      .select(col("day"), col("dau"), col("mau"),
        when(col("mau") > 0, expr("dau * 1000 div mau")).otherwise(0L)
          .as("stickiness_pm"))
      .withColumn("peak7_pm", max(col("stickiness_pm")).over(
        Window.partitionBy(pmod(col("day"), lit(1L))).orderBy("day")
          .rowsBetween(-6, 0)))
      .orderBy("day")
  }

  /** Streaming per-day event counts — the only corpus-sized pass
    * behind [[EventStreams.changePoints]]' CUSUM panel, maintained
    * incrementally (update-mode keyed sum; state is bounded by the
    * series' day range, not the corpus). The |days|-sized CUSUM —
    * whose every value depends on the GLOBAL mean — is a pure
    * function of this frame, recomputed per trigger downstream; the
    * spec folds the final streamed counts into the exact batch
    * panel. */
  def dayCounts(events: Dataset[EventRow]): org.apache.spark.sql.DataFrame =
    events.toDF()
      .groupBy(org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .count()

  /** Streaming per-(type, day) counts — the additive state behind
    * [[EventStreams.mannKendall]]'s trend panel: an update-mode keyed
    * sum bounded by |types × days|, never the corpus. The S statistic
    * — every pair (i < j) of days — is a pure function of this frame,
    * recomputed per trigger downstream (|days|²-bounded, the same
    * contract as the batch operator); the spec folds the final
    * streamed counts into the exact batch panel. */
  def typeDayCounts(events: Dataset[EventRow])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    events.toDF()
      .groupBy(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .count()
  }

  /** Streaming (window, value-cents) histogram — the watermark-bounded
    * state behind [[EventStreams.windowP95]]'s exact tail-latency
    * panel: an update-mode keyed sum whose state is bounded by
    * |windows in horizon| × |distinct cents|, never the event count.
    * The rank selection (smallest value whose cumulative count reaches
    * ⌈0.95·n⌉) is a pure per-trigger fold of this frame; the spec
    * folds the final streamed histogram into the exact batch panel. */
  def windowCentsCounts(events: Dataset[EventRow])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    events.toDF()
      .groupBy(
        (expr("unix_micros(cast(ts as timestamp)) div 21600000000") *
          21600000000L).as("w_us"),
        expr("cast(cast(value as decimal(18,2)) * 100 as long)")
          .as("cents"))
      .count()
  }

  /** The same running totals on Spark 4's `transformWithState` API —
    * the successor to flatMapGroupsWithState: typed per-key state
    * variables (Value/List/Map), per-state TTLs, and timers, backed
    * by the RocksDB state store (the provider the API requires; set
    * `spark.sql.streaming.stateStore.providerClass` to
    * RocksDBStateStoreProvider). Both formulations stay in the repo
    * deliberately: identical semantics, old vs new state API. */
  final class RunningTotalsProcessor
      extends StatefulProcessor[Long, EventRow, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning]("running",
        Encoders.product[UserRunning], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = if (state.exists()) state.get() else UserRunning(key, 0L, 0.0)
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserRunning(key, n, total)
      state.update(next)
      Iterator(next)
    }
  }

  def runningTotalsTws(events: Dataset[EventRow]): Dataset[UserRunning] = {
    implicit val outEnc = Encoders.product[UserRunning]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update)
  }

  final case class ClosedSession(user_id: Long, n_events: Long,
      last_ts_ms: Long)

  /** EVENT-TIME TIMERS on transformWithState: each key accumulates a
    * running count and re-arms one timer at (last event ts + gap);
    * when the watermark passes the timer the session CLOSES — the
    * state emits once and clears. This is the state-bounding
    * mechanism at scale: idle keys evict themselves via their timer,
    * no scan ever walks the store. (session_window expresses the same
    * aggregation declaratively — the processor exists for semantics
    * windows can't: emit-on-close with arbitrary per-key state.) */
  final class IdleSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, EventRow, ClosedSession] {
    @transient private var count: ValueState[Long] = _
    @transient private var lastTs: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count",
        Encoders.scalaLong, TTLConfig.NONE)
      lastTs = getHandle.getValueState[Long]("last_ts",
        Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      var n = if (count.exists()) count.get() else 0L
      // track TRUE event time (micros): ms-truncated getTime would let
      // a same-millisecond pair pick its "last" event arbitrarily
      var last = if (lastTs.exists()) lastTs.get() else Long.MinValue
      rows.foreach { e =>
        n += 1
        val us = eventMicros(e.ts)
        if (us > last) last = us
      }
      // one live timer per key: disarm the stale one before re-arming;
      // timers are ms-domain, so round the micros expiry UP — the gap
      // must have TRULY elapsed before the session closes
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      val fireMs = last / 1000L + gapMs + 1L
      getHandle.registerTimer(fireMs)
      armed.update(fireMs)
      count.update(n)
      lastTs.update(last)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val out = ClosedSession(key, count.get(), lastTs.get() / 1000L)
      count.clear(); lastTs.clear(); armed.clear()
      Iterator(out)
    }
  }

  def idleSessions(events: Dataset[EventRow], gapMs: Long): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new IdleSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append)
  }

  // ------------------------------------------- streaming debounce
  /** A persisted (debounced) state change: user entered `state` at
    * event-time micros `us` and stayed ≥ the hold. */
  final case class DebouncedChange(user_id: Long, state: String, us: Long)
  /** Debounce state: the change awaiting its hold (sentinel us = −1 →
    * none) plus the current raw state for change detection. */
  final case class PendingChange(state: String, us: Long, cur: String)

  /** Streaming form of [[EventStreams.debounce]] — the alert-pager
    * gate as an EVENT-TIME-TIMER processor: a state change arms a
    * timer at (change time + hold); a counter-change inside the hold
    * REPLACES the pending change (the flap collapses, nothing pages);
    * the pending change is emitted as PERSISTED either by a later
    * change arriving past the hold (emitted inline — robust even when
    * that change and the watermark advance share a batch) or by the
    * timer firing once the watermark passes (the no-more-events
    * case). State is O(1) per key and idle keys self-evict through
    * their timer — the same bounding contract as
    * [[IdleSessionProcessor]]. Per-user event-time order across
    * batches is the usual horizon contract; within a batch rows are
    * sorted. */
  final class DebounceProcessor(holdUs: Long)
      extends StatefulProcessor[Long, EventRow, DebouncedChange] {
    @transient private var pend: ValueState[PendingChange] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pend = getHandle.getValueState[PendingChange]("pending",
        Encoders.product[PendingChange], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[DebouncedChange] = {
      val out = Seq.newBuilder[DebouncedChange]
      var st = if (pend.exists()) pend.get()
        else PendingChange("", -1L, "")
      rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id)).foreach { e =>
        val us = eventMicros(e.ts)
        if (st.cur != e.event_type) {
          if (st.us >= 0L) {
            if (us - st.us > holdUs)
              out += DebouncedChange(key, st.state, st.us) // persisted
            // else: flap — the pending change is silently replaced
          }
          st = PendingChange(e.event_type, us, e.event_type)
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          // timers are millisecond-domain; round the hold expiry UP so
          // the timer never fires before the hold has truly elapsed
          val fireMs = (st.us + holdUs) / 1000L + 1L
          getHandle.registerTimer(fireMs)
          armed.update(fireMs)
        }
      }
      pend.update(st)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DebouncedChange] = {
      // SELF-EVICTION: with TTLConfig.NONE the timer is the ONLY bound
      // on idle-key state, so expiry must clear EVERYTHING — a key
      // whose hold elapsed holds zero bytes until it speaks again. The
      // next event for an evicted key is then a fresh first change
      // (batch lag-NULL semantics: a first observed state has no
      // predecessor and is itself a pending change) — the horizon
      // caveat is that an evicted key re-entering with the SAME state
      // re-announces it, which a full-history batch replay would not.
      val st = if (pend.exists()) pend.get() else PendingChange("", -1L, "")
      pend.clear(); armed.clear()
      if (st.us >= 0L) Iterator(DebouncedChange(key, st.state, st.us))
      else Iterator.empty
    }
  }

  def debounceUpdates(events: Dataset[EventRow],
      holdUs: Long = 1800000000L): Dataset[DebouncedChange] = {
    implicit val outEnc = Encoders.product[DebouncedChange]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new DebounceProcessor(holdUs),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
