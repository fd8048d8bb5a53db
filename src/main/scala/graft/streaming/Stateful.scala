package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-stateful streaming via typed
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the escape hatch
  * for semantics windowed aggregation can't express (cross-batch
  * running state, custom eviction). State lives per key in the state
  * store, bounded by timeouts at scale.
  */
object Stateful {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

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
}
