package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One stream update for a keyed entity (the bus-update envelope shape,
  * pyspark-job.py:92-118 reduced to the state-relevant fields).
  */
final case class KeyedUpdate(key: String, seq: Long, remaining: Long, lastStop: Boolean)

/** Current state of one key. */
final case class KeyedLatest(key: String, seq: Long, remaining: Long)

/** Input row for [[StatefulOps.runningUserAgg]]. */
final case class EventIn(user_id: Long, event_id: Long, value: Double)

/** Running per-user aggregate held in the state store. */
final case class UserAgg(
    user_id: Long, n_events: Long, max_value: Double, last_event_id: Long)

/** Spark 4 `transformWithState` processor (the arbitrary-state API that
  * replaces flatMapGroupsWithState: explicit named state variables,
  * RocksDB-backed, timers, TTL): one [[ValueState]] cell per user holding
  * the running (count, max value, max event id) triple, updated with
  * order-free math so the result is deterministic under any row order and
  * any micro-batch split; each batch emits the key's current aggregate
  * (update semantics).
  */
final class RunningUserAggProcessor
    extends StatefulProcessor[Long, EventIn, UserAgg] {
  @transient private var state: ValueState[UserAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserAgg]("agg",
      org.apache.spark.sql.Encoders.product[UserAgg], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventIn],
      timers: TimerValues): Iterator[UserAgg] = {
    var cur =
      if (state.exists()) state.get()
      else UserAgg(key, 0L, Double.NegativeInfinity, Long.MinValue)
    rows.foreach { r =>
      cur = UserAgg(key, cur.n_events + 1,
        math.max(cur.max_value, r.value),
        math.max(cur.last_event_id, r.event_id))
    }
    state.update(cur)
    Iterator.single(cur)
  }
}

/** SURVEY §7.3 U3-v2: real incremental state via flatMapGroupsWithState —
  * the proper replacement for the reference's collect_list+UDF-per-batch
  * hack (pyspark-job.py:34-54). State is O(#keys) and updated
  * incrementally per micro-batch (the complete-mode variant in
  * StreamingOps.t5 recomputes from all data each epoch, faithful to the
  * reference); a tombstoned key (lastStop on its latest update) is removed
  * from the store and a later-seq update recreates it, exactly matching
  * the "ride ended / next ride starts" lifecycle. T19's
  * [[RunningUserAggProcessor]] is the transformWithState successor of the
  * same idea.
  */
object StatefulOps {

  /** T19 core: per-user running aggregates via `transformWithState` —
    * state is O(#keys) in RocksDB, input is consumed incrementally.
    */
  def runningUserAgg(events: Dataset[EventIn]): Dataset[UserAgg] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningUserAggProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  def latestPerKey(updates: Dataset[KeyedUpdate]): Dataset[KeyedLatest] = {
    val s = updates.sparkSession
    import s.implicits._
    updates.groupByKey(_.key)
      .flatMapGroupsWithState[KeyedLatest, KeyedLatest](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[KeyedUpdate], state: GroupState[KeyedLatest]) =>
          val incoming = batch.toVector
          if (incoming.isEmpty) Iterator.empty
          else {
            val newest = incoming.maxBy(u => (u.seq, u.lastStop))
            val current = state.getOption
            if (current.exists(_.seq >= newest.seq)) Iterator.empty // stale batch
            else if (newest.lastStop) {
              if (state.exists) state.remove()
              Iterator.empty // tombstone: key leaves the state table
            } else {
              val next = KeyedLatest(key, newest.seq, newest.remaining)
              state.update(next)
              Iterator.single(next)
            }
          }
      }
  }
}
