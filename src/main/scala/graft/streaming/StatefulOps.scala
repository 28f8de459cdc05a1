package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream update for a keyed entity (the bus-update envelope shape,
  * pyspark-job.py:92-118 reduced to the state-relevant fields).
  */
final case class KeyedUpdate(key: String, seq: Long, remaining: Long, lastStop: Boolean)

/** Current state of one key. */
final case class KeyedLatest(key: String, seq: Long, remaining: Long)

/** SURVEY §7.3 U3-v2: real incremental state via flatMapGroupsWithState —
  * the proper replacement for the reference's collect_list+UDF-per-batch
  * hack (pyspark-job.py:34-54). State is O(#keys) and updated
  * incrementally per micro-batch (the complete-mode variant in
  * StreamingOps.t5 recomputes from all data each epoch, faithful to the
  * reference); a tombstoned key (lastStop on its latest update) is removed
  * from the store and a later-seq update recreates it, exactly matching
  * the "ride ended / next ride starts" lifecycle.
  */
object StatefulOps {

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
