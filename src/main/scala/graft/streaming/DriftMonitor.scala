package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift alarms — the live twin of the batch fold gated
  * by q191 (operators/SeqFold.cusum): per key, s ← max(0, s + (x − k));
  * when s reaches h an alarm EVENT is emitted and the statistic restarts.
  * The per-key (s, alarms) pair lives in `flatMapGroupsWithState` state —
  * O(1) per key, checkpointed by the engine, so a monitor over 10⁸
  * tenants carries two longs each and nothing else.
  *
  * Ordering contract: the fold is order-sensitive (clamp + reset are
  * non-associative — the q191 scaladoc's argument), so each batch's rows
  * are sorted by (um, event_id) INSIDE the group before folding, and
  * cross-batch order is the source's responsibility: batches must
  * partition event time monotonically per key (a replayed log, a
  * time-ordered file feed — the same discipline every keyed fold in this
  * repo's foreachBatch tenants states). With that contract, the emitted
  * alarm sequence is byte-identical to the batch fold over the full
  * history — StreamingSpec replays the events fixture in four
  * time-quartile files and pins alarm-count parity with SeqFold.cusum.
  *
  * Unlike the versioned-state tenants there is no staging/rename
  * protocol here: flatMapGroupsWithState state is the engine's own
  * checkpointed store, and alarm emission is exactly-once downstream of
  * the checkpoint like any other streaming operator output. */
object DriftMonitor {

  final case class DriftEvent(user_id: Long, um: Long, event_id: Long,
                              cents: Long)
  final case class DriftState(s: Long, alarms: Long)
  /** One row per fired alarm: which event tripped it and its ordinal. */
  final case class DriftAlarm(user_id: Long, um: Long, event_id: Long,
                              alarm_no: Long)

  def alarms(events: Dataset[DriftEvent], k: Long, h: Long)
      : Dataset[DriftAlarm] = {
    require(h > 0 && k >= 0, s"drift monitor: need h > 0, k >= 0; got $k/$h")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[DriftEvent], state: GroupState[DriftState]) =>
          var st = state.getOption.getOrElse(DriftState(0L, 0L))
          val out = Seq.newBuilder[DriftAlarm]
          // batch-local sort: the engine hands the group unordered; the
          // batch is one time slice, so sorting it restores the global
          // per-key order under the monotone-batches contract
          it.toSeq.sortBy(e => (e.um, e.event_id)).foreach { e =>
            val s1 = math.max(0L, st.s + e.cents - k)
            st =
              if (s1 >= h) {
                out += DriftAlarm(uid, e.um, e.event_id, st.alarms + 1)
                DriftState(0L, st.alarms + 1)
              } else DriftState(s1, st.alarms)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
