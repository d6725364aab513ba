package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** O35 in its arbitrary-stateful-operator form: changelog → continuously
  * maintained snapshot via `flatMapGroupsWithState` — the per-key state
  * machine the reference's OpenSearch upsert implements service-side
  * (reference cdk_stacks/firehose.py:114-116, README.md:455-457).
  *
  * The foreachBatch merge (CdcStreamPipeline) re-reduces persisted state
  * per trigger; this operator instead keeps ONE winner row per key in the
  * state store and emits a delta row only when a key's winner changes —
  * at 100 TB the state store shuffles once on the key and per-trigger work
  * is proportional to the CHANGED keys, not the accumulated state.
  * Last-write-wins order `(timestamp, transaction-id)` and delete
  * tombstones match the batch materializer exactly (spec-pinned).
  */
object StatefulMaterialize {

  /** One parsed change (flattened envelope essentials). pk/ts/txid are
    * non-nullable by the Envelope.corrupt routing contract (rows missing
    * any of them go to the DLQ, never here); `amount` is nullable in the
    * source DDL (INT NULL, reference README.md:203) so it stays Option.
    * sch/tbl default to the reference task's single table; a wildcard-
    * selected stream sets them per record so shards with colliding pk
    * ranges never share a state-store key. */
  final case class Change(pk: Long, ts: String, txid: Long, op: String,
                          amount: Option[Int],
                          sch: String = "testdb",
                          tbl: String = "retail_trans")

  /** Current winner per key; `live = false` = tombstone. */
  final case class KeyState(ts: String, txid: Long, live: Boolean,
                            amount: Option[Int])

  /** Emitted delta: the key's new current row (or tombstone). */
  final case class SnapshotDelta(sch: String, tbl: String, pk: Long,
                                 live: Boolean, amount: Option[Int],
                                 ts: String, txid: Long)

  private def newer(a: (String, Long), b: (String, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  def updateKey(key: (String, String, Long), changes: Iterator[Change],
                state: GroupState[KeyState]): Iterator[SnapshotDelta] = {
    var cur = state.getOption
    changes.foreach { c =>
      val candidate = KeyState(c.ts, c.txid, c.op != "delete", c.amount)
      if (cur.forall(s => newer((c.ts, c.txid), (s.ts, s.txid))))
        cur = Some(candidate)
    }
    cur match {
      case Some(s) if !state.getOption.contains(s) =>
        state.update(s)
        Iterator.single(SnapshotDelta(key._1, key._2, key._3,
          s.live, s.amount, s.ts, s.txid))
      case _ => Iterator.empty // no change for this key this trigger
    }
  }

  /** Streaming snapshot deltas for a stream (or batch) of changes. The
    * state store shuffles once on (schema, table, pk) — one composite
    * key, same exchange count as the single-table form. */
  def deltas(changes: Dataset[Change]): Dataset[SnapshotDelta] = {
    implicit val se = Encoders.product[KeyState]
    implicit val de = Encoders.product[SnapshotDelta]
    changes.groupByKey(c => (c.sch, c.tbl, c.pk))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateKey)
  }
}
