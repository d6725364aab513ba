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
      // winner ordering is LEXICOGRAPHIC (the engine-wide fixed-width
      // stamp contract — same rule as the batch materializer), which is
      // chronological only within ONE wire form; a stream mixing the
      // ISO-'T' and space-separated forms for a key would mis-order
      // silently ('T' > ' '), so reject it loudly at the first collision
      cur.foreach { s =>
        require(c.ts.length == s.ts.length &&
            (c.ts.length <= 10 || c.ts.charAt(10) == s.ts.charAt(10)),
          s"mixed timestamp wire forms for key $key: '${s.ts}' vs '${c.ts}' — " +
            "use one fixed-width form per stream (ordering is lexicographic)")
      }
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
    * key, same exchange count as the single-table form.
    *
    * No timeout → state is retained forever, INCLUDING tombstones. Use
    * this form only for bounded replays (tests, backfills); a long-running
    * stream should use [[deltasEvicting]] so state tracks LIVE keys, not
    * keys-ever-seen. */
  def deltas(changes: Dataset[Change]): Dataset[SnapshotDelta] = {
    implicit val se = Encoders.product[KeyState]
    implicit val de = Encoders.product[SnapshotDelta]
    changes.groupByKey(c => (c.sch, c.tbl, c.pk))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateKey)
  }

  /** Envelope `metadata.timestamp` → epoch millis. Accepts both wire
    * forms the envelope fixtures carry: `yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'`
    * (the DMS ISO-8601 instant — zone-explicit) and the space-separated
    * SQL form, which is interpreted in `zone`. `zone` MUST be the Spark
    * session timezone: the eviction deadline this feeds is compared
    * against a watermark derived from `try_to_timestamp` of the SAME
    * string, and the two clocks must agree or tombstones evict offset
    * from the horizon (deltasEvicting captures the session zone so the
    * coupling cannot drift). */
  private[streaming] def tsMillis(ts: String, zone: java.time.ZoneId): Long = {
    val iso = ts.replace(' ', 'T')
    if (iso.endsWith("Z")) java.time.Instant.parse(iso).toEpochMilli
    else java.time.LocalDateTime.parse(iso)
      .atZone(zone).toInstant.toEpochMilli
  }

  /** [[updateKey]] plus tombstone eviction via event-time timeout: a key
    * whose winner is a delete schedules its own removal once the watermark
    * passes `tombstone ts + lateness`. Live keys never time out — their
    * retention is the serving view's inherent bound (same as the
    * reference's OpenSearch index); tombstones are pure replay armor and
    * safe to drop once every change they could suppress would be filtered
    * as late data anyway (the exec's own late-row filter under an
    * event-time watermark). */
  private[streaming] def updateKeyEvicting(latenessMs: Long,
      zoneId: String)(
      key: (String, String, Long), changes: Iterator[Change],
      state: GroupState[KeyState]): Iterator[SnapshotDelta] = {
    if (state.hasTimedOut) {
      // Only tombstones schedule timeouts, but a key revived AFTER its
      // tombstone armed one still sees that stale alarm fire — keep live
      // state, drop only tombstones.
      if (state.getOption.exists(!_.live)) state.remove()
      Iterator.empty
    } else {
      val out = updateKey(key, changes, state)
      state.getOption.filter(!_.live).foreach { s =>
        // setTimeoutTimestamp requires a value strictly beyond the current
        // watermark; an already-expired tombstone (late replay racing the
        // horizon) arms for the very next watermark tick instead.
        state.setTimeoutTimestamp(math.max(
          tsMillis(s.ts, java.time.ZoneId.of(zoneId)) + latenessMs,
          state.getCurrentWatermarkMs() + 1))
      }
      out
    }
  }

  /** Long-running form of [[deltas]]: identical winners and delta emission
    * (spec-pinned parity), but tombstone state is EVICTED once the
    * watermark passes the delete's event time plus `lateness` — so at
    * 100 TB with key churn (insert→delete lifecycles) the state store is
    * bounded by LIVE keys + the lateness horizon's worth of tombstones,
    * not by keys-ever-seen. Eviction is safe, not just convenient: any
    * replayed change old enough to need the tombstone's suppression is
    * older than the watermark and is dropped by the operator's late-row
    * filter before it can resurrect the key (StatefulMaterializeSpec pins
    * exactly this). Zone-less `ts` strings are read in the SESSION
    * timezone on both clocks — the watermark's (try_to_timestamp) and the
    * timeout's (tsMillis) — so they can never drift apart. */
  def deltasEvicting(changes: Dataset[Change],
                     lateness: java.time.Duration): Dataset[SnapshotDelta] = {
    implicit val se = Encoders.product[KeyState]
    implicit val de = Encoders.product[SnapshotDelta]
    import org.apache.spark.sql.functions.{col, try_to_timestamp}
    val zoneId = changes.sparkSession.sessionState.conf.sessionLocalTimeZone
    changes
      .withColumn("event_ts", try_to_timestamp(col("ts")))
      .withWatermark("event_ts", s"${lateness.toMillis} milliseconds")
      .as[Change](Encoders.product[Change])
      .groupByKey(c => (c.sch, c.tbl, c.pk))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(
        updateKeyEvicting(lateness.toMillis, zoneId))
  }
}
