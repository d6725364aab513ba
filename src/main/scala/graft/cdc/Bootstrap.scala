package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1: the reference task's `full-load-and-cdc` migration type (reference
  * cdk_stacks/dms_aurora_mysql_to_kinesis.py:145) — a one-time snapshot of
  * the source table seeds the target, then the change stream takes over.
  *
  * The whole handover problem is the BOUNDARY: the change stream replays
  * from a point at or before the snapshot's consistent-read time, so
  * changes committed before the cut arrive twice (once inside the snapshot
  * image, once as replayed CDC records), and changes after the cut arrive
  * only via CDC. Re-expressed in Spark, the fix is purely declarative —
  * wrap every snapshot row in the same DMS envelope the stream carries,
  * stamped with:
  *
  *   - `metadata.timestamp`  = loadTs (the snapshot's consistent-read
  *     point, fixed-width ISO8601 so lexicographic == chronological),
  *   - `metadata.transaction-id` = -1 (below every real transaction id,
  *     so a genuine change at exactly loadTs still beats the seed),
  *   - `metadata.operation`  = "load" (the DMS full-load operation tag).
  *
  * Then the ordinary last-write-wins merge is the handover: a replayed
  * record with timestamp ≤ loadTs loses to the seed (its effect is already
  * inside the snapshot image — no double-apply, no regression to a stale
  * image), a record after the cut wins (no boundary loss), and a key whose
  * insert+delete both predate the cut never resurrects (the snapshot holds
  * no row for it, and the replayed delete is the key's own latest write).
  * No mode switch, no fencing, no state machine — the merge that runs
  * every micro-batch is already the correct cutover semantics.
  *
  * Scale: envelope-wrapping is map-only; the seed write shuffles once on
  * the primary key exactly like every later micro-batch merge. A 100 TB
  * initial load is one ordinary batch job feeding
  * `CdcStreamPipeline.bootstrap`, not a special ingest path.
  */
object Bootstrap {

  /** Envelope-wrap a full-load row image (columns = Envelope.dataSchema,
    * the shape Materialize.snapshot emits) so the seed is
    * indistinguishable from stream state to every downstream operator.
    * Fields are built in declared schema order — union with parsed stream
    * envelopes must agree positionally as well as by name. */
  def asLoadEnvelope(snapshot: DataFrame, loadTs: String,
                     schemaName: String = "testdb",
                     tableName: String = "retail_trans"): DataFrame = {
    val dataCols = Envelope.dataSchema.map(f =>
      col(f.name).cast(f.dataType).as(f.name))
    snapshot.select(
      struct(dataCols: _*).as("data"),
      struct(
        lit(loadTs).as("timestamp"),
        lit("data").as("record-type"),
        lit("load").as("operation"),
        lit("primary-key").as("partition-key-type"),
        lit(schemaName).as("schema-name"),
        lit(tableName).as("table-name"),
        lit(-1L).as("transaction-id")).as("metadata"))
  }

  /** Batch form of the handover: the serving table a full-load-and-cdc
    * task converges to, computed in one shot from the snapshot at the cut
    * plus a (possibly overlapping) changelog replay. Equal to
    * materializing the full changelog alone whenever the snapshot really
    * is the consistent state at loadTs — the gated q100 invariant. */
  def handover(snapshot: DataFrame, changelog: DataFrame,
               loadTs: String): DataFrame =
    Materialize.snapshot(
      asLoadEnvelope(snapshot, loadTs).unionByName(changelog))
}
