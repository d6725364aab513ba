package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O35: changelog → snapshot materialization — the reference's OpenSearch
  * "last write per key wins" semantics (reference cdk_stacks/firehose.py:
  * 114-116, README.md:455-457) as a batch operator.
  *
  * Per key: keep the row with the greatest `(metadata.timestamp,
  * metadata.transaction-id)` — the declared D-Q33 tie-break — then drop keys
  * whose final operation is `delete` (tombstone). A key re-inserted after a
  * delete re-appears (its insert is the latest write).
  *
  * Scale: the window shuffles once on the primary key — exactly the
  * reference's Kinesis partition-by-PK exchange (S5,
  * dms_aurora_mysql_to_kinesis.py:121-123). At 100 TB the per-key group is
  * tiny (one row per change), so no skew concern beyond AQE's handling;
  * state never accumulates because this is a pure shuffle+reduce, not a
  * driver-side fold.
  */
object Materialize {

  /** Latest non-delete row image per primary key. Input: a parsed,
    * selected, CORRUPT-FREE changelog (Envelope.changelog enforces all
    * three) — a null-operation record here would go three-valued in the
    * delete filter and silently vanish, which is exactly what the
    * changelog's `!corrupt` filter routes to the DLQ instead. Output
    * columns: data.* flattened. */
  def snapshot(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("data.trans_id"))
      .orderBy(col("metadata.timestamp").desc, col("metadata.`transaction-id`").desc)
    changelog
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("metadata.operation") =!= "delete")
      .select(col("data.*"))
  }

  /** Multi-table form of [[snapshot]] for a wildcard-selected changelog
    * (S3 rule lists fan N tables into one stream): last-write-wins per
    * (schema, table, primary key) — two shards may reuse the same key
    * value, so the table identity MUST be in the window key or one
    * shard's change silently overwrites the other's row. Still one
    * shuffle, now on the composite key; per-group size is unchanged. */
  def snapshotByTable(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("metadata.`schema-name`"),
        col("metadata.`table-name`"), col("data.trans_id"))
      .orderBy(col("metadata.timestamp").desc, col("metadata.`transaction-id`").desc)
    changelog
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("metadata.operation") =!= "delete")
      .select(col("metadata.`schema-name`").as("sch"),
        col("metadata.`table-name`").as("tbl"), col("data.*"))
  }

  /** Aggregate-form materialization: the same last-write-wins semantics
    * as [[snapshot]], expressed as `max_by` over the `(timestamp,
    * transaction-id)` ordering key instead of a window. Scale: the window
    * form shuffles EVERY change row and sorts each key partition; max_by
    * partial-aggregates map-side, so the exchange carries one candidate
    * row per key per map task — the right form when the changelog has
    * many updates per key (a hot row at 0.33 rec/s for a day is ~30k
    * versions that never leave their map task). Kept alongside the window
    * form as an independently-computed snapshot for [[Reconcile]];
    * inherits the same accepted limitation on fully-identical
    * (pk, timestamp, txid) ties. */
  def snapshotAgg(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("data.trans_id").as("__pk"))
      .agg(max_by(
        struct(col("data.*"), col("metadata.operation").as("__op")),
        struct(col("metadata.timestamp"),
          col("metadata.`transaction-id`"))).as("__last"))
      .filter(col("__last.__op") =!= "delete")
      .select(col("__last.*"))
      .drop("__op")

  /** O36: CDC op statistics — pipeline observability (the Kinesis data
    * viewer role, reference README.md:448-449). Grouped on provenance. */
  def opStats(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("metadata.`record-type`") === "data")
      .groupBy(col("metadata.`schema-name`").as("sch"),
        col("metadata.`table-name`").as("tbl"),
        col("metadata.operation").as("op"))
      .agg(count(lit(1)).as("c"))
}
