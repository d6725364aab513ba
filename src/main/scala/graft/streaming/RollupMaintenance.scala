package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally maintained serving rollup — the streaming counterpart of
  * q89's rollup-reuse: instead of recomputing hourly op statistics from
  * the whole archive per dashboard query (S15, the reference's OpenSearch
  * aggregation role), each micro-batch folds its PARTIAL aggregate into a
  * persisted rollup. Counts and DECIMAL sums merge associatively, so
  * incremental maintenance is bit-identical to a one-shot aggregation
  * over everything the stream has delivered (RollupSpec pins this).
  *
  * Exactly-once under at-least-once batch execution comes from the same
  * versioned-directory protocol as the serving merge: a batch commits its
  * merged rollup as `v=<batchId>` (staging + rename); a RETRIED batch
  * whose rename already committed finds the version present and skips —
  * critical here, because unlike last-write-wins a SUM rollup is NOT
  * idempotent, and double-merging a batch would double its counts.
  *
  * Scale: the per-batch partial reduces the batch to (hour × op) rows
  * before anything is read or written; the merge unions two rollup-sized
  * tables — state is bounded by the key space, never by stream volume.
  */
object RollupMaintenance {

  private val Amt = DecimalType(18, 2)

  /** (hour, schema, table, op) partial aggregate of one micro-batch of
    * parsed, selected envelope rows (CdcStreamPipeline.parseLines
    * output). Table identity is in the key so a wildcard-selected
    * multi-table stream rolls up per shard — the streaming counterpart
    * of q101's per-table op stats; single-table streams just carry two
    * constant columns. */
  def partial(batch: DataFrame): DataFrame =
    batch.groupBy(
      date_format(col("event_ts"), "yyyy-MM-dd HH").as("h"),
      col("metadata.`schema-name`").as("sch"),
      col("metadata.`table-name`").as("tbl"),
      col("metadata.operation").as("op"))
      .agg(count(lit(1)).cast("long").as("c"),
        sum(col("data.amount").cast(Amt)).cast(Amt).as("amt"))

  /** Associative merge of rollup states/partials. */
  def merge(old: Option[DataFrame], p: DataFrame): DataFrame = {
    val all = old.map(_.unionByName(p)).getOrElse(p)
    all.groupBy("h", "sch", "tbl", "op")
      .agg(sum(col("c")).cast("long").as("c"),
        sum(col("amt")).cast(Amt).as("amt"))
  }

  /** Fold one micro-batch into the persisted rollup at `rollupDir`.
    * Call from the stream's foreachBatch with the batch's parsed good
    * rows. Idempotent per batchId via VersionedState's commit protocol. */
  def update(rollupDir: String, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (VersionedState.committed(spark, rollupDir, batchId)) return
    val merged = merge(
      VersionedState.latestSnapshot(spark, rollupDir), partial(batch))
    VersionedState.commit(merged, rollupDir, batchId)
  }

  /** Newest complete rollup state. */
  def snapshot(spark: SparkSession, rollupDir: String): DataFrame =
    VersionedState.latestSnapshot(spark, rollupDir).getOrElse(
      throw new IllegalStateException(s"no rollup state under $rollupDir"))
}
