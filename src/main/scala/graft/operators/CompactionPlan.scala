package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning (the OPTIMIZE/rewrite maintenance pass).
  *
  * Streaming ingest (one file per trigger per partition — the reference's
  * Firehose-to-S3 leg produces exactly this layout, buffering hints
  * `README.md`'s 60-300 s / 1-128 MB) leaves tables dominated by small
  * files; scan cost degrades by per-file open overhead long before by
  * bytes. The planner turns a file INVENTORY (one row per file: table,
  * partition key, size) into rewrite jobs: files ordered by partition key
  * within each table, each file assigned wholly to bucket
  * `floor(start_offset / targetBytes)` where `start_offset` is the
  * exclusive byte cumsum — the same offset-based grouping AQE uses to
  * coalesce shuffle partitions. Deterministic, split-free (no file is torn
  * across buckets), and contiguous in partition key, so a rewrite
  * preserves min/max zone-map pruning (q214).
  *
  * Bounds (pinned in OperatorSpec): every bucket's total is
  * `< targetBytes + max(file bytes in bucket)` — start offsets of one
  * bucket span less than one target width, and only the last file's tail
  * crosses it; buckets within a table cover disjoint, ordered key ranges;
  * assignment is a bijection on the inventory (no file lost or
  * duplicated).
  *
  * Scale: the inventory is METADATA — ~millions of rows at 100 TB (one
  * per file, listed from the catalog for free) vs billions of data rows —
  * and the window partitions by table, so planning parallelizes across
  * tables and never touches data files. */
object CompactionPlan {

  /** Adds `bucket` to `files`. `files` carries one row per file;
    * `tableCol` scopes planning, `keyCol` is the partition/ordering key,
    * `bytesCol` the file size (long). */
  def assign(files: DataFrame, tableCol: String, keyCol: String,
             bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window.partitionBy(tableCol).orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("start_off",
        coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bucket", expr(s"start_off div ${targetBytes}L"))
      .drop("start_off")
  }

  /** One row per rewrite job: file count, total bytes, and the contiguous
    * key range `[min_key, max_key]` the job covers. */
  def plan(files: DataFrame, tableCol: String, keyCol: String,
           bytesCol: String, targetBytes: Long): DataFrame =
    assign(files, tableCol, keyCol, bytesCol, targetBytes)
      .groupBy(col(tableCol), col("bucket"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bucket_bytes"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
}
