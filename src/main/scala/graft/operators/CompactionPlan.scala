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
  * Bounds (pinned in CompactionSpec): every bucket's total is
  * `< targetBytes + max(file bytes in bucket)` — start offsets of one
  * bucket span less than one target width, and only the last file's tail
  * crosses it; bucket ids are monotone in key order starting at 0 (an
  * oversized file may legitimately SKIP ids — `floor(start/target)`
  * jumps); key ranges of consecutive buckets never interleave
  * (`max_key(k) ≤ min_key(k+1)`, with equality only when one key's
  * files straddle a bucket boundary — strict `<` when keys are unique);
  * assignment is a bijection on the inventory (no file lost or
  * duplicated). Determinism requires a total order: `fileIdCol` breaks
  * ties between files sharing a partition key (a real inventory always
  * has one — the file path).
  *
  * Scale: the inventory is METADATA — ~millions of rows at 100 TB (one
  * per file, listed from the catalog for free) vs billions of data rows —
  * and the window partitions by table, so planning parallelizes across
  * tables and never touches data files. */
object CompactionPlan {

  /** Adds `bucket` to `files`. `files` carries one row per file;
    * `tableCol` scopes planning, `keyCol` is the partition/ordering key,
    * `bytesCol` the file size (long), `fileIdCol` a per-file unique
    * tiebreaker (file path/id; defaults to `keyCol` for inventories
    * whose keys are already unique, like q213's one-file-per-day). */
  def assign(files: DataFrame, tableCol: String, keyCol: String,
             bytesCol: String, targetBytes: Long,
             fileIdCol: String = null): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val tiebreak = Option(fileIdCol).getOrElse(keyCol)
    val w = Window.partitionBy(tableCol).orderBy(keyCol, tiebreak)
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
           bytesCol: String, targetBytes: Long,
           fileIdCol: String = null): DataFrame =
    assign(files, tableCol, keyCol, bytesCol, targetBytes, fileIdCol)
      .groupBy(col(tableCol), col("bucket"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bucket_bytes"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
}
