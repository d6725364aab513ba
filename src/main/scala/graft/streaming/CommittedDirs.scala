package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE copy of the batch-scoped-sink commit-marker protocol (the
  * DocIngest index rule): a `batch_id=` directory counts only once its
  * `_SUCCESS` marker exists — a crash mid-write must neither crash-loop
  * retries (FileOutputCommitter moves task files before the marker, so
  * an unmarked dir may hold partial files) nor count as prior state.
  * [[DocIngest]] and [[CopyDetectMaintenance]] both resolve their
  * batch-scoped sinks through here, so the protocol cannot drift
  * between tenants. */
private[streaming] object CommittedDirs {

  /** Committed `batch_id=` dirs under `dir` as (batchId, path), empty
    * when the root does not exist. One listing of the root plus one
    * marker check per batch dir — O(triggers), never O(buckets). */
  def list(spark: SparkSession, dir: String): Seq[(Long, Path)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .flatMap { s =>
        s.getPath.getName.stripPrefix("batch_id=").toLongOption
          .filter(_ => fs.exists(new Path(s.getPath, "_SUCCESS")))
          .map(_ -> s.getPath)
      }
  }
}
