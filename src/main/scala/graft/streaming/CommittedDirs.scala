package graft.streaming

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** The ONE copy of the batch-scoped-sink commit-marker protocol (the
  * DocIngest index rule): a `batch_id=` directory counts only once its
  * `_SUCCESS` marker exists — a crash mid-write must neither crash-loop
  * retries (FileOutputCommitter moves task files before the marker, so
  * an unmarked dir may hold partial files) nor count as prior state.
  * [[DocIngest]], [[CopyDetectMaintenance]] and [[IvfIngestMaintenance]]
  * all resolve their batch-scoped sinks through here, so the protocol
  * cannot drift between tenants. */
private[graft] object CommittedDirs {

  /** A committed dir WITH its one child listing — the commit-marker
    * check, the deletion-fence check and the partition-subdir selection
    * all ride that single listing, so a probe pays ONE metadata
    * round-trip per prior dir instead of three (the round-14 bench
    * regression on the ANN/index probe family was exactly the extra
    * per-dir `exists` calls). */
  final case class ListedDir(id: Long, path: Path,
                             children: Seq[FileStatus]) {
    lazy val childNames: Set[String] = children.map(_.getPath.getName).toSet

    /** Child partition dirs (`cell=`/`bucket=`…) from the listing. */
    def childDirs(prefix: String): Seq[Path] =
      children.filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(prefix)).map(_.getPath)

    /** Deletion-fence check riding the listing (no second round-trip):
      * refuse a dir a forget() died on — same contract as
      * [[graft.operators.IndexForget.assertClean]]. */
    def assertClean(): Unit =
      require(!childNames.contains(graft.operators.IndexForget.Marker),
        s"a forget() is in progress (or died mid-rewrite) under $path — " +
          "re-run forget with the same ids to heal before probing")
  }

  /** Committed `batch_id=` dirs under `dir` as (batchId, path), empty
    * when the root does not exist. One listing of the root plus one
    * marker check per batch dir — O(triggers), never O(buckets). For
    * probe paths that go on to LIST each dir (fence check, partition
    * subdirs), use [[listDetailed]] instead — it folds all three into
    * the one child listing. */
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

  /** Committed `prefix`-named dirs WITH their child listings: one root
    * listing plus exactly one child listing per candidate dir (which
    * the commit check itself consumes — callers get the fence check
    * and partition subdirs for free from [[ListedDir]]). `marker` is
    * the family's commit point (`_SUCCESS` for plain batch dirs,
    * `_FANOUT` for CopyIndex folds). */
  def listDetailed(spark: SparkSession, dir: String,
                   prefix: String = "batch_id=",
                   marker: String = "_SUCCESS"): Seq[ListedDir] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { s =>
        s.getPath.getName.stripPrefix(prefix).toLongOption.flatMap { id =>
          // a dir deleted between the root listing and its child
          // listing (a concurrent fold's cleanup) is simply not
          // committed-here-and-now — the same answer fs.exists gave the
          // pre-listing code; throwing would crash the stable-snapshot
          // retry loop that exists to absorb exactly this race
          try {
            val children = fs.listStatus(s.getPath).toSeq
            if (children.exists(_.getPath.getName == marker))
              Some(ListedDir(id, s.getPath, children))
            else None
          } catch {
            case _: java.io.FileNotFoundException => None
          }
        }
      }.sortBy(_.id)
  }
}
