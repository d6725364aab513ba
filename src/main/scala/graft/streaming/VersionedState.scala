package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned-directory exactly-once commit shared by every small
  * persisted state the streams maintain (serving rollups, sketch
  * shelves): a batch's merged state lands as `v=<batchId>` via staging +
  * rename, so a RETRIED batch whose rename already committed sees the
  * version present and skips — the guard that keeps non-idempotent
  * folds (SUM rollups, HLL register unions) from double-counting under
  * at-least-once batch execution. Factored out of RollupMaintenance
  * when SketchMaintenance became its second user. */
object VersionedState {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Numeric versions present (stray non-numeric `v=` debris ignored —
    * not a crash loop). */
  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(_.stripPrefix("v=").toLongOption)
  }

  def latest(spark: SparkSession, dir: String): Option[Long] =
    listVersions(spark, dir) match {
      case Nil => None
      case vs  => Some(vs.max)
    }

  /** True when `batchId` already committed — the retry short-circuit. */
  def committed(spark: SparkSession, dir: String, batchId: Long): Boolean =
    fsOf(spark, dir).exists(new Path(s"$dir/v=$batchId"))

  /** Newest complete state, if any. */
  def latestSnapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    latest(spark, dir).map(v => spark.read.parquet(s"$dir/v=$v"))

  /** Commit `state` as version `batchId`: write to staging, rename into
    * place (skipping if a concurrent retry won the rename), then prune
    * crashed stagings and versions beyond a short read horizon. */
  def commit(state: DataFrame, dir: String, batchId: Long,
             keepVersions: Int = 4): Unit = {
    val spark = state.sparkSession
    val staging = new Path(s"$dir/.staging-$batchId")
    state.write.mode("overwrite").parquet(staging.toString)
    commitStaged(spark, dir, batchId, keepVersions)
  }

  /** Staging path for [[commitStaged]] — for states BUILT IN PLACE
    * (a whole index tree, not one DataFrame write): the builder fills
    * this dir completely, then [[commitStaged]] publishes it. A crash
    * mid-build leaves only an invisible staging dir (the committed
    * `v=` listing never changes), healed by the next attempt's
    * overwrite. */
  def stagingPath(dir: String, version: Long): String =
    s"$dir/.staging-$version"

  /** Publish an already-built [[stagingPath]] as `v=<version>`: ONE
    * atomic rename is the whole repoint — readers resolving [[latest]]
    * see the old version or the new one, never a mix — then prune
    * crashed stagings and versions beyond the read horizon (old
    * versions linger `keepVersions` deep so in-flight readers finish
    * against the version they resolved). Skips if a concurrent retry
    * already won the rename. */
  def commitStaged(spark: SparkSession, dir: String, version: Long,
                   keepVersions: Int = 4): Unit = {
    val fs = fsOf(spark, dir)
    val target = new Path(s"$dir/v=$version")
    val staging = new Path(stagingPath(dir, version))
    if (fs.exists(target)) fs.delete(staging, true)
    else require(fs.rename(staging, target),
      s"rename $staging -> $target failed")
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(".staging-") &&
        p.getName.stripPrefix(".staging-").toLongOption.exists(_ < version))
      .foreach(p => fs.delete(p, true))
    listVersions(spark, dir).filter(_ < version).sorted
      .dropRight(keepVersions)
      .foreach(v => fs.delete(new Path(s"$dir/v=$v"), true))
  }
}
