package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Periodic maintenance for the S10 archive: the streaming sink writes one
  * `batch_id=N` directory per micro-batch (exactly-once under retries), so
  * a long-running stream accumulates ~1440 directories/day at the
  * reference's 60 s trigger — file-listing cost grows linearly until reads
  * slow down. Compaction rewrites all batch directories up to a horizon
  * into ONE directory, preserving the `year/month/day/hour` partition
  * columns (hour pruning still pushes after compaction).
  *
  * Protocol (single writer, same assumption as the serving merge —
  * typically invoked from the stream's own quiet window between triggers):
  *   1. write the union of `batch_id <= upTo` into a dot-prefixed staging
  *      dir (invisible to partition discovery);
  *   2. delete the source batch directories;
  *   3. rename staging to `batch_id=<upTo>`.
  * Every step is resumable: a crash between 2 and 3 leaves a COMPLETE
  * staging dir (written before any delete) plus its `.complete` marker —
  * every entry point first finishes such orphaned swaps ([[recover]]),
  * so the stranded rows become visible again no matter what horizon the
  * next invocation asks for. Readers racing step 2 can
  * transiently miss pre-horizon rows, which is why this belongs in the
  * maintenance window, not concurrent with queries.
  */
object ArchiveCompaction {

  /** Batch ids present under the archive root (compacted dirs included —
    * they carry the id of their horizon). */
  def batchIds(spark: SparkSession, archive: String): Seq[Long] = {
    val root = new Path(archive)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .flatMap(_.stripPrefix("batch_id=").toLongOption)
  }

  /** Horizons of crashed runs: a `.compact-<h>.complete` marker says the
    * staging dir for horizon `h` was fully written but the swap (delete
    * sources, rename staging in) may not have finished. */
  def orphanHorizons(spark: SparkSession, archive: String): Seq[Long] = {
    val root = new Path(archive)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Marker = """\.compact-(\d+)\.complete""".r
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName).collect {
      case Marker(h) => h.toLong
    }.sorted
  }

  /** Finish every crashed compaction's swap. Must run before any new
    * horizon is chosen: a crash between source-delete and rename strands
    * the pre-horizon rows in the invisible staging dir, and a fresh
    * `compactOlderThan` recomputes its horizon from the REMAINING batch
    * ids — it would never re-pick the crashed horizon on its own. */
  def recover(spark: SparkSession, archive: String): Int =
    orphanHorizons(spark, archive)
      .map(h => doCompact(spark, archive, h)).sum

  /** Forget-time debris reaping for QUIESCED archives: delete any
    * `.compact-<h>` staging dir LACKING its `.complete` marker. Such a
    * dir is a compaction that crashed mid-staging-WRITE — uncommitted
    * by protocol ([[recover]] only finishes marker-committed swaps),
    * invisible to every reader (dot prefix), yet physically retaining
    * row bytes: a forget that rewrote every committed dir would leave
    * victim bytes in it indefinitely (only a later compaction that
    * happened to pick the same horizon would overwrite it). Safe under
    * quiesce: the staging never received its marker, so no swap can
    * want it, and a re-run compaction rewrites its own staging from
    * scratch (mode overwrite). Run AFTER [[recover]] — a marked
    * staging is committed and must finish its swap, never be reaped.
    * Returns the reaped paths. */
  def reapStaging(spark: SparkSession, archive: String): Seq[String] = {
    val root = new Path(archive)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Staging = """\.compact-(\d+)""".r
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter { s =>
      s.isDirectory && (s.getPath.getName match {
        case Staging(h) => !fs.exists(new Path(root, s".compact-$h.complete"))
        case _          => false
      })
    }.map { s => fs.delete(s.getPath, true); s.getPath.toString }
  }

  /** Compact every `batch_id <= upTo` directory into one. Finishes any
    * crashed prior compaction first. Returns the number of source
    * directories folded in (0 = nothing to do). */
  def compact(spark: SparkSession, archive: String, upTo: Long): Int = {
    orphanHorizons(spark, archive).filterNot(_ == upTo)
      .foreach(h => doCompact(spark, archive, h))
    doCompact(spark, archive, upTo)
  }

  private def doCompact(spark: SparkSession, archive: String, upTo: Long): Int = {
    val root = new Path(archive)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sources = batchIds(spark, archive).filter(_ <= upTo).sorted
    val staging = new Path(s"$archive/.compact-$upTo")
    val done = new Path(s"$archive/.compact-$upTo.complete")
    val target = new Path(s"$archive/batch_id=$upTo")
    // resume-after-swap: the marker outlived the rename — the compaction
    // already committed; deleting "sources" here would destroy the target
    if (fs.exists(done) && !fs.exists(staging)) {
      fs.delete(done, false)
      return 0
    }
    if (sources.size <= 1 && !fs.exists(done)) return 0

    // 1. complete staging copy (skipped when resuming a crashed run —
    //    the marker commits the staging dir as whole)
    if (!fs.exists(done)) {
      // FILELESS sources (a quiet stream's empty batches write markers
      // only) hold zero rows: fold only the dirs that carry data — an
      // all-fileless horizon would crash the union's schema inference.
      // When NOTHING below the horizon has data, just reap the dirs
      // (no batch <= upTo can retry once a later batch committed).
      // a file counts as data only when EVERY path component below the
      // batch dir is visible — a nonzero file under dot-prefixed debris
      // (a crashed forget's .forget_tmp./.forget_trash. child) is
      // invisible to the union read below, so counting it as data would
      // route an all-fileless horizon into schema inference and throw:
      // the exact failure this guard exists to prevent (r18 ADVICE fix)
      def hasData(p: Path): Boolean = {
        val qp = fs.makeQualified(p)
        def visibleUnder(f: Path): Boolean = {
          var cur = f
          var ok = true
          while (ok && cur != null && cur != qp) {
            val n = cur.getName
            ok = !n.startsWith("_") && !n.startsWith(".")
            cur = cur.getParent
          }
          ok
        }
        val it = fs.listFiles(p, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next()
          found = f.getLen > 0 && visibleUnder(f.getPath)
        }
        found
      }
      val withData =
        sources.filter(i => hasData(new Path(s"$archive/batch_id=$i")))
      if (withData.isEmpty) {
        sources.foreach(i =>
          fs.delete(new Path(s"$archive/batch_id=$i"), true))
        return sources.size
      }
      val union = spark.read.option("basePath", archive).parquet(
        withData.map(i => s"$archive/batch_id=$i"): _*)
      // preserve whichever partition layout the sink wrote: the CDC
      // archive's hourly four columns or its `rotation` key (the Rotation
      // knob), and the DocIngest corpus's `split` — pruning must survive
      // compaction for every sink that uses batch_id dirs
      val cols = union.columns.toSet
      val partCols =
        (if (cols.contains("rotation")) Seq("rotation")
         else Seq("year", "month", "day", "hour").filter(cols)) ++
          Seq("split").filter(cols)
      union.drop("batch_id")
        .write.partitionBy(partCols: _*)
        .mode("overwrite").parquet(staging.toString)
      fs.create(done, true).close()
    }
    // 2. drop the sources (the staging dir now owns every row)
    sources.foreach(i => fs.delete(new Path(s"$archive/batch_id=$i"), true))
    // 3. swap in
    require(fs.rename(staging, target), s"rename $staging -> $target failed")
    fs.delete(done, false)
    sources.size
  }

  /** Convenience horizon: keep the newest `retainBatches` directories
    * live for exactly-once retry overlap, compact everything older. */
  def compactOlderThan(spark: SparkSession, archive: String,
                       retainBatches: Int): Int = {
    val recovered = recover(spark, archive)
    val ids = batchIds(spark, archive).sorted
    if (ids.size <= retainBatches) recovered
    else recovered + doCompact(spark, archive, ids.dropRight(retainBatches).last)
  }
}
