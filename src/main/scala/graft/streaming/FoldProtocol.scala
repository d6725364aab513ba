package graft.streaming

import graft.operators.IndexForget
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE crash-safe fold / stable-listing protocol — the single copy of
  * the consolidation machinery every batch-dir-scoped streaming tenant
  * shares. Until round 15 this logic lived in three hand-maintained
  * copies (CopyDetectMaintenance's index and alert folds,
  * IvfIngestMaintenance's batch fold, plus two stable-listing loops),
  * and two review passes found 14 crash-window bugs in exactly those
  * triplicated paths — the same argument that produced
  * [[graft.operators.IndexForget]] as the one copy of the deletion
  * protocol. Families now supply LAYOUT only (root, commit marker,
  * how to read the tail's union, how to write a consolidated dir); the
  * protocol owns every window:
  *
  *   - a consolidated dir COUNTS only once its family's commit marker
  *     exists (written/renamed into place last) — a torn fold is
  *     invisible and overwritten by the next fold;
  *   - folds only touch `batch_id < batchId`, so a retried batch sees
  *     the same prior state whether or not its first attempt folded;
  *   - missed cleanups heal lazily: every fold first deletes dirs at
  *     or below the committed horizon;
  *   - LIVE readers racing a concurrent fold take a retry-until-stable
  *     (consol, tail) snapshot — the consol horizon must hold across
  *     the tail read, else an old consol + a post-cleanup tail would
  *     silently gap the folded batches;
  *   - deletion fences: the family's fence root and every listed dir
  *     are refused while a forget() is in flight — the per-dir check
  *     rides the child listing ([[CommittedDirs.ListedDir]]), never a
  *     second metadata round-trip.
  */
private[graft] object FoldProtocol {

  val ConsolPrefix = "consol_id="

  /** Layout of one folded family: `root` holds the `batch_id=` dirs
    * and their `consol_id=` folds; `consolMarker` is the fold's commit
    * point (`_SUCCESS`, or `_FANOUT` for CopyIndex layouts whose own
    * writeIndex renames it last); `fenceRoot` is where the tenant's
    * COMPOSITION forget fence lives (checked before maintenance and
    * snapshots — it may differ from `root`, e.g. the IVF tenant fences
    * the index root while batches fold under `root = index/batches`);
    * `batchMarker` is the BATCH dirs' commit point — `_SUCCESS` (job
    * commit) for plain relations, but `_FANOUT` for the CopyIndex index
    * family, whose writeIndex renames it into place AFTER the job
    * commit: a crash in that window leaves a dir with `_SUCCESS` but no
    * `_FANOUT`, and every consumer (probe tail, fold tail, forget-time
    * reap) must agree it is NOT committed — the stream retry overwrites
    * it wholesale. */
  final case class Family(root: String, consolMarker: String,
                          fenceRoot: Option[String] = None,
                          batchMarker: String = "_SUCCESS")

  import CommittedDirs.ListedDir

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every COMMITTED `consol_id=` dir under the family root, in id
    * order, with child listings. */
  def consols(spark: SparkSession, f: Family): Seq[ListedDir] =
    CommittedDirs.listDetailed(spark, f.root, ConsolPrefix, f.consolMarker)

  /** The newest committed consol — the one probes read. Older committed
    * consols are shadowed (their content is a subset of the latest) and
    * deleted lazily by [[cleanupBelow]]; tenant forgets still rewrite
    * them while they exist. */
  def latestConsol(spark: SparkSession, f: Family): Option[ListedDir] =
    consols(spark, f).lastOption

  /** Committed batch dirs beyond the horizon (with child listings). */
  def committedTail(spark: SparkSession, f: Family,
                    horizon: Long): Seq[ListedDir] =
    CommittedDirs.listDetailed(spark, f.root, marker = f.batchMarker)
      .filter(_.id > horizon)

  /** Delete batch dirs at or below the committed horizon and consol
    * dirs below it — safe at any time: probes only read the LATEST
    * committed consol plus dirs ABOVE its id, and no batch ≤ horizon
    * can retry once a later batch's offsets committed. */
  def cleanupBelow(fs: FileSystem, root: String, horizon: Long): Unit =
    if (horizon >= 0) {
      fs.listStatus(new Path(root)).foreach { s =>
        val n = s.getPath.getName
        val stale =
          (n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLongOption.exists(_ <= horizon)) ||
            (n.startsWith(ConsolPrefix) &&
              n.stripPrefix(ConsolPrefix).toLongOption.exists(_ < horizon))
        if (stale) fs.delete(s.getPath, true): Unit
      }
    }

  /** Threshold fold, called from batch `batchId`'s own update AFTER its
    * write committed: once more than `after` committed batch dirs sit
    * beyond the horizon, fold {latest consol, tail < batchId} into ONE
    * `consol_id=H` dir (H = the tail's max id) and delete the folded
    * dirs. `readUnion` returns the family's union of those dirs — or
    * None when they hold no data at all (an idle stream's FILELESS
    * committed dirs: markers only), in which case the protocol reaps
    * the tail dirs directly (they carry nothing and only ids <
    * batchId, so no retry can want them back). `writeConsol` must make
    * the family's commit marker the LAST thing that appears (job-commit
    * `_SUCCESS`, or CopyIndex.writeIndex's `_FANOUT` rename). */
  def fold(spark: SparkSession, f: Family, batchId: Long, after: Int)
          (readUnion: (Option[ListedDir], Seq[ListedDir]) => Option[DataFrame])
          (writeConsol: (DataFrame, String) => Unit): Unit = {
    val fs = fsOf(spark, f.root)
    if (!fs.exists(new Path(f.root))) return
    // a torn tenant forget leaves the composition fence up — folding
    // over a dir carrying forget debris (a retired-but-unpublished
    // partition in trash) would omit its rows from the union and then
    // DELETE the dir: silent survivor loss. Refuse loudly; the stream
    // stops until the operator heals with a forget re-run.
    f.fenceRoot.foreach(r => IndexForget.assertClean(spark, r))
    val consol = latestConsol(spark, f)
    val horizon = consol.map(_.id).getOrElse(-1L)
    cleanupBelow(fs, f.root, horizon)
    val tail = committedTail(spark, f, horizon).filter(_.id < batchId)
    if (tail.size <= after) return
    // per-dir deletion fences ride the listings already taken
    (consol.toSeq ++ tail).foreach(_.assertClean())
    val h = tail.map(_.id).max
    readUnion(consol, tail) match {
      case None =>
        tail.foreach(d => fs.delete(d.path, true))
      case Some(union) =>
        writeConsol(union, s"${f.root}/$ConsolPrefix$h")
        cleanupBelow(fs, f.root, h)
    }
  }

  /** STABLE snapshot of (latest consol, committed tail beyond it) for
    * a LIVE reader racing a concurrent trigger's fold: a fold
    * committing between the two listings would otherwise leave a
    * silent GAP — an old consol plus a post-cleanup tail missing every
    * batch folded in between. Re-lists until the consol horizon is
    * unchanged across the tail read; dirs deleted between here and the
    * scan still fail loudly (FileNotFoundException) and a plain retry
    * sees the folded state — transient by construction, never wrong.
    * Checks the composition fence and each listed dir's own fence. */
  def stableSnapshot(spark: SparkSession, f: Family)
      : (Option[ListedDir], Seq[ListedDir]) = {
    f.fenceRoot.foreach(r => IndexForget.assertClean(spark, r))
    var snap: Option[(Option[ListedDir], Seq[ListedDir])] = None
    var attempts = 0
    while (snap.isEmpty) {
      val c0 = latestConsol(spark, f)
      val t = committedTail(spark, f, c0.map(_.id).getOrElse(-1L))
      if (latestConsol(spark, f).map(_.id) == c0.map(_.id))
        snap = Some((c0, t))
      else {
        attempts += 1
        require(attempts < 8,
          s"could not take a stable listing of ${f.root}")
      }
    }
    val (consol, tail) = snap.get
    (consol.toSeq ++ tail).foreach(_.assertClean())
    (consol, tail)
  }

  /** Forget-time debris reaping — for QUIESCED tenants only: delete
    * `batch_id=`/`consol_id=` dirs LACKING their commit marker. Such
    * debris is invisible to every probe (the commit protocol) but
    * physically retains bytes — a crashed trigger's partial files or a
    * torn fold can hold a victim's rows that the committed-dir rewrite
    * never touches, and nothing reclaims them unless the stream later
    * resumes and happens to overwrite. Safe under quiesce: an
    * uncommitted batch dir either retries with a full overwrite of its
    * own dir or its batch is dead; an uncommitted consol is overwritten
    * by the next fold. Returns the reaped paths. */
  def reapUncommitted(spark: SparkSession, f: Family): Seq[Path] = {
    val fs = fsOf(spark, f.root)
    val root = new Path(f.root)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isDirectory && (
        (n.startsWith("batch_id=") &&
          !fs.exists(new Path(s.getPath, f.batchMarker))) ||
          (n.startsWith(ConsolPrefix) &&
            !fs.exists(new Path(s.getPath, f.consolMarker))))
    }.map { s =>
      fs.delete(s.getPath, true)
      s.getPath
    }
  }
}
