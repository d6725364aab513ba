package graft

import java.nio.file.Files
import graft.operators.IndexForget
import graft.streaming.{CommittedDirs, FoldProtocol}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Direct unit coverage of the SHARED fold / stable-listing protocol —
  * the tenants' StreamingSpec suites drive it end-to-end through their
  * own layouts; this pins the protocol's own contract so a future
  * tenant cannot mis-read it: threshold + horizon math, the
  * `< batchId` retry cut, lazy cleanup healing, torn-fold
  * invisibility, fileless-tail reaping, stable snapshots, fences, and
  * forget-time debris reaping. */
class FoldProtocolSpec extends SparkTestBase {

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fam(root: String) =
    FoldProtocol.Family(root, "_SUCCESS", Some(root))

  private def writeBatch(root: String, id: Long, rows: Seq[Long]): Unit = {
    import spark.implicits._
    rows.toDF("v").repartition(1)
      .write.mode("overwrite").parquet(s"$root/batch_id=$id")
  }

  private def foldAt(root: String, batchId: Long, after: Int): Unit =
    FoldProtocol.fold(spark, fam(root), batchId, after) { (consol, tail) =>
      val dirs = (consol.toSeq ++ tail)
        .filter(d => d.children.exists(c => c.isFile && c.getLen > 0 &&
          c.getPath.getName.endsWith(".parquet")))
        .map(_.path.toString)
      if (dirs.isEmpty) None
      else Some(spark.read.parquet(dirs: _*).localCheckpoint())
    } { (u, dest) => u.write.mode("overwrite").parquet(dest) }

  private def rows(root: String): Seq[Long] = {
    val (consol, tail) = FoldProtocol.stableSnapshot(spark, fam(root))
    val dirs = (consol.toSeq ++ tail).map(_.path.toString)
    spark.read.parquet(dirs: _*).select("v")
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  test("fold: threshold gate, the < batchId retry cut, horizon cleanup, row preservation, torn-fold invisibility, all-fileless reap") {
    val root = Files.createTempDirectory("foldproto").toString
    (0L to 5L).foreach(i => writeBatch(root, i, Seq(i)))

    // below threshold: no fold
    foldAt(root, 6L, 10)
    assert(FoldProtocol.latestConsol(spark, fam(root)).isEmpty)

    // the RETRY CUT: a fold at batchId = 3 may only touch ids < 3 —
    // a retried batch must see the same prior state either way
    foldAt(root, 3L, 1)
    val c0 = FoldProtocol.latestConsol(spark, fam(root))
    assert(c0.map(_.id) === Some(2L), s"fold crossed the retry cut: $c0")
    assert(CommittedDirs.list(spark, root).map(_._1).sorted === Seq(3L, 4L, 5L),
      "fold deleted dirs at or above its own batch id")
    assert(rows(root) === (0L to 5L), "fold lost or duplicated rows")

    // a TORN fold (data, no marker) is invisible to every reader …
    val torn = s"$root/consol_id=4"
    import spark.implicits._
    Seq(999L).toDF("v").write.mode("overwrite").parquet(torn)
    fsOf(root).delete(new Path(torn, "_SUCCESS"), false)
    assert(FoldProtocol.latestConsol(spark, fam(root)).map(_.id) === Some(2L),
      "an unmarked consol dir was read as committed")
    assert(rows(root) === (0L to 5L))
    // … and the next fold's lazy cleanup reaps it (id < new horizon)
    foldAt(root, 6L, 1)
    assert(FoldProtocol.latestConsol(spark, fam(root)).map(_.id) === Some(5L))
    assert(!fsOf(root).exists(new Path(torn)),
      "the torn fold's debris survived the next fold's cleanup")
    assert(rows(root) === (0L to 5L), "post-fold union drifted")

    // a fileless tail folding OVER a data-carrying consol rolls the
    // consol forward (the union is the consol's own rows) — content
    // preserved, horizon advanced, listing re-bounded
    (6L to 9L).foreach { i =>
      val d = new Path(s"$root/batch_id=$i")
      fsOf(root).mkdirs(d)
      fsOf(root).create(new Path(d, "_SUCCESS"), true).close()
    }
    foldAt(root, 10L, 2)
    assert(CommittedDirs.list(spark, root).isEmpty,
      "fileless committed dirs survived the fold")
    assert(FoldProtocol.latestConsol(spark, fam(root)).map(_.id) === Some(9L))
    assert(rows(root) === (0L to 5L), "rolling the consol forward lost rows")

    // an all-FILELESS family (idle stream from birth: markers only, no
    // consol) REAPS the tail instead of writing an empty consol — and
    // instead of growing the listing one dir per empty trigger forever
    val root2 = Files.createTempDirectory("foldproto_idle").toString
    (0L to 4L).foreach { i =>
      val d = new Path(s"$root2/batch_id=$i")
      fsOf(root2).mkdirs(d)
      fsOf(root2).create(new Path(d, "_SUCCESS"), true).close()
    }
    foldAt(root2, 5L, 2)
    assert(CommittedDirs.list(spark, root2).isEmpty,
      "idle-stream fileless dirs survived the reap")
    assert(FoldProtocol.latestConsol(spark, fam(root2)).isEmpty,
      "the fileless reap fabricated a consol")
  }

  test("stable snapshot: consol + tail beyond it; composition and per-dir forget fences refuse loudly; reapUncommitted deletes exactly the unmarked dirs") {
    val root = Files.createTempDirectory("foldproto_snap").toString
    (0L to 3L).foreach(i => writeBatch(root, i, Seq(i)))
    foldAt(root, 3L, 1) // consol_id=2, tail = {3}

    val (consol, tail) = FoldProtocol.stableSnapshot(spark, fam(root))
    assert(consol.map(_.id) === Some(2L))
    assert(tail.map(_.id) === Seq(3L))

    // per-dir forget fence rides the snapshot's own listing
    val f = fsOf(root)
    f.create(new Path(s"$root/batch_id=3", IndexForget.Marker), true).close()
    val e1 = intercept[IllegalArgumentException](
      FoldProtocol.stableSnapshot(spark, fam(root)))
    assert(e1.getMessage.contains("forget"), e1.getMessage)
    f.delete(new Path(s"$root/batch_id=3", IndexForget.Marker), false)

    // composition fence at the family's fence root
    f.create(new Path(root, IndexForget.Marker), true).close()
    intercept[IllegalArgumentException](
      FoldProtocol.stableSnapshot(spark, fam(root)))
    intercept[IllegalArgumentException](foldAt(root, 5L, 0))
    f.delete(new Path(root, IndexForget.Marker), false)

    // forget-time debris reaping: unmarked batch/consol dirs delete,
    // committed dirs and root FILES are untouched
    f.mkdirs(new Path(s"$root/batch_id=9"))   // crashed trigger, no marker
    f.mkdirs(new Path(s"$root/consol_id=7"))  // torn fold, no marker
    f.create(new Path(root, "_SOME_ROOT_FILE"), true).close()
    val reaped = FoldProtocol.reapUncommitted(spark, fam(root))
      .map(_.getName).toSet
    assert(reaped === Set("batch_id=9", "consol_id=7"),
      s"reap touched the wrong dirs: $reaped")
    assert(f.exists(new Path(root, "_SOME_ROOT_FILE")))
    assert(FoldProtocol.latestConsol(spark, fam(root)).map(_.id) === Some(2L))
    assert(CommittedDirs.list(spark, root).map(_._1) === Seq(3L))
    assert(rows(root) === (0L to 3L), "reap changed committed content")
  }

  test("family batchMarker: a _FANOUT family's batch dir with only _SUCCESS is torn — invisible to the committed tail, reaped by reapUncommitted; a dir with both markers survives") {
    // the CopyIndex index-family shape: writeIndex renames _FANOUT into
    // place AFTER the job commit, so _SUCCESS-but-no-_FANOUT is a crash
    // window, not a committed batch — a reap that judged by _SUCCESS
    // would skip the victim-bearing debris and the tenant forget would
    // then throw in verifyFanout with the fences up (round-15 ADVICE)
    val root = Files.createTempDirectory("foldproto_fanout").toString
    val fanoutFam = FoldProtocol.Family(root, "_FANOUT", Some(root),
      batchMarker = "_FANOUT")
    val f = fsOf(root)
    writeBatch(root, 0L, Seq(0L)) // job commit wrote _SUCCESS …
    f.create(new Path(s"$root/batch_id=0", "_FANOUT"), true).close() // … + rename
    writeBatch(root, 1L, Seq(1L)) // torn: _SUCCESS only, no _FANOUT

    assert(FoldProtocol.committedTail(spark, fanoutFam, -1L)
      .map(_.id) === Seq(0L),
      "a _SUCCESS-only dir counted as committed under a _FANOUT family")
    val reaped = FoldProtocol.reapUncommitted(spark, fanoutFam)
      .map(_.getName)
    assert(reaped === Seq("batch_id=1"),
      s"reap under batchMarker judged the wrong dirs: $reaped")
    assert(f.exists(new Path(s"$root/batch_id=0")),
      "reap deleted a fully-committed (_SUCCESS + _FANOUT) dir")

    // the default family is unchanged: _SUCCESS alone still commits
    val plain = Files.createTempDirectory("foldproto_plain").toString
    writeBatch(plain, 0L, Seq(0L))
    assert(FoldProtocol.committedTail(spark, fam(plain), -1L)
      .map(_.id) === Seq(0L))
    assert(FoldProtocol.reapUncommitted(spark, fam(plain)).isEmpty)
  }
}
