package graft

import java.nio.file.Files
import graft.functions.{Ivf, IvfPq}
import graft.operators.IndexForget
import graft.text.{Bm25Index, CopyIndex, Phrase, TextOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten across the persisted index families
  * (IndexForget protocol): a deleted document must never appear in any
  * probe/search answer afterward, survivors' answers must equal an
  * index built WITHOUT the victim (not just "victim filtered from
  * output"), only victim partitions may rewrite, a torn run must fence
  * probes loudly, and a re-run must be idempotent. */
class ForgetSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** File names per partition dir — the "untouched partitions keep
    * their exact files" witness. */
  private def filesByPart(dir: String): Map[String, Set[String]] = {
    val f = fs(dir)
    f.listStatus(new Path(dir)).filter(_.isDirectory).map { d =>
      d.getPath.getName ->
        f.listStatus(d.getPath).map(_.getPath.getName).toSet
    }.toMap
  }

  /** documents + planted near-verbatim dups (the IndexSpec recipe) —
    * victims with guaranteed cross-doc matches. */
  private lazy val docs = {
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    base.unionAll(
        base.filter(col("doc_id") < 100)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" xdup marker")).as("text")))
      .localCheckpoint()
  }

  test("CopyIndex.forget: victim pairs vanish; survivors equal a rebuild without the victim; untouched buckets keep their exact files; torn run fences probes; re-run is a no-op") {
    val sel = CopyIndex.selections(docs, "doc_id", "text").localCheckpoint()
    val dir = tmp("forget_copyindex")
    CopyIndex.writeIndex(sel.filter(col("id") < 100000), dir)
    val batch = sel.filter(col("id") >= 100000).localCheckpoint()

    def probe() = CopyIndex.probe(spark, dir, batch)
      .collect().map(_.toString).toSet
    val before = probe()
    assert(before.exists(_.contains("[0,100000,")),
      s"victim doc 0 has no planted match — vacuous: $before")

    val inventory = filesByPart(dir)
    val rewritten = CopyIndex.forget(spark, dir, Seq(0L)).toSet
    assert(rewritten.nonEmpty, "victim had selections but no bucket rewrote")

    // victim gone; everything else byte-identical to a ground-up
    // rebuild WITHOUT the victim (the only acceptable meaning of
    // "forgotten": not filtered late, absent from the relation)
    val after = probe()
    assert(!after.exists(_.contains("[0,100000,")), s"victim survived: $after")
    val rebuilt = tmp("forget_copyindex_rebuilt")
    CopyIndex.writeIndex(
      sel.filter(col("id") < 100000 && col("id") =!= 0), rebuilt)
    val want = CopyIndex.probe(spark, rebuilt, batch)
      .collect().map(_.toString).toSet
    assert(after === want,
      s"forget diverged from rebuild-without: missing=${want -- after} extra=${after -- want}")

    // ONLY victim buckets rewrote — the others keep their exact files
    val inventoryAfter = filesByPart(dir)
    inventory.keys.filterNot(k =>
        rewritten.map(v => s"bucket=$v").contains(k)).foreach { k =>
      assert(inventoryAfter(k) === inventory(k),
        s"untouched $k was rewritten")
    }

    // torn-run fence: a crash mid-forget leaves the marker — every
    // probe choke point must refuse loudly
    val f = fs(dir)
    f.create(new Path(dir, IndexForget.Marker), true).close()
    val err = intercept[IllegalArgumentException](probe())
    assert(err.getMessage.contains("forget"), err.getMessage)
    // crash-window repair: a retired-but-unpublished bucket (trash dir,
    // original missing) must restore before the re-filter
    val someBucket = inventoryAfter.keys.head
    assert(f.rename(new Path(dir, someBucket),
      new Path(dir, s".forget_trash.$someBucket")))
    // re-running forget (idempotent — victim already gone) heals both
    assert(CopyIndex.forget(spark, dir, Seq(0L)).isEmpty,
      "re-run found victim rows after a completed forget")
    assert(probe() === want, "repair did not restore the retired bucket")
  }

  test("Phrase.forget: victim drops out of phrase hits; survivors equal a rebuild; rewrite bounded by the victim's term buckets") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .localCheckpoint()
    val dir = tmp("forget_phrase")
    Phrase.writeIndex(toks, "doc_id", "w", dir, nBuckets = 64)

    // a real two-term phrase from some document, and a victim that has it
    val first = toks.select(col("doc_id"), col("w")).first()
    val terms = first.getSeq[String](1).take(2)
    def hits(d: String) = Phrase.phraseHitsIndexed(spark, d, terms)
      .collect().map(_.toString).toSet
    val victim = first.getLong(0)
    val before = hits(dir)
    assert(before.exists(_.startsWith(s"[$victim,")),
      s"victim $victim does not match the phrase — vacuous")

    val nTerms = toks.filter(col("doc_id") === victim)
      .select(explode(col("w"))).distinct().count()
    val rewritten = Phrase.forget(spark, dir, Seq(victim))
    assert(rewritten.size <= nTerms,
      s"rewrote ${rewritten.size} buckets for a $nTerms-distinct-term victim")

    val rebuilt = tmp("forget_phrase_rebuilt")
    Phrase.writeIndex(toks.filter(col("doc_id") =!= victim), "doc_id", "w",
      rebuilt, nBuckets = 64)
    assert(hits(dir) === hits(rebuilt),
      "forgotten index diverged from rebuild-without")
    assert(!hits(dir).exists(_.startsWith(s"[$victim,")), "victim survived")
  }

  test("Bm25Index.forget: postings AND stat sidecars update — scores equal an index built without the victim (N, Σdl, df all shift)") {
    val terms = Seq("hash", "scan", "window")
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .localCheckpoint()
    def build(dir: String, t: org.apache.spark.sql.DataFrame): Unit = {
      Phrase.writeIndex(t, "doc_id", "w", s"$dir/post", nBuckets = 64)
      t.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
        .write.mode("overwrite").parquet(s"$dir/docs")
      spark.read.parquet(s"$dir/docs")
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
        .write.mode("overwrite").parquet(s"$dir/corpus")
    }
    val dir = tmp("forget_bm25")
    build(dir, toks)
    def top10(d: String) = graft.queries.Analytics
      .bm25IndexProbe(spark, d, terms).collect().map(_.toString).toSeq
    val before = top10(dir)
    assert(before.nonEmpty, "no scored docs — vacuous")
    // victim = the current top doc: its removal must change the answer
    val victim = before.head.stripPrefix("[").takeWhile(_ != ',').toLong

    Bm25Index.forget(spark, dir, Seq(victim))
    val rebuilt = tmp("forget_bm25_rebuilt")
    build(rebuilt, toks.filter(col("doc_id") =!= victim))
    assert(top10(dir) === top10(rebuilt),
      "forgotten BM25 diverged from rebuild-without — a sidecar did not update")
    assert(!top10(dir).exists(_.startsWith(s"[$victim,")), "victim survived")
  }

  test("Ivf.forget: victim leaves exactly its one cell; survivors' top-k equals the same centroids over the corpus minus the victim; fence guards both IVF and IVF-PQ reads") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val query = e.filter(col("vec_id") === 0)
    val corpus = e.filter(col("vec_id") =!= 0)
    val path = tmp("forget_ivf")
    Ivf.writeIndex(corpus, "vec_id", "v", nlist = 8, path,
      iters = 2, sampleMod = 7)

    def top(d: String) = Ivf.ivfTopKIndexed(spark, d, query, "v",
        k = 10, nprobe = 3)
      .select(col("nn_id"), round(col("sim"), 9).as("s"))
      .collect().map(_.toString).toSeq
    val before = top(path)
    val victim = before.head.stripPrefix("[").takeWhile(_ != ',').toLong

    val cells = Ivf.forget(spark, path, Seq(victim))
    assert(cells.size === 1,
      s"a single vector rewrote ${cells.size} cells — should live in exactly one")

    val after = top(path)
    assert(!after.exists(_.startsWith(s"[$victim,")), "victim survived")
    // survivors: same frozen centroids, corpus minus victim, inline path
    val want = Ivf.ivfTopK(corpus.filter(col("vec_id") =!= victim), query,
        "vec_id", "v", k = 10, Ivf.readCentroids(spark, path), nprobe = 3)
      .select(col("nn_id"), round(col("sim"), 9).as("s"))
      .collect().map(_.toString).toSeq
    assert(after === want, s"survivor answers diverged: $after vs $want")

    // the same fence covers the IVF-PQ shelf (shared cell layout)
    val pq = tmp("forget_ivfpq")
    IvfPq.writeIndex(corpus, "vec_id", "v", nlist = 8, m = 8, ksub = 16,
      pq, iters = 2, sampleMod = 7)
    val pqBefore = IvfPq.topKIndexed(spark, pq, query, "v", k = 10,
      nprobe = 3).collect().map(_.getLong(0)).toSeq
    val pqVictim = pqBefore.head
    Ivf.forget(spark, pq, Seq(pqVictim))
    val pqAfter = IvfPq.topKIndexed(spark, pq, query, "v", k = 10,
      nprobe = 3).collect().map(_.getLong(0)).toSeq
    assert(!pqAfter.contains(pqVictim), "IVF-PQ victim survived")
    // removing one candidate keeps the relative order of the rest
    assert(pqAfter.take(9) === pqBefore.filterNot(_ == pqVictim).take(9),
      "IVF-PQ survivor ordering shifted")

    fs(pq).create(new Path(s"$pq/cells", IndexForget.Marker), true).close()
    intercept[IllegalArgumentException](
      IvfPq.topKIndexed(spark, pq, query, "v", k = 10))
    intercept[IllegalArgumentException](
      Ivf.ivfTopKIndexed(spark, pq, query, "v", k = 10))
  }

  test("flat-family forget: NearDup signatures, Spans substring index, SimJoin prefix index — victims vanish, survivors equal a rebuild; the frozen token order survives; torn swaps fence and heal") {
    import graft.text.{NearDup, SimJoin, Spans}
    val toks = docs.withColumn("w", TextOps.tokens(col("text")))
      .filter(size(col("w")) >= 3).select("doc_id", "w").localCheckpoint()

    // ---- NearDup (flat signature relation) ----
    val nd = tmp("forget_neardup")
    NearDup.writeIndex(toks, "doc_id", "w", nd)
    def ndPairs(d: String) = NearDup.pairsFromIndex(spark, d, 0.3)
      .collect().map(_.toString).toSet
    val ndBefore = ndPairs(nd)
    assert(ndBefore.nonEmpty, "no near-dup pairs — vacuous")
    val ndVictim = ndBefore.head.stripPrefix("[").takeWhile(_ != ',').toLong
    assert(NearDup.forget(spark, nd, Seq(ndVictim)), "victim had no rows")
    val ndRb = tmp("forget_neardup_rb")
    NearDup.writeIndex(toks.filter(col("doc_id") =!= ndVictim),
      "doc_id", "w", ndRb)
    assert(ndPairs(nd) === ndPairs(ndRb),
      "NearDup forget diverged from rebuild-without")
    // torn flat swap: the sibling marker must fence the probe …
    val ndP = new Path(nd)
    val marker = new Path(ndP.getParent,
      ndP.getName + "._FORGET_INPROGRESS")
    fs(nd).create(marker, true).close()
    intercept[IllegalArgumentException](ndPairs(nd))
    // … and a re-run (no victims left) heals it
    assert(!NearDup.forget(spark, nd, Seq(ndVictim)))
    assert(ndPairs(nd) === ndPairs(ndRb), "healing re-run changed pairs")
    // mid-swap crash window: the live dir retired to trash but the
    // replacement never published — repair must restore the original
    val trash = new Path(ndP.getParent, ndP.getName + ".forget_trash")
    assert(fs(nd).rename(ndP, trash))
    fs(nd).create(marker, true).close()
    intercept[Exception](ndPairs(nd)) // missing dir or fence — loud either way
    assert(!NearDup.forget(spark, nd, Seq(ndVictim)))
    assert(ndPairs(nd) === ndPairs(ndRb),
      "trash restore lost rows or the fence stayed up")

    // ---- Spans (flat substring-window relation) ----
    val sp = tmp("forget_spans")
    Spans.writeIndex(toks, "doc_id", "w", sp, window = 8)
    def spRows(d: String) = Spans.fromIndex(spark, d)
      .collect().map(_.toString).toSet
    val spVictim = Spans.fromIndex(spark, sp).first().getLong(0)
    assert(Spans.forget(spark, sp, Seq(spVictim)))
    val spRb = tmp("forget_spans_rb")
    Spans.writeIndex(toks.filter(col("doc_id") =!= spVictim),
      "doc_id", "w", spRb, window = 8)
    assert(spRows(sp) === spRows(spRb),
      "Spans forget diverged from rebuild-without")

    // ---- SimJoin (prefix + fp under a frozen dfreq order) ----
    val sets = toks.select(col("doc_id").as("id"),
      array_distinct(col("w")).as("set")).localCheckpoint()
    val sj = tmp("forget_simjoin")
    SimJoin.writeIndex(sets, sj, 1, 2)
    // keep (a_id, b_id) parsed — a rendered contains() check would
    // false-positive on the intersection/size fields
    def sjPairs(d: String) = SimJoin.pairsFromIndex(spark, d, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.toString)).toSet
    val sjBefore = sjPairs(sj)
    assert(sjBefore.nonEmpty, "no simjoin pairs — vacuous")
    val sjVictim = sjBefore.head._1
    val dfreqBefore = spark.read.parquet(s"$sj/dfreq")
      .collect().map(_.toString).toSet
    SimJoin.forget(spark, sj, Seq(sjVictim))
    // the frozen token order is LAYOUT, not data — untouched by forget
    assert(spark.read.parquet(s"$sj/dfreq")
        .collect().map(_.toString).toSet === dfreqBefore,
      "forget rewrote the frozen dfreq order")
    // pair-set parity vs a ground-up rebuild WITHOUT the victim — the
    // rebuild freezes a DIFFERENT order (new frequencies), but prefix
    // exactness holds under any consistent total order, so the PAIR
    // SETS must agree
    val sjRb = tmp("forget_simjoin_rb")
    SimJoin.writeIndex(sets.filter(col("id") =!= sjVictim), sjRb, 1, 2)
    assert(sjPairs(sj) === sjPairs(sjRb),
      "SimJoin forget diverged from rebuild-without")
    assert(!sjPairs(sj).exists(r => r._1 == sjVictim || r._2 == sjVictim),
      "victim survived in a pair")
    // composition fence at the family root
    fs(sj).create(new Path(sj, IndexForget.Marker), true).close()
    intercept[IllegalArgumentException](sjPairs(sj))
    SimJoin.forget(spark, sj, Seq(sjVictim)) // heals
    assert(sjPairs(sj) === sjPairs(sjRb))
  }

  test("heal keeps the fence up through the re-scan: a torn run whose retry dies in the victim scan leaves the marker (probes still refused); a clean retry clears it on the no-victims path") {
    val sel = CopyIndex.selections(docs, "doc_id", "text").localCheckpoint()
    val dir = tmp("forget_fence_heal")
    CopyIndex.writeIndex(sel.filter(col("id") < 100000), dir)
    assert(CopyIndex.forget(spark, dir, Seq(0L)).nonEmpty)

    val f = fs(dir)
    // simulate the torn re-run: the fence is up AND the re-scan will
    // die (a garbage file in a partition dir fails the parquet read)
    f.create(new Path(dir, IndexForget.Marker), true).close()
    val someBucket = f.listStatus(new Path(dir))
      .filter(_.isDirectory).head.getPath
    val junk = new Path(someBucket, "junk.parquet")
    val out = f.create(junk, true)
    out.write("this is not parquet".getBytes("UTF-8")); out.close()
    intercept[Exception](CopyIndex.forget(spark, dir, Seq(0L)))
    // the heal died mid-scan — the fence must STILL be up (clearing it
    // at repair time would let probes read a possibly-half-forgotten
    // index before the re-filter confirmed the layout)
    assert(f.exists(new Path(dir, IndexForget.Marker)),
      "a retry that died in the victim scan dropped the fence early")
    intercept[IllegalArgumentException](
      IndexForget.assertClean(spark, dir))

    // a clean retry (junk removed, victim already gone) heals: marker
    // clears on the no-victims return path
    f.delete(junk, false)
    assert(CopyIndex.forget(spark, dir, Seq(0L)).isEmpty)
    assert(!f.exists(new Path(dir, IndexForget.Marker)),
      "no-victims retry left the fence up")
    IndexForget.assertClean(spark, dir)
  }

  test("CopyDetectMaintenance.forget: victim leaves every committed index dir (consolidated + tail) and every alert mentioning it; survivors unchanged; a same-text newcomer no longer matches the victim; fence guards the monitor") {
    import graft.streaming.CopyDetectMaintenance
    val root = java.nio.file.Files.createTempDirectory("forget_tenant").toString
    val idx = s"$root/index"
    val alertDir = s"$root/alerts"
    // 3 triggers with consolidateAfter = 1 → the fold fires (consol +
    // tail), so forget must reach BOTH layouts
    (0 until 3).foreach { i =>
      CopyDetectMaintenance.update(idx, alertDir,
        docs.filter(col("doc_id") % 3 === i), i.toLong,
        idCol = "doc_id", textCol = "text", consolidateAfter = 1)
    }
    // keep (a_id, b_id) parsed — a rendered-string contains() check
    // would false-positive on shared/span fields equal to the victim id
    def rows(): Set[(Long, Long, String)] =
      CopyDetectMaintenance.alerts(spark, alertDir)
        .select("a_id", "b_id", "shared", "a_lo", "a_hi", "b_lo", "b_hi")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.toString)).toSet
    val before = rows()
    def mentions(set: Set[(Long, Long, String)], id: Long) =
      set.filter(r => r._1 == id || r._2 == id)
    val victim = 5L
    assert(mentions(before, victim).nonEmpty,
      "victim has no alerts — vacuous (planted dup 100005 should pair)")

    CopyDetectMaintenance.forget(spark, idx, alertDir, Seq(victim))
    val after = rows()
    assert(mentions(after, victim).isEmpty,
      s"alerts still mention the victim: ${mentions(after, victim)}")
    assert(after === before -- mentions(before, victim),
      "forget changed alerts beyond the victim's rows")

    // the victim's selections are gone from the INDEX too: a newcomer
    // with the victim's exact text must match the surviving dup
    // (100005) but never the victim
    val newcomer = docs.filter(col("doc_id") === victim)
      .select(lit(999999L).as("doc_id"), col("text"))
    CopyDetectMaintenance.update(idx, alertDir, newcomer, 3L,
      idCol = "doc_id", textCol = "text", consolidateAfter = 1)
    val withNew = rows()
    assert(mentions(withNew, victim).isEmpty,
      "a post-forget probe matched the forgotten document")
    assert(mentions(withNew, 999999L)
        .exists(r => r._1 == 100000L + victim || r._2 == 100000L + victim),
      s"newcomer did not match the surviving dup: ${mentions(withNew, 999999L)}")

    // a FILELESS committed batch dir (an empty trigger commits markers
    // only) must not crash the tenant forget — nor strand its fence
    CopyDetectMaintenance.update(idx, alertDir,
      docs.filter(lit(false)), 4L,
      idCol = "doc_id", textCol = "text", consolidateAfter = 1)
    CopyDetectMaintenance.forget(spark, idx, alertDir, Seq(victim))
    assert(rows() === withNew,
      "forget over a fileless batch dir changed the alert history")

    // fence: a torn tenant forget must fail the monitor loudly …
    fs(alertDir).create(new Path(alertDir, IndexForget.Marker), true).close()
    val err = intercept[IllegalArgumentException](
      CopyDetectMaintenance.alerts(spark, alertDir))
    assert(err.getMessage.contains("forget"), err.getMessage)
    // … and re-running forget heals the fence (idempotent re-filter)
    CopyDetectMaintenance.forget(spark, idx, alertDir, Seq(victim))
    assert(rows() === withNew, "healing re-run changed the alert history")
  }

  test("tenant forget reaps UNCOMMITTED debris: a crashed trigger's unmarked batch dir and a torn fold hold victim bytes invisible to probes — both physically delete (copy-detect and IVF tenants)") {
    import graft.streaming.{CopyDetectMaintenance, IvfIngestMaintenance}
    import org.apache.hadoop.fs.FileUtil
    val conf = spark.sparkContext.hadoopConfiguration

    // clone a committed dir, dropping the named markers — exactly what
    // a trigger that crashed after its task files moved (but before
    // job commit) leaves behind
    def cloneWithout(f: org.apache.hadoop.fs.FileSystem, src: Path,
                     dst: Path, markers: Set[String]): Unit = {
      f.mkdirs(dst)
      f.listStatus(src).foreach { st =>
        if (!markers.contains(st.getPath.getName))
          FileUtil.copy(f, st.getPath, f,
            new Path(dst, st.getPath.getName), false, conf): Unit
      }
    }

    // ---- copy-detect tenant ----
    val root = tmp("reap_tenant")
    val idx = s"$root/index"
    val alertDir = s"$root/alerts"
    (0 until 2).foreach { i =>
      CopyDetectMaintenance.update(idx, alertDir,
        docs.filter(col("doc_id") % 2 === i), i.toLong,
        idCol = "doc_id", textCol = "text", consolidateAfter = 0)
    }
    val f = fs(root)
    // debris: a torn batch writeIndex (job-committed _SUCCESS present
    // but the _FANOUT rename never ran — the index family's REAL commit
    // point, round-15 ADVICE) and a torn fold (no _FANOUT) — both still
    // carry doc 0's selections on disk
    cloneWithout(f, new Path(idx, "batch_id=0"),
      new Path(idx, "batch_id=9"), Set("_FANOUT"))
    cloneWithout(f, new Path(idx, "batch_id=0"),
      new Path(idx, "consol_id=5"), Set("_SUCCESS", "_FANOUT"))
    cloneWithout(f, new Path(alertDir, "batch_id=0"),
      new Path(alertDir, "batch_id=9"), Set("_SUCCESS"))
    def alertRows(): Set[(Long, Long, String)] =
      CopyDetectMaintenance.alerts(spark, alertDir)
        .select("a_id", "b_id", "shared", "a_lo", "a_hi", "b_lo", "b_hi")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.toString)).toSet
    val before = alertRows()

    CopyDetectMaintenance.forget(spark, idx, alertDir, Seq(0L))
    assert(!f.exists(new Path(idx, "batch_id=9")),
      "unmarked index batch debris survived the tenant forget")
    assert(!f.exists(new Path(idx, "consol_id=5")),
      "torn index fold debris survived the tenant forget")
    assert(!f.exists(new Path(alertDir, "batch_id=9")),
      "unmarked alert batch debris survived the tenant forget")
    // committed history is exactly the usual forget result — reaping
    // touched nothing a probe could see
    assert(alertRows() ===
        before.filterNot(r => r._1 == 0L || r._2 == 0L),
      "reaping changed committed alerts beyond the victim's rows")

    // ---- IVF tenant ----
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val ipath = tmp("reap_ivf") + "/idx"
    graft.functions.Ivf.writeIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "v", nlist = 4, ipath, iters = 1, sampleMod = 7)
    IvfIngestMaintenance.update(ipath, e.filter(col("vec_id") % 2 =!= 0),
      0L, idCol = "vec_id", vecCol = "v", consolidateAfter = 0)
    val bf = fs(ipath)
    cloneWithout(bf, new Path(s"$ipath/batches/batch_id=0"),
      new Path(s"$ipath/batches/batch_id=7"), Set("_SUCCESS"))
    cloneWithout(bf, new Path(s"$ipath/batches/batch_id=0"),
      new Path(s"$ipath/batches/consol_id=3"), Set("_SUCCESS"))
    IvfIngestMaintenance.forget(spark, ipath, Seq(1L))
    assert(!bf.exists(new Path(s"$ipath/batches/batch_id=7")),
      "unmarked IVF batch debris survived the tenant forget")
    assert(!bf.exists(new Path(s"$ipath/batches/consol_id=3")),
      "torn IVF fold debris survived the tenant forget")
    // the committed dirs still serve
    val served = IvfIngestMaintenance.topKLive(spark, ipath,
        e.filter(col("vec_id") === 0), "v", k = 5, nprobe = 2)
      .collect()
    assert(served.nonEmpty && !served.exists(_.getLong(0) == 1L),
      "post-reap shelf lost committed rows or kept the victim")
  }

  test("tenant forget heals trash-retired dirs BEFORE listing: a dir a crashed run left in trash is restored AND rewritten on the re-run, not silently skipped (DocIngest index + copy-detect alerts)") {
    import graft.streaming.{CopyDetectMaintenance, DocIngest}
    import graft.streaming.DocIngest.Sinks
    import org.apache.spark.sql.streaming.Trigger

    // ---- DocIngest signature index ----
    def doc(id: Long, text: String): String =
      s"""{"doc_id": $id, "text": "$text", "source": "crawl", "ingest_ts": "2026-08-12T10:00:00.000Z"}"""
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val src = tmp("heal_docingest_src")
    Files.writeString(java.nio.file.Paths.get(s"$src/a.jsonl"),
      doc(100, base) + "\n" +
        doc(101, "a fully unrelated second text about parquet footers") + "\n")
    val root = tmp("heal_docingest")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val idx = s"$root/idx"
    val (m, r, d) = DocIngest.start(spark.readStream.text(src), sinks,
      Trigger.AvailableNow(), nearDupIndex = Some(idx),
      nearDupThreshold = 0.3, consolidateAfter = 0)
    assert(m.awaitTermination(120000)); assert(r.awaitTermination(120000))
    assert(d.awaitTermination(120000))

    val f = fs(idx)
    // the dir that actually HOLDS the victim's signatures (a no-data
    // trailing trigger can leave an empty committed dir too)
    val batchDir = f.listStatus(new Path(idx))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .find { s =>
        !spark.read.schema(DocIngest.signatureSchema)
          .parquet(s.getPath.toString).filter(col("id") === 100L).isEmpty
      }.get.getPath
    // the crash window: forgetWhere retired the dir to trash and died
    // before publishing the rewrite — fence up, dir exists ONLY in trash
    assert(f.rename(batchDir,
      new Path(idx, s".forget_trash.${batchDir.getName}")))
    IndexForget.fence(spark, idx)
    // the heal re-run: must RESTORE the dir first, then rewrite it —
    // a list-before-repair implementation restores it after listing
    // and skips the rewrite, leaving the victim's signatures alive
    // behind cleared fences
    DocIngest.forget(spark, sinks, Seq(100L), Some(idx))
    assert(f.exists(batchDir), "heal did not restore the retired dir")
    assert(!f.exists(new Path(idx, s".forget_trash.${batchDir.getName}")))
    val sigs = spark.read.schema(DocIngest.signatureSchema)
      .parquet(batchDir.toString).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(!sigs.contains(100L),
      "victim signatures survived in the RESTORED dir — the heal listed " +
        "before repairing")
    assert(sigs.contains(101L), "survivor signatures lost in the heal")
    assert(!f.exists(new Path(idx, IndexForget.Marker)),
      "fence left up after a successful heal")

    // ---- copy-detect alert family (same window, forgetWhere caller) ----
    val docs2 = graft.queries.Text.plantedCopyDocs(spark, sf).localCheckpoint()
    val croot = tmp("heal_copydetect")
    (0 until 2).foreach { i =>
      CopyDetectMaintenance.update(s"$croot/index", s"$croot/alerts",
        docs2.filter(col("doc_id") % 2 === i), i.toLong,
        idCol = "doc_id", textCol = "t", consolidateAfter = 0)
    }
    val victim = CopyDetectMaintenance.alerts(spark, s"$croot/alerts")
      .select("a_id").first().getLong(0)
    val af = fs(s"$croot/alerts")
    val alertDirWithVictim = af.listStatus(new Path(s"$croot/alerts"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .find { s =>
        !spark.read.schema(org.apache.spark.sql.types.StructType(
            CopyDetectMaintenance.alertSchema.dropRight(1)))
          .parquet(s.getPath.toString)
          .filter(col("a_id") === victim || col("b_id") === victim).isEmpty
      }.get.getPath
    assert(af.rename(alertDirWithVictim,
      new Path(s"$croot/alerts", s".forget_trash.${alertDirWithVictim.getName}")))
    IndexForget.fence(spark, s"$croot/alerts")
    CopyDetectMaintenance.forget(spark, s"$croot/index", s"$croot/alerts",
      Seq(victim))
    assert(af.exists(alertDirWithVictim),
      "alert heal did not restore the retired dir")
    val alerts = CopyDetectMaintenance.alerts(spark, s"$croot/alerts")
      .filter(col("a_id") === victim || col("b_id") === victim).count()
    assert(alerts === 0,
      "victim alerts survived the heal — the alert list was taken " +
        "before repair")
  }

  test("tenant forget heals STAGED-swap-retired dirs BEFORE listing: a dir mid-publish-crashed to its .forget_old. sibling restores and rewrites, not silently skips (copy-detect index + IVF batches)") {
    import graft.streaming.{CopyDetectMaintenance, IvfIngestMaintenance}

    // ---- copy-detect INDEX family (per-dir CopyIndex.forget can
    // auto-stage for mass deletes; the crash retires the whole dir to
    // a dot-prefixed sibling invisible to the consol/batch listing) ----
    val docs2 = graft.queries.Text.plantedCopyDocs(spark, sf).localCheckpoint()
    val croot = tmp("stagedheal_copydetect")
    (0 until 2).foreach { i =>
      CopyDetectMaintenance.update(s"$croot/index", s"$croot/alerts",
        docs2.filter(col("doc_id") % 2 === i), i.toLong,
        idCol = "doc_id", textCol = "t", consolidateAfter = 0)
    }
    val victim = CopyDetectMaintenance.alerts(spark, s"$croot/alerts")
      .select("a_id").first().getLong(0)
    val ifs = fs(s"$croot/index")
    val idxDir = ifs.listStatus(new Path(s"$croot/index"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .find { s =>
        !spark.read.parquet(s.getPath.toString)
          .filter(col("id") === victim).isEmpty
      }.get.getPath
    assert(ifs.rename(idxDir,
      new Path(s"$croot/index", s".forget_old.${idxDir.getName}")))
    IndexForget.fence(spark, s"$croot/index") // the torn run's fence
    CopyDetectMaintenance.forget(spark, s"$croot/index", s"$croot/alerts",
      Seq(victim))
    assert(ifs.exists(idxDir),
      "heal did not restore the staged-retired index dir")
    assert(spark.read.parquet(idxDir.toString)
        .filter(col("id") === victim).count() === 0,
      "victim selections survived in the restored dir — the index list " +
        "was taken before the staged heal")
    assert(!ifs.exists(new Path(s"$croot/index", IndexForget.Marker)),
      "index fence left up after the heal")

    // ---- IVF batches family (same window, cell-partitioned dirs) ----
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val ipath = tmp("stagedheal_ivf") + "/idx"
    graft.functions.Ivf.writeIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "v", nlist = 4, ipath, iters = 1, sampleMod = 7)
    IvfIngestMaintenance.update(ipath, e.filter(col("vec_id") % 2 =!= 0),
      0L, idCol = "vec_id", vecCol = "v", consolidateAfter = 0)
    val bf = fs(ipath)
    val bdir = new Path(s"$ipath/batches/batch_id=0")
    val victimVec = spark.read.parquet(bdir.toString)
      .select("nn_id").first().getLong(0)
    assert(bf.rename(bdir,
      new Path(s"$ipath/batches", ".forget_old.batch_id=0")))
    IndexForget.fence(spark, ipath)
    IvfIngestMaintenance.forget(spark, ipath, Seq(victimVec))
    assert(bf.exists(bdir),
      "heal did not restore the staged-retired IVF batch dir")
    assert(spark.read.parquet(bdir.toString)
        .filter(col("nn_id") === victimVec).count() === 0,
      "victim vector survived in the restored dir — the batches list " +
        "was taken before the staged heal")
    assert(!bf.exists(new Path(ipath, IndexForget.Marker)),
      "IVF fence left up after the heal")
  }

  test("tenant forget FINISHES a committed staged publish before listing: a dir crashed between the two publish renames (.forget_stage. committed, original missing) is published, its victim-retaining .forget_old. sibling dropped, and the re-run rewrites the published dir") {
    import graft.streaming.CopyDetectMaintenance

    val docs2 = graft.queries.Text.plantedCopyDocs(spark, sf).localCheckpoint()
    val croot = tmp("stagepub_copydetect")
    (0 until 2).foreach { i =>
      CopyDetectMaintenance.update(s"$croot/index", s"$croot/alerts",
        docs2.filter(col("doc_id") % 2 === i), i.toLong,
        idCol = "doc_id", textCol = "t", consolidateAfter = 0)
    }
    val victim = CopyDetectMaintenance.alerts(spark, s"$croot/alerts")
      .select("a_id").first().getLong(0)
    val ifs = fs(s"$croot/index")
    val idxDir = ifs.listStatus(new Path(s"$croot/index"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .find { s =>
        !spark.read.parquet(s.getPath.toString)
          .filter(col("id") === victim).isEmpty
      }.get.getPath
    // fabricate the mid-publish window of an EARLIER crashed per-dir
    // staged forget: the original is renamed to the staging name (so it
    // keeps its _FANOUT/_SUCCESS sidecars), the staging commit marker is
    // touched, the retired original sits at .forget_old., and the
    // original name is GONE from the committed listing
    val stage = new Path(s"$croot/index", s".forget_stage.${idxDir.getName}")
    val old = new Path(s"$croot/index", s".forget_old.${idxDir.getName}")
    assert(ifs.rename(idxDir, stage))
    ifs.create(new Path(stage, ".stage_complete"), true).close()
    ifs.mkdirs(old) // the retired, victim-retaining pre-forget bytes
    spark.read.parquet(stage.toString).write.parquet(s"$old/data")
    IndexForget.fence(spark, s"$croot/index") // the torn run's fence
    CopyDetectMaintenance.forget(spark, s"$croot/index", s"$croot/alerts",
      Seq(victim))
    assert(ifs.exists(idxDir),
      "heal did not finish the committed staged publish")
    assert(!ifs.exists(old),
      "victim-retaining .forget_old. sibling survived the heal")
    assert(!ifs.exists(stage), "staging sibling survived its publish")
    assert(!ifs.exists(new Path(idxDir, ".stage_complete")),
      "staging commit marker rode into the published dir")
    assert(spark.read.parquet(idxDir.toString)
        .filter(col("id") === victim).count() === 0,
      "victim selections survived — the index list was taken before " +
        "the publish was finished")
    assert(!ifs.exists(new Path(s"$croot/index", IndexForget.Marker)),
      "index fence left up after the heal")

    // ---- IVF batches family, same committed-stage window ----
    import graft.streaming.IvfIngestMaintenance
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val ipath = tmp("stagepub_ivf") + "/idx"
    graft.functions.Ivf.writeIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "v", nlist = 4, ipath, iters = 1, sampleMod = 7)
    IvfIngestMaintenance.update(ipath, e.filter(col("vec_id") % 2 =!= 0),
      0L, idCol = "vec_id", vecCol = "v", consolidateAfter = 0)
    val bf = fs(ipath)
    val bdir = new Path(s"$ipath/batches/batch_id=0")
    val victimVec = spark.read.parquet(bdir.toString)
      .select("nn_id").first().getLong(0)
    val bStage = new Path(s"$ipath/batches", ".forget_stage.batch_id=0")
    val bOld = new Path(s"$ipath/batches", ".forget_old.batch_id=0")
    assert(bf.rename(bdir, bStage))
    bf.create(new Path(bStage, ".stage_complete"), true).close()
    bf.mkdirs(bOld)
    spark.read.parquet(bStage.toString).write.parquet(s"$bOld/data")
    IndexForget.fence(spark, ipath)
    IvfIngestMaintenance.forget(spark, ipath, Seq(victimVec))
    assert(bf.exists(bdir),
      "IVF heal did not finish the committed staged publish")
    assert(!bf.exists(bOld),
      "victim-retaining .forget_old. IVF sibling survived the heal")
    assert(!bf.exists(bStage), "IVF staging sibling survived its publish")
    assert(spark.read.parquet(bdir.toString)
        .filter(col("nn_id") === victimVec).count() === 0,
      "victim vector survived — the batches list was taken before the " +
        "publish was finished")
    assert(!bf.exists(new Path(ipath, IndexForget.Marker)),
      "IVF fence left up after the heal")
  }

  test("forget(holdFence = true): a caller's composition fence survives every return path — no victims, fileless root, and a full rewrite") {
    import spark.implicits._
    val root = tmp("forget_holdfence")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "part")
      .write.partitionBy("part").mode("overwrite").parquet(root)
    val f = fs(root)
    val marker = new Path(root, IndexForget.Marker)

    // the composition caller fences the SAME root it passes to forget
    IndexForget.fence(spark, root)
    // no-victims early return must NOT drop the fence
    assert(IndexForget.forget(spark, root, "part", "id", Seq(99L),
      holdFence = true).isEmpty)
    assert(f.exists(marker), "no-victim return dropped the held fence")
    // a real rewrite keeps it up too
    assert(IndexForget.forget(spark, root, "part", "id", Seq(1L),
      holdFence = true) === Seq("a"))
    assert(f.exists(marker), "rewrite completion dropped the held fence")
    assert(spark.read.parquet(root).select("id").as[Long].collect().toSet
      === Set(2L, 3L))
    // fileless root early return (every partition dir gone)
    val root2 = tmp("forget_holdfence_empty")
    f.mkdirs(new Path(root2))
    f.create(new Path(root2, "_SUCCESS"), true).close()
    IndexForget.fence(spark, root2)
    assert(IndexForget.forget(spark, root2, "part", "id", Seq(1L),
      holdFence = true).isEmpty)
    assert(f.exists(new Path(root2, IndexForget.Marker)),
      "fileless-root return dropped the held fence")
    // the default (holdFence = false) still clears, as before
    IndexForget.unfence(spark, root)
    assert(IndexForget.forget(spark, root, "part", "id", Seq(99L)).isEmpty)
    assert(!f.exists(marker), "unheld no-victim forget left a stale marker")
    // the STAGED path honors a held fence too: the marker rides the
    // staging itself through the publish (not a post-swap re-touch),
    // so it survives every crash window of the swap
    IndexForget.fence(spark, root)
    assert(IndexForget.forget(spark, root, "part", "id", Seq(2L),
      holdFence = true, stagedFraction = 0.0) === Seq("b"))
    assert(f.exists(marker), "staged publish dropped the held fence")
    assert(spark.read.parquet(root).select("id").as[Long].collect().toSet
      === Set(3L))
    IndexForget.unfence(spark, root)
  }

  test("staged bulk forget: parity with the per-dir path; mid-build staging invisible and reaped; mid-publish crash finishes; auto-switch needs both gates") {
    import spark.implicits._
    def build(root: String): Unit =
      spark.range(400)
        .select(col("id"), pmod(col("id"), lit(40)).cast("string").as("part"))
        .write.partitionBy("part").mode("overwrite").parquet(root)
    def rows(root: String): Set[Long] =
      spark.read.parquet(root).select("id").as[Long].collect().toSet
    val ids = (0L until 400L by 3).toSeq // victims land in every partition
    val survivors = (0L until 400L).filterNot(_ % 3 == 0).toSet

    // PARITY: staged (forced) vs per-dir (pinned) on identical twins
    val a = tmp("forget_staged_a")
    val b = tmp("forget_staged_b")
    build(a); build(b)
    // a family sidecar beside the partition dirs (the CopyIndex
    // _FANOUT shape) must survive the whole-root swap
    fs(a).create(new Path(a, "_FANOUT"), true).close()
    val vA = IndexForget.forget(spark, a, "part", "id", ids,
      stagedFraction = 0.0)
    val vB = IndexForget.forget(spark, b, "part", "id", ids,
      stagedFraction = 2.0)
    assert(vA.toSet === vB.toSet, "the two paths found different victims")
    assert(rows(a) === survivors, "staged path lost or kept wrong rows")
    assert(rows(b) === survivors)
    assert(filesByPart(a).keySet === filesByPart(b).keySet,
      "staged path changed the partition layout")
    val f = fs(a)
    assert(!f.exists(new Path(a, IndexForget.Marker)),
      "staged forget left its fence up")
    assert(f.exists(new Path(a, "_FANOUT")),
      "staged swap dropped the family sidecar")
    assert(!f.exists(new Path(a, ".stage_complete")),
      "staging commit marker leaked into the published root")
    // idempotent re-run (staged request, no victims left -> no-op)
    assert(IndexForget.forget(spark, a, "part", "id", ids,
      stagedFraction = 0.0).isEmpty)

    // POST-PUBLISH window: a crash after the publish rename but before
    // the old-sibling delete leaves the FULL pre-forget index in
    // `.forget_old.` — the published root must still be FENCED (the
    // marker rides the staging), so probes refuse until a re-run
    // deletes the retained bytes and only then clears the fence
    val oldB = new Path(new Path(b).getParent,
      s".forget_old.${new Path(b).getName}")
    f.mkdirs(oldB)
    f.create(new Path(b, IndexForget.Marker), true).close()
    val refuse = intercept[IllegalArgumentException](
      IndexForget.assertClean(spark, b))
    assert(refuse.getMessage.contains("forget"))
    assert(IndexForget.forget(spark, b, "part", "id", ids).isEmpty)
    assert(!f.exists(oldB), "retained pre-forget bytes survived the re-run")
    assert(!f.exists(new Path(b, IndexForget.Marker)),
      "fence left up after the healing re-run")

    // AUTO-SWITCH gates: on this 40-partition fixture the default
    // fraction (victims = 40/40 dirs >= 33 floor) picks staged...
    val c = tmp("forget_staged_c")
    build(c)
    val inventoryC = filesByPart(c)
    assert(IndexForget.forget(spark, c, "part", "id", ids).toSet === vA.toSet)
    assert(rows(c) === survivors)
    assert(filesByPart(c).forall { case (k, files) =>
        inventoryC(k) != files },
      "default params did not stage a 100%-victim-fraction mass delete")
    // ...while a victim-bounded delete stays per-dir (untouched
    // partitions keep their exact files) even though its FRACTION
    // (1 of 40 = too few victim dirs) passes nothing
    val d = tmp("forget_staged_d")
    build(d)
    val inventoryD = filesByPart(d)
    assert(IndexForget.forget(spark, d, "part", "id", Seq(0L)) === Seq("0"))
    inventoryD.keys.filterNot(_ == "part=0").foreach { k =>
      assert(filesByPart(d)(k) === inventoryD(k),
        s"single-victim forget rewrote untouched $k")
    }

    // CRASH MID-BUILD: a staging sibling without its job-commit
    // _SUCCESS is invisible to every read (dot prefix) and must REAP
    // on heal, never publish
    val parentA = new Path(a).getParent
    val stageA = new Path(parentA, s".forget_stage.${new Path(a).getName}")
    f.mkdirs(new Path(stageA, "part=0"))
    IndexForget.heal(spark, a)
    assert(!f.exists(stageA), "uncommitted staging survived heal")
    assert(rows(a) === survivors, "mid-build heal touched the live root")

    // CRASH MID-PUBLISH: root retired to .forget_old., staging fully
    // committed — the re-entry must FINISH the publish (the staging is
    // the whole survivor set), not restore the stale root
    val e = tmp("forget_staged_e")
    build(e)
    val parentE = new Path(e).getParent
    val nameE = new Path(e).getName
    val stageE = new Path(parentE, s".forget_stage.$nameE")
    val oldE = new Path(parentE, s".forget_old.$nameE")
    spark.read.option("basePath", e).parquet(e)
      .filter(!col("id").isin(ids: _*))
      .write.partitionBy("part").mode("overwrite").parquet(stageE.toString)
    f.create(new Path(stageE, ".stage_complete"), true).close()
    assert(f.rename(new Path(e), oldE))
    // (root now missing: mid-publish) — a forget re-run heals first
    assert(IndexForget.forget(spark, e, "part", "id", ids,
      stagedFraction = 0.0).isEmpty)
    assert(!f.exists(stageE) && !f.exists(oldE),
      "mid-publish debris survived the healing re-run")
    assert(rows(e) === survivors,
      "mid-publish heal did not finish the committed publish")
  }

  test("staged forget: zero-padded partition values abort the staging (canonicalization guard) and the per-dir fallback resolves the real dir names") {
    import spark.implicits._
    val root = tmp("forget_zeropad")
    // partition VALUES '00'..'03': partition discovery canonicalizes
    // them to ints 0..3, so a staged rebuild would regenerate part=0
    // (merging nothing here but renaming every dir and flipping the
    // inferred column type), and a naive per-dir rewrite would look for
    // the nonexistent part=0 dir
    spark.range(40)
      .select(col("id"),
        lpad(pmod(col("id"), lit(4)).cast("string"), 2, "0").as("part"))
      .write.partitionBy("part").mode("overwrite").parquet(root)
    val namesBefore = filesByPart(root).keySet
    assert(namesBefore === Set("part=00", "part=01", "part=02", "part=03"),
      s"fixture did not lay out zero-padded dirs: $namesBefore")
    // victims in every partition; FORCE the staged path — the guard
    // must bounce it to the per-dir path
    val victims = (0L until 40L by 3).toSeq
    val rewritten = IndexForget.forget(spark, root, "part", "id", victims,
      stagedFraction = 0.0)
    assert(rewritten.toSet === Set("00", "01", "02", "03"),
      s"fallback did not rewrite the on-disk dir names: $rewritten")
    assert(filesByPart(root).keySet === namesBefore,
      "forget renamed or merged zero-padded partition dirs")
    val f = fs(root)
    assert(!f.exists(new Path(root, IndexForget.Marker)),
      "fence left up after the fallback")
    assert(!f.exists(new Path(new Path(root).getParent,
        s".forget_stage.${new Path(root).getName}")),
      "aborted staging left debris")
    val got = spark.read.parquet(s"$root/part=01")
      .select("id").as[Long].collect().toSet
    assert(got === (0L until 40L).filter(i => i % 4 == 1 && i % 3 != 0).toSet,
      "fallback rewrote the wrong rows")
    // idempotent re-run: no victims left
    assert(IndexForget.forget(spark, root, "part", "id", victims,
      stagedFraction = 0.0).isEmpty)
  }

  test("forget resolves PATH-ESCAPED and NULL partition values (r18 ADVICE): victims under 'a:b'-style and __HIVE_DEFAULT_PARTITION__ dirs rewrite, never silently retain") {
    import spark.implicits._
    val root = tmp("forget_escaped")
    // values 'k:0'/'k:1' path-escape on write (':' → '%3A' in the dir
    // name); id % 5 == 4 rows carry a NULL value (the
    // __HIVE_DEFAULT_PARTITION__ dir). The old raw-suffix comparison
    // matched neither class and returned "no victims" with victim rows
    // retained — the silent-compliance-no-op failure mode.
    spark.range(40)
      .select(col("id"),
        when(pmod(col("id"), lit(5)) === 4, lit(null).cast("string"))
          .otherwise(concat(lit("k:"), pmod(col("id"), lit(2)))).as("part"))
      .write.partitionBy("part").mode("overwrite").parquet(root)
    val dirNames = filesByPart(root).keySet
    assert(dirNames.exists(_.contains("%3A")) &&
      dirNames.contains("part=__HIVE_DEFAULT_PARTITION__"),
      s"fixture did not lay out escaped/null dirs: $dirNames")
    // victims in an escaped dir AND in the null dir
    val victims = Seq(1L, 3L, 4L, 9L) // k:1, k:1, NULL, NULL
    val rewritten = IndexForget.forget(spark, root, "part", "id", victims)
    assert(rewritten.nonEmpty, "escaped/null victim dirs were not resolved")
    val left = spark.read.parquet(root).select("id").as[Long].collect().toSet
    assert(victims.forall(v => !left.contains(v)),
      s"victim rows retained: ${victims.filter(left.contains)}")
    assert(left.size === 40 - victims.size, "survivors lost")
    assert(filesByPart(root).keySet === dirNames,
      "forget renamed or merged escaped partition dirs")
    // idempotent re-run
    assert(IndexForget.forget(spark, root, "part", "id", victims).isEmpty)
  }

  test("archive compaction: a batch dir whose only nonzero bytes live under dot-prefixed debris counts as fileless (all-fileless horizon reaps, no schema-inference crash)") {
    import graft.streaming.ArchiveCompaction
    // two committed-but-empty batch dirs (markers only); one additionally
    // carries crashed-forget debris — a dot-prefixed child with a real
    // parquet file inside. The union read skips dot dirs, so hasData
    // counting that file as data would route this all-fileless horizon
    // into schema inference and throw (r18 ADVICE fix).
    val archive = tmp("compact_dotdebris")
    val f = fs(archive)
    Seq(0L, 1L).foreach { i =>
      val d = new Path(s"$archive/batch_id=$i")
      f.mkdirs(d)
      f.create(new Path(d, "_SUCCESS"), true).close()
    }
    spark.range(5).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(s"$archive/batch_id=1/.forget_tmp.part=0")
    assert(ArchiveCompaction.compact(spark, archive, 1L) === 2,
      "all-fileless horizon (debris included) did not reap both dirs")
    assert(ArchiveCompaction.batchIds(spark, archive).isEmpty,
      "reap left batch dirs behind")
  }

  test("DocIngest tenant forget: corpus rows, audit rows and near-dup signatures all delete (consolidated + tail dirs); surviving signatures equal a rebuild without the victims; uncommitted debris reaps; re-run is a no-op") {
    import graft.streaming.DocIngest
    import graft.streaming.DocIngest.Sinks
    import org.apache.hadoop.fs.FileUtil
    import org.apache.spark.sql.streaming.Trigger

    def doc(id: Long, text: String): String =
      s"""{"doc_id": $id, "text": "$text", "source": "crawl", "ingest_ts": "2026-08-12T10:00:00.000Z"}"""
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val o0 = "completely different second subject matter entirely about spark shuffles"
    val o1 = "yet another fully unrelated document about watermark state eviction"

    val src = tmp("forget_docingest_src")
    // three single-file triggers with consolidateAfter = 1 → the index
    // holds a consolidated dir AND a tail dir; forget must cover both.
    // DISTINCT mtimes pin the trigger order: the file source orders by
    // modification time, and same-millisecond writes replay in an
    // undefined order (measured — b before a flipped who the near-dup
    // victim was)
    Seq("a.jsonl" -> (doc(100, base) + "\n" + doc(101, o0) + "\n"),
      "b.jsonl" -> (doc(102, base + " extra marker") + "\n" + // near-dup → audit
        doc(103, "tiny doc") + "\n"),                         // quality → audit
      "c.jsonl" -> (doc(104, o1) + "\n")).zipWithIndex
      .foreach { case ((name, content), i) =>
        val p = java.nio.file.Paths.get(s"$src/$name")
        Files.writeString(p, content)
        assert(p.toFile.setLastModified(
          System.currentTimeMillis() - 60000 + i * 10000))
      }
    val root = tmp("forget_docingest")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val idx = s"$root/idx"
    val (m, r, d) = DocIngest.start(
      spark.readStream.option("maxFilesPerTrigger", "1").text(src),
      sinks, Trigger.AvailableNow(), nearDupIndex = Some(idx),
      nearDupThreshold = 0.3, consolidateAfter = 1)
    assert(m.awaitTermination(180000)); assert(r.awaitTermination(120000))
    assert(d.awaitTermination(120000))

    def indexRows(): Set[String] = {
      val (c, t) = DocIngest.indexParts(spark, idx, Long.MaxValue)
      val dirs = c.map(i => s"$idx/consol_id=$i").toSeq ++
        t.map(i => s"$idx/batch_id=$i")
      spark.read.schema(DocIngest.signatureSchema).parquet(dirs: _*)
        .collect().map(_.toString).toSet
    }
    val (c0, t0) = DocIngest.indexParts(spark, idx, Long.MaxValue)
    assert(c0.nonEmpty && t0.nonEmpty,
      s"fixture must exercise consol AND tail dirs: $c0/$t0")
    assert(indexRows().exists(_.startsWith("[100,")),
      "victim 100 never indexed — vacuous")
    assert(spark.read.parquet(s"${sinks.rejects}_neardup")
      .filter(col("doc_id") === 102).count() === 1)
    assert(spark.read.parquet(sinks.rejects)
      .filter(col("doc_id") === 103).count() === 1)

    // uncommitted debris carrying victim signatures: a crashed
    // trigger's unmarked dir — invisible to probes, physically retained
    val f = fs(idx)
    val committed = f.listStatus(new Path(idx))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .head.getPath
    val debris = new Path(idx, "batch_id=9")
    f.mkdirs(debris)
    f.listStatus(committed).foreach { st =>
      if (st.getPath.getName != "_SUCCESS")
        FileUtil.copy(f, st.getPath, f, new Path(debris, st.getPath.getName),
          false, spark.sparkContext.hadoopConfiguration): Unit
    }

    DocIngest.forget(spark, sinks, Seq(100L, 102L, 103L), Some(idx))

    assert(!f.exists(debris), "uncommitted index debris survived forget")
    assert(spark.read.parquet(sinks.corpus)
      .filter(col("doc_id") === 100).count() === 0, "victim corpus rows survived")
    assert(spark.read.parquet(s"${sinks.rejects}_neardup")
      .filter(col("doc_id") === 102).count() === 0, "victim audit rows survived")
    assert(spark.read.parquet(sinks.rejects)
      .filter(col("doc_id") === 103).count() === 0, "victim reject rows survived")
    assert(!indexRows().exists(_.startsWith("[100,")),
      "victim signatures survived in the index")

    // survivors equal a ground-up rebuild WITHOUT the victims — the
    // only acceptable meaning of "forgotten" (same argument as every
    // other family in this suite); the rebuild derives from the
    // surviving corpus through the ingest's own signature pipeline
    val surv = spark.read.parquet(sinks.corpus).select("doc_id", "text")
    val want = graft.text.NearDup.signatureRelation(
        surv.select(col("doc_id"),
          graft.text.TextOps.tokens(col("text")).as("w")), "doc_id", "w")
      .collect().map(_.toString).toSet
    assert(indexRows() === want,
      "surviving signatures diverge from a rebuild without the victims")

    // idempotent re-run; no fence left on any root
    DocIngest.forget(spark, sinks, Seq(100L, 102L, 103L), Some(idx))
    assert(indexRows() === want)
    Seq(idx, sinks.corpus, sinks.rejects, s"${sinks.rejects}_neardup")
      .foreach { p =>
        assert(!fs(p).exists(new Path(p, IndexForget.Marker)),
          s"composition fence left up at $p")
      }

    // CRASHED-COMPACTION window: an ArchiveCompaction that died between
    // its source deletes and the staging rename leaves the corpus rows
    // ONLY in the invisible `.compact-<h>` staging dir (+ `.complete`
    // marker). forget must finish that swap first — a rewrite that only
    // saw committed dirs would "succeed", and the NEXT compaction run
    // would publish the victims right back over the cleaned corpus.
    import graft.streaming.ArchiveCompaction
    val cfs = fs(sinks.corpus)
    val srcIds = ArchiveCompaction.batchIds(spark, sinks.corpus).sorted
    assert(srcIds.nonEmpty)
    val h = srcIds.max
    spark.read.option("basePath", sinks.corpus)
      .parquet(srcIds.map(i => s"${sinks.corpus}/batch_id=$i"): _*)
      .drop("batch_id")
      .write.partitionBy("split").mode("overwrite")
      .parquet(s"${sinks.corpus}/.compact-$h")
    cfs.create(new Path(s"${sinks.corpus}/.compact-$h.complete"), true).close()
    srcIds.foreach(i =>
      cfs.delete(new Path(s"${sinks.corpus}/batch_id=$i"), true))
    // victim 101 now lives ONLY in the staging dir
    DocIngest.forget(spark, sinks, Seq(101L), Some(idx))
    assert(ArchiveCompaction.orphanHorizons(spark, sinks.corpus).isEmpty,
      "forget left the crashed compaction staging unconsumed")
    val corpusAfter = spark.read.parquet(sinks.corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusAfter === Set(104L),
      s"staging victim survived (or survivors lost): $corpusAfter")
    assert(!indexRows().exists(_.startsWith("[101,")),
      "victim 101's signatures survived the forget")
    // and a later maintenance compaction finds nothing to resurrect
    assert(ArchiveCompaction.compactOlderThan(spark, sinks.corpus, 0) >= 0)
    assert(spark.read.parquet(sinks.corpus)
        .select("doc_id").collect().map(_.getLong(0)).toSet === Set(104L),
      "post-forget compaction resurrected forgotten rows")

    // CRASHED-MID-STAGING window (the other half of the compaction
    // crash surface): a compaction that died while WRITING its staging
    // leaves `.compact-<h>` with NO `.complete` marker — invisible to
    // recover() and every reader, yet physically retaining row bytes.
    // forget must REAP it (uncommitted by protocol, safe under
    // quiesce); otherwise bytes it holds outlive the forget
    // indefinitely, violating physical retention.
    val h2 = h + 7
    spark.read.parquet(sinks.corpus)
      .withColumn("doc_id", lit(999L))
      .write.partitionBy("split").mode("overwrite")
      .parquet(s"${sinks.corpus}/.compact-$h2")
    spark.range(1)
      .selectExpr("999L as doc_id", "'s' as source", "'x' as reject_reason")
      .write.mode("overwrite").parquet(s"${sinks.rejects}/.compact-$h2")
    DocIngest.forget(spark, sinks, Seq(999L), Some(idx))
    assert(!cfs.exists(new Path(s"${sinks.corpus}/.compact-$h2")),
      "unmarked corpus staging debris survived forget")
    assert(!fs(sinks.rejects).exists(new Path(s"${sinks.rejects}/.compact-$h2")),
      "unmarked audit staging debris survived forget")
    assert(spark.read.parquet(sinks.corpus)
        .select("doc_id").collect().map(_.getLong(0)).toSet === Set(104L),
      "staging reap touched committed corpus rows")

    // MISTYPED-ROOT refusal: an absent corpus root must fail loudly
    // BEFORE any fence plants — a skip would delete nothing and
    // "succeed" (the silent compliance-no-op class)
    val err = intercept[IllegalArgumentException] {
      DocIngest.forget(spark, sinks.copy(corpus = sinks.corpus + "_typo"),
        Seq(104L), Some(idx))
    }
    assert(err.getMessage.contains("no corpus"))
    Seq(idx, sinks.corpus, sinks.rejects, s"${sinks.rejects}_neardup")
      .foreach { p =>
        assert(!fs(p).exists(new Path(p, IndexForget.Marker)),
          s"refused forget left a fence at $p")
      }
  }
}
