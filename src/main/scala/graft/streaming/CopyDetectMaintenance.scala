package graft.streaming

import graft.text.CopyIndex
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming cross-document COPY DETECTION — live contamination alerts
  * for the ingest pipeline (q224/q225's semantics as a foreachBatch
  * tenant; reference: documents land in a content-indexed serving store
  * precisely so fresh arrivals are checkable against the corpus,
  * cdk_stacks/ops.py + the README's content-query walkthrough).
  * Per micro-batch of `(id, text)` documents:
  *   1. winnow the batch into position-carrying selections
  *      ([[CopyIndex.selections]] — the same fingerprint pipeline the
  *      persisted index holds, so the two sides cannot drift);
  *   2. probe the bucket-partitioned index for localized matches
  *      against every EARLIER batch — the read prunes to the batch's
  *      fingerprint buckets, so per-trigger I/O is O(batch + touched
  *      buckets), never O(index);
  *   3. self-join the batch for same-trigger pairs (copies that arrive
  *      together must not slip through);
  *   4. emit canonicalized alerts (a_id < b_id, each side's matched-run
  *      span) under the batch's own alert directory;
  *   5. append the batch's selections to the index under the batch's
  *      own directory;
  *   6. when the committed tail has grown past `consolidateAfter`
  *      directories, fold it into ONE consolidated dir (see RETENTION).
  *
  * Exactly-once: both writes are batch-scoped `batch_id=` dirs in
  * overwrite mode (the DocIngest index discipline) — a retried batch
  * overwrites its own contribution, and the probe reads only COMMITTED
  * dirs with `batch_id < this batch`, so a retry probes the identical
  * pre-batch index and recomputes identical alerts.
  *
  * Completeness: the alert UNION over ANY partition of a corpus into
  * ordered batches equals the one-shot q224 answer — a pair lands in
  * the later document's trigger (cross-probe) or in their shared
  * trigger (self-join), exactly once either way. StreamingSpec replays
  * the planted-copy corpus across triggers and pins parity, including
  * across a consolidation boundary.
  *
  * RETENTION — automated consolidation: without maintenance the probe
  * would list every `batch_id=` dir ever committed, O(triggers)
  * metadata per trigger — at production trigger counts (thousands/day)
  * that listing dominates data I/O long before the data does. So batch
  * N's own update folds the committed tail once it exceeds
  * `consolidateAfter` dirs: the union of `consol_id=H_old` and every
  * committed `batch_id ≤ H` (H = the largest committed id < N) is
  * deduplicated and rewritten THROUGH [[CopyIndex.writeIndex]] into
  * `consol_id=H` (writeIndex lays the bucket dirs AND renames the
  * `_FANOUT` marker into place LAST, so the marker is the consolidated
  * dir's commit point), after which the folded dirs delete. Probes read
  * {latest committed consol, committed batch dirs in (H, N)} — the
  * listed-dir count is bounded by the threshold, not the stream's age.
  * Crash-safe at every window: a torn fold has no `_FANOUT` → invisible
  * to probes, overwritten by the next fold; a committed fold whose
  * deletes didn't run is healed lazily (every update deletes dirs at or
  * below the current horizon). Retries stay exactly-once because the
  * fold only touches `batch_id < N` — a retried batch N probes the
  * same union whether or not its first attempt consolidated. Alert
  * dirs get the same fold (they are immutable facts keyed by batch_id,
  * carried as a column in the consolidated file; `_SUCCESS` — written
  * at job commit, after the data moves — is the marker there).
  * Document deletion is [[forget]] — quiesce, then one call rewrites
  * the victims out of every committed index dir AND every alert
  * mentioning them, under a composition fence at both roots. */
object CopyDetectMaintenance {

  /** Default consolidation threshold: fold once more than this many
    * committed batch dirs sit outside the consolidated dir. Sized so
    * fold cost (a full rewrite of the tail + prior consol) amortizes
    * to ~2 extra writes per row while the per-trigger listing stays
    * ≤ threshold + 1 directories. */
  val DefaultConsolidateAfter = 16

  private val ConsolPrefix = "consol_id="

  /** The alert relation's fixed schema — the layout CONTRACT for every
    * alert dir (batch-scoped dirs carry batch_id as the partition dir;
    * consolidated files carry it as a column). All-long by
    * construction: ids normalize to long in [[CopyIndex.selections]],
    * COUNT(DISTINCT) and the span min/max are long. StreamingSpec pins
    * this against a written dir's actual footer. */
  private[graft] val alertSchema: StructType = StructType(
    Seq("a_id", "b_id", "shared", "a_lo", "a_hi", "b_lo", "b_hi",
      "batch_id").map(StructField(_, LongType)))

  /** Fold one micro-batch of documents — call from foreachBatch.
    * `w`/`nBuckets`/`minShared` must be constant for the life of an
    * index directory (the fingerprint function and bucket layout are
    * baked into the files); `consolidateAfter` may vary freely (it
    * only gates maintenance cadence). */
  def update(indexDir: String, alertDir: String, docs: DataFrame,
             batchId: Long, idCol: String = "doc_id",
             textCol: String = "text", w: Int = 4,
             nBuckets: Int = CopyIndex.DefaultBuckets,
             minShared: Int = 2,
             consolidateAfter: Int = DefaultConsolidateAfter): Unit = {
    val spark = docs.sparkSession
    // four consumers below (bucket resolution, probe join, self-join,
    // index append) — pin once; the relation is batch-sized
    val sel = CopyIndex.selections(docs, idCol, textCol, w).localCheckpoint()

    val a = sel.select(col("id").as("a_id"), col("pos").as("a_pos"),
      col("fp"))
    val b = sel.select(col("id").as("b_id"), col("pos").as("b_pos"),
      col("fp"))
    val within = CopyIndex.localize(
      a.join(b, Seq("fp")).filter(col("a_id") < col("b_id")),
      "a", "b", minShared)

    val cross = priorIndex(spark, indexDir, batchId, sel, nBuckets) match {
      // first batch: nothing earlier to probe — an alert relation of
      // the self-join's own shape (no hand-built schema to drift)
      case None => within.limit(0)
      case Some(idx) =>
        // idx_id =!= new_id: a re-ingested doc_id (the same doc in a
        // later batch) must not alert as "copying itself" against its
        // own earlier selections. It DOES re-alert against its earlier
        // cross-doc partners — by design (re-ingestion re-raises the
        // contamination fact); the q224-parity claim assumes the
        // batches PARTITION the corpus (each doc_id arrives once).
        val raw = CopyIndex.localize(
          idx.select(col("id").as("idx_id"), col("pos").as("idx_pos"),
              col("fp"))
            .join(sel.select(col("id").as("new_id"),
              col("pos").as("new_pos"), col("fp")), Seq("fp"))
            .filter(col("idx_id") =!= col("new_id")),
          "idx", "new", minShared)
        // canonical orientation (a_id < b_id): arrival order is the
        // source's business; alerts must align with the one-shot answer
        // whichever side was indexed first
        val older = col("idx_id") < col("new_id")
        raw.select(
          least(col("idx_id"), col("new_id")).as("a_id"),
          greatest(col("idx_id"), col("new_id")).as("b_id"),
          col("shared"),
          when(older, col("idx_lo")).otherwise(col("new_lo")).as("a_lo"),
          when(older, col("idx_hi")).otherwise(col("new_hi")).as("a_hi"),
          when(older, col("new_lo")).otherwise(col("idx_lo")).as("b_lo"),
          when(older, col("new_hi")).otherwise(col("idx_hi")).as("b_hi"))
    }

    cross.unionByName(within)
      .write.mode("overwrite").parquet(s"$alertDir/batch_id=$batchId")
    CopyIndex.writeIndex(sel, s"$indexDir/batch_id=$batchId", nBuckets)

    if (consolidateAfter > 0) {
      consolidateIndex(spark, indexDir, batchId, nBuckets, consolidateAfter)
      consolidateAlerts(spark, alertDir, batchId, consolidateAfter)
    }
  }

  /** Every alert emitted so far, with its `batch_id` provenance —
    * the latest COMMITTED consolidated dir plus the committed batch
    * directories beyond it, read as explicit paths: a crash
    * mid-job-commit leaves partial files under an unmarked dir, and a
    * monitoring reader must never see them as data
    * ([[CommittedDirs]]). The explicit [[alertSchema]] makes the read
    * independent of footer inference — a tail of all-empty alert dirs
    * (the common no-contamination case) still reads cleanly. A LIVE
    * monitor racing a concurrent trigger's fold takes a STABLE listing
    * (the consol horizon must hold across the tail read — otherwise an
    * old consol + a post-cleanup tail would silently gap the folded
    * batches); a dir deleted between the listing and the scan still
    * fails loudly (FileNotFoundException) and a plain retry sees the
    * consolidated state — transient by construction, never wrong. */
  def alerts(spark: SparkSession, alertDir: String): DataFrame = {
    // deletion fence: a forget() that died mid-swap must fail the
    // monitor loudly, not serve a half-forgotten alert history
    graft.operators.IndexForget.assertClean(spark, alertDir)
    val fs = fsOf(spark, alertDir)
    // STABLE snapshot of (consol, tail): a fold committing between the
    // two listings would otherwise leave a silent GAP — an old consol
    // plus a post-cleanup tail missing the batches folded in between.
    // Re-list until the consol horizon holds across the tail read.
    var snap: Option[(Option[(Long, Path)], Seq[(Long, Path)])] = None
    var attempts = 0
    while (snap.isEmpty) {
      val c0 = latestConsol(fs, alertDir, "_SUCCESS")
      val t = CommittedDirs.list(spark, alertDir)
        .filter(_._1 > c0.map(_._1).getOrElse(-1L))
      if (latestConsol(fs, alertDir, "_SUCCESS").map(_._1) == c0.map(_._1))
        snap = Some((c0, t))
      else {
        attempts += 1
        require(attempts < 8,
          s"could not take a stable listing of $alertDir")
      }
    }
    val (consol, tail) = snap.get
    require(consol.nonEmpty || tail.nonEmpty,
      s"no committed copy-detect alerts under $alertDir")
    val consolDf = consol match {
      case Some((_, p)) => spark.read.schema(alertSchema).parquet(p.toString)
      case None => emptyAlerts(spark)
    }
    val tailDf =
      if (tail.isEmpty) emptyAlerts(spark)
      else spark.read.option("basePath", alertDir).schema(alertSchema)
        .parquet(tail.map(_._2.toString): _*)
    consolDf.unionByName(tailDf)
  }

  /** Right-to-be-forgotten across the WHOLE tenant — the victims'
    * selections leave every committed index dir (consolidated + tail,
    * via [[CopyIndex.forget]] per dir: victim buckets only) AND every
    * alert that MENTIONS a victim leaves the alert dirs (a
    * contamination fact about a forgotten document is part of what
    * must be forgotten; `a_id`/`b_id` are both checked). QUIESCE the
    * stream first: a concurrent trigger's probe would race the
    * partition swaps — the `_FORGET_INPROGRESS` fence turns that race
    * into a loud failure, not a wrong answer. `nBuckets` must be the
    * tenant's constant (verified per dir against `_FANOUT`). */
  def forget(spark: SparkSession, indexDir: String, alertDir: String,
             ids: Seq[Long],
             nBuckets: Int = CopyIndex.DefaultBuckets): Unit = {
    import graft.operators.IndexForget
    // COMPOSITION fence at both roots: the per-dir markers clear as
    // each dir's rewrite commits, so a crash BETWEEN dirs (or between
    // the index and alert passes) would otherwise leave a clean-looking
    // half-forgotten tenant. Probes check these roots too.
    IndexForget.fence(spark, indexDir)
    IndexForget.fence(spark, alertDir)
    val ifs = fsOf(spark, indexDir)
    // EVERY committed consol dir, not just the newest: a fold's missed
    // cleanup can leave a shadowed-but-readable older consol holding
    // the victim's rows — a compliance leak if skipped
    val idxDirs = consols(ifs, indexDir, CopyIndex.FanoutMarker)
      .map(_._2) ++ CommittedDirs.list(spark, indexDir).map(_._2)
    idxDirs.foreach(d => CopyIndex.forget(spark, d.toString, ids, nBuckets))
    val afs = fsOf(spark, alertDir)
    val victim = col("a_id").isin(ids: _*) || col("b_id").isin(ids: _*)
    // one pass over every committed alert dir: batch-scoped dirs carry
    // batch_id in the DIR NAME (7-col files), consolidated dirs carry
    // it as a column — per-dir schemas; holdFence keeps the root marker
    // up until BOTH roots unfence below
    val batchSchema =
      org.apache.spark.sql.types.StructType(alertSchema.dropRight(1))
    IndexForget.forgetWhere(spark, alertDir,
      CommittedDirs.list(spark, alertDir)
        .map(d => d._2.getName -> batchSchema) ++
        consols(afs, alertDir, "_SUCCESS")
          .map(d => d._2.getName -> alertSchema),
      victim, holdFence = true)
    IndexForget.unfence(spark, alertDir)
    IndexForget.unfence(spark, indexDir)
  }

  /** What a probe at `batchId` would list: (committed consolidation
    * horizon if any, committed tail batch ids beyond it) — the bound
    * the consolidation exists to enforce, exposed so StreamingSpec can
    * pin the listed-dir count dropping across a fold. */
  private[graft] def indexParts(spark: SparkSession, indexDir: String,
                                batchId: Long): (Option[Long], Seq[Long]) = {
    val consol = latestConsol(fsOf(spark, indexDir), indexDir,
      CopyIndex.FanoutMarker)
    val horizon = consol.map(_._1).getOrElse(-1L)
    (consol.map(_._1),
      CommittedDirs.list(spark, indexDir)
        .map(_._1).filter(i => i > horizon && i < batchId).sorted)
  }

  /** Bucket-pruned selections of everything COMMITTED BEFORE `batchId`
    * — the latest consolidated dir plus the batch dirs beyond it; None
    * when this is the first batch (or every earlier dir is uncommitted
    * debris). Reads explicit `…/bucket=B` paths (the
    * CopyIndex.prunedIndex discipline): a root read would list every
    * bucket dir of every trigger ever run before pruning and would
    * crash on a fileless committed dir (an empty batch's partitioned
    * write emits only markers). The `< batchId` cut is what makes a
    * RETRY probe identical to the original run: the retrying batch's
    * own committed dir is invisible to it, and consolidation never
    * folds past batchId − 1. */
  private def priorIndex(spark: SparkSession, indexDir: String,
                         batchId: Long, sel: DataFrame, nBuckets: Int)
      : Option[DataFrame] = {
    val fs = fsOf(spark, indexDir)
    val consol = latestConsol(fs, indexDir, CopyIndex.FanoutMarker)
    val horizon = consol.map(_._1).getOrElse(-1L)
    val tail = CommittedDirs.list(spark, indexDir)
      .filter(t => t._1 > horizon && t._1 < batchId).map(_._2)
    val roots = consol.map(_._2).toSeq ++ tail
    if (roots.isEmpty) return None
    // the fan-out is baked into every dir's layout — a drifted caller
    // constant must fail loudly here, not prune the wrong modulus's
    // directories (one marker read per trigger)
    CopyIndex.verifyFanout(spark, roots.head.toString, nBuckets)
    // deletion fences: the tenant-level forget marks the ROOT for the
    // whole composition, and each dir carries its own marker while ITS
    // rewrite is in flight — a probe must refuse both (an fs.exists
    // per prior dir, bounded by the consolidation threshold)
    graft.operators.IndexForget.assertClean(spark, indexDir)
    roots.foreach(r =>
      graft.operators.IndexForget.assertClean(spark, r.toString))
    val want = CopyIndex.bucketsOf(sel, nBuckets)
      .map(b => s"bucket=$b").toSet
    // one listing per prior dir — bounded by consolidateAfter + 1, not
    // by the stream's age; bucket dirs exist only where data landed, so
    // the selected paths always carry parquet footers
    val bucketDirs = roots.flatMap { d =>
      fs.listStatus(d).filter(s => s.isDirectory &&
        want.contains(s.getPath.getName)).map(_.getPath.toString)
    }
    Some(
      if (bucketDirs.isEmpty)
        spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            CopyIndex.indexSchema)
          .select("id", "pos", "fp")
      else
        // no basePath: the roots mix batch_id= and consol_id= names, so
        // partition inference would see conflicting columns; the files
        // carry (id, pos, fp) and that is all the probe needs
        spark.read.parquet(bucketDirs: _*).select("id", "pos", "fp"))
  }

  /** Fold the committed index tail into `consol_id=H` once it exceeds
    * the threshold, and lazily heal any leftovers of an earlier fold
    * whose deletes didn't run. The fold dedupes exact (id, pos, fp)
    * rows (probe answers are duplicate-blind — the compactIndex
    * argument — so consolidation doubles as compaction for
    * re-ingestion-heavy streams). */
  private def consolidateIndex(spark: SparkSession, indexDir: String,
                               batchId: Long, nBuckets: Int,
                               after: Int): Unit = {
    // a torn tenant forget leaves the root fence up — folding (and its
    // cleanup deletes) must not run over forget debris
    graft.operators.IndexForget.assertClean(spark, indexDir)
    val fs = fsOf(spark, indexDir)
    val consol = latestConsol(fs, indexDir, CopyIndex.FanoutMarker)
    val horizon = consol.map(_._1).getOrElse(-1L)
    cleanupBelow(fs, indexDir, horizon)
    val tail = CommittedDirs.list(spark, indexDir)
      .filter(t => t._1 > horizon && t._1 < batchId)
    if (tail.size <= after) return
    val h = tail.map(_._1).max
    val parts = consol.map(_._2).toSeq ++ tail.map(_._2)
    val union = parts.map(p =>
        CopyIndex.prunedIndex(spark, p.toString, 0 until nBuckets, nBuckets)
          .select("id", "pos", "fp"))
      .reduce(_ unionAll _)
      .dropDuplicates("id", "pos", "fp")
      // sever lineage before writeIndex: the fold's own write must not
      // re-open the (about-to-be-deleted) source files lazily
      .localCheckpoint()
    // writeIndex renames _FANOUT into place LAST — the commit point; a
    // crash before it leaves an unmarked dir no probe reads and the
    // next fold overwrites
    CopyIndex.writeIndex(union, s"$indexDir/$ConsolPrefix$h", nBuckets)
    cleanupBelow(fs, indexDir, h)
  }

  /** Alert-side fold: same cadence and commit shape as the index fold,
    * but alerts are plain immutable rows — the consolidated file just
    * carries batch_id as a column. `_SUCCESS` (created at job commit,
    * after the data files move) is the marker. */
  private def consolidateAlerts(spark: SparkSession, alertDir: String,
                                batchId: Long, after: Int): Unit = {
    graft.operators.IndexForget.assertClean(spark, alertDir)
    val fs = fsOf(spark, alertDir)
    val consol = latestConsol(fs, alertDir, "_SUCCESS")
    val horizon = consol.map(_._1).getOrElse(-1L)
    cleanupBelow(fs, alertDir, horizon)
    val tail = CommittedDirs.list(spark, alertDir)
      .filter(t => t._1 > horizon && t._1 < batchId)
    if (tail.size <= after) return
    val h = tail.map(_._1).max
    val tailDf = spark.read.option("basePath", alertDir).schema(alertSchema)
      .parquet(tail.map(_._2.toString): _*)
    val union = consol match {
      case Some((_, p)) =>
        spark.read.schema(alertSchema).parquet(p.toString)
          .unionByName(tailDf)
      case None => tailDf
    }
    union.localCheckpoint()
      .write.mode("overwrite").parquet(s"$alertDir/$ConsolPrefix$h")
    cleanupBelow(fs, alertDir, h)
  }

  /** Delete batch dirs at or below the committed horizon and consol
    * dirs below it — safe at any time: probes only read the LATEST
    * committed consol plus dirs ABOVE its id, and no batch ≤ horizon
    * can retry once a later batch's offsets committed. */
  private def cleanupBelow(fs: FileSystem, dir: String,
                           horizon: Long): Unit =
    if (horizon >= 0) {
      fs.listStatus(new Path(dir)).foreach { s =>
        val n = s.getPath.getName
        val stale =
          (n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLongOption.exists(_ <= horizon)) ||
            (n.startsWith(ConsolPrefix) &&
              n.stripPrefix(ConsolPrefix).toLongOption.exists(_ < horizon))
        if (stale) fs.delete(s.getPath, true): Unit
      }
    }

  /** Every COMMITTED `consol_id=` dir under `dir` in id order (commit
    * marker: `_FANOUT` for index folds — renamed into place last — or
    * `_SUCCESS` for alert folds). */
  private def consols(fs: FileSystem, dir: String,
                      marker: String): Seq[(Long, Path)] = {
    val root = new Path(dir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(ConsolPrefix))
      .flatMap { s =>
        s.getPath.getName.stripPrefix(ConsolPrefix).toLongOption
          .filter(_ => fs.exists(new Path(s.getPath, marker)))
          .map(_ -> s.getPath)
      }
      .sortBy(_._1)
  }

  /** The newest committed consol dir — the one probes read. Older
    * committed consols are shadowed (their content is a subset of the
    * latest) and deleted lazily by [[cleanupBelow]]; [[forget]] still
    * rewrites them while they exist. */
  private def latestConsol(fs: FileSystem, dir: String,
                           marker: String): Option[(Long, Path)] =
    consols(fs, dir, marker).lastOption

  private def emptyAlerts(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], alertSchema)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
