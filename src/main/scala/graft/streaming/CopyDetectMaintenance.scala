package graft.streaming

import graft.text.CopyIndex

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

  // the crash-safe fold/stable-listing machinery is the SHARED protocol
  // (FoldProtocol — one copy across tenants); these two families are
  // this tenant's whole layout config: the index folds commit via
  // CopyIndex's _FANOUT rename, the alert folds via job-commit _SUCCESS,
  // and both fence their own root for the composition forget
  // batchMarker = _FANOUT too: writeIndex renames it into place AFTER
  // the job commit, so a dir with only _SUCCESS is a torn write — the
  // tail probe, the fold and the forget-time reap must all skip it
  // (the stream retry overwrites it wholesale)
  private def indexFamily(indexDir: String): FoldProtocol.Family =
    FoldProtocol.Family(indexDir, CopyIndex.FanoutMarker, Some(indexDir),
      batchMarker = CopyIndex.FanoutMarker)
  private def alertFamily(alertDir: String): FoldProtocol.Family =
    FoldProtocol.Family(alertDir, "_SUCCESS", Some(alertDir))

  /** The alert relation's fixed schema — the layout CONTRACT for every
    * alert dir (batch-scoped dirs carry batch_id as the partition dir;
    * consolidated files carry it as a column). All-long by
    * construction: ids normalize to long in [[CopyIndex.selections]],
    * COUNT(DISTINCT) and the span min/max are long. StreamingSpec pins
    * this against a written dir's actual footer. */
  private[graft] val alertSchema: StructType = StructType(
    Seq("a_id", "b_id", "shared", "a_lo", "a_hi", "b_lo", "b_hi",
      "batch_id").map(StructField(_, LongType)))

  /** The AGGREGATED (coverage) alert schema — one row per matched
    * batch document instead of one per pair (the q226 coverage shape):
    * `(doc_id, n_partners, shared_total, shared_max, lo, hi,
    * batch_id)`. On replica-heavy corpora the pair relation is
    * irreducibly quadratic (every arrival matches every prior replica
    * — ~18M pairs per late trigger at 100×, SCALE.md); coverage mode
    * bounds what a trigger WRITES to ≤ |batch| rows while still
    * answering the operational question ("which arrivals are
    * contaminated, how much, where"). The mode is a per-tenant layout
    * constant like `nBuckets` — the files' schema is baked into the
    * alert dirs. Partner IDS are not stored (counts and extents only),
    * so [[forget]] in this mode only rewrites the victim's own rows;
    * surviving docs' counts are anonymous aggregates (the sketch-forget
    * stance). */
  private[graft] val coverageSchema: StructType = StructType(
    Seq("doc_id", "n_partners", "shared_total", "shared_max", "lo", "hi",
      "batch_id").map(StructField(_, LongType)))

  /** The alert LAYOUT is baked into the files, so — like CopyIndex's
    * `_FANOUT` fan-out — it is persisted at the alert root and verified
    * at every choke point: a caller whose mode constant drifted
    * (update/read/forget against the wrong layout) fails LOUDLY here
    * instead of reading silent nulls through a mismatched schema (the
    * pair columns don't exist in coverage files — a mis-schema'd forget
    * would match no victims and "succeed" having deleted nothing, a
    * compliance no-op). An absent marker is a pre-round-15 pairs
    * tenant. */
  private val ModeMarker = "_ALERT_MODE"

  private def modeName(coverage: Boolean) = if (coverage) "coverage" else "pairs"

  private def writeOrVerifyMode(spark: SparkSession, alertDir: String,
                                coverage: Boolean): Unit = {
    val root = new org.apache.hadoop.fs.Path(alertDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(root, ModeMarker)
    persistedMode(spark, alertDir) match {
      case Some(persisted) =>
        require(persisted == modeName(coverage),
          s"alert dir $alertDir is laid out as '$persisted' but the " +
            s"caller uses '${modeName(coverage)}' — the layout is a " +
            "per-tenant constant; fix the caller (or rebuild the tenant)")
      case None =>
        // a PRE-MARKER root with history is a legacy PAIRS tenant (the
        // marker ships with coverage mode — every tenant that ever ran
        // with it has one, stamped before its first batch write). A
        // caller resuming such a tenant with aggregateAlerts = true must
        // fail HERE: stamping 'coverage' onto pair-schema history would
        // make forget()'s doc_id predicate read nulls through the old
        // pair files and delete nothing (a silent compliance no-op —
        // the exact failure the marker exists to prevent) and coverage()
        // would read garbage. Any batch_id=/consol_id= dir counts,
        // committed or not: an uncommitted dir can only be legacy debris
        // (post-marker tenants stamp before their first write).
        if (coverage && fs.exists(root) &&
            fs.listStatus(root).exists { s =>
              val n = s.getPath.getName
              s.isDirectory && (n.startsWith("batch_id=") ||
                n.startsWith(FoldProtocol.ConsolPrefix))
            })
          throw new IllegalArgumentException(
            s"alert dir $alertDir holds pre-marker (pairs-layout) " +
              "history but the caller uses 'coverage' — the layout is a " +
              "per-tenant constant; resume with aggregateAlerts = false " +
              "or start a fresh tenant root for coverage mode")
        fs.mkdirs(root)
        // temp-then-rename: no reader can observe a half-written marker
        val tmp = new org.apache.hadoop.fs.Path(root, s".$ModeMarker.tmp")
        val out = fs.create(tmp, true)
        try out.write(modeName(coverage).getBytes("UTF-8")) finally out.close()
        fs.delete(m, false)
        require(fs.rename(tmp, m), s"could not publish $ModeMarker at $alertDir")
    }
  }

  /** The persisted layout, if any (None = pre-marker dir: pairs). */
  private def persistedMode(spark: SparkSession,
                            alertDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(alertDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(root, ModeMarker)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  private def persistedCoverage(spark: SparkSession,
                                alertDir: String): Boolean =
    persistedMode(spark, alertDir).contains("coverage")

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
             consolidateAfter: Int = DefaultConsolidateAfter,
             aggregateAlerts: Boolean = false): Unit = {
    val spark = docs.sparkSession
    // layout drift must fail FIRST — before any per-batch compute, and
    // before a mis-shaped dir could land
    writeOrVerifyMode(spark, alertDir, aggregateAlerts)
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

    val rawPairs = cross.unionByName(within)
    val out =
      if (!aggregateAlerts) rawPairs
      // coverage mode: the pair relation still COMPUTES (the per-pair
      // localization is what minShared is defined on) but never
      // persists — the write is ≤ |batch| rows however many replicas
      // each arrival matches
      else coverageOf(rawPairs, sel)
    out.write.mode("overwrite").parquet(s"$alertDir/batch_id=$batchId")
    CopyIndex.writeIndex(sel, s"$indexDir/batch_id=$batchId", nBuckets)

    if (consolidateAfter > 0) {
      consolidateIndex(spark, indexDir, batchId, nBuckets, consolidateAfter)
      consolidateAlerts(spark, alertDir, batchId, consolidateAfter,
        if (aggregateAlerts) coverageSchema else alertSchema)
    }
  }

  /** Roll a trigger's pair alerts up to the q226 coverage shape,
    * credited to THIS batch's documents (for a cross pair the batch
    * side is the later arrival — the union over triggers still covers
    * every pair exactly once, by the same argument as pair alerts; a
    * same-trigger pair credits both sides). By construction this
    * equals a per-batch rollup of the raw mode — StreamingSpec pins
    * that parity against an independently computed rollup. */
  private[streaming] def coverageOf(pairs: DataFrame,
                                    sel: DataFrame): DataFrame = {
    val sideA = pairs.select(col("a_id").as("doc_id"),
      col("b_id").as("partner"), col("shared"),
      col("a_lo").as("lo"), col("a_hi").as("hi"))
    val sideB = pairs.select(col("b_id").as("doc_id"),
      col("a_id").as("partner"), col("shared"),
      col("b_lo").as("lo"), col("b_hi").as("hi"))
    // batch membership is batch-sized — broadcast semi join, so only
    // the trigger's own documents earn coverage rows
    val batchIds = broadcast(sel.select(col("id").as("doc_id")).distinct())
    sideA.unionByName(sideB)
      .join(batchIds, Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(countDistinct(col("partner")).as("n_partners"),
        sum(col("shared")).as("shared_total"),
        max(col("shared")).as("shared_max"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))
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
    require(!persistedCoverage(spark, alertDir),
      s"$alertDir is a coverage-mode tenant — read coverage(), not alerts()")
    alertHistory(spark, alertDir, alertSchema)
  }

  /** [[alerts]]'s counterpart for tenants running
    * `update(aggregateAlerts = true)` — every committed coverage row
    * with batch_id provenance, under the [[coverageSchema]] contract.
    * Same stable-snapshot and fence discipline. */
  def coverage(spark: SparkSession, alertDir: String): DataFrame = {
    require(persistedCoverage(spark, alertDir),
      s"$alertDir is a pairs-mode tenant — read alerts(), not coverage()")
    alertHistory(spark, alertDir, coverageSchema)
  }

  private def alertHistory(spark: SparkSession, alertDir: String,
                           schema: StructType): DataFrame = {
    // stable (consol, tail) snapshot + composition/per-dir deletion
    // fences — all owned by the shared protocol (a forget() that died
    // mid-swap must fail the monitor loudly, not serve a half-forgotten
    // alert history)
    val (consol, tail) =
      FoldProtocol.stableSnapshot(spark, alertFamily(alertDir))
    require(consol.nonEmpty || tail.nonEmpty,
      s"no committed copy-detect alerts under $alertDir")
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val consolDf = consol match {
      case Some(c) => spark.read.schema(schema).parquet(c.path.toString)
      case None => empty
    }
    val tailDf =
      if (tail.isEmpty) empty
      else spark.read.option("basePath", alertDir).schema(schema)
        .parquet(tail.map(_.path.toString): _*)
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
    // the alert layout comes from the tenant's own persisted marker —
    // never a caller flag, whose drift would make the victim predicate
    // read nulls through the wrong schema and "succeed" deleting nothing
    val aggregateAlerts = persistedCoverage(spark, alertDir)
    import graft.operators.IndexForget
    // COMPOSITION fence at both roots: the per-dir markers clear as
    // each dir's rewrite commits, so a crash BETWEEN dirs (or between
    // the index and alert passes) would otherwise leave a clean-looking
    // half-forgotten tenant. Probes check these roots too.
    IndexForget.fence(spark, indexDir)
    IndexForget.fence(spark, alertDir)
    // UNCOMMITTED debris first (the stream is quiesced by contract): a
    // crashed trigger's partial batch dir or a torn fold is invisible
    // to probes but can physically retain the victims' bytes — the
    // committed-dir rewrite below never touches it, and nothing else
    // reclaims it until the stream happens to overwrite. Reaping is
    // safe under quiesce: an uncommitted batch either retries with a
    // full overwrite of its own dir or is dead; an uncommitted consol
    // is overwritten by the next fold.
    FoldProtocol.reapUncommitted(spark, indexFamily(indexDir))
    FoldProtocol.reapUncommitted(spark, alertFamily(alertDir))
    // EVERY committed consol dir, not just the newest: a fold's missed
    // cleanup can leave a shadowed-but-readable older consol holding
    // the victim's rows — a compliance leak if skipped. Batch dirs
    // resolve by the family's OWN commit marker (_FANOUT): a torn
    // writeIndex (job-committed but unrenamed) was just reaped above,
    // and enumerating by _SUCCESS would hand CopyIndex.forget a dir
    // whose verifyFanout throws with the fences up
    // HEAL before listing (the alert pass below already does): the
    // per-dir CopyIndex.forget can take the STAGED whole-dir swap for
    // mass deletes, and a crash mid-publish retires the dir to a
    // dot-prefixed sibling this enumeration cannot see — the re-run
    // would silently skip the (victim-bearing) dir while both fences
    // clear. heal() finishes/restores child staged swaps first.
    IndexForget.heal(spark, indexDir)
    val idxDirs = FoldProtocol.consols(spark, indexFamily(indexDir))
      .map(_.path) ++
      CommittedDirs.listDetailed(spark, indexDir,
        marker = CopyIndex.FanoutMarker).map(_.path)
    idxDirs.foreach(d => CopyIndex.forget(spark, d.toString, ids, nBuckets))
    // coverage mode stores no partner ids — the victim's own rows are
    // the whole per-document footprint (surviving docs' counts are
    // anonymous aggregates, the sketch-forget stance)
    val victim =
      if (aggregateAlerts) col("doc_id").isin(ids: _*)
      else col("a_id").isin(ids: _*) || col("b_id").isin(ids: _*)
    val schema = if (aggregateAlerts) coverageSchema else alertSchema
    // one pass over every committed alert dir: batch-scoped dirs carry
    // batch_id in the DIR NAME (dropRight files), consolidated dirs
    // carry it as a column — per-dir schemas; holdFence keeps the root
    // marker up until BOTH roots unfence below
    val batchSchema =
      org.apache.spark.sql.types.StructType(schema.dropRight(1))
    // HEAL before listing: a crashed earlier run's trash-retired alert
    // dir is invisible to this enumeration, and forgetWhere's internal
    // repair would restore it AFTER the list was taken — the restored
    // dir (still holding the victim's alerts) would silently skip the
    // rewrite while both fences clear (the compliance no-op class)
    IndexForget.heal(spark, alertDir)
    IndexForget.forgetWhere(spark, alertDir,
      CommittedDirs.list(spark, alertDir)
        .map(d => d._2.getName -> batchSchema) ++
        FoldProtocol.consols(spark, alertFamily(alertDir))
          .map(d => d.path.getName -> schema),
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
    val fam = indexFamily(indexDir)
    val consol = FoldProtocol.latestConsol(spark, fam)
    val horizon = consol.map(_.id).getOrElse(-1L)
    (consol.map(_.id),
      CommittedDirs.listDetailed(spark, indexDir,
          marker = CopyIndex.FanoutMarker)
        .map(_.id).filter(i => i > horizon && i < batchId).sorted)
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
    val fam = indexFamily(indexDir)
    val consol = FoldProtocol.latestConsol(spark, fam)
    val horizon = consol.map(_.id).getOrElse(-1L)
    val tail = FoldProtocol.committedTail(spark, fam, horizon)
      .filter(_.id < batchId)
    val roots = consol.toSeq ++ tail
    if (roots.isEmpty) return None
    // the fan-out is baked into every dir's layout — a drifted caller
    // constant must fail loudly here, not prune the wrong modulus's
    // directories (one marker read per trigger)
    CopyIndex.verifyFanout(spark, roots.head.path.toString, nBuckets)
    // deletion fences: the tenant-level forget marks the ROOT for the
    // whole composition (one exists check), and each dir carries its
    // own marker while ITS rewrite is in flight — that per-dir check
    // rides the child listing the probe already took, never a second
    // metadata round-trip
    graft.operators.IndexForget.assertClean(spark, indexDir)
    roots.foreach(_.assertClean())
    val want = CopyIndex.bucketsOf(sel, nBuckets)
      .map(b => s"bucket=$b").toSet
    // one listing per prior dir — bounded by consolidateAfter + 1, not
    // by the stream's age; bucket dirs exist only where data landed, so
    // the selected paths always carry parquet footers
    val bucketDirs = roots.flatMap { d =>
      d.children.filter(s => s.isDirectory &&
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
                               after: Int): Unit =
    FoldProtocol.fold(spark, indexFamily(indexDir), batchId, after) {
      (consol, tail) =>
        val parts = consol.toSeq ++ tail
        // the fan-out drift guard once per fold (probes re-check per
        // trigger); the fold's own fence checks already rode the listing
        CopyIndex.verifyFanout(spark, parts.head.path.toString, nBuckets,
          requireClean = false)
        // bucket dirs come from the child listings the protocol already
        // took — no per-bucket existence probes (prunedIndex would pay
        // nBuckets of them per part)
        val bucketDirs = parts.flatMap(_.childDirs("bucket="))
        val union =
          if (bucketDirs.isEmpty)
            // an all-fileless tail (idle triggers) still FOLDS for this
            // family: the empty consol bounds the listing and carries
            // the layout marker for the probes' fanout verification
            spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                CopyIndex.indexSchema)
              .select("id", "pos", "fp")
          else
            // no basePath: the parents mix batch_id= and consol_id=
            // names, so partition inference would see conflicting
            // columns; the files carry (id, pos, fp) — all a fold needs
            spark.read.parquet(bucketDirs.map(_.toString): _*)
              .select("id", "pos", "fp")
        // dedup exact (id, pos, fp) rows — probe answers are
        // duplicate-blind, so the fold doubles as compaction for
        // re-ingestion-heavy streams; sever lineage before writeIndex
        // (the fold's write must not lazily re-open the about-to-be-
        // deleted source files)
        Some(union.dropDuplicates("id", "pos", "fp").localCheckpoint())
    } { (union, dest) =>
      // writeIndex renames _FANOUT into place LAST — the commit point;
      // a crash before it leaves an unmarked dir no probe reads and the
      // next fold overwrites
      CopyIndex.writeIndex(union, dest, nBuckets)
    }

  /** Alert-side fold: same cadence and commit shape as the index fold,
    * but alerts are plain immutable rows — the consolidated file just
    * carries batch_id as a column. `_SUCCESS` (created at job commit,
    * after the data files move) is the marker. */
  private def consolidateAlerts(spark: SparkSession, alertDir: String,
                                batchId: Long, after: Int,
                                schema: StructType): Unit =
    FoldProtocol.fold(spark, alertFamily(alertDir), batchId, after) {
      (consol, tail) =>
        val tailDf = spark.read.option("basePath", alertDir)
          .schema(schema).parquet(tail.map(_.path.toString): _*)
        val union = consol match {
          case Some(c) =>
            spark.read.schema(schema).parquet(c.path.toString)
              .unionByName(tailDf)
          case None => tailDf
        }
        Some(union.localCheckpoint())
    } { (union, dest) =>
      union.write.mode("overwrite").parquet(dest)
    }

}
