package graft.streaming

import graft.functions.{Ivf, VectorOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ANN-shelf ingest — q227's append-without-re-train as a
  * foreachBatch tenant (the DocIngest discipline applied to the IVF
  * index; reference: embeddings stream into the serving vector store
  * continuously, cdk_stacks/ops.py). Per micro-batch of
  * `(id, vector)` rows:
  *   1. assign cells against the index's FROZEN centroids — a pure
  *      function of (vector, centroids), broadcast join + argmax, cost
  *      |batch|, no re-train, no rewrite of old files;
  *   2. write the assignments under the batch's own
  *      `batches/batch_id=N` dir, `cell=`-partitioned like the base
  *      index — batch-scoped overwrite + the committed-dir protocol
  *      ([[CommittedDirs]]) make retries exactly-once (the bare
  *      `Ivf.appendToIndex` is a BATCH ingest API; its append-mode
  *      write would double rows under a streaming retry);
  *   3. emit one drift row — the operational failure mode APPEND
  *      CREATES is silent recall decay: frozen centroids fit a moving
  *      distribution worse and worse, so each batch records its mean
  *      assignment fit (cos of each vector to its own centroid)
  *      against the base corpus's persisted baseline.
  *
  * Search ([[topKLive]]) reads base cells ∪ committed batch dirs,
  * pruned to the query's nprobe cells everywhere (explicit `cell=`
  * paths on the batch dirs — the CopyDetectMaintenance listing
  * discipline), so old and new vectors serve uniformly.
  *
  * RE-TRAIN is explicit, never automatic: when [[driftReport]] flags
  * (fit below baseline − tolerance), rebuild with `Ivf.writeIndex`
  * over the live corpus at a fresh root and repoint — the same
  * quiesce-rebuild recipe as every versioned shelf.
  *
  * RETENTION — the copy-detect consolidation pattern, applied here:
  * batch N's update folds committed batch dirs beyond the horizon into
  * ONE `batches/consol_id=H` dir (cell-partitioned like everything
  * else; `_SUCCESS` — created at job commit, after the data moves — is
  * the fold's marker) once they exceed `consolidateAfter`, then
  * deletes them; [[topKLive]] reads {base cells, latest consol, tail},
  * so its listing is bounded by the threshold, not the stream's age.
  * The fold preserves the exact row multiset (NO dedup — unlike winnow
  * selections, two ingests of one id with different vectors are
  * distinct serving rows). Retries stay exactly-once: folds only touch
  * `batch_id < N`, so a retried batch overwrites its own dir and sees
  * the same fold state. Drift rows keep one dir per batch — they are
  * the report's content, read at monitor cadence, not per trigger. */
object IvfIngestMaintenance {

  /** One-time after the base `Ivf.writeIndex`: persist the drift
    * BASELINE — the base corpus's mean assignment fit under its own
    * centroids (one scan of the cells, done once at build time, never
    * per trigger). Pass the `sampleMod` used at TRAIN time: the
    * baseline then measures only the held-out complement
    * (`id % sampleMod != 0`) — training rows sit unnaturally close to
    * the centroids they defined, and a baseline that includes them is
    * biased HIGH, which false-flags perfectly in-distribution arrivals
    * (measured: all-rows baseline 0.233 vs held-out batch fits
    * 0.17–0.19 on the sf0.001 embeddings — a gap wider than any honest
    * tolerance).
    *
    * The modulus defaults to the index's own persisted training
    * metadata (`Ivf.writeIndex` records the EFFECTIVE value — 1 when
    * training silently fell back to the full corpus because the sample
    * undershot nlist), so the holdout can never desynchronize from
    * what training actually used. An explicit `sampleMod` is checked
    * against that metadata and refused on mismatch: a caller passing
    * the requested-but-fallen-back modulus would rebuild exactly the
    * biased baseline the holdout exists to avoid. */
  def writeBaseline(spark: SparkSession, indexDir: String,
                    sampleMod: Int = -1): Unit = {
    val persisted = Ivf.readTrainMeta(spark, indexDir)
    val mod =
      if (sampleMod < 0) persisted.getOrElse(1)
      else {
        persisted.foreach(m => require(m == sampleMod,
          s"baseline sampleMod=$sampleMod disagrees with the index's " +
            s"effective training modulus $m under $indexDir — training " +
            "fell back (or a different modulus was used); pass nothing " +
            "and the persisted value applies"))
        sampleMod
      }
    val centroids = Ivf.readCentroids(spark, indexDir)
    val cells = spark.read.parquet(s"$indexDir/cells")
    val holdout =
      if (mod <= 1) cells
      else cells.filter(col("nn_id") % mod =!= 0)
    fitOf(holdout, centroids)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/drift_baseline")
  }

  /** Default fold threshold — same sizing argument as
    * [[CopyDetectMaintenance.DefaultConsolidateAfter]]. */
  val DefaultConsolidateAfter = 16

  private val ConsolPrefix = "consol_id="

  /** Fold one micro-batch of vectors — call from foreachBatch. */
  def update(indexDir: String, vecs: DataFrame, batchId: Long,
             idCol: String = "vec_id", vecCol: String = "embedding",
             consolidateAfter: Int = DefaultConsolidateAfter): Unit = {
    val spark = vecs.sparkSession
    val centroids = Ivf.readCentroids(spark, indexDir)
    // one assignment pass feeds the write AND the drift row
    val assigned = Ivf.assignCells(
        vecs.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
          VectorOps.l2(col(vecCol)).as("cn"), Ivf.unit(col(vecCol)).as("vu")),
        "nn_id", "vu", centroids, keep = Seq("cv", "cn"))
      .localCheckpoint()
    assigned.write.partitionBy("cell").mode("overwrite")
      .parquet(s"$indexDir/batches/batch_id=$batchId")
    // no drift row for an EMPTY batch (a no-data trigger or recovery
    // replay): fitOf's global aggregate over zero rows would commit a
    // one-row all-null record that poisons driftReport (null
    // retrain_due); absence of the dir is the honest "nothing to
    // measure". The batch dir above still commits — exactly-once
    // bookkeeping is the stream's contract, metrics are not.
    if (!assigned.isEmpty)
      fitOf(assigned, centroids)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$indexDir/drift/batch_id=$batchId")
    if (consolidateAfter > 0)
      consolidateBatches(spark, indexDir, batchId, consolidateAfter)
  }

  /** Fold the committed batch-dir tail into `batches/consol_id=H` once
    * it exceeds the threshold; heal leftover deletes lazily (the
    * CopyDetectMaintenance recipe — a torn fold has no `_SUCCESS`, is
    * invisible, and the next fold overwrites it). */
  private def consolidateBatches(spark: SparkSession, indexDir: String,
                                 batchId: Long, after: Int): Unit = {
    val root = s"$indexDir/batches"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root))) return
    // a torn tenant forget leaves the ROOT fence up — folding over a
    // dir carrying forget debris (a retired-but-unpublished cell in
    // trash) would omit its rows from the union and then DELETE the
    // dir: silent survivor loss. Refuse loudly; the stream stops until
    // the operator heals with a forget re-run.
    graft.operators.IndexForget.assertClean(spark, indexDir)
    val consol = latestConsol(spark, root)
    val horizon = consol.map(_._1).getOrElse(-1L)
    cleanupBelow(fs, root, horizon)
    val tail = CommittedDirs.list(spark, root)
      .filter(t => t._1 > horizon && t._1 < batchId)
    if (tail.size <= after) return
    tail.foreach(t =>
      graft.operators.IndexForget.assertClean(spark, t._2.toString))
    val h = tail.map(_._1).max
    // explicit cell-dir reads (fileless committed dirs — empty batches
    // — carry no footers for inference); basePath keeps the cell column
    val parts = consol.map(_._2).toSeq ++ tail.map(_._2)
    val cellDirs = parts.flatMap { d =>
      fs.listStatus(d).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("cell=")).map(_.getPath)
    }
    if (cellDirs.isEmpty) {
      // nothing but FILELESS dirs (an idle stream's empty triggers):
      // zero rows to fold, but leaving them would grow the tail one dir
      // per empty trigger forever — reap them directly (they carry no
      // data and only ids < batchId, so no retry can want them back)
      tail.foreach(t => fs.delete(t._2, true))
      return
    }
    val union = parts.map { d =>
        val dirs = fs.listStatus(d).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("cell=")).map(_.getPath.toString)
        if (dirs.isEmpty) None
        else Some(spark.read.option("basePath", d.toString)
          .parquet(dirs: _*).select("nn_id", "cv", "cn", "cell"))
      }.flatten.reduce(_ unionByName _)
      .localCheckpoint() // sever lineage from the dirs deleted below
    union.write.partitionBy("cell").mode("overwrite")
      .parquet(s"$root/$ConsolPrefix$h")
    cleanupBelow(fs, root, h)
  }

  private def cleanupBelow(fs: org.apache.hadoop.fs.FileSystem,
                           root: String, horizon: Long): Unit =
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

  /** Newest COMMITTED `consol_id=` dir under the batches root. */
  private def latestConsol(spark: SparkSession, root: String)
      : Option[(Long, Path)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(ConsolPrefix))
      .flatMap { s =>
        s.getPath.getName.stripPrefix(ConsolPrefix).toLongOption
          .filter(_ => fs.exists(new Path(s.getPath, "_SUCCESS")))
          .map(_ -> s.getPath)
      }.sortBy(_._1).lastOption
  }

  /** Right-to-be-forgotten for the LIVE shelf: the base cells
    * ([[graft.functions.Ivf.forget]]) AND every committed streaming
    * batch dir — a vector that arrived through [[update]] lives under
    * `batches/batch_id=N/cell=C`, which the base-only forget never
    * touches. Quiesce the stream first; a composition fence at the
    * index root keeps [[topKLive]] loudly refused across the multi-dir
    * rewrite (each dir's own marker clears as it commits). Drift rows
    * are per-batch aggregates (counts and means), not per-document
    * data — they carry nothing to forget. */
  def forget(spark: SparkSession, indexDir: String, ids: Seq[Long]): Unit = {
    import graft.operators.IndexForget
    IndexForget.fence(spark, indexDir)
    Ivf.forget(spark, indexDir, ids)
    // every committed streaming dir: consolidated AND tail (an older
    // shadowed consol can only exist as a missed delete BELOW the
    // latest — cleanupBelow reaps it; rows there are a subset of the
    // latest, but rewrite them anyway if present)
    val root = s"$indexDir/batches"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val consolDirs =
      if (!fs.exists(new Path(root))) Seq.empty
      else fs.listStatus(new Path(root)).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(ConsolPrefix) &&
          fs.exists(new Path(s.getPath, "_SUCCESS"))).map(_.getPath)
    (consolDirs ++ CommittedDirs.list(spark, root).map(_._2)).foreach { d =>
      IndexForget.forget(spark, d.toString, "cell", "nn_id", ids): Unit
    }
    IndexForget.unfence(spark, indexDir)
  }

  /** Mean assignment fit + occupancy skew of an assigned relation
    * `(cell, cv, …)`: fit = avg cos(vector, its centroid) — the
    * quantity whose decay means the frozen coarse quantizer no longer
    * matches the data; top_share = the largest cell's row fraction —
    * a hot cell degrades probe pruning even when fit holds. */
  private def fitOf(assigned: DataFrame, centroids: Seq[Seq[Double]])
      : DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "cvec"))
    // two-level: per-cell partials (uniform key, map-side combined),
    // then one nlist-row reduce — nothing data-sized moves
    assigned.join(cdf, "cell")
      .select(col("cell"),
        call_function("vec_dot", Ivf.unit(col("cv")), col("cvec")).as("fit"))
      .groupBy("cell")
      .agg(count(lit(1)).as("rows"), sum(col("fit")).as("fit_sum"))
      .agg(sum(col("rows")).as("n"),
        (sum(col("fit_sum")) / sum(col("rows"))).as("fit"),
        (max(col("rows")).cast("double") / sum(col("rows")))
          .as("top_share"))
  }

  /** Drift rows of every committed batch, joined against the persisted
    * baseline, flagged where fit dropped more than `tolerance`:
    * `(batch_id, n, fit, base_fit, retrain_due)`. The flag is advisory
    * — re-training is an explicit operator action (see scaladoc). */
  def driftReport(spark: SparkSession, indexDir: String,
                  tolerance: Double = 0.05): DataFrame = {
    val dirs = CommittedDirs.list(spark, s"$indexDir/drift")
    require(dirs.nonEmpty, s"no committed drift rows under $indexDir/drift")
    val base = broadcast(
      spark.read.parquet(s"$indexDir/drift_baseline")
        .select(col("fit").as("base_fit")))
    spark.read.option("basePath", s"$indexDir/drift")
      .parquet(dirs.map(_._2.toString): _*)
      .crossJoin(base)
      .select(col("batch_id").cast("long").as("batch_id"), col("n"),
        col("fit"), col("top_share"), col("base_fit"),
        (col("fit") < col("base_fit") - lit(tolerance)).as("retrain_due"))
      .orderBy("batch_id")
  }

  /** [[Ivf.ivfTopKIndexed]] over the LIVE shelf: base cells ∪ every
    * committed batch dir, all pruned to the query's nprobe cells
    * before a row is read (partition filter on the base, explicit
    * `cell=` paths on the batch dirs). Identical scoring to the base
    * path, so results equal an inline `ivfTopK` over the union corpus
    * with the same frozen centroids. */
  def topKLive(spark: SparkSession, indexDir: String, query: DataFrame,
               vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    // deletion fences: the tenant-level forget marks the index ROOT for
    // its whole multi-dir composition; cells/ and each batch dir carry
    // their own marker while their rewrite is in flight
    graft.operators.IndexForget.assertClean(spark, indexDir)
    graft.operators.IndexForget.assertClean(spark, s"$indexDir/cells")
    val centroids = Ivf.readCentroids(spark, indexDir)
    val probes = query.select(
        explode(Ivf.probeCells(Ivf.unit(col(vecCol)), centroids, nprobe))
          .as("p"))
      .as[Int].collect().toSeq
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = probes.map(p => s"cell=$p").toSet
    // STABLE snapshot of (consol, tail): a fold committing between the
    // two listings would otherwise leave a silent GAP — an old consol
    // plus a post-cleanup tail missing every batch folded in between.
    // Re-list until the consol horizon is unchanged across the tail
    // read; dirs deleted between here and the scan fail loudly
    // (FileNotFoundException) and a plain retry sees the folded state.
    val root = s"$indexDir/batches"
    var snap: Option[(Option[(Long, Path)], Seq[Path])] = None
    var attempts = 0
    while (snap.isEmpty) {
      val c0 = latestConsol(spark, root)
      val t = CommittedDirs.list(spark, root)
        .filter(_._1 > c0.map(_._1).getOrElse(-1L)).map(_._2)
      if (latestConsol(spark, root).map(_._1) == c0.map(_._1))
        snap = Some((c0, t))
      else {
        attempts += 1
        require(attempts < 8, s"could not take a stable listing of $root")
      }
    }
    val (consol, tailDirs) = snap.get
    val batchCellDirs = (consol.map(_._2).toSeq ++ tailDirs)
      .flatMap { d =>
        graft.operators.IndexForget.assertClean(spark, d.toString)
        fs.listStatus(d).filter(s => s.isDirectory &&
          want.contains(s.getPath.getName)).map(_.getPath.toString)
      }
    val base = spark.read.parquet(s"$indexDir/cells")
      .filter(col("cell").isin(probes: _*))
      .select("nn_id", "cv", "cn")
    val live =
      if (batchCellDirs.isEmpty) base
      else base.unionByName(
        spark.read.parquet(batchCellDirs: _*).select("nn_id", "cv", "cn"))
    val q = broadcast(query.select(col(vecCol).as("qv"),
      VectorOps.l2(col(vecCol)).as("qn")))
    live.crossJoin(q)
      .withColumn("sim",
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .select(col("nn_id"), col("sim"))
      .orderBy(col("sim").desc, col("nn_id"))
      .limit(k)
  }
}
