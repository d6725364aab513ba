package graft.streaming

import graft.text.CopyIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *      own directory.
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
  * the planted-copy corpus across triggers and pins parity.
  *
  * RETENTION (deliberate, like the batch index's append-only posture):
  * the probe lists every committed `batch_id=` dir per trigger, so
  * listing cost grows with trigger count — the operational compaction
  * is: quiesce the stream at a committed horizon H, rewrite the union
  * of `batch_id ≤ H` selections THROUGH [[CopyIndex.writeIndex]] into
  * `batch_id=H` of a FRESH root (writeIndex is what lays down the
  * bucket dirs AND the `_FANOUT` marker the probe verifies — a plain
  * parquet write would crash-loop every later trigger on the marker
  * check) plus a `_SUCCESS` marker, then point the maintenance at the
  * new root and resume with the SAME checkpoint. Safe because rows are
  * immutable per-document facts, probes only read `batch_id < current`,
  * and no batch ≤ H can retry once H+1's offsets committed. Document
  * deletion is the same anti-join rewrite the batch index documents. */
object CopyDetectMaintenance {

  /** Fold one micro-batch of documents — call from foreachBatch.
    * `w`/`nBuckets`/`minShared` must be constant for the life of an
    * index directory (the fingerprint function and bucket layout are
    * baked into the files). */
  def update(indexDir: String, alertDir: String, docs: DataFrame,
             batchId: Long, idCol: String = "doc_id",
             textCol: String = "text", w: Int = 4,
             nBuckets: Int = CopyIndex.DefaultBuckets,
             minShared: Int = 2): Unit = {
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
  }

  /** Every alert emitted so far, with its `batch_id` provenance —
    * COMMITTED batch directories only, read as explicit paths: a crash
    * mid-job-commit leaves partial files under an unmarked dir, and a
    * monitoring reader must never see them as data
    * ([[CommittedDirs]]). */
  def alerts(spark: SparkSession, alertDir: String): DataFrame = {
    val dirs = CommittedDirs.list(spark, alertDir)
    require(dirs.nonEmpty,
      s"no committed copy-detect alerts under $alertDir")
    spark.read.option("basePath", alertDir)
      .parquet(dirs.map(_._2.toString): _*)
  }

  /** Bucket-pruned selections of every COMMITTED batch BEFORE
    * `batchId` — None when this is the first batch (or every earlier
    * dir is uncommitted debris). Reads explicit
    * `batch_id=N/bucket=B` paths (the CopyIndex.prunedIndex
    * discipline): a root read would list every bucket dir of every
    * trigger ever run before pruning — O(triggers × P) listings per
    * trigger — and would crash on a fileless committed dir (an
    * empty batch's partitioned write emits only _SUCCESS). The
    * `< batchId` cut is what makes a RETRY probe identical to the
    * original run: the retrying batch's own committed dir is invisible
    * to it. */
  private def priorIndex(spark: SparkSession, indexDir: String,
                         batchId: Long, sel: DataFrame, nBuckets: Int)
      : Option[DataFrame] = {
    val prior = CommittedDirs.list(spark, indexDir)
      .filter(_._1 < batchId).map(_._2)
    if (prior.isEmpty) return None
    // the fan-out is baked into every batch dir's layout — a drifted
    // caller constant must fail loudly here, not prune the wrong
    // modulus's directories (one marker read per trigger)
    CopyIndex.verifyFanout(spark, prior.head.toString, nBuckets)
    val want = CopyIndex.bucketsOf(sel, nBuckets)
      .map(b => s"bucket=$b").toSet
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one listing per committed batch dir — O(triggers), not O(P);
    // bucket dirs exist only where data landed, so the selected paths
    // always carry parquet footers
    val bucketDirs = prior.flatMap { d =>
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
        spark.read.option("basePath", indexDir).parquet(bucketDirs: _*)
          .select("id", "pos", "fp"))
  }
}
