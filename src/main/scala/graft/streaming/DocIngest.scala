package graft.streaming

import graft.text.{NearDup, TextOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming document ingest — the corpus-side analog of the CDC spine
  * (north star: a training-data pipeline ingests documents continuously,
  * not just row changes). Same skeleton as CdcStreamPipeline (parse →
  * route → watermark → dedup → exactly-once batch-scoped sink), different
  * semantics at each stage:
  *
  *   - dedup keys on CONTENT (md5 digest), not row identity: the same text
  *     arriving twice — redelivery OR a mirror/crawl duplicate — keeps one
  *     copy. Identity dedup is the CDC pipeline's job; corpora dedup by
  *     what the model would see. State is watermark-bounded; cross-horizon
  *     duplicates are the batch dedup pass's job (q35/q64 over the corpus).
  *   - a QUALITY gate (token count band) sits between parse and dedup —
  *     rejected docs are data, not errors: they land in an auditable
  *     rejects sink, separate from the unparseable-line DLQ.
  *   - the accepted sink partitions by the deterministic hash SPLIT
  *     (q63's first-hex-char-of-md5 rule), so train/val/test assignment
  *     happens once at ingest and downstream readers partition-prune to
  *     their split.
  *
  * Scale: every stage before the sink is map-only except the dedup
  * (one shuffle on the uniformly distributed digest — no skew) and the
  * watermark state is bounded by the lateness horizon. The sink writes
  * batch-scoped overwrite dirs: exactly-once contents under at-least-once
  * micro-batch retries, compactable by ArchiveCompaction like the CDC
  * archive. */
object DocIngest {

  final case class Sinks(corpus: String, rejects: String, error: String,
                         checkpoint: String)

  /** Wire schema: one JSON document per line. Fixed StructType — never
    * inferSchema on a production stream (SURVEY §1.2). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("ingest_ts", StringType)))

  /** Stateless parse front. try_to_timestamp, not to_timestamp: one
    * poisoned timestamp must DLQ-route, not crash-loop the stream from
    * its checkpoint (same ANSI-mode trap as the CDC parse). */
  def parseLines(lines: DataFrame): DataFrame =
    lines
      .withColumn("doc", from_json(col("value"), docSchema))
      .withColumn("event_ts", try_to_timestamp(col("doc.ingest_ts")))

  /** Unparseable or incomplete: no parse at all, or a missing required
    * field. Complement of the main-path filter by construction — every
    * line reaches exactly one sink. */
  private def corrupt =
    col("doc").isNull || col("doc.doc_id").isNull ||
      col("doc.text").isNull || col("event_ts").isNull

  /** Quality gate: token-count band (the q41/q65 quality-proxy family;
    * extreme-length docs are boilerplate or binary junk). Kept as a column
    * so rejects stay auditable with their failure reason. */
  private def tooFewToks(minToks: Int) =
    size(TextOps.tokens(col("doc.text"))) < minToks
  private def tooManyToks(maxToks: Int) =
    size(TextOps.tokens(col("doc.text"))) > maxToks

  /** q63's deterministic hash-split rule, applied at ingest. */
  private def splitCol = {
    val h = substring(md5(col("doc.doc_id").cast("string")), 1, 1)
    when(h < "c", "train").when(h < "e", "val").otherwise("test")
  }

  /** Three routed queries: accepted (deduped corpus), rejected (audit),
    * corrupt (DLQ). Rejects split off BEFORE the stateful dedup — they are
    * an audit trail (every rejected line must appear, duplicates included)
    * and junk must not occupy corpus-dedup watermark state. The three
    * filters partition the input: every line reaches exactly one sink. */
  def start(lines: DataFrame, sinks: Sinks, trigger: Trigger,
            lateness: String = "1 hour", minToks: Int = 3,
            maxToks: Int = 10000, nearDupIndex: Option[String] = None,
            nearDupThreshold: Double = 0.5)
      : (StreamingQuery, StreamingQuery, StreamingQuery) = {
    val parsed = parseLines(lines)
    val rejectReason =
      when(tooFewToks(minToks), "too_short")
        .when(tooManyToks(maxToks), "too_long")

    val main = parsed
      .filter(!corrupt && rejectReason.isNull)
      .withColumn("digest", md5(col("doc.text")))
      .withWatermark("event_ts", lateness)
      .dropDuplicatesWithinWatermark("digest")
      .writeStream
      .foreachBatch(sinkBatch(sinks, nearDupIndex, nearDupThreshold) _)
      .trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint).start()

    val rejects = parsed
      .filter(!corrupt && rejectReason.isNotNull)
      .select(col("doc.doc_id").as("doc_id"), col("doc.source").as("source"),
        rejectReason.as("reject_reason"))
      .writeStream.foreachBatch { (bad: DataFrame, batchId: Long) =>
        bad.write.mode("overwrite").parquet(s"${sinks.rejects}/batch_id=$batchId")
      }.trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint + "_rejects").start()

    val dlq = parsed
      .filter(corrupt)
      .select(col("value"))
      .writeStream.foreachBatch { (bad: DataFrame, batchId: Long) =>
        bad.write.mode("overwrite").text(s"${sinks.error}/batch_id=$batchId")
      }.trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint + "_dlq").start()

    (main, rejects, dlq)
  }

  /** Corpus write. EXACT dedup already happened upstream in the stateful
    * dropDuplicatesWithinWatermark (first arrival wins — deterministic
    * under retry because a retried micro-batch replays the same offsets
    * from the checkpoint); this stage writes exactly-once via batch-scoped
    * overwrite, partitioned by the ingest-time split.
    *
    * With `nearDupIndex` set, the batch also runs NEAR-dup dedup against
    * the persisted MinHash index (the 100 TB steady state: the batch's
    * bands join the index FILES — cost |batch|, never |corpus|²). A new
    * document is dropped when it pairs above the threshold with an
    * already-indexed document, or with a lower-id document of the same
    * batch; dropped docs land in an auditable `<rejects>_neardup` sink
    * and ONLY survivors append their signatures (batch-scoped dirs, so a
    * retried micro-batch overwrites its own index contribution —
    * exactly-once for the index too). */
  def sinkBatch(sinks: Sinks, nearDupIndex: Option[String] = None,
                nearDupThreshold: Double = 0.5)
               (batch: DataFrame, batchId: Long): Unit = {
    // the near-dup branch drives several actions over the batch (audit
    // write, index append, corpus write) — persist so the source micro-
    // batch parses once, same discipline as the CDC sinkBatch
    if (nearDupIndex.isDefined) batch.persist()
    try doSinkBatch(sinks, nearDupIndex, nearDupThreshold, batch, batchId)
    finally if (nearDupIndex.isDefined) batch.unpersist()
  }

  private def doSinkBatch(sinks: Sinks, nearDupIndex: Option[String],
                          nearDupThreshold: Double,
                          batch: DataFrame, batchId: Long): Unit = {
    val rows = batch
      .select(col("doc.doc_id").as("doc_id"), col("doc.text").as("text"),
        col("doc.source").as("source"), col("event_ts"),
        col("digest"), splitCol.as("split"))
    val accepted = nearDupIndex match {
      case None => rows
      case Some(idx) =>
        val spark = batch.sparkSession
        val docsW = rows
          .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
          .filter(size(col("w")) >= 3) // shingle-less docs cannot near-dup
        val newSig = NearDup.signatureRelation(docsW, "doc_id", "w")
          .localCheckpoint()
        // only COMMITTED batch dirs count ([[CommittedDirs]] — the one
        // copy of the marker protocol): a crash mid-write must not
        // leave an unreadable root that crash-loops every retry, and an
        // uncommitted dir holds no rows anyway. Reading our own
        // batchId's committed dir on a retry is harmless: the drop rule
        // is a pure function of (ids, signatures), so the outcome is
        // identical either way.
        val committed = CommittedDirs.list(spark, idx)
        // read the committed dirs as EXPLICIT paths — a root read would
        // also ingest partial part-files of an unmarked (crashed) batch
        // dir as index rows, the window CommittedDirs exists to close
        val index =
          if (committed.nonEmpty)
            spark.read.option("basePath", idx)
              .parquet(committed.map(_._2.toString): _*)
              .select("id", "sh", "band_idx", "band_hash")
          else newSig.limit(0)
        val pairs = NearDup.incrementalPairs(index, newSig, nearDupThreshold)
        // drop a NEW doc paired with an indexed doc (any id) or a
        // lower-id batch-mate — deterministic survivor per family
        val newIds = newSig.select(col("id")).distinct()
        val dropped = pairs
          .select(col("a_id").as("x"), col("b_id").as("y"))
          .unionAll(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
          .join(newIds.select(col("id").as("x")), Seq("x"), "left_semi")
          .join(newIds.select(col("id").as("ny")), col("y") === col("ny"),
            "left")
          .filter(col("ny").isNull || col("y") < col("x"))
          .select(col("x").as("doc_id")).distinct()
          .localCheckpoint()
        rows.join(dropped, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("source"),
            lit("near_dup").as("reject_reason"))
          .write.mode("overwrite")
          .parquet(s"${sinks.rejects}_neardup/batch_id=$batchId")
        newSig.join(dropped, newSig("id") === dropped("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$idx/batch_id=$batchId")
        rows.join(dropped, Seq("doc_id"), "left_anti")
    }
    accepted.write.partitionBy("split")
      .mode("overwrite").parquet(s"${sinks.corpus}/batch_id=$batchId")
  }
}
