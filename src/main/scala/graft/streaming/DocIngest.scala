package graft.streaming

import graft.text.TextOps
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
  private def splitCol =
    when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c", "train")
      .when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e", "val")
      .otherwise("test")

  def start(lines: DataFrame, sinks: Sinks, trigger: Trigger,
            lateness: String = "1 hour", minToks: Int = 3,
            maxToks: Int = 10000): (StreamingQuery, StreamingQuery) = {
    val parsed = parseLines(lines)

    val main = parsed
      .filter(!corrupt)
      .withColumn("reject_reason",
        when(tooFewToks(minToks), "too_short")
          .when(tooManyToks(maxToks), "too_long"))
      .withColumn("digest", md5(col("doc.text")))
      .withWatermark("event_ts", lateness)
      .dropDuplicatesWithinWatermark("digest")
      .writeStream.foreachBatch(sinkBatch(sinks) _).trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint).start()

    val dlq = parsed
      .filter(corrupt)
      .select(col("value"))
      .writeStream.foreachBatch { (bad: DataFrame, batchId: Long) =>
        bad.write.mode("overwrite").text(s"${sinks.error}/batch_id=$batchId")
      }.trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint + "_dlq").start()

    (main, dlq)
  }

  /** Routed writes. Dedup already happened upstream in the stateful
    * dropDuplicatesWithinWatermark (first arrival wins — deterministic
    * under retry because a retried micro-batch replays the same offsets
    * from the checkpoint); this stage only splits accepted vs rejected
    * and writes each exactly-once via batch-scoped overwrite. */
  def sinkBatch(sinks: Sinks)(batch: DataFrame, batchId: Long): Unit = {
    batch.persist()
    try {
      batch.filter(col("reject_reason").isNotNull)
        .select(col("doc.doc_id").as("doc_id"), col("doc.source").as("source"),
          col("reject_reason"))
        .write.mode("overwrite").parquet(s"${sinks.rejects}/batch_id=$batchId")

      batch.filter(col("reject_reason").isNull)
        .select(col("doc.doc_id").as("doc_id"), col("doc.text").as("text"),
          col("doc.source").as("source"), col("event_ts"),
          col("digest"), splitCol.as("split"))
        .write.partitionBy("split")
        .mode("overwrite").parquet(s"${sinks.corpus}/batch_id=$batchId")
    } finally batch.unpersist()
  }
}
