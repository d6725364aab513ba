package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Incrementally maintained first-seen vocabulary — the STREAMING twin
  * of q203's Heaps-law audit, and the third [[BucketedState]] tenant
  * (join view, dup-cluster labels, now the shingle vocabulary).
  *
  * "Cumulative distinct" is the primitive a streaming corpus audit
  * actually needs (how much NEW vocabulary did today's crawl add?),
  * and it reduces to maintaining min(first doc id) per shingle: each
  * micro-batch folds its per-shingle min into the persisted relation
  * with one shingle-keyed group-min — never a rescan of prior
  * documents. The serving curve (vocabulary after each N-doc prefix)
  * derives from the state alone, so it answers at any moment without
  * touching the corpus.
  *
  * Out-of-order tolerance comes from the fold being a MIN: delivering
  * batches in any order converges to the same state (the spec pins
  * delivery-order invariance), unlike a "first writer wins" register.
  *
  * State layout: shingles are vocabulary-sized (they GROW all corpus
  * long — that is the point of the audit), so per-trigger writes must
  * not rewrite the whole relation. Rows hash-bucket on the shingle;
  * the post-fold set-diff finds exactly the changed rows (new shingles
  * + earlier-than-recorded re-deliveries) and the commit rewrites only
  * their buckets through the same staging+rename exactly-once protocol
  * as every shelf tenant — a retried batch whose version landed is a
  * no-op. Write amplification is O(new vocabulary this batch), which
  * Heaps' law says decays as the corpus grows. */
object VocabMaintenance {

  /** Bucket fan-out; fixed for the life of a vocabulary dir. */
  val NumBuckets = 8

  private val stateSchema = StructType(Seq(
    StructField("s", StringType), StructField("first_doc", LongType),
    StructField(BucketedState.BucketCol, IntegerType)))

  /** Fold one micro-batch of documents `(doc_id, text)` into the
    * vocabulary state at `dir` — call from foreachBatch. The dirty set
    * (via [[BucketedState.foldCommit]]'s diff) is exactly the changed
    * shingles: brand-new ones plus shingles whose recorded first_doc an
    * out-of-order batch just lowered. */
  def update(dir: String, docs: DataFrame, batchId: Long): Unit =
    BucketedState.foldCommit(docs.sparkSession, dir, batchId, NumBuckets,
      stateSchema, "s", "vocabulary", growOnly = true) { prev =>
      val batchMin = docs
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .withColumn("w", TextOps.tokens(col("text")))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(TextOps.trigrams(col("w"))).as("s"))
        .groupBy("s").agg(min(col("doc_id")).as("first_doc"))
      prev.unionByName(batchMin)
        .groupBy("s").agg(min(col("first_doc")).as("first_doc"))
    }

  /** Newest committed first-seen relation `(s, first_doc)`. */
  def firstSeen(spark: SparkSession, dir: String): DataFrame =
    BucketedState.readState(spark, dir, stateSchema, NumBuckets,
      "vocabulary").select(col("s"), col("first_doc"))

  /** The q203-shaped growth curve served FROM STATE: (docs_seen,
    * new_shingles, vocab) per `bucketDocs`-document prefix. */
  def curve(spark: SparkSession, dir: String,
            bucketDocs: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    firstSeen(spark, dir)
      .groupBy(expr(s"first_doc div $bucketDocs").as("bucket"))
      .agg(count(lit(1)).as("new_shingles"))
      .select(((col("bucket") + 1) * bucketDocs).cast("long").as("docs_seen"),
        col("new_shingles"),
        sum(col("new_shingles")).over(Window.orderBy("bucket")).as("vocab"))
      .orderBy("docs_seen")
  }
}
