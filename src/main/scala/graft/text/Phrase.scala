package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the engine-side
  * re-expression of the reference's serving store (documents are upserted
  * into an OpenSearch index and queried by content,
  * cdk_stacks/ops.py; README.md's Kibana query walkthrough). A
  * posting is `(term, doc_id, pos)`; a phrase of k terms matches wherever
  * the terms' postings align at k consecutive positions — evaluated as a
  * chained equi-join on `(doc_id, pos + offset)`, never by rescanning
  * text.
  *
  * Plan shape at 100 TB:
  *   - the index builds once ([[writeIndex]]): tokenize + posexplode,
  *     written PARTITIONED BY a term-hash bucket so a probe's
  *     `bucket IN (...)` prunes to |phrase| directories before any row
  *     is read (same directory-pruning posture as [[NearDup]] bands and
  *     `Ivf` cells);
  *   - a probe reads only the phrase terms' posting lists (scan-side
  *     `term IN (...)` on top of the bucket pruning), joins them on
  *     `(doc_id, anchor position)` — uniform keys, |postings(term)|-sized
  *     inputs, no all-pairs leg anywhere;
  *   - ingest appends a new batch's postings under the same bucket
  *     layout ([[appendToIndex]]); old postings never rewrite.
  */
object Phrase {

  /** Posting relation over (idCol, tokensCol): one `(doc_id, pos, term)`
    * row per token occurrence. Position is 0-based in token order. */
  def postings(docs: DataFrame, idCol: String, tokensCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(col(tokensCol)).as(Seq("pos", "term")))

  /** Stable bucket of a term, for partition layout and probe pruning.
    * xxhash64 is Spark-native and seed-stable across sessions. */
  def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(term), lit(nBuckets)).cast("int")

  /** Persist the positional index PARTITIONED BY term bucket. OVERWRITES
    * the path — the one-time build; ingest uses [[appendToIndex]]. */
  def writeIndex(docs: DataFrame, idCol: String, tokensCol: String,
                 path: String, nBuckets: Int = 64): Unit =
    postings(docs, idCol, tokensCol)
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** Ingest path: append a NEW batch's postings inside the same bucket
    * layout — steady-state cost is |batch| tokens. */
  def appendToIndex(docs: DataFrame, idCol: String, tokensCol: String,
                    path: String, nBuckets: Int = 64): Unit =
    postings(docs, idCol, tokensCol)
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.partitionBy("bucket").mode("append").parquet(path)

  /** Documents matching a k-term phrase, with occurrence counts:
    * `(doc_id, n_hits)` where n_hits = number of positions p such that
    * postings contain (terms(0), p), (terms(1), p+1), …  Duplicate terms
    * in the phrase are handled naturally (the same posting list joins at
    * two offsets). `post` is a posting relation — [[postings]] inline or
    * the pruned read of a persisted index. */
  def phraseHits(post: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phrase search needs at least one term")
    // anchor = first term's postings; each later term must appear at
    // anchor + i. Every join is an equi-join on (doc_id, pos) with the
    // offset folded into the probe side's join key — no theta join.
    val anchor = post.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos"))
    val matched = terms.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        val p = post.filter(col("term") === t)
          .select(col("doc_id").as(s"d_$i"), (col("pos") - i).as(s"p_$i"))
        acc.join(p, col("doc_id") === col(s"d_$i") && col("pos") === col(s"p_$i"))
          .select(col("doc_id"), col("pos"))
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** The ONE copy of the index-probe layout contract: read a persisted
    * posting index pruned to `terms`' buckets (a literal `bucket IN
    * (...)` over the partition column — directory pruning) and their
    * posting lists (scan-side `term IN (...)`); nothing else is read.
    * Both the phrase probe and q197's indexed BM25 go through here — a
    * bucket-function or fan-out change lands in every prober or none. */
  def prunedPostings(spark: SparkSession, path: String,
                     terms: Seq[String], nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "index probe needs at least one term")
    // deletion fence: a forget() that died mid-rewrite must fail the
    // probe loudly, not serve half-forgotten posting lists
    graft.operators.IndexForget.assertClean(spark, path)
    spark.read.parquet(path)
      .filter(col("bucket").isin(
        terms.map(t => math.floorMod(TermHash.xx64(t), nBuckets.toLong).toInt)
          .distinct: _*))
      .filter(col("term").isin(terms.distinct: _*))
  }

  /** [[phraseHits]] against a persisted index via [[prunedPostings]]. */
  def phraseHitsIndexed(spark: SparkSession, path: String,
                        terms: Seq[String], nBuckets: Int = 64): DataFrame =
    phraseHits(prunedPostings(spark, path, terms, nBuckets), terms)

  /** Right-to-be-forgotten: delete every posting of `ids`, rewriting
    * only the buckets holding victim rows — bounded by the victims'
    * distinct-term counts, found by one column-pruned (doc_id, bucket)
    * scan (the [[graft.operators.IndexForget]] protocol: marker-fenced,
    * crash-recoverable, idempotent). Postings are independent
    * per-document facts, so probe results afterward equal an index
    * built without the victims. Derived stat sidecars (the BM25 dl /
    * corpus relations) must be refreshed by the caller —
    * [[Bm25Index.forget]] owns that composition. */
  def forget(spark: SparkSession, path: String, ids: Seq[Long]): Seq[String] =
    graft.operators.IndexForget.forget(spark, path, "bucket", "doc_id", ids)
}

/** Driver-side twin of Spark's xxhash64(string, seed=42) for resolving a
  * probe term's bucket without a Spark job (the [[graft.functions.Ivf]]
  * probe-resolution rule: O(parameters) driver work, never data rows). */
private[graft] object TermHash {
  def xx64(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)
}
