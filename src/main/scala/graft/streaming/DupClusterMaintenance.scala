package graft.streaming

import graft.operators.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally maintained duplicate-cluster labels — the STREAMING
  * counterpart of q168's batch incremental components, and the fifth
  * tenant of the versioned-state shelf (rollups, HLL sketches,
  * Misra-Gries, quantile samples, now cluster labels).
  *
  * Each micro-batch delivers near-dup PAIR edges (from
  * NearDup.incrementalPairs or SimJoin over the batch); the persisted
  * (id, cluster) label relation folds them in via
  * `ConnectedComponents.incremental` — labels are edges to their
  * representatives, so closure(labels ∪ batch) == closure(all pairs
  * ever delivered), at |labels| + |batch| cost per trigger rather than
  * |corpus pairs|. The serving question "which cluster does this doc
  * belong to / which docs are one entity" is answerable at any moment
  * from the label relation alone.
  *
  * Exactly-once: cluster folding is NOT idempotent under retry in
  * general (a re-run could observe torn state mid-write), so each fold
  * commits through the same versioned staging+rename protocol as every
  * other shelf tenant — a retried batch whose version already landed is
  * a no-op (DupClusterSpec/StreamingSpec discipline). */
object DupClusterMaintenance {

  /** Fold one micro-batch of pair edges `(a_id, b_id)` into the label
    * state at `labelDir` — call from foreachBatch. */
  def update(labelDir: String, pairs: DataFrame, batchId: Long): Unit = {
    val spark = pairs.sparkSession
    if (VersionedState.committed(spark, labelDir, batchId)) return
    val edges = pairs.toDF("a", "b")
    val merged = VersionedState.latestSnapshot(spark, labelDir) match {
      case Some(prev) => ConnectedComponents.incremental(prev, edges)
      case None       => ConnectedComponents.run(edges)
    }
    VersionedState.commit(merged, labelDir, batchId)
  }

  /** Newest committed label relation `(id, cluster)`. */
  def labels(spark: SparkSession, labelDir: String): DataFrame =
    VersionedState.latestSnapshot(spark, labelDir).getOrElse(
      throw new IllegalStateException(s"no cluster state under $labelDir"))
}
