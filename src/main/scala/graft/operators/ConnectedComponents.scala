package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step AFTER near-dup
  * detection in a dedup pipeline: pairwise matches (q45 Jaccard, q40 LSH)
  * are only edges; the deletion unit is the transitive CLUSTER (A~B, B~C
  * ⇒ {A,B,C} is one duplicate group even if A and C never matched).
  *
  * Algorithm: iterative min-label propagation (the Pregel/GraphX formula
  * expressed in DataFrames): every node starts labeled with itself; each
  * round takes the min of its label and its neighbors' labels; fixpoint in
  * O(component diameter) rounds. Each round is one shuffled join + one
  * aggregate — at 100 TB that is the standard big-graph CC shape (hashed
  * exchanges on node id, no global structure on any single executor).
  * The driver loop carries only the single `changed` count per round —
  * the label table itself never leaves the cluster; per-round
  * localCheckpoint keeps the lineage (and recompute cost) flat.
  *
  * Duplicate-cluster semantics downstream: keep min(id) per cluster (the
  * q64 canonical-winner idea applied transitively), drop the rest. */
object ConnectedComponents {

  /** `edges`: two Long columns (a, b), undirected (symmetrized here).
    * Returns (id, cluster) for every endpoint, cluster = min id reachable.
    * `maxIters` bounds the driver loop; propagation needs ~diameter
    * rounds, so 20 covers any plausible dup-cluster shape (a chain of 2^20
    * pairwise-similar docs would be the pathology, not the norm). */
  def run(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val e = edges.toDF("a", "b")
    val sym = e.union(e.select(col("b"), col("a"))).distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("id2")).agg(min(col("label")).as("nl"))
      val next = labels
        .join(nbrMin, col("id") === col("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"),
          (coalesce(col("nl"), col("label")) < col("label")).as("moved"))
        .localCheckpoint()
      changed = next.filter(col("moved")).count()
      labels = next.drop("moved")
      i += 1
    }
    labels.withColumnRenamed("label", "cluster")
  }
}
