package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step AFTER near-dup
  * detection in a dedup pipeline: pairwise matches (q45 Jaccard, q40 LSH)
  * are only edges; the deletion unit is the transitive CLUSTER (A~B, B~C
  * ⇒ {A,B,C} is one duplicate group even if A and C never matched).
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with itself; each round (1) takes the min of its label
  * and its neighbors' labels (one hop along an edge), then (2) shortcuts
  * through the label table itself — `label(id) <- label(label(id))` — so
  * the distance a min-label still has to travel roughly halves per round.
  * Hop alone needs ~diameter rounds; hop+jump converges in O(log d), the
  * same reason large-star/small-star CC runs in logarithmic rounds. Each
  * round is two shuffled joins + one aggregate — at 100 TB that is the
  * standard big-graph CC shape (hashed exchanges on node id, no global
  * structure on any single executor). The driver loop carries only the
  * single `changed` count per round — the label table itself never leaves
  * the cluster; per-round checkpointing keeps the lineage (and recompute
  * cost) flat — local blocks by default, Checkpoint.Reliable(dir) for
  * lossy-executor clusters (operators/Checkpoint.scala).
  *
  * Duplicate-cluster semantics downstream: keep min(id) per cluster (the
  * q64 canonical-winner idea applied transitively), drop the rest. */
object ConnectedComponents {

  /** `edges`: two Long columns (a, b), undirected (symmetrized here).
    * Returns (id, cluster) for every endpoint, cluster = min id reachable.
    * `maxIters` bounds the driver loop; with pointer jumping the label
    * distance halves per round, so 20 rounds cover diameters up to ~2^20.
    * Throws (rather than silently returning split clusters, which would
    * corrupt downstream dedup) if the fixpoint is not reached. */
  def run(edges: DataFrame, maxIters: Int = 20,
          strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame = {
    val e = edges.toDF("a", "b")
    // no distinct: duplicate edges only feed extra rows into min() aggs,
    // which tolerate them — dedup here would cost an exchange per run
    val sym = Checkpoint(e.union(e.select(col("b"), col("a"))), strategy)
    // init fused with the first hop: label = min(self, neighbors) in one
    // aggregation, saving a whole join round
    var labels = Checkpoint(sym.groupBy(col("a").as("id"))
      .agg(min(col("b")).as("nb"))
      .select(col("id"), least(col("id"), col("nb")).as("label")), strategy)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      // (1) hop: min over neighbors' labels
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("id2")).agg(min(col("label")).as("nl"))
      val hopped = labels
        .join(nbrMin, col("id") === col("id2"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("mid"))
      // (2) jump: label(id) <- label(label(id)); label values are node
      // ids (min-propagation only ever copies ids), and label(j) <= j, so
      // the looked-up label can only improve
      //
      // r19 (guide §1.2/§2.6 driver round-trips): the per-round changed
      // count rides the checkpoint job as an observed metric instead of
      // a SECOND count() job over the materialized blocks — one driver
      // job per round, not two. At the gate SF the loop is job-latency-
      // bound (~20 sub-100 ms stages per query), so halving the job
      // count halves the loop's fixed cost; the convergence test is the
      // SAME count of label < prev rows, so round counts are unchanged.
      val obs = new org.apache.spark.sql.Observation()
      val next = Checkpoint(hopped.as("x")
        .join(hopped.select(col("id").as("jid"), col("mid").as("jl")),
          col("x.mid") === col("jid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.mid"), coalesce(col("jl"), col("x.mid"))).as("label"),
          col("x.prev").as("prev"))
        .observe(obs,
          count(when(col("label") < col("prev"), 1)).as("changed")), strategy)
      changed = obs.get("changed").asInstanceOf[Long]
      labels = next.drop("prev")
      i += 1
    }
    require(changed == 0,
      s"connected components did not converge after $maxIters rounds " +
        s"($changed labels still moving) — raise maxIters; returning " +
        "partial labels would split clusters and corrupt downstream dedup")
    labels.withColumnRenamed("label", "cluster")
  }

  /** INCREMENTAL form: fold a new batch of pair edges into an existing
    * label relation without re-walking old-batch edges. A (id, cluster)
    * label is itself an edge to the cluster representative — the
    * transitive closure of {labels-as-edges} ∪ {new edges} equals the
    * closure of {all edges ever} (labels preserve exactly the
    * connectivity the old edges established), so the steady-state
    * ingest cost is |labels| + |batch|, not |corpus pairs|. The same
    * persisted-index discipline as NearDup.incrementalPairs: dedup a
    * 100 TB corpus once, then label each ingest batch against the
    * stored labels. */
  def incremental(prevLabels: DataFrame, newEdges: DataFrame,
                  maxIters: Int = 20,
                  strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame =
    run(
      prevLabels.select(col("id").as("a"), col("cluster").as("b"))
        .unionByName(newEdges.toDF("a", "b")),
      maxIters, strategy)
}
