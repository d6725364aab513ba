package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-core decomposition by iterative peeling — the density filter of the
  * graph family (reference analog: the serve-side "which entities
  * matter" analytics surface, `README.md:2-4`, generalized from
  * centrality to cohesion). The k-core is the maximal subgraph in which
  * every node keeps degree ≥ k; peeling low-degree nodes until none
  * remain below k reaches it regardless of removal order, so a
  * synchronous "drop ALL sub-k nodes each round" sweep computes the same
  * fixpoint as sequential peeling — that order-independence is what
  * makes the operator distributable at all, and it is what the
  * GraphSpec permutation test pins.
  *
  * Use in this engine's north-star pipeline: a near-dup similarity graph
  * (q78/q134 edges) has its tight plagiarism/mirror communities exactly
  * in the high-k cores, while Jaccard-threshold EDGES alone overcount
  * (chains of marginal pairs); PageRank (q122) ranks influence, k-core
  * certifies cohesion.
  *
  * Scale shape: the symmetrized edge relation hash-partitions on `u`
  * once per round inside the degree aggregation (partial-aggregated
  * map-side); the survivor relation is |V|-sized and broadcastable in
  * every realistic core query (nodes shrink monotonically); the edge
  * restriction is two semi-joins that reuse the degree exchange's
  * partitioning on `u` and hash the (small) survivor side for `v`.
  * Each round's edge relation persists and cuts lineage via
  * [[Checkpoint]]; the loop exits the first round that removes nothing.
  * Rounds are bounded by the peeling depth (≤ |V| worst case, tiny on
  * real graphs — 3 on the gated supplier graph); each round's cost is
  * proportional to the SURVIVING edges, so total work telescopes. */
object KCore {

  /** Nodes of the k-core with their in-core degrees. `pairs(u, v)` is an
    * undirected edge list (either orientation); returns `(node, deg)`
    * with deg ≥ k, empty when the k-core is empty. Malformed input
    * degrades harmlessly rather than corrupting degrees: duplicate edge
    * rows — including an edge delivered in BOTH orientations — collapse
    * through the post-symmetrize `distinct()`, and self-loops are
    * dropped (a self-loop would hand its node a free degree and peel
    * wrongly). */
  def core(pairs: DataFrame, k: Int,
           strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame = {
    require(k >= 1, s"kcore: k must be >= 1, got $k")
    val sym = pairs.select(col("u"), col("v"))
      .union(pairs.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
    // r19 (guide §1.2/§2.6 driver round-trips): the surviving-edge count
    // rides each checkpoint job as an observed metric instead of a
    // second count() job over the just-materialized blocks — one driver
    // job per peel round (and for the init), not two. Same scalar, same
    // fixpoint test, so peel depth is unchanged.
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val out = Checkpoint(df.observe(obs, count(lit(1)).as("n")), strategy)
      (out, obs.get("n").asInstanceOf[Long])
    }
    var (e, edges) = checkpointCounted(sym)
    var done = edges == 0L
    while (!done) {
      val surv = e.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u").as("s"))
      val (next, after) = checkpointCounted(
        e.join(surv, e("u") === surv("s"), "left_semi")
          .join(surv, e("v") === surv("s"), "left_semi"))
      done = after == edges
      e = next
      edges = after
    }
    e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
  }
}
