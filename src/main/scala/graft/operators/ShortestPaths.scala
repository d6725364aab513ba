package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop weighted shortest paths — distributed Bellman-Ford with a
  * frontier restriction, the cost-annotated sibling of
  * [[Reachability.bfs]] (reference analog: the same multi-stage routing
  * question the pipeline's staged topology poses — source → stream →
  * store hops, `README.md` architecture diagram — generalized to
  * weighted route finding over an edge relation). BFS answers "how many
  * hops", this answers "what is the cheapest route within H hops":
  * logistics lanes, dependency build costs, min-latency fan-out trees.
  *
  * Semantics: `dist(v)` = minimum total weight over all directed paths
  * from any seed to `v` using AT MOST `maxHops` edges (seeds cost 0).
  * The hop bound makes the minimum well-defined for weights of ANY sign
  * (an UNbounded shortest path would additionally need no reachable
  * negative cycle); costs only ever decrease during relaxation, so the
  * frontier restriction below is sign-agnostic too.
  *
  * Relaxation is FRONTIER-RESTRICTED (delta Bellman-Ford): each round
  * relaxes only edges out of nodes whose cost IMPROVED last round. The
  * classical invariant survives — for any ≤k-edge path, its prefix's
  * endpoint last improved at some round j ≤ k−1 and was therefore
  * relaxed at round j+1 ≤ k with that improved value — and the loop
  * exits early the moment a round improves nothing (on a graph whose
  * weighted ≤H-hop optimum stabilizes before H, tail rounds cost zero
  * jobs).
  *
  * Scale shape: edges hash-partition on `src` ONCE and persist; each
  * round shuffles (a) the candidate relation, map-side pre-aggregated to
  * one min per destination before the exchange, and (b) the |V|-row dist
  * relation into a full-outer merge. Nothing driver-sized moves — the
  * driver carries one boolean (frontier emptiness) per round. Lineage is
  * cut per round via [[Checkpoint]] (Local default, Reliable(dir) for
  * lossy-executor clusters). This is Pregel's SSSP without the
  * framework; at 100 TB edge lists the per-round cost is proportional to
  * the frontier's out-degree, not the graph. */
object ShortestPaths {

  /** `(node, cost)` for every node reachable from `seeds` within
    * `maxHops` edges; `edges(src, dst, w)` directed with long weights of
    * any sign (the hop bound keeps the minimum well-defined — see object
    * doc); `seeds(node)`. Seeds report cost 0. */
  def bellmanFord(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                  strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame = {
    require(maxHops >= 0, s"bellmanFord: maxHops must be >= 0, got $maxHops")
    // src layout + within-partition src ORDER (r19, as Reachability):
    // the persisted relation then satisfies the per-round sort-merge
    // join's sort requirement — only the frontier side re-sorts
    val e = edges.select(col("src"), col("dst"), col("w"))
      .repartition(col("src")).sortWithinPartitions("src").persist()
    // try/finally: isEmpty/Checkpoint run eager jobs inside the loop — a
    // failure there must not leak the persisted edge relation for the
    // rest of the session
    try {
      var dist = Checkpoint(
        seeds.select(col("node")).distinct().withColumn("cost", lit(0L)),
        strategy)
      var improved = dist
      var improvedSize = -1L // unknown for the seed frontier
      var hop = 0
      while (hop < maxHops && improvedSize != 0L &&
          (improvedSize > 0L || !improved.isEmpty)) {
        hop += 1
        // min per destination BEFORE the merge join: the exchange carries
        // one candidate row per reached node, not one per relaxed edge
        val cand = improved.join(e, improved("node") === e("src"))
          .select(col("dst").as("node"), (col("cost") + col("w")).as("cand"))
          .groupBy("node").agg(min(col("cand")).as("cand"))
        // r19 (guide §1.2/§2.6): next round's frontier-emptiness test
        // rides the checkpoint job as an observed count of improved
        // rows — one driver job per round instead of checkpoint +
        // isEmpty. Seed-frontier emptiness (first test only) keeps
        // isEmpty.
        val obs = new org.apache.spark.sql.Observation()
        val merged = Checkpoint(
          dist.join(cand, Seq("node"), "full_outer")
            .select(col("node"),
              least(coalesce(col("cost"), lit(Long.MaxValue)),
                coalesce(col("cand"), lit(Long.MaxValue))).as("best"),
              (col("cost").isNull ||
                (col("cand").isNotNull && col("cand") < col("cost"))).as("imp"))
            .observe(obs, count(when(col("imp"), 1)).as("n")),
          strategy)
        improvedSize = obs.get("n").asInstanceOf[Long]
        dist = merged.select(col("node"), col("best").as("cost"))
        improved = merged.filter(col("imp"))
          .select(col("node"), col("best").as("cost"))
      }
      dist
    } finally e.unpersist()
  }
}
