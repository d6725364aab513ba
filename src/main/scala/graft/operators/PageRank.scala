package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an edge list — the graph-centrality step a
  * training-data pipeline runs over derived relation graphs (document
  * link/citation graphs for quality priors a la CommonCrawl harmonic
  * ranks, co-purchase graphs for recommendation features). The reference
  * surfaces the serve-side analytics purpose (reference `README.md:2-4`);
  * this is its iterative-graph generalization, built the way every
  * iterative Spark job must be built.
  *
  * Arithmetic is EXACT integer fixed-point so results are reproducible
  * across engines and cluster sizes: ranks carry scale 1e12, the damping
  * factor is the rational 17/20 (0.85) and the teleport term
  * (3·S)/(20·N) (0.15/N), every division is integral `div` (truncation
  * == floor for the all-positive values here). Float PageRank would make
  * the per-node sums order-dependent and the result nondeterministic
  * under shuffle — unacceptable for an oracle-gated operator and for
  * repeatable feature generation.
  *
  * Scale shape (the part that must survive 100 TB):
  *   - edges join degrees ONCE, get hash-partitioned by `src` ONCE, and
  *     persist; every iteration reuses that layout, so the big relation
  *     is never re-shuffled — only the small rank relation (|V| rows)
  *     moves per iteration, plus the partial-aggregated contribution
  *     shuffle on `dst` (map-side combine halves it).
  *   - the driver loop carries no data: N is the single scalar collected;
  *     rank tables stay distributed.
  *   - `localCheckpoint` after every iteration truncates lineage — an
  *     unbroken 5-iteration plan is a 5-deep self-join tree that Catalyst
  *     re-analyzes (and task retry re-executes) from the source; at
  *     production iteration counts that is exponential planning cost.
  *     WHERE the cut materializes is the `strategy` parameter
  *     (operators/Checkpoint.scala): executor-local blocks by default;
  *     on a real 1000-executor cluster, where executors are lost as a
  *     matter of course mid-loop, pass Checkpoint.Reliable(dir) and the
  *     same call sites write recoverable checkpoints to DFS.
  *
  * Contract: `edges(src, dst)` directed; node ids are any equatable type
  * — callers with composite string ids ('p123'/'s45') should pass a
  * compact injective LONG encoding instead and decode after the last
  * iteration (guide §2.3: an 8-byte key vs a tagged string cuts every
  * per-iteration exchange, hash, and sort; ranks are invariant under any
  * injective relabeling). Every node of interest must appear as a `src`
  * at least once (no dangling-mass redistribution is modeled —
  * symmetrize bipartite relations as the callers do and the condition
  * holds by construction). */
object PageRank {

  val Scale: Long = 1000000000000L // 1e12 fixed-point scale

  /** Rank relation `(node, r)` after `iters` damped iterations.
    * r sums to ~Scale (minus integer-truncation dust, bounded by
    * iters·(|V| + |E|) ulps — at scale 1e12 that is noise, and the SAME
    * noise on every engine). */
  def run(edges: DataFrame, iters: Int,
          strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame = {
    require(iters >= 1, s"pagerank: iters must be >= 1, got $iters")
    // materialized once: deg feeds the edge layout, the node count, AND
    // the initial ranks — unpinned it re-runs the (possibly expensive)
    // upstream edge derivation three times before iteration 1
    val deg = Checkpoint(
      edges.groupBy("src").agg(count(lit(1)).as("d")), strategy)
    // the one big relation, laid out once: (src, dst, outdeg(src)).
    // repartition BEFORE the deg join (r18): the join's own exchange then
    // satisfies nothing extra — a post-join repartition re-shuffled the
    // identical hashpartitioning(src) a second time (guide §2.4,
    // redundant-exchange class); when the planner sort-merges, the
    // persisted relation additionally keeps its src sort order, so the
    // per-iteration rank join skips the big side's re-sort too
    val e = edges.repartition(col("src")).join(deg, "src").persist()
    val n = deg.count() // O(1) driver scalar, the only collect
    require(n > 0, "pagerank: empty edge list")
    val base = 3L * Scale / (20L * n) // teleport term 0.15/N, exact
    var ranks = Checkpoint(deg
      .select(col("src").as("node"), lit(Scale / n).as("r")), strategy)
    for (i <- 1 to iters) {
      val step = e
        .join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(expr("(17 * sum(r div d)) div 20").as("damped"))
        .select(col("dst").as("node"), (lit(base) + col("damped")).as("r"))
      // cut every OTHER round (and at the end): a depth-2 lineage stays
      // cheap to re-plan, and halving the eager materializations shaves
      // the per-iteration constant that dominates small-|V| runs
      ranks = if (i % 2 == 0 || i == iters) Checkpoint(step, strategy)
              else step
    }
    e.unpersist()
    ranks
  }

  /** Personalized PageRank (random-walk-with-restart): the teleport
    * mass returns to `seeds(node)` ONLY, so ranks measure graph
    * PROXIMITY to the seed set — the recommendation / related-entities
    * primitive. Same exact fixed-point arithmetic and scale shape as
    * `run`; the rank relation carries only reached nodes (everything
    * else is implicitly 0), so on a large graph with a small seed
    * neighborhood the per-iteration exchanges stay neighborhood-sized
    * until the walk saturates. The per-iteration union-then-sum folds
    * the seed restart into the same hash aggregation that combines
    * contributions — no extra pass. */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                   strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame = {
    require(iters >= 1, s"pagerank: iters must be >= 1, got $iters")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    // same exchange discipline as [[run]]: repartition before the join,
    // not after it (one src shuffle, ordering preserved when sort-merged)
    val e = edges.repartition(col("src")).join(deg, "src").persist()
    val sd = Checkpoint(seeds.select(col("node")).distinct(), strategy)
    val ns = sd.count()
    require(ns > 0, "personalized pagerank: empty seed set")
    val base = 3L * Scale / (20L * ns)
    var ranks = Checkpoint(sd.select(col("node"), lit(Scale / ns).as("r")), strategy)
    for (i <- 1 to iters) {
      val damped = e
        .join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(expr("(17 * sum(r div d)) div 20").as("r"))
        .select(col("dst").as("node"), col("r"))
      val step = damped
        .unionByName(sd.select(col("node"), lit(base).as("r")))
        .groupBy("node").agg(sum(col("r")).as("r"))
      // same every-other-round cut as `run` — depth-2 lineage re-plans
      // cheaply, half the eager materializations disappear
      ranks = if (i % 2 == 0 || i == iters) Checkpoint(step, strategy)
              else step
    }
    e.unpersist()
    ranks
  }
}
