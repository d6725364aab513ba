package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-hop reachability (bounded transitive closure) by frontier BFS —
  * the recursive-query capability Spark SQL lacks (no WITH RECURSIVE),
  * re-expressed as the iterative driver loop every distributed BFS uses:
  * provenance closure ("everything downstream of these suppliers"),
  * dependency cones, contamination spread through derived datasets.
  * Third member of the iterative family: CC propagates labels to a
  * fixpoint, PageRank iterates a fixed count, BFS expands a FRONTIER
  * that empties.
  *
  * Min-depth semantics: a node's depth is the FIRST hop count at which
  * it is reached (the left-anti join against the visited set per hop
  * guarantees it — a node never re-enters the frontier, which is also
  * what makes BFS terminate on cyclic graphs without re-walking them).
  *
  * Scale shape: the edge relation is hash-partitioned on `src` once and
  * persisted — every hop's frontier join reuses that layout, shuffling
  * only the frontier (which is bounded by |V| total across ALL hops,
  * since each node enters once). The driver loop carries one scalar
  * (frontier size) per hop; visited/frontier checkpoint per hop keeps
  * lineage flat — local blocks by default, Checkpoint.Reliable(dir) for
  * lossy-executor clusters (operators/Checkpoint.scala). Against 100 TB edge lists this is the standard
  * BSP traversal shape (Pregel's BFS without the framework). */
object Reachability {

  /** `(node, depth)` for every node within `maxHops` of `seeds`.
    * `edges(src, dst)` directed; `seeds(node)`; depth = min hops. */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int,
          strategy: Checkpoint.Strategy = Checkpoint.Local): DataFrame = {
    require(maxHops >= 0, s"bfs: maxHops must be >= 0, got $maxHops")
    // laid out by src ONCE — and SORTED within partitions (r19): the
    // persisted relation then carries hashpartitioning(src) AND src
    // ordering, so every hop's sort-merge join re-sorts only the small
    // frontier side, never the edge relation (the per-hop e-side sort
    // was the loop's dominant task time at gate SF)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).sortWithinPartitions("src").persist()
    var visited = Checkpoint(seeds.select(col("node"), lit(0).as("depth"))
      .distinct(), strategy)
    var frontier = visited.select(col("node"))
    var frontierSize = -1L // unknown for the seed frontier
    var hop = 0
    while (hop < maxHops && frontierSize != 0L &&
        (frontierSize > 0L || !frontier.isEmpty)) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .withColumn("depth", lit(hop))
      // r19 (guide §1.2/§2.6 driver round-trips): the next hop's
      // emptiness test rides the checkpoint job as an observed count
      // instead of a separate isEmpty job per hop — one driver job per
      // hop. Seed-frontier emptiness (first test only) keeps isEmpty.
      val obs = new org.apache.spark.sql.Observation()
      val nextM = Checkpoint(
        next.observe(obs, count(lit(1)).as("n")), strategy)
      frontierSize = obs.get("n").asInstanceOf[Long]
      // visited stays a UNION of already-checkpointed hop relations — a
      // k-way union of pinned legs re-plans in O(k) and re-reads cached
      // blocks, so materializing the union again each hop only doubled
      // the eager work
      visited = visited.unionByName(nextM)
      frontier = nextM.select(col("node"))
    }
    e.unpersist()
    visited
  }
}
