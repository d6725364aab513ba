package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** PageRank operator invariants (queries/Graph.scala, q122): exact
  * parity with a driver-side integer model, known fixed points, mass
  * conservation, and the iterative-lineage pin. */
class GraphSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side exact model of operators/PageRank.run — same integer
    * fixed-point arithmetic, pure Scala Maps. */
  private def model(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val S = PageRank.Scale
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    val base = 3L * S / (20L * n)
    var r = deg.keys.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = contrib.map { case (v, c) => v -> (base + 17L * c / 20L) }
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap

  test("pagerank: exact parity with the driver-side integer model on a random graph") {
    val rnd = new scala.util.Random(47)
    val nodes = (0 until 40).map(i => s"n$i")
    // random directed graph, symmetrized so every node is a src
    val base = (0 until 300).map(_ => (nodes(rnd.nextInt(40)), nodes(rnd.nextInt(40))))
      .filter { case (a, b) => a != b }.distinct
    val edges = base ++ base.map(_.swap)
    assert(run(edges, 5) === model(edges, 5))
  }

  test("checkpoint strategy: Local and Reliable(dir) produce identical results (pagerank, cc, bfs)") {
    import graft.operators.{Checkpoint, ConnectedComponents, Reachability}
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val rel = Checkpoint.Reliable(dir)
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 20).map(i => s"m$i")
    val base = (0 until 80).map(_ => (nodes(rnd.nextInt(20)), nodes(rnd.nextInt(20))))
      .filter { case (a, b) => a != b }.distinct
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(m(PageRank.run(edges, 3)) === m(PageRank.run(edges, 3, rel)))
    val seeds = Seq("m0").toDF("node")
    assert(m(Reachability.bfs(edges, seeds, 3)) ===
      m(Reachability.bfs(edges, seeds, 3, rel)))
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 9L)).toDF("a", "b")
    assert(m(ConnectedComponents.run(pairs)) ===
      m(ConnectedComponents.run(pairs, strategy = rel)))
    // reliable mode actually wrote checkpoint data under the dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "Reliable strategy wrote nothing under its dir")
  }

  test("pagerank: uniform rank is the fixed point of a directed cycle") {
    // 5 nodes, outdeg 1 each; S/n and the damped update are exact at n=5,
    // so every iteration must reproduce S/n on the nose
    val edges = (0 until 5).map(i => (s"c$i", s"c${(i + 1) % 5}"))
    val r = run(edges, 7)
    val expect = PageRank.Scale / 5
    assert(r.values.toSet === Set(expect))
  }

  test("pagerank: star center outranks leaves; mass is conserved up to truncation dust") {
    val leaves = (1 to 12).map(i => s"l$i")
    val edges = leaves.map(l => (l, "hub")) ++ leaves.map(l => ("hub", l))
    val r = run(edges, 5)
    assert(leaves.map(r).toSet.size === 1) // symmetric leaves tie exactly
    assert(r("hub") > r(leaves.head))
    val mass = r.values.sum
    // each iteration can only lose dust: <= 1 ulp per edge (div d), per
    // node (div 20 twice, base) — generous bound, exact-zero not required
    val maxLoss = 5L * (edges.size + 3L * (leaves.size + 1))
    assert(mass <= PageRank.Scale && mass >= PageRank.Scale - maxLoss)
  }

  test("pagerank: lineage is truncated per iteration (no join tower in the result plan)") {
    val edges = (0 until 6).map(i => (s"a$i", s"a${(i + 1) % 6}"))
    val df = PageRank.run(edges.toDF("src", "dst"), 4)
    val plan = df.queryExecution.optimizedPlan.toString
    // localCheckpoint per iteration => the result reads an RDD scan, not a
    // 4-deep join/aggregate tower re-derived from the source
    assert(!plan.contains("Join"), s"expected checkpointed lineage, got:\n$plan")
  }

  test("personalized pagerank: parity with a driver model; seeds dominate; proximity orders") {
    val S = PageRank.Scale
    def model(edges: Seq[(String, String)], seeds: Seq[String], iters: Int): Map[String, Long] = {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val base = 3L * S / (20L * seeds.size)
      var r: Map[String, Long] = seeds.map(_ -> S / seeds.size).toMap
      for (_ <- 1 to iters) {
        val contrib = edges.filter(e => r.contains(e._1)).groupBy(_._2).view
          .mapValues(es => 17L * es.map { case (u, _) => r(u) / deg(u) }.sum / 20L)
        r = (contrib.keySet ++ seeds).map { v =>
          v -> (contrib.getOrElse(v, 0L) + (if (seeds.contains(v)) base else 0L))
        }.toMap
      }
      r
    }
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 30).map(i => s"n$i")
    val base = (0 until 150).map(_ => (nodes(rnd.nextInt(30)), nodes(rnd.nextInt(30))))
      .filter(e => e._1 != e._2).distinct
    val edges = base ++ base.map(_.swap)
    val seeds = Seq("n0", "n1")
    val got = PageRank.personalized(edges.toDF("src", "dst"), seeds.toDF("node"), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === model(edges, seeds, 4))
    // restart mass keeps seeds above every non-seed on a sparse graph
    val nonSeedMax = (got -- seeds).values.max
    assert(seeds.forall(s => got(s) > nonSeedMax))
  }

  test("bfs: min-depth semantics on a diamond with a shortcut edge") {
    // a→b→d and a→d: d must be depth 1, not 2; e unreachable
    val edges = Seq(("a", "b"), ("b", "d"), ("a", "d"), ("d", "c"), ("e", "e"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = graft.operators.Reachability.bfs(edges, seeds, 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("a" -> 0, "b" -> 1, "d" -> 1, "c" -> 2))
  }

  test("bfs: cycles terminate (frontier empties) and maxHops truncates the cone") {
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val full = graft.operators.Reachability.bfs(cyc, Seq("a").toDF("node"), 10)
    assert(full.count() === 3) // each node entered exactly once despite the cycle
    val cut = graft.operators.Reachability.bfs(cyc, Seq("a").toDF("node"), 1)
    assert(cut.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ===
      Map("a" -> 0, "b" -> 1))
  }

  test("triangles: parity with brute force on random graphs; K4 and cycle cases") {
    def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq
      val tris = for {
        a <- nodes; b <- nodes if a < b; c <- nodes if b < c
        if und((a, b)) && und((b, c)) && und((a, c))
      } yield Seq(a, b, c)
      tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Triangles.perNode(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: every node in C(3,2)=3 triangles; C4 (square): none
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(run(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) === Map.empty)
    val rnd = new scala.util.Random(47)
    val edges = (0 until 200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    assert(run(edges) === brute(edges))
  }

  test("q122 shape: top-20 rows, all-supplier heads carry the co-sourcing mass") {
    val df = SparkEntry.queries("q122_pagerank")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 20)
    // ranks strictly positive and sorted desc with the declared tie-break
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ > 0) && ranks.sameElements(ranks.sortBy(-_)))
  }

  // ---- bounded-hop weighted shortest paths (operators/ShortestPaths) ----

  /** Driver-side exact model: `maxHops` rounds of FULL relaxation (the
    * textbook Bellman-Ford, no frontier) — the operator must match it
    * exactly, which is what certifies the frontier restriction. */
  private def spModel(edges: Seq[(String, String, Long)], seeds: Seq[String],
                      maxHops: Int): Map[String, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to maxHops) {
      val cand = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      dist = (dist.keySet ++ cand.keySet).map { n =>
        n -> math.min(dist.getOrElse(n, Long.MaxValue),
          cand.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    dist
  }

  private def spRun(edges: Seq[(String, String, Long)], seeds: Seq[String],
                    maxHops: Int): Map[String, Long] =
    graft.operators.ShortestPaths
      .bellmanFord(edges.toDF("src", "dst", "w"), seeds.toDF("node"), maxHops)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("shortest paths: multi-hop beats direct; the hop bound binds") {
    val e = Seq(("a", "b", 10L), ("a", "c", 1L), ("c", "b", 2L))
    assert(spRun(e, Seq("a"), 1) === Map("a" -> 0L, "b" -> 10L, "c" -> 1L))
    assert(spRun(e, Seq("a"), 2) === Map("a" -> 0L, "b" -> 3L, "c" -> 1L))
  }

  test("shortest paths: exact parity with full-relaxation Bellman-Ford on a random weighted graph") {
    val rnd = new scala.util.Random(61)
    val nodes = (0 until 30).map(i => s"n$i")
    val edges = (0 until 200).map(_ => (nodes(rnd.nextInt(30)),
      nodes(rnd.nextInt(30)), rnd.nextInt(50).toLong))
      .filter { case (a, b, _) => a != b }
      .groupBy(t => (t._1, t._2)).map(_._2.minBy(_._3)).toSeq
    for (h <- Seq(1, 2, 4))
      assert(spRun(edges, Seq("n0", "n7"), h) === spModel(edges, Seq("n0", "n7"), h))
  }

  test("shortest paths: sign-agnostic — negative edges respect the bounded-hop minimum") {
    val e = Seq(("a", "b", 5L), ("b", "c", -3L), ("a", "c", 4L), ("c", "b", 1L))
    for (h <- Seq(1, 2, 3))
      assert(spRun(e, Seq("a"), h) === spModel(e, Seq("a"), h))
  }

  test("shortest paths: frontier empties early on a short chain; unreached nodes are absent") {
    val e = Seq(("a", "b", 1L), ("b", "c", 1L), ("x", "y", 1L))
    // maxHops far past the diameter — early exit must not change results
    assert(spRun(e, Seq("a"), 10) === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  /** Driver-side sequential peel (remove ONE minimum-degree sub-k node at
    * a time) — the order k-core theory says any peeling schedule must
    * agree with; the operator peels synchronously. */
  private def kcoreModel(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      adj.find { case (_, nb) => nb.size < k }.map(_._1) match {
        case Some(victim) =>
          adj = (adj - victim).view.mapValues(_ - victim).toMap
        case None => changed = false
      }
    }
    adj.map { case (n, nb) => n -> nb.size.toLong }
  }

  private def kcoreRun(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    graft.operators.KCore.core(pairs.toDF("u", "v"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kcore: synchronous peel equals sequential one-at-a-time peel on a random graph") {
    val rnd = new scala.util.Random(47)
    val pairs = (0 until 120)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    for (k <- Seq(2, 3, 4))
      assert(kcoreRun(pairs, k) === kcoreModel(pairs, k))
  }

  test("kcore: a clique survives its own k, a tree has an empty 2-core") {
    // K5 plus a pendant chain: the 4-core is exactly the clique
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    assert(kcoreRun(clique ++ chain, 4) ===
      (0L to 4L).map(_ -> 4L).toMap)
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    assert(kcoreRun(tree, 2) === Map.empty)
  }

  test("mmr: first pick is max relevance; diversity penalty demotes the near-duplicate") {
    import graft.functions.Mmr
    // b is a near-copy of a (sim 9900): plain relevance would rank it
    // second; MMR must prefer the diverse c
    val rel = Seq((1L, 9000L), (2L, 8900L), (3L, 8000L))
    val sim = Map(
      (1L, 2L) -> 9900L, (2L, 1L) -> 9900L,
      (1L, 3L) -> 1000L, (3L, 1L) -> 1000L,
      (2L, 3L) -> 1200L, (3L, 2L) -> 1200L)
    val picks = Mmr.select(rel, sim, 3)
    assert(picks.map(_._2) === Seq(1L, 3L, 2L))
    // scores: 7·rel for the first, 7·rel − 3·maxSim after
    assert(picks.head._4 === 7L * 9000L)
    assert(picks(1)._4 === 7L * 8000L - 3L * 1000L)
    assert(picks(2)._4 === 7L * 8900L - 3L * 9900L)
  }

  test("mmr: ties break on ascending id; k caps at the candidate count") {
    import graft.functions.Mmr
    val rel = Seq((5L, 100L), (2L, 100L))
    val sim = Map((5L, 2L) -> 0L, (2L, 5L) -> 0L)
    val picks = Mmr.select(rel, sim, 10)
    assert(picks.map(_._2) === Seq(2L, 5L) && picks.size === 2)
  }
}
