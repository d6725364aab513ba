package graft.queries

import graft.{GatedQuery, Tables}
import graft.GatedQuery.gated
import graft.operators.{PageRank, Reachability, ShortestPaths, Triangles}
import org.apache.spark.sql.functions._

/** Graph analytics over relations derived from the base tables — the
  * iterative-computation surface (SURVEY §2 serve-side analytics S15
  * generalized to graph centrality). Companion to the pointer-jumping
  * connected components (q78/q90): CC answers "which rows are one
  * entity", PageRank answers "which entities matter".
  *
  * Everything gated is exact integer fixed-point (see
  * operators/PageRank.scala) — the oracle unrolls the same iterations as
  * CTEs with DuckDB's `//` truncating division (truncation toward zero,
  * == floor only because every rank here is positive; Spark's `div`
  * truncates identically), so both engines agree to the last unit.
  */
object Graph {

  private val S = PageRank.Scale

  /** One oracle iteration step: r_{k+1}(v) = 0.15/N + 0.85·Σ r_k(u)/d(u)
    * in scale-1e12 integer arithmetic. */
  private def step(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT e.dst AS node,
       |         (3 * $S // (20 * nn.n))
       |           + (17 * SUM($prev.r // deg.d)) // 20 AS r
       |  FROM edges e
       |  JOIN $prev ON e.src = $prev.node
       |  JOIN deg ON e.src = deg.src
       |  CROSS JOIN nn
       |  GROUP BY e.dst, nn.n
       |)""".stripMargin

  private val iterChain: String =
    (0 until 5).map(i => step(s"r$i", s"r${i + 1}")).mkString(",\n")

  val all: Seq[GatedQuery] = Seq(

    // ---- PageRank over the part↔supplier co-sourcing graph: nodes are
    //      parts and suppliers, an edge per distinct (l_partkey,
    //      l_suppkey) sourcing relation, symmetrized (so no node
    //      dangles). Top-20 by rank = the most central suppliers in the
    //      supply network. 5 damped iterations, exact fixed-point.
    //      Scale: edges laid out once (hash on src) and reused across
    //      all iterations; per iteration only the |V|-row rank relation
    //      shuffles plus one partial-aggregated contribution exchange;
    //      lineage truncated per iteration (localCheckpoint) so plan
    //      depth stays O(1) — the canonical iterative-Spark shape. ----
    gated("q122_pagerank",
      s"""WITH pairs AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
         |edges AS (
         |  SELECT 'p' || CAST(pk AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || CAST(sk AS VARCHAR), 'p' || CAST(pk AS VARCHAR) FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |r0 AS (SELECT deg.src AS node, $S // nn.n AS r FROM deg CROSS JOIN nn),
         |$iterChain
         |SELECT node, CAST(r AS BIGINT) AS rank FROM r5
         |ORDER BY rank DESC, node LIMIT 20""") { (s, d) =>
      // r18 (guide §2.3/§2.4): the iteration runs on a compact LONG node
      // encoding (part pk ↦ 2·pk, supplier sk ↦ 2·sk+1 — injective, so
      // ranks are unchanged; decoded to the oracle's 'p…'/'s…' strings
      // only on the 20-row output), and BOTH edge directions explode
      // from ONE materialized distinct-pair scan instead of unioning two
      // full re-derivations (the lineitem→distinct subtree ran 3× before:
      // once per union branch + once for the degree relation)
      val pairs = Tables.lineitem(s, d)
        .select(col("l_partkey").cast("long").as("pk"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct()
        .localCheckpoint() // feeds both edge directions AND the degrees
      val edges = pairs.select(explode(array(
          struct((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst")),
          struct((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      PageRank.run(edges, 5)
        .select(when(pmod(col("node"), lit(2)) === 0,
            concat(lit("p"), expr("node div 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) div 2"))).as("node"),
          col("r").cast("long").as("rank"))
        .orderBy(desc("rank"), col("node"))
        .limit(20)
    },

    // ---- Bounded transitive closure: the provenance cone downstream of
    //      three suppliers through the typed supplier→part→order→customer
    //      edge relation, with min-hop depths — Spark has no WITH
    //      RECURSIVE, so the oracle IS DuckDB's recursive CTE and the
    //      engine answers with frontier BFS (operators/Reachability).
    //      Output aggregates the closure per (depth, node kind) so the
    //      gate pins the whole reachable set (counts + extremal ids)
    //      without dumping 16k rows. ----
    gated("q125_reachability",
      """WITH RECURSIVE
        |edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |                  'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem
        |  UNION ALL
        |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR),
        |                  'o' || CAST(l_orderkey AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT DISTINCT 'o' || CAST(o_orderkey AS VARCHAR),
        |                  'c' || CAST(o_custkey AS VARCHAR) FROM orders),
        |reach(node, depth) AS (
        |  SELECT 's' || CAST(s_suppkey AS VARCHAR), 0 FROM supplier WHERE s_suppkey < 3
        |  UNION
        |  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.node
        |  WHERE r.depth < 3),
        |md AS (SELECT node, MIN(depth) AS depth FROM reach GROUP BY node)
        |SELECT depth, substr(node, 1, 1) AS kind, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(node) AS first_node, MAX(node) AS last_node
        |FROM md GROUP BY depth, kind ORDER BY depth, kind""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      // r18 (guide §2.3): the BFS walks a compact LONG encoding —
      // node = 4·key + kindCode (s=0, p=1, o=2, c=3; injective since the
      // typed key spaces are disjoint by construction) — and decodes to
      // the oracle's tagged strings only after the walk, BEFORE the
      // (depth, kind) aggregation (first_node/last_node are min/max in
      // STRING order, so the decode must precede the agg). Frontier
      // joins, dedup, and the visited anti-join all hash 8-byte longs
      // instead of tagged strings.
      def tag(k: Int, c: String) = col(c).cast("long") * 4 + k
      val edges = li.select(tag(0, "l_suppkey").as("src"),
          tag(1, "l_partkey").as("dst")).distinct()
        .unionByName(li.select(tag(1, "l_partkey").as("src"),
          tag(2, "l_orderkey").as("dst")).distinct())
        .unionByName(Tables.orders(s, d).select(
          tag(2, "o_orderkey").as("src"), tag(3, "o_custkey").as("dst")))
      val seeds = Tables.supplier(s, d).filter(col("s_suppkey") < 3)
        .select(tag(0, "s_suppkey").as("node"))
      val kindStr = element_at(array(lit("s"), lit("p"), lit("o"), lit("c")),
        (pmod(col("node"), lit(4)) + 1).cast("int"))
      Reachability.bfs(edges, seeds, maxHops = 3)
        .select(col("depth"),
          concat(kindStr, expr("node div 4")).as("node"))
        .groupBy(col("depth"), substring(col("node"), 1, 1).as("kind"))
        .agg(count(lit(1)).as("n"), min(col("node")).as("first_node"),
          max(col("node")).as("last_node"))
        .orderBy("depth", "kind")
    },

    // ---- Co-occurrence mining: parts bought together, the basket
    //      self-join every recommender/feature pipeline starts from.
    //      Scale: the pair explosion is bounded per basket (the join key
    //      is the order), partial aggregation combines map-side, top-20
    //      is a TakeOrdered — the hazard at 100 TB is a HOT basket, and
    //      the mitigation is the same salting/AQE-skew split the engine
    //      pins in SkewSpec, not a different plan. ----
    gated("q127_copurchase",
      """WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS c
        |FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 ORDER BY c DESC, pa, pb LIMIT 20""") { (s, d) =>
      val basket = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint() // r19: feeds BOTH self-join sides — one scan +
                           // one distinct, the q141/q157 shape (guide §6)
      val a = basket.select(col("ok"), col("pk").as("pa"))
      val b = basket.select(col("ok").as("ok2"), col("pk").as("pb"))
      a.join(b, col("ok") === col("ok2") && col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pa"), col("pb"))
        .limit(20)
    },

    // ---- Triangle counting (operators/Triangles): per-node triangle
    //      participation over the 300 strongest supplier co-sourcing
    //      edges (top by shared-part count — a deterministic, scale-free
    //      sparsification; the raw co-sourcing graph is complete).
    //      The engine orients by (degree, node) and wedge-joins — each
    //      triangle enumerated once, out-neighborhoods bounded O(√E);
    //      the oracle enumerates with three id-ordered joins. Orientation
    //      changes the join sizes, never the counts, so the two agree
    //      exactly. ----
    gated("q128_triangles",
      """WITH e0 AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
        |w AS (SELECT a.sk AS u, b.sk AS v, COUNT(*) AS n
        |      FROM e0 a JOIN e0 b ON a.pk = b.pk AND a.sk < b.sk GROUP BY 1, 2),
        |edges AS (SELECT u, v FROM w ORDER BY n DESC, u, v LIMIT 300),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        |        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
        |FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |GROUP BY node ORDER BY tri DESC, node LIMIT 10""") { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val strongest = e0.as("x").join(e0.as("y"),
          col("x.pk") === col("y.pk") && col("x.sk") < col("y.sk"))
        .groupBy(col("x.sk").as("u"), col("y.sk").as("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("u"), col("v"))
        .limit(300)
        .select(col("u"), col("v"))
        .localCheckpoint() // r19: Triangles derives degrees + both wedge
                           // sides from this 300-row relation — pin it so
                           // the lineitem self-join builds ONCE (guide §6,
                           // the q142 shape)
      Triangles.perNode(strongest)
        .orderBy(col("tri").desc, col("node"))
        .limit(10)
    },

    // ---- Personalized PageRank: proximity to suppliers s0/s1 through
    //      the co-sourcing graph (random-walk-with-restart, the
    //      related-entities primitive). Seeds hold the restart mass;
    //      every other node ranks by how much seed mass random walks
    //      deliver to it. Same exact integer fixed-point as q122; the
    //      oracle folds the seed restart with a union inside each
    //      iteration's aggregation, exactly like the engine. ----
    gated("q135_ppr",
      s"""WITH pairs AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
         |edges AS (
         |  SELECT 'p' || CAST(pk AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || CAST(sk AS VARCHAR), 'p' || CAST(pk AS VARCHAR) FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
         |seeds AS (SELECT 's0' AS node UNION ALL SELECT 's1'),
         |r0 AS (SELECT node, $S // 2 AS r FROM seeds),
         |${(0 until 4).map(i => pprStep(s"r$i", s"r${i + 1}")).mkString(",\n")}
         |SELECT node, r FROM r4 ORDER BY r DESC, node LIMIT 15""") { (s, d) =>
      import s.implicits._
      // same long-encoded iteration + single-scan edge explode as q122
      // (seeds 's0'/'s1' encode to 1/3); decode on the 15-row output
      val pairs = Tables.lineitem(s, d)
        .select(col("l_partkey").cast("long").as("pk"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct()
        .localCheckpoint() // feeds both edge directions AND the degrees
      val edges = pairs.select(explode(array(
          struct((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst")),
          struct((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      PageRank.personalized(edges, Seq(1L, 3L).toDF("node"), 4)
        .select(when(pmod(col("node"), lit(2)) === 0,
            concat(lit("p"), expr("node div 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) div 2"))).as("node"),
          col("r"))
        .orderBy(desc("r"), col("node"))
        .limit(15)
    },

    // ---- Association rules over baskets (support ≥ 2): confidence and
    //      lift for every qualifying part pair, all exact rationals —
    //      conf(a→b) = c(ab)/c(a) in basis points, lift =
    //      n·c(ab)/(c(a)·c(b)) in ppm, truncating division both
    //      engines. The market-basket classic on top of q127's pair
    //      counts: one basket self-join with partial aggregation, two
    //      broadcast-sized item joins, one scalar basket count — no
    //      all-pairs leg (the HAVING support floor is what keeps rule
    //      output from exploding on a hot catalog at 100 TB). ----
    gated("q141_assoc_rules",
      """WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT COUNT(DISTINCT ok) AS n FROM basket),
        |item AS (SELECT pk, COUNT(*) AS c FROM basket GROUP BY pk),
        |pair AS (SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS cab
        |         FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
        |         GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT pair.pa, pair.pb, CAST(pair.cab AS BIGINT) AS cab,
        |       CAST((10000 * pair.cab) // ca.c AS BIGINT) AS conf_ab_bp,
        |       CAST((10000 * pair.cab) // cb.c AS BIGINT) AS conf_ba_bp,
        |       CAST((1000000 * pair.cab * nb.n) // (ca.c * cb.c) AS BIGINT) AS lift_ppm
        |FROM pair JOIN item ca ON pair.pa = ca.pk JOIN item cb ON pair.pb = cb.pk
        |CROSS JOIN nb
        |ORDER BY pa, pb""") { (s, d) =>
      val basket = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint() // feeds pair counts, item counts, AND n
      val item = basket.groupBy("pk").agg(count(lit(1)).as("c"))
      val nb = basket.select(countDistinct(col("ok")).as("n"))
      val pair = basket.select(col("ok"), col("pk").as("pa"))
        .join(basket.select(col("ok").as("ok2"), col("pk").as("pb")),
          col("ok") === col("ok2") && col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 2)
      pair
        .join(item.select(col("pk").as("pa"), col("c").as("ca")), "pa")
        .join(item.select(col("pk").as("pb"), col("c").as("cb")), "pb")
        .crossJoin(broadcast(nb))
        .select(col("pa"), col("pb"), col("cab"),
          expr("(10000 * cab) div ca").as("conf_ab_bp"),
          expr("(10000 * cab) div cb").as("conf_ba_bp"),
          // through DECIMAL(38,0): 10^6·cab·n in Long wraps silently at
          // ~10^12 baskets·cooccurrences (DuckDB would promote to
          // HUGEINT and diverge); decimal keeps the product exact and
          // IntegralDivide still lands on BIGINT
          expr("(CAST(1000000 AS DECIMAL(38,0)) * cab * n) div (ca * cb)")
            .as("lift_ppm"))
        .orderBy("pa", "pb")
    },

    // ---- Item-item co-occurrence COSINE (collaborative-filtering
    //      similarity): cos(a,b) = cab/√(ca·cb) over basket membership
    //      vectors — the sqrt-free EXACT form is cos² in ppm,
    //      cab²·10⁶ div (ca·cb), monotone in cos for the ranking.
    //      Complements q141: lift measures dependence vs independence,
    //      cosine normalizes by popularity (a pair of two blockbusters
    //      ranks lower here). Products through DECIMAL(38,0) — cab² in
    //      Long wraps at ~3B co-occurrences. Same bounded-per-basket
    //      self-join as q127; support floor bounds rule output. ----
    gated("q157_item_cosine",
      """WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |item AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM basket GROUP BY pk),
        |pair AS (SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS cab
        |         FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
        |         GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT pa, pb, cab,
        |       CAST((1000000 * cab * cab) // (ca.c * cb.c) AS BIGINT) AS cos2_ppm
        |FROM pair JOIN item ca ON pa = ca.pk JOIN item cb ON pb = cb.pk
        |ORDER BY cos2_ppm DESC, pa, pb LIMIT 20""") { (s, d) =>
      val basket = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint() // feeds pair counts AND item counts
      val item = basket.groupBy("pk").agg(count(lit(1)).as("c"))
      basket.select(col("ok"), col("pk").as("pa"))
        .join(basket.select(col("ok").as("ok2"), col("pk").as("pb")),
          col("ok") === col("ok2") && col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 2)
        .join(item.select(col("pk").as("pa"), col("c").as("ca")), "pa")
        .join(item.select(col("pk").as("pb"), col("c").as("cb")), "pb")
        .select(col("pa"), col("pb"), col("cab"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * cab * cab) div (ca * cb)")
            .as("cos2_ppm"))
        .orderBy(col("cos2_ppm").desc, col("pa"), col("pb"))
        .limit(20)
    },

    // ---- Local clustering coefficient: cc(v) = 2·tri(v)/(d(v)·(d(v)−1))
    //      in exact ppm over the q128 graph — triangles and degrees are
    //      both relations the engine already builds; the coefficient is
    //      one integer division. Top-20 most-clustered supplier
    //      neighborhoods (community-density ranking). ----
    gated("q142_clustering_coeff",
      """WITH e0 AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
        |w AS (SELECT a.sk AS u, b.sk AS v, COUNT(*) AS n
        |      FROM e0 a JOIN e0 b ON a.pk = b.pk AND a.sk < b.sk GROUP BY 1, 2),
        |edges AS (SELECT u, v FROM w ORDER BY n DESC, u, v LIMIT 300),
        |deg AS (SELECT dn AS dnode, CAST(COUNT(*) AS BIGINT) AS d FROM (
        |          SELECT u AS dn FROM edges UNION ALL SELECT v FROM edges) GROUP BY dn),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        |        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tc AS (SELECT tn AS tnode, CAST(COUNT(*) AS BIGINT) AS t FROM (
        |         SELECT a AS tn FROM tri UNION ALL SELECT b FROM tri
        |         UNION ALL SELECT c FROM tri) GROUP BY tn)
        |SELECT deg.dnode AS node, deg.d, COALESCE(tc.t, 0) AS tri,
        |       CAST((2000000 * COALESCE(tc.t, 0)) // (deg.d * (deg.d - 1)) AS BIGINT) AS cc_ppm
        |FROM deg LEFT JOIN tc ON deg.dnode = tc.tnode
        |WHERE deg.d >= 2
        |ORDER BY cc_ppm DESC, node LIMIT 20""") { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val strongest = e0.as("x").join(e0.as("y"),
          col("x.pk") === col("y.pk") && col("x.sk") < col("y.sk"))
        .groupBy(col("x.sk").as("u"), col("y.sk").as("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("u"), col("v"))
        .limit(300)
        .select(col("u"), col("v"))
        .localCheckpoint() // feeds degrees AND the triangle operator
      val deg = strongest.select(col("u").as("node"))
        .unionAll(strongest.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      deg.join(Triangles.perNode(strongest).withColumnRenamed("node", "tnode"),
          col("node") === col("tnode"), "left")
        .filter(col("d") >= 2)
        .select(col("node"), col("d"), coalesce(col("tri"), lit(0L)).as("tri"),
          expr("(2000000 * coalesce(tri, 0L)) div (d * (d - 1))").as("cc_ppm"))
        .orderBy(desc("cc_ppm"), col("node"))
        .limit(20)
    },

    // ---- Bounded-hop weighted shortest paths (operators/ShortestPaths,
    //      delta Bellman-Ford): cheapest supply route from nation 0 to
    //      every nation within 3 lane hops, where a lane supplier-nation
    //      → customer-nation costs its best-ever fulfilment delay
    //      |shipdate − orderdate| in whole days. Non-trivial on this
    //      graph: at sf0.01, 22 of 25 nations have a multi-hop route
    //      strictly cheaper than their direct lane. The oracle is
    //      DuckDB's recursive CTE enumerating every ≤3-edge path and
    //      taking the min — same bounded-hop semantics, third
    //      formulation (the engine never enumerates paths). Scale: the
    //      lane build is three equi-joins + one agg (the nation-pair
    //      relation is schema-bounded at 625 rows); the iteration moves
    //      only frontier-out-degree candidates and the |V|-row dist
    //      relation per round (see the operator's scaladoc). ----
    gated("q176_shortest_path",
      """WITH RECURSIVE
        |e AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
        |             CAST(MIN(abs(date_diff('day', o.o_orderdate, l.l_shipdate))) AS BIGINT) AS w
        |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |      JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |      GROUP BY 1, 2),
        |p(node, cost, depth) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION
        |  SELECT CAST(e.dst AS BIGINT), p.cost + e.w, p.depth + 1
        |  FROM p JOIN e ON e.src = p.node WHERE p.depth < 3),
        |d AS (SELECT node, CAST(MIN(cost) AS BIGINT) AS cost_days FROM p GROUP BY node)
        |SELECT d.node AS nationkey, n.n_name AS nation, d.cost_days
        |FROM d JOIN nation n ON n.n_nationkey = d.node
        |ORDER BY nationkey""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val lanes = li
        .join(Tables.orders(s, d), li("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), li("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .agg(min(abs(datediff(col("l_shipdate"), col("o_orderdate"))))
          .cast("long").as("w"))
      val seeds = Tables.nation(s, d).filter(col("n_nationkey") === 0)
        .select(col("n_nationkey").cast("long").as("node"))
      ShortestPaths.bellmanFord(lanes, seeds, maxHops = 3)
        .join(broadcast(Tables.nation(s, d)),
          col("node") === col("n_nationkey").cast("long"))
        .select(col("node").as("nationkey"), col("n_name").as("nation"),
          col("cost").as("cost_days"))
        .orderBy("nationkey")
    },

    // ---- K-core decomposition (operators/KCore): the 3-core of the
    //      q128 top-300 supplier co-sourcing graph — the cohesion
    //      certificate edges alone can't give (a chain of strong pairs
    //      has high edge weight but no core; a mirror community keeps
    //      everyone at degree ≥ 3). Engine peels synchronously to the
    //      fixpoint (order-independent, see the operator doc; observed
    //      depth 3); the oracle unrolls 8 peel rounds — peeling is
    //      idempotent at the fixpoint, so extra rounds are no-ops and
    //      the two agree exactly. The `stable` column makes the unroll
    //      SELF-DIAGNOSING: the oracle peels one round beyond
    //      PeelRounds and reports 1 only when that extra round removed
    //      nothing (fixpoint reached), while the engine — which runs to
    //      fixpoint by construction — emits a literal 1. A scale factor
    //      that ever needs deeper peeling therefore fails with an
    //      unambiguous stable=0 diff, not a confusing degree mismatch. ----
    gated("q200_kcore",
      s"""WITH e00 AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
         |w AS (SELECT a.sk AS u, b.sk AS v, COUNT(*) AS n
         |      FROM e00 a JOIN e00 b ON a.pk = b.pk AND a.sk < b.sk GROUP BY 1, 2),
         |top AS (SELECT u, v FROM w ORDER BY n DESC, u, v LIMIT 300),
         |e0 AS MATERIALIZED (SELECT u, v FROM top UNION ALL SELECT v, u FROM top),
         |$peelChain,
         |st AS (SELECT CASE WHEN (SELECT COUNT(*) FROM e$PeelRounds) =
         |                        (SELECT COUNT(*) FROM e${PeelRounds + 1})
         |              THEN 1 ELSE 0 END AS st)
         |SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg,
         |       CAST(st AS BIGINT) AS stable
         |FROM e$PeelRounds CROSS JOIN st GROUP BY u, st ORDER BY node""") { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val strongest = e0.as("x").join(e0.as("y"),
          col("x.pk") === col("y.pk") && col("x.sk") < col("y.sk"))
        .groupBy(col("x.sk").as("u"), col("y.sk").as("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("u"), col("v"))
        .limit(300)
        .select(col("u"), col("v"))
        .localCheckpoint() // r19: KCore symmetrizes via union — both
                           // branches read this 300-row relation instead
                           // of re-running the lineitem self-join twice
                           // (guide §6, the q142 shape)
      graft.operators.KCore.core(strongest, k = 3)
        .withColumn("stable", lit(1L)) // engine peels to fixpoint
        .orderBy("node")
    }
  )

  private def PeelRounds = 8

  /** Unrolled synchronous peel rounds for the q200 oracle: degrees →
    * survivors (deg ≥ 3) → edge restriction, repeated; idempotent once
    * the fixpoint is reached. Emits ONE round past PeelRounds so the
    * gate's `stable` column can certify convergence of the unroll. */
  private def peelChain: String =
    (0 to PeelRounds).map { i =>
      s"""d$i AS (SELECT u, COUNT(*) AS d FROM e$i GROUP BY u),
         |n$i AS (SELECT u FROM d$i WHERE d >= 3),
         |e${i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e$i e
         |  JOIN n$i a ON e.u = a.u JOIN n$i b ON e.v = b.u)""".stripMargin
    }.mkString(",\n")

  /** One personalized-iteration step: contributions union the seed
    * restart, then one group-sum (HUGEINT → BIGINT cast at the fold). */
  private def pprStep(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT node, CAST(SUM(r) AS BIGINT) AS r FROM (
       |    SELECT e.dst AS node, (17 * SUM($prev.r // deg.d)) // 20 AS r
       |    FROM edges e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
       |    GROUP BY e.dst
       |    UNION ALL SELECT node, (3 * $S) // (20 * 2) FROM seeds) u
       |  GROUP BY node)""".stripMargin
}
