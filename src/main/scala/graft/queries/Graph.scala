package graft.queries

import graft.{GatedQuery, Tables}
import graft.GatedQuery.gated
import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Graph analytics over relations derived from the base tables — the
  * iterative-computation surface (SURVEY §2 serve-side analytics S15
  * generalized to graph centrality). Companion to the pointer-jumping
  * connected components (q78/q90): CC answers "which rows are one
  * entity", PageRank answers "which entities matter".
  *
  * Everything gated is exact integer fixed-point (see
  * operators/PageRank.scala) — the oracle unrolls the same iterations as
  * CTEs with DuckDB's `//` floor division (== Spark's `div` truncation
  * for the all-positive ranks), so both engines agree to the last unit.
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
      val pairs = Tables.lineitem(s, d)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = pairs
        .select(concat(lit("p"), col("pk").cast("string")).as("src"),
          concat(lit("s"), col("sk").cast("string")).as("dst"))
        .unionAll(pairs.select(
          concat(lit("s"), col("sk").cast("string")).as("src"),
          concat(lit("p"), col("pk").cast("string")).as("dst")))
      PageRank.run(edges, 5)
        .select(col("node"), col("r").cast("long").as("rank"))
        .orderBy(desc("rank"), col("node"))
        .limit(20)
    }
  )
}
