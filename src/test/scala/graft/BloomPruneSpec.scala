package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** Explicit bloom-filter join pruning: no false negatives (prune keeps a
  * superset of the semi-join), real selectivity (false positives bounded),
  * and a broadcast-only plan (the fact side is not shuffled to be probed). */
class BloomPruneSpec extends SparkTestBase {

  test("prune keeps exactly a superset of the semi-join, join result unchanged") {
    val dim = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
    val fact = Tables.lineitem(spark, sf)
    val pruned = BloomPrune.prune(fact, "l_orderkey", dim, "o_orderkey")

    val exact = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    // no false negatives: every semi-join row survives the prune
    assert(exact.exceptAll(pruned).count() === 0)

    // composed with the exact join the result is identical to no pruning
    val withPrune = dim.join(pruned, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
    val without = dim.join(fact, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
    assert(withPrune.exceptAll(without).count() === 0)
    assert(without.exceptAll(withPrune).count() === 0)
  }

  test("empty dim prunes everything (the empty semi-join), not an analysis error") {
    val dim = Tables.orders(spark, sf).filter(col("o_totalprice") < 0)
    val pruned = BloomPrune.prune(Tables.lineitem(spark, sf),
      "l_orderkey", dim, "o_orderkey")
    assert(pruned.count() === 0)
  }

  test("false positives stay within sketch bounds; probe plan is exchange-free") {
    val dim = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
    val fact = Tables.lineitem(spark, sf)
    val pruned = BloomPrune.prune(fact, "l_orderkey", dim, "o_orderkey",
      estimatedItems = 10000L)
    val exactCnt = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val prunedCnt = pruned.count()
    val totalCnt = fact.count()
    assert(prunedCnt >= exactCnt)
    // default fpp is ~3%; allow 10% of the non-matching rows as headroom
    assert(prunedCnt <= exactCnt + (totalCnt - exactCnt) / 10,
      s"pruning too weak: $prunedCnt of $totalCnt (exact $exactCnt)")

    // the sketch is a literal in the probe filter: the pruned fact plan is
    // scan + filter, no exchange of any kind
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("might_contain"),
      s"probe expression missing from plan:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected exchange in probe plan:\n$plan")
  }
}
