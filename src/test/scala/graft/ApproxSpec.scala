package graft

import org.apache.spark.sql.functions._

/** O12: approx_count_distinct has no cross-engine oracle (HLL++ vs DuckDB's
  * estimator), so the gate is a Spark-side error envelope vs the exact
  * count (SURVEY.md §2.2 O12: ±5%). */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct lands within 5% of exact") {
    val orders = Tables.orders(spark, sf)
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), 0.02))
      .head().getLong(0)
    val err = math.abs(approx.toDouble - exact) / exact
    assert(err <= 0.05, s"approx=$approx exact=$exact err=$err")
  }

  test("non-vacuity: predicates chosen for q06/q23/q24/q45/q46 hit the data") {
    val q = SparkEntry.queries
    Seq("q06_anti_join", "q23_except", "q24_string_funcs",
      "q45_ngram_jaccard", "q46_cosine_neardup").foreach { name =>
      assert(q(name)(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
