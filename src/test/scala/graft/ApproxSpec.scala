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

  test("non-vacuity: EVERY registered query returns rows at sf0.001") {
    // a 0=0 hash match certifies nothing (round-1 lesson: three queries
    // were vacuously green) — so emptiness anywhere in the registry fails
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (_, fn) => fn(spark, sf).count() == 0
    }.map(_._1)
    assert(empty.isEmpty, s"vacuous queries: ${empty.mkString(", ")}")
  }
}
