package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation must be value-identical to the direct group-by —
  * including on an artificially skewed key distribution. */
class SkewSpec extends SparkTestBase {

  test("salted count/sum equals direct aggregation under skew") {
    // skew: fold 2/3 of users onto key 0 (one hot group)
    val events = Tables.events(spark, sf)
      .withColumn("k", when(col("user_id") % 3 =!= 0, 0L)
        .otherwise(col("user_id")))
      .withColumn("v", col("value").cast("double"))

    val direct = events.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("v")).as("total"))
    val salted = Skew.saltedCountSum(events, col("k"), col("v"),
      col("event_id"), nSalts = 8)

    val d = direct.collect().map(r => r.getLong(0) -> (r.getLong(1),
      math.round(r.getDouble(2) * 100))).toMap
    val s = salted.collect().map(r => r.getLong(0) -> (r.getLong(1),
      math.round(r.getDouble(2) * 100))).toMap
    assert(s === d)
  }

  test("salting spreads the hot key over multiple partial groups") {
    val events = Tables.events(spark, sf).withColumn("k", lit(0L))
    val partials = events
      .groupBy(col("k"), pmod(xxhash64(col("event_id")), lit(8)).as("salt"))
      .agg(count(lit(1)))
    assert(partials.count() === 8) // one hot key → 8 parallel partials
  }
}
