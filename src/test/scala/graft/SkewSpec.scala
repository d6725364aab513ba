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

  test("hot basket: AQE splits the q127/q141 pair-explosion join's planted 1500-part order") {
    // the basket self-join hazard named at Graph.scala's q127/q141: one
    // pathological order holding ~10^3 parts makes its shuffle partition
    // the straggler AND explodes quadratically (C(1500,2) ≈ 1.1M pairs
    // from one key). The pair count is semantics — what must NOT happen
    // is the whole explosion serializing on one reducer: AQE's skew
    // split has to carve the hot partition into parallel sub-tasks.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> c.getOption(k)).toMap
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    try {
      // 200 normal single-digit baskets + ONE hot order with 1500 parts,
      // localCheckpoint so both join inputs are bare shuffle reads (the
      // SMJ(Sort(ShuffleRead),·) shape OptimizeSkewedJoin matches)
      val normal = spark.range(1200)
        .selectExpr("id % 200 AS ok", "id AS pk")
      val hot = spark.range(1500)
        .select(lit(999999L).as("ok"), (col("id") + 100000L).as("pk"))
      val basket = normal.unionByName(hot).localCheckpoint()
      val pairs = basket.select(col("ok"), col("pk").as("pa"))
        .join(basket.select(col("ok").as("ok2"), col("pk").as("pb")),
          col("ok") === col("ok2") && col("pa") < col("pb"))
      val agg = pairs.agg(count(lit(1)).as("n"))
      val n = agg.collect().head.getLong(0)
      // exact pair arithmetic: hot C(1500,2) + 200 baskets of C(6,2)
      assert(n === 1500L * 1499 / 2 + 200L * 15)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot basket's partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("AQE splits a 100x-skewed self-join key instead of stranding it on one reducer") {
    // the q83/q08/q09 hazard class: a user-keyed join where one planted
    // user carries 100× the rows. AQE's skew-join must split the hot
    // partition into parallel sub-tasks (skew=true on the join) — the
    // production knob set, scaled down to test-sized thresholds.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> c.getOption(k)).toMap
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try {
      val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
      // hot side: user 42 planted at 100× everyone else's volume
      val hot = ev.crossJoin(spark.range(100))
        .select(col("event_id"), lit(42L).as("user_id"), col("ts"))
      val fact = ev.unionByName(hot)
      // per-key-small right side, so output stays |fact| while the join
      // INPUT partition for user 42 is the straggler candidate.
      // Materialized: OptimizeSkewedJoin pattern-matches
      // SMJ(Sort(ShuffleRead), Sort(ShuffleRead)) — a distinct's final
      // aggregate between shuffle and sort would opt the join out
      val dim = fact.select("user_id").distinct()
        .withColumn("cohort", pmod(col("user_id"), lit(7)))
        .localCheckpoint()
      val joined = fact.join(dim, "user_id")
      // execute THIS DataFrame's QueryExecution (count() would spawn its
      // own) so executedPlan is the final adaptive plan
      assert(joined.collect().length.toLong === fact.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot key's partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }
}
