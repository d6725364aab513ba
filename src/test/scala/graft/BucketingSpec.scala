package graft

import org.apache.spark.sql.functions._

/** Bucketing — the persisted form of co-located joins (SURVEY scale notes:
  * "bucketing for co-located joins"). Two tables bucketed+sorted on the
  * join key must join with ZERO exchanges and zero sorts: at 100 TB this
  * is the difference between a terabyte shuffle per join and none. */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed sorted tables plans no exchange and no sort") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
      Tables.orders(spark, sf)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("bkt_orders")
      Tables.customer(spark, sf)
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("bkt_customer")

      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === Tables.orders(spark, sf).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    // the archive layout (partitionBy day) joined to a filtered dim must
    // scan only the dim's days — at 100 TB the difference between
    // reading 3 partitions and 3 years. Static pruning can't do it (the
    // day set is only known after the dim filter runs); DPP injects the
    // runtime subquery into the scan's partition filters.
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val nDays = fact.select("day").distinct().count()
    assert(nDays > 3, s"fixture has only $nDays days")
    // DPP's planner heuristic wants a SELECTIVE PREDICATE on the dim
    // side (a limit/checkpoint doesn't qualify) — filter on 3 literal
    // days, the shape a real dim lookup has
    val keep = fact.select("day").distinct().orderBy("day").limit(3)
      .collect().map(_.getDate(0))
    val dim = fact.select("day").distinct()
      .filter(col("day").isin(keep.toIndexedSeq: _*))
      .withColumn("tag", lit("keep"))
    val joined = fact.join(dim, Seq("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$plan")
    assert(joined.count() === 3)
  }
}
