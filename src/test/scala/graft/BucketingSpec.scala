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
}
