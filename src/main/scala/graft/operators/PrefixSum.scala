package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running (prefix) sum in total `order` — WITHOUT the
  * single-task global window (`Window.orderBy` with no partition drags
  * the whole relation through ONE reducer; the optimizer even warns).
  * The primitive behind greedy budget cuts ("keep documents until the
  * token budget is spent"), global ranks, and CDF points.
  *
  * Same two-level shape as SortedNeighborhood's global sequence:
  * range-partition by the order key (cluster-wide parallel sort), local
  * prefix sums within each partition, then add per-partition offsets
  * computed from ONE collected count-per-partition row each — driver
  * data is O(partitions), never O(rows). The ranked relation is pinned
  * (localCheckpoint) BEFORE the totals collect so the offset join reads
  * the exact partitioning the totals were computed from —
  * repartitionByRange samples a fresh seed per job, and at scales where
  * sampling is partial an unpinned second execution could place rows in
  * different partitions (the round-8 SortedNeighborhood hazard). */
object PrefixSum {

  /** All columns of `df` plus `cum` = running sum of `value` (Long) over
    * rows ordered by `order` (which must be a total order — ties would
    * make the running sum nondeterministic between equal rows). */
  def global(df: DataFrame, order: Seq[Column], value: Column): DataFrame = {
    require(order.nonEmpty, "prefix sum: order columns required")
    val spark = df.sparkSession
    import spark.implicits._
    val local = df
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cum",
        sum(value).over(Window.partitionBy("__pid").orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    // partition total = sum of the value column (NOT max of the running
    // sum, which only equals the total when every value is non-negative)
    val totals = local.groupBy("__pid").agg(sum(value).as("t"))
      .orderBy("__pid").collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets = totals.zip(
      totals.map(_._2).scanLeft(0L)(_ + _)
    ).map { case ((pid, _), off) => (pid, off) }.toSeq
    if (offsets.isEmpty)
      return df.withColumn("cum", lit(0L)).filter(lit(false))
    local
      .join(broadcast(offsets.toDF("__pid", "__off")), Seq("__pid"))
      .withColumn("cum", col("__cum") + col("__off"))
      .drop("__pid", "__cum", "__off")
  }
}
