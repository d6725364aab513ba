package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog sketch as a RELATION — the PERSISTABLE distinct-count
  * sketch completing the mergeable shelf next to KMV (distinct +
  * sample), Count-Min (frequencies) and priority sampling (weighted
  * totals). q11b's `approx_count_distinct` answers one query inline;
  * this operator makes the sketch itself a first-class column
  * (Spark's DataSketches HLL binary format), so per-shard / per-day
  * sketches can be WRITTEN TO PARQUET and rolled up later without
  * re-scanning the data — the 100 TB pattern: a daily distinct-users
  * sketch is KBs, the day's events are TBs, and a 90-day rollup folds
  * 90 sketch rows instead of re-reading a quarter of the lake.
  *
  * Scale shape: BUILD is one ObjectHashAggregate with a partial phase —
  * each map task collapses to one sketch per group BEFORE the exchange,
  * so the shuffle carries `groups × 2^lgK` registers at most, never
  * keys. MERGE unions sketch relations and folds register-wise
  * (`hll_union_agg`); the union is a handful of sketch rows per shard.
  * ESTIMATE reads the registers alone. Relative standard error ≈
  * 1.04 / sqrt(2^lgK) ≈ 1.6% at the default lgK = 12 (Flajolet et al.,
  * AofA 2007; implementation: Apache DataSketches HLL_8).
  *
  * Unlike the md5-ring sketches (Kmv/PrioritySample), the binary
  * register blob is DataSketches-specific, not cross-engine — so the
  * gate (q115) pins exact counts as the oracle payload and the
  * estimate as a measured-tolerance verdict, the q11b pattern. The
  * sketch carries its own `lgk` column so merges can never silently
  * fold sketches built at different precisions (the CountMin width
  * lesson); `hll_union_agg` would also reject mismatched lgK, but only
  * lazily inside an executor task — the eager check fails at the
  * driver with the family's error message. */
object Hll {

  /** Build the sketch `(grp, sketch, lgk)` — one DataSketches HLL blob
    * per group over the key column's non-null values. */
  def build(df: DataFrame, groupCol: String, keyCol: String,
            lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21,
      s"lgK must be in [4, 21] (DataSketches HLL bounds), got $lgK")
    df.select(col(groupCol).as("grp"), col(keyCol).as("key"))
      .where(col("key").isNotNull)
      .groupBy("grp")
      .agg(hll_sketch_agg(col("key"), lit(lgK)).as("sketch"))
      .withColumn("lgk", lit(lgK))
  }

  /** Shelf build for ALL shards in ONE corpus scan: `(grp, sketch, lgk,
    * shard)` grouped by (group, shard) — the caller writes
    * `partitionBy("shard")` to land the per-shard directory layout
    * without re-scanning the corpus once per shard (N shards × K sketch
    * types cost K scans, not N·K; at 100 TB the scan IS the cost). Each
    * shard's rows are exactly what [[build]] over that shard alone
    * produces — IndexSpec pins disk-merged == inline-merged. */
  def buildSharded(df: DataFrame, groupCol: String, keyCol: String,
                   shardCol: org.apache.spark.sql.Column,
                   lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21,
      s"lgK must be in [4, 21] (DataSketches HLL bounds), got $lgK")
    df.select(col(groupCol).as("grp"), col(keyCol).as("key"),
        shardCol.as("shard"))
      .where(col("key").isNotNull)
      .groupBy("grp", "shard")
      .agg(hll_sketch_agg(col("key"), lit(lgK)).as("sketch"))
      .withColumn("lgk", lit(lgK))
      .select("grp", "sketch", "lgk", "shard")
  }

  /** Fold sketches built with the SAME lgK into one — register-wise
    * union per group (HLL union is a semilattice). Mismatched lgK fails
    * loudly at the driver; an all-empty union (every shard had zero
    * rows) merges to the empty sketch. The union is checkpointed so the
    * lgK check and the fold execute each input's build lineage ONCE
    * (the Kmv.merge rule). */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionAll _).localCheckpoint()
    val r = all.agg(countDistinct(col("lgk")).as("nl"), max(col("lgk")).as("lgk"))
      .collect().head
    if (r.getLong(0) == 0L) return all
    require(r.getLong(0) == 1L,
      s"sketches built with ${r.getLong(0)} different lgK values — merge " +
        "only sketches sharing lgK")
    all.groupBy("grp")
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
      .withColumn("lgk", lit(r.getInt(1)))
  }

  /** Distinct-count estimate per group, from the registers alone. */
  def estimateDistinct(sketch: DataFrame): DataFrame =
    sketch.select(col("grp"),
      hll_sketch_estimate(col("sketch")).cast("double").as("est"))

  /** Inline estimate COLUMN — the one-pass composition form: a
    * distinct-count estimate of `key` as an ordinary aggregate
    * expression, so a profiling query folds n_rows + k sketch estimates
    * into ONE scan (the q219 FD-discovery shape: at 100 TB the scan is
    * the cost and every candidate must ride the same pass). Same
    * DataSketches registers as [[build]]; use build/merge when the
    * sketch itself must persist or fold across shards. */
  def estimateAgg(key: org.apache.spark.sql.Column, lgK: Int = 12)
      : org.apache.spark.sql.Column = {
    require(lgK >= 4 && lgK <= 21,
      s"lgK must be in [4, 21] (DataSketches HLL bounds), got $lgK")
    hll_sketch_estimate(hll_sketch_agg(key, lit(lgK))).cast("double")
  }
}
