package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable QUANTILE sketch as a relation — a uniform per-group ROW
  * sample by hash rank, completing the sketch shelf next to HLL
  * (distinct counts), Count-Min (frequencies), KMV (distinct
  * sample/count/overlap) and priority sampling (weighted totals):
  * per group, keep the k rows whose md5(row-key) is smallest, then read
  * empirical quantiles off the sample values alone. `percentile()`
  * answers one quantile query inline by sorting the whole group; this
  * makes the sample itself a first-class relation, so per-shard/per-day
  * samples persist to parquet and a 90-day p99 rolls up from sample
  * rows, never the events (the q117 shelf pattern).
  *
  * Why hash-rank rows (and not value-space summaries like GK/KLL): the
  * bottom-k of md5(row-key) is a uniform row sample that is
  *   - REPRODUCIBLE and append-stable (the q66/q112 determinism
  *     contract — both engines, any run, same sample),
  *   - a SEMILATTICE (bottomK(A ∪ B) = bottomK(bottomK(A) ∪
  *     bottomK(B))), so per-shard sketches merge by re-ranking ≤
  *     k·shards sample rows, and
  *   - a quantile estimator with distribution-free rank error: for
  *     sample size k, the empirical q-quantile sits within
  *     |F(v̂) − q| ≈ sqrt(q(1−q)/k) of the true rank position
  *     (Dvoretzky–Kiefer–Wolfowitz; ≈ 0.031 at q = 0.5, k = 256).
  *
  * Scale shape — every property is a plan property, same as Kmv: BUILD
  * is one rank-filter window executed as WindowGroupLimit (each map task
  * truncates to ≤ k rows per group BEFORE the exchange); MERGE re-ranks
  * the union of sketch rows (never data); ESTIMATE windows over ≤ k
  * rows per group. */
object QuantileSample {

  private def bottomK(withH: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(col("h"), col("key"))
    withH.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .withColumn("k", lit(k))
      .select("grp", "key", "h", "v", "rn", "k")
  }

  /** Build the sketch `(grp, key, h, v, rn, k)` — the k rows with the
    * smallest md5(rowKey) per group, carrying their values. `rowKeyCol`
    * must identify rows uniquely (an event id, a file offset): the
    * sample is uniform over distinct row keys. Null keys and null
    * values are excluded (a quantile is over present values). */
  def build(df: DataFrame, groupCol: String, rowKeyCol: String,
            valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val rows = df.select(col(groupCol).as("grp"), col(rowKeyCol).as("key"),
        col(valueCol).cast("double").as("v"))
      .where(col("key").isNotNull && col("v").isNotNull)
      .dropDuplicates("grp", "key")
    bottomK(rows.withColumn("h", Kmv.hashOf(col("key"))), k)
  }

  /** Fold sketches built with the same k — re-rank the deduped union
    * (the Kmv.merge rule: checkpoint so each input's build lineage runs
    * once; loud on mismatched k; empty-safe). */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionAll _).localCheckpoint()
    val r = all.agg(countDistinct(col("k")).as("nk"), max(col("k")).as("k"))
      .collect().head
    if (r.getLong(0) == 0L) return all
    require(r.getLong(0) == 1L,
      s"sketches built with ${r.getLong(0)} different k values — merge " +
        "only sketches sharing k")
    bottomK(all.select("grp", "key", "h", "v").dropDuplicates("grp", "key"),
      r.getInt(1))
  }

  /** Empirical quantiles per group from the sample rows alone —
    * `(grp, q, est)`, nearest-rank (the estimate is an actual sampled
    * value, ties included): est = the value at rank max(1, ceil(q·n))
    * of the sample sorted by value. Exact whenever the group held ≤ k
    * rows (the sample IS the group). */
  def estimateQuantiles(sketch: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val byV = Window.partitionBy("grp").orderBy(col("v"), col("key"))
    val ranked = sketch
      .withColumn("rv", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    ranked
      .select(col("grp"), col("v"), col("rv"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("rv") === greatest(lit(1), ceil(col("q") * col("n"))))
      .select(col("grp"), col("q"), col("v").as("est"))
  }
}
