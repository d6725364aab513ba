package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable Misra-Gries summary as a RELATION — the persistable,
  * foldable form of the frequent-items sketch (Agarwal et al.,
  * "Mergeable Summaries", PODS'12: MG summaries merge by pointwise
  * counter addition followed by subtracting the (k+1)-th largest
  * counter, preserving the εn undercount bound with ε = 1/(k+1) under
  * ANY merge tree). Complements operators/HeavyHitters (per-partition
  * MG + exact recount, a two-pass batch shape): this form needs no
  * second pass over the data, so it can live on the sketch shelf
  * (q117) and fold per micro-batch in a stream.
  *
  * Relation schema (grp, item, c):
  *   - item ≠ NULL rows: ≤ k surviving counters per group; c is an
  *     UNDERCOUNT of the item's true frequency, short by at most
  *     n/(k+1).
  *   - one item = NULL sentinel row per group: c = n, the total item
  *     count ever folded into the group — the denominator the error
  *     bound and any "exceeds n/k" serve-time filter needs. Carrying n
  *     inside the same relation keeps the state a SINGLE versioned
  *     parquet dir (one atomic commit per batch).
  *
  * Scale: counters-per-group is k+1 rows forever, so state size is
  * groups × (k+1) regardless of stream length; every step below is a
  * hash-agg or a bounded per-group window — nothing holds a vocabulary
  * anywhere. */
object MgSummary {

  /** Summary of one batch: exact per-group counts, compressed to k. */
  def build(df: DataFrame, grpCol: String, itemCol: String, k: Int): DataFrame = {
    val base = df.select(col(grpCol).as("grp"), col(itemCol).as("item"))
    val counts = base.groupBy("grp", "item").agg(count(lit(1)).as("c"))
    val totals = base.groupBy("grp")
      .agg(count(lit(1)).as("c"))
      .withColumn("item", lit(null).cast(base.schema("item").dataType))
      .select(col("grp"), col("item"), col("c"))
    compress(counts.unionByName(totals), k)
  }

  /** Merge two summaries built with the same k: counters add pointwise
    * (absent = 0), sentinels add, then one compression. Associative and
    * commutative up to the MG guarantee; the error bounds add. */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    compress(
      a.unionByName(b).groupBy("grp", "item").agg(sum(col("c")).as("c")),
      k)

  /** MG compression: subtract the (k+1)-th largest counter from every
    * counter in the group, drop the non-positive — ≤ k survivors.
    * Sentinel rows pass through untouched. Deterministic tie-break
    * (c desc, item) so the surviving SET is reproducible, not just the
    * guarantee. */
  def compress(rel: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"mg: k must be >= 1, got $k")
    val items = rel.filter(col("item").isNotNull)
    val tot = rel.filter(col("item").isNull)
    val byCount = Window.partitionBy("grp").orderBy(desc("c"), asc("item"))
    items
      .withColumn("rk", row_number().over(byCount))
      .withColumn("s",
        max(when(col("rk") === k + 1, col("c")).otherwise(lit(0L)))
          .over(Window.partitionBy("grp")))
      .filter(col("rk") <= k && col("c") > col("s"))
      .select(col("grp"), col("item"), (col("c") - col("s")).as("c"))
      .unionByName(tot)
  }

  /** Serve-time view: (grp, item, c, n) — candidate frequent items with
    * their undercounted frequency and the group total. Every item whose
    * true count exceeds n/(k+1) is guaranteed present; c is within
    * n/(k+1) below the true count. */
  def candidates(state: DataFrame): DataFrame =
    state.filter(col("item").isNotNull)
      .join(
        state.filter(col("item").isNull).select(col("grp"), col("c").as("n")),
        "grp")
      .select(col("grp"), col("item"), col("c"), col("n"))
}
