package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield–Lund–Thorup, JACM 2007) as a RELATION —
  * the WEIGHTED counterpart of the KMV bottom-k sample (operators/Kmv).
  * Per group, each key draws priority w / u from its weight w and its
  * deterministic hash position u ∈ (0, 1]; the sketch keeps the k+1
  * highest-priority keys. The top k are
  *   - a weighted-without-replacement sample biased toward heavy keys —
  *     the quality-/length-weighted corpus subsample a training-data
  *     pipeline draws (long or high-quality documents kept with
  *     probability ∝ weight), reproducible and append-stable because u
  *     is a pure function of the key (the q66/Kmv determinism
  *     contract); and
  *   - an UNBIASED subset-sum estimator: with τ = the (k+1)-th
  *     priority, E[Σ_{top k} max(w_i, τ)] = Σ w_i exactly (DLT
  *     theorem 1) — total token counts estimated from k rows.
  *
  * No transcendentals anywhere: exponential/weighted-reservoir schemes
  * rank on u^(1/w) or ln(u)/w, which are not bit-portable across
  * engines (the q81 lesson), while w / u is ONE IEEE division —
  * correctly rounded and identical everywhere, so a cross-engine gate
  * can pin the sample EXACTLY. u is the first 13 md5 hex chars (52
  * bits, exact in a double, divided by 2^52 — exact). u = 0 needs ~2^52
  * keys to appear; both engines agree on w / 0.0 = +Inf and the key
  * tie-break, so even that degenerate draw stays deterministic.
  *
  * Scale shape (same as Kmv): the weight consolidation is the
  * map-side-combined aggregation every dedup pays; the rank filter runs
  * as WindowGroupLimit, so the window exchange carries ≤ k+1 rows per
  * group per task. MERGE re-ranks the deduped union of shard sketches —
  * priorities are pure per-key functions, so top-(k+1) is a semilattice
  * over shards. The sketch carries its own `k` column (the CountMin
  * width lesson). */
object PrioritySample {

  /** Hash position u ∈ [0, 1): first 52 bits of md5, exact in a double
    * (Kmv's conversion — one copy, both gates pin its exact bits). */
  private def fracOf(key: Column): Column = Kmv.frac(Kmv.hashOf(key))

  /** Build the sketch `(grp, key, w, rn, k)`: the k+1 keys with the
    * highest priorities w / u per group, rn ∈ 1..k+1 in priority order
    * (rn ≤ k = the sample; rn = k+1 = the estimator's threshold row).
    * A key appearing with several weights consolidates to max(w) first
    * — deterministic, and the identity when weight is a function of the
    * key. */
  def build(df: DataFrame, groupCol: String, keyCol: String,
            weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = df
      .select(col(groupCol).as("grp"), col(keyCol).as("key"),
        col(weightCol).cast("double").as("w"))
      .where(col("key").isNotNull && col("w").isNotNull && col("w") > 0)
      .groupBy("grp", "key").agg(max(col("w")).as("w"))
    topK(keyed, k)
  }

  private def topK(keyed: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("grp")
      .orderBy((col("w") / fracOf(col("key"))).desc, col("key"))
    keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k + 1)
      .withColumn("k", lit(k))
      .select("grp", "key", "w", "rn", "k")
  }

  /** The sample itself: the top-k rows (drops the threshold row). */
  def sample(sketch: DataFrame): DataFrame = sketch.filter(col("rn") <= col("k"))

  /** Fold sketches built with the SAME k — re-rank the deduped union
    * (a key present in several shards hashes and weighs identically,
    * so dedupe keeps max(w) like build). Mismatched k fails loudly; an
    * all-empty union merges to the empty sketch. Checkpointed like
    * Kmv.merge: the k-check and the re-rank run the input builds ONCE. */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionAll _).localCheckpoint()
    val r = all.agg(countDistinct(col("k")).as("nk"), max(col("k")).as("k"))
      .collect().head
    if (r.getLong(0) == 0L) return all
    require(r.getLong(0) == 1L,
      s"sketches built with ${r.getLong(0)} different k values — merge " +
        "only sketches sharing k")
    topK(all.groupBy("grp", "key").agg(max(col("w")).as("w")), r.getInt(1))
  }

  /** Unbiased estimate of Σw per group, from sketch rows alone: with
    * τ = the group's (k+1)-th priority, est = Σ_{rn ≤ k} max(w, τ).
    * Groups that yielded ≤ k keys have no threshold row — τ = 0 and
    * the estimate is their exact total. The sketch is ≤ (k+1)·groups
    * rows, so the τ-broadcast window is trivially cheap. */
  def estimateTotal(sketch: DataFrame): DataFrame = {
    val tau = max(when(col("rn") === col("k") + 1,
        col("w") / fracOf(col("key"))).otherwise(lit(0.0)))
      .over(Window.partitionBy("grp"))
    sketch.withColumn("tau", tau)
      .filter(col("rn") <= col("k"))
      .groupBy("grp")
      .agg(sum(greatest(col("w"), col("tau"))).as("est"))
  }
}
