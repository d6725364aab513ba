package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) / bottom-k sketch as a RELATION — the mergeable
  * SAMPLING sketch completing the approximate shelf next to HLL (distinct
  * counts, q11b), Misra-Gries (top-k items, q98) and Count-Min
  * (frequencies, q111). Per group, the sketch keeps the k DISTINCT keys
  * with the smallest hash values; because the hash is a pure function of
  * the key, that set is simultaneously
  *   - a uniform random sample of the group's distinct keys that is
  *     REPRODUCIBLE and append-stable (re-running over a grown corpus
  *     never swaps an old survivor for a different equal-rank one — the
  *     q66 determinism contract, in bottom-k form: fixed SIZE per group
  *     instead of fixed RATE), and
  *   - a distinct-cardinality estimator: k keys occupying the hash-ring
  *     prefix [0, h_k] witness ≈ (k-1)/h_k keys on the whole ring
  *     (Bar-Yossef et al., "Counting distinct elements in a data
  *     stream", RANDOM 2002).
  *
  * Why a relation: every sketch property is a plan property.
  *   - BUILD is the exact-distinct pass every dedup operator already
  *     pays (map-side-combined, q35's shape) followed by a rank-filter
  *     window that Spark executes as WindowGroupLimit — each map task
  *     truncates to ≤ k rows per group BEFORE the exchange, so the
  *     second shuffle carries sketch rows, not distinct keys;
  *   - MERGE exploits that bottom-k is a semilattice:
  *     bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) — per-shard /
  *     per-day sketches fold by re-ranking their union (≤ k·shards rows,
  *     never the data); a key present in several shards hashes
  *     identically everywhere, so the union dedupes by (grp, key);
  *   - ESTIMATE reads k and h_k off the sketch rows alone.
  *
  * The hash is md5 hex — deterministic, session-independent, and
  * rendered identically by other engines, so a bottom-k sample is
  * bit-reproducible cross-engine (the q63/q66 mechanism). The sketch
  * carries its own `k` column so merges can never silently fold
  * sketches built with different k (the CountMin width lesson). */
object Kmv {

  /** Hash-ring position of a key: md5 hex of its string rendering. */
  def hashOf(key: Column): Column = md5(key.cast("string"))

  /** First 13 hex chars = 52 bits → exact in a double: position in [0,1).
    * Shared with PrioritySample — both operators' cross-engine gates pin
    * this exact conversion, so there is exactly one copy of it. */
  private[operators] def frac(h: Column): Column =
    conv(substring(h, 1, 13), 16, 10).cast("long") / lit(4503599627370496.0)

  private def bottomK(withH: DataFrame, k: Int,
                      parts: Seq[String] = Seq("grp")): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*)
      .orderBy(col("h"), col("key"))
    withH.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .withColumn("k", lit(k))
      .select((Seq("grp", "key", "h", "rn", "k") ++
        parts.filterNot(_ == "grp")).map(col): _*)
  }

  /** Build the sketch `(grp, key, h, rn, k)` — the k distinct keys with
    * the smallest hashes per group, rn ∈ 1..k in hash order. Groups with
    * fewer than k distinct keys keep all of them (and the estimator
    * returns their exact count). */
  def build(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (the estimator reads the k-th minimum), got $k")
    val pairs = df.select(col(groupCol).as("grp"), col(keyCol).as("key"))
      .where(col("key").isNotNull)
      .distinct()
    bottomK(pairs.withColumn("h", hashOf(col("key"))), k)
  }

  /** Shelf build for ALL shards in ONE distinct pass: `(grp, key, h,
    * rn, k, shard)` ranked per (group, shard) — the caller writes
    * `partitionBy("shard")` for the per-shard directory layout without
    * one scan per shard (the [[Hll.buildSharded]] rationale). Each
    * shard's rows are exactly what [[build]] over that shard alone
    * yields: the hash is a pure key function, so per-shard bottom-k
    * needs no cross-shard coordination. */
  def buildSharded(df: DataFrame, groupCol: String, keyCol: String,
                   shardCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (the estimator reads the k-th minimum), got $k")
    val pairs = df.select(col(groupCol).as("grp"), col(keyCol).as("key"),
        shardCol.as("shard"))
      .where(col("key").isNotNull)
      .distinct()
    bottomK(pairs.withColumn("h", hashOf(col("key"))), k,
      parts = Seq("grp", "shard"))
  }

  /** Fold sketches built with the SAME k into one — re-rank the deduped
    * union (bottom-k is a semilattice). Mismatched k fails loudly; an
    * all-empty union (every shard had zero rows) merges to the empty
    * sketch. The union is checkpointed so the k-check and the re-rank
    * execute each input sketch's build lineage ONCE, not twice — sketch
    * rows are ≤ k·groups·shards, the builds above them are not. */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionAll _).localCheckpoint()
    val r = all.agg(countDistinct(col("k")).as("nk"), max(col("k")).as("k"))
      .collect().head
    if (r.getLong(0) == 0L) return all
    require(r.getLong(0) == 1L,
      s"sketches built with ${r.getLong(0)} different k values — merge " +
        "only sketches sharing k")
    bottomK(all.select("grp", "key", "h").dropDuplicates("grp", "key"),
      r.getInt(1))
  }

  /** Distinct-count estimate per group, from sketch rows alone: exact
    * when the group yielded fewer than k keys (the sketch IS its
    * distinct set), else (k-1)/h_k. Relative standard error ≈
    * 1/sqrt(k-2). */
  def estimateDistinct(sketch: DataFrame): DataFrame =
    sketch.groupBy("grp")
      .agg(count(lit(1)).as("n_keys"), max(col("k")).as("kk"),
        max(frac(col("h"))).as("hk"))
      .select(col("grp"),
        when(col("n_keys") < col("kk"), col("n_keys").cast("double"))
          .otherwise((col("kk") - lit(1)).cast("double") / col("hk"))
          .as("est"))

  /** Set-overlap estimate per group from two sketches built with the
    * same k — `(grp, jaccard_est, inter_est)`. This is the corpus-
    * decontamination screen at 100 TB: "how much does my train shard
    * overlap this eval set" answered from two KB-scale sketch relations,
    * never a join of the full key sets.
    *
    * Mechanism (Beyer et al., "On synopses for distinct value estimation
    * under multiset operations", SIGMOD 2007): bottom-k of A ∪ B is
    * computable from the two sketches alone (semilattice), and each of
    * its members is hash-uniform over A ∪ B; membership of such a member
    * in A is decidable from A's SKETCH (a key of A among the k smallest
    * hashes of the union is necessarily among the k smallest of A), so
    * the fraction present in BOTH sketches estimates J(A, B), and
    * J · D̂(A ∪ B) estimates the intersection size. Exact whenever both
    * groups hold < k distinct keys (the sketches are the sets). Standard
    * error of the Jaccard ratio ≈ sqrt(J(1−J)/k). Deterministic: the md5
    * ring makes both the union sketch and the membership tests pure
    * functions of the key sets.
    *
    * Scale shape: every join here is sketch-rows × sketch-rows
    * (≤ k·groups each side — broadcast-scale by construction); the
    * underlying data is never touched. */
  def estimateOverlap(a: DataFrame, b: DataFrame): DataFrame = {
    // checkpoint FIRST: the union sketch and both membership joins read
    // each input — uncheckpointed, each read would re-execute the
    // sketch's whole build lineage (i.e. re-scan the corpus twice more)
    val (ac, bc) = (a.localCheckpoint(), b.localCheckpoint())
    val u = merge(ac, bc) // validates matching k; ≤ k rows per group
    val aKeys = ac.select(col("grp").as("ag"), col("key").as("ak"))
    val bKeys = bc.select(col("grp").as("bg"), col("key").as("bk"))
    val flagged = u
      .join(aKeys, col("grp") <=> col("ag") && col("key") === col("ak"), "left")
      .join(bKeys, col("grp") <=> col("bg") && col("key") === col("bk"), "left")
      .select(col("grp"),
        (col("ak").isNotNull && col("bk").isNotNull).cast("long").as("both"))
    val dU = estimateDistinct(u).select(col("grp").as("ug"), col("est"))
    flagged.groupBy("grp")
      .agg(count(lit(1)).as("n_u"), sum(col("both")).as("n_both"))
      .join(dU, col("grp") <=> col("ug"), "left")
      .select(col("grp"),
        (col("n_both").cast("double") / col("n_u")).as("jaccard_est"),
        (col("n_both").cast("double") / col("n_u") * col("est"))
          .as("inter_est"))
  }
}
