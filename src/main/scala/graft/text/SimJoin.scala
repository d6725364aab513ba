package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the AllPairs/
  * PPJoin family, Bayardo et al. WWW'07 / Xiao et al. WWW'08 — public
  * literature): all pairs with Jaccard ≥ τ, with NO all-pairs work and
  * recall 1.0 (tokens travel as 64-bit fingerprints — see jaccardJoin's
  * collision note; everything else is exact). The exact counterpart of
  * the MinHash-LSH path
  * (text/NearDup.scala): LSH trades recall for speed; prefix filtering
  * keeps recall 1.0 and prunes with a theorem instead of a hash.
  *
  * Principle: order every set by one GLOBAL token order (rarest-first by
  * document frequency, ties on the token) and keep only each set's first
  * |s| − ⌈τ·|s|⌉ + 1 tokens (its "prefix"). Any two sets with
  * J ≥ τ share ≥ ⌈τ·max(|a|,|b|)⌉ tokens (J ≥ τ forces overlap
  * i ≥ τ(|a|+|b|)/(1+τ) ≥ τ·max), and by pigeonhole on the shared global
  * order two sets overlapping that much MUST collide inside these
  * prefixes — so joining on prefix tokens alone loses nothing, and the
  * exact verify runs only on surviving candidates.
  *
  * Scale shape: the candidate join carries |prefix| ≈ (1−τ)·|tokens|
  * rows per set, keyed by token — rarest-first ordering pushes hot
  * tokens OUT of prefixes, which is what keeps the token-key join from
  * exploding on stopwords (the failure mode of a naive token join).
  * Verify re-joins the two set arrays per candidate and intersects in
  * O(|a|+|b|) — candidates, not pairs, bound the work. The threshold
  * compare is integer cross-multiplication (τ = tNum/tDen), so boundary
  * pairs (J == τ) are decided exactly — no float epsilon at the cut. */
object SimJoin {

  /** All pairs of `sets(id, set)` (set = DISTINCT string tokens; id any
    * orderable type) with Jaccard(a, b) ≥ tNum/tDen. Returns
    * (a_id, b_id, i, na, nb): intersection and set sizes — callers
    * derive J = i / (na + nb − i).
    *
    * Tokens travel as 64-bit xxhash fingerprints end-to-end (join keys
    * AND intersect payloads): an 8-byte long vs a ~25-byte shingle
    * string cuts every exchange this operator runs ~3× (measured 25 s →
    * single-digit at sf0.1), and intersection counts over 64-bit
    * fingerprints equal exact counts unless two distinct shingles of one
    * pair's union collide — P ≈ |union|²·2⁻⁶⁴ ≈ 1e-13 per pair, the
    * standard PPJoin-implementation trade. Set SIZES are taken from the
    * pre-hash arrays, so na/nb are exact regardless. */
  /** ASYMMETRIC containment join: all ordered pairs (a, b), a ≠ b, with
    * |a∩b| / |a| ≥ tNum/tDen — "is most of document a inside document
    * b", the subsumption/quotation relation Jaccard can't express (a
    * tweet quoted inside an article has tiny Jaccard but containment
    * ≈ 1). Returns (a_id, b_id, i, na, nb).
    *
    * Prefix filtering adapts: containment bounds only the PROBE side's
    * uncovered tokens (≥ τ·|a| of a must appear in b), so a's prefix
    * under the global rarest-first order is still |a| − ⌈τ·|a|⌉ + 1
    * tokens — but b contributes its FULL token list (nothing bounds
    * which of b's tokens overlap). That asymmetry is the classic
    * probe-prefix-vs-inverted-index shape: the b side IS an inverted
    * index, and rarest-first probe prefixes are what keep its hot
    * (stopword) postings out of the candidate join. Length filter:
    * |b| ≥ ⌈τ·|a|⌉ (the intersection can't exceed |b|), applied inside
    * the join. Verify and threshold are exact integer cross-multiplies
    * over 64-bit fingerprints (same collision note as jaccardJoin). */
  def containmentJoin(sets: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    val mat = sets.select(col("id"), col("set")).localCheckpoint()
    val tok = mat.select(col("id"), size(col("set")).as("n"),
      explode(col("set")).as("w0"))
      .select(col("id"), col("n"), xxhash64(col("w0")).as("w"))
      .localCheckpoint() // probe prefixes AND the inverted index read it
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfreq"))
    val probe = tok.join(dfreq, "w")
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy("dfreq", "w")))
      .filter(col("pos") <=
        col("n") - expr(s"($tNum * n + $tDen - 1) div $tDen") + lit(1))
      .select(col("id").as("a_id"), col("n").as("pna"), col("w"))
    val cand = probe
      .join(tok.select(col("id").as("b_id"), col("n").as("pnb"), col("w")), "w")
      .filter(col("a_id") =!= col("b_id") &&
        col("pnb") * tDen >= col("pna") * tNum)
      .select(col("a_id"), col("b_id"))
      .distinct()
    val fp = mat.select(col("id"),
      expr("array_distinct(transform(set, x -> xxhash64(x)))").as("fps"),
      size(col("set")).as("n"))
    cand
      .join(fp.select(col("id").as("a_id"), col("fps").as("seta"),
        col("n").as("na")), "a_id")
      .join(fp.select(col("id").as("b_id"), col("fps").as("setb"),
        col("n").as("nb")), "b_id")
      .withColumn("i", size(array_intersect(col("seta"), col("setb"))))
      // |a∩b|/|a| ≥ τ ⟺ i·tDen ≥ na·tNum, decided in integers
      .filter(col("i") * tDen >= col("na") * tNum)
      .select(col("a_id"), col("b_id"), col("i").cast("long").as("i"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
  }

  def jaccardJoin(sets: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    // the input feeds BOTH the prefix pipeline and the verify arrays —
    // materialize the (usually tokenizer-derived) sets once, not twice
    val mat = sets.select(col("id"), col("set")).localCheckpoint()
    // n comes from the array itself — no per-group count window
    val tok = mat.select(col("id"), size(col("set")).as("n"),
      explode(col("set")).as("w0"))
      .select(col("id"), col("n"), xxhash64(col("w0")).as("w"))
    // global rarity order: document frequency, ties broken on the
    // fingerprint — any total order is correct; rarest-first is the fast
    // one (hot tokens stay OUT of prefixes)
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfreq"))
    val prefix = tok.join(dfreq, "w")
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy("dfreq", "w")))
      // keep first n − ⌈τ·n⌉ + 1 under the global order
      .filter(col("pos") <=
        col("n") - expr(s"($tNum * n + $tDen - 1) div $tDen") + lit(1))
      .select(col("id"), col("n"), col("w"))
      // both sides of the candidate self-join read this relation —
      // materialize it or the dfreq join + rank window run twice
      .localCheckpoint()
    // candidate pairs: share a prefix fingerprint AND pass the length
    // filter (J ≥ τ forces τ·max(na,nb) ≤ min(na,nb)) — the filter runs
    // inside the join so size-incompatible pairs never reach distinct()
    val cand = prefix.select(col("id").as("a_id"), col("n").as("pna"), col("w"))
      .join(prefix.select(col("id").as("b_id"), col("n").as("pnb"), col("w")), "w")
      .filter(col("a_id") < col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .select(col("a_id"), col("b_id"))
      .distinct()
    // deliberately NOT pinned: the hash+distinct transform re-runs once
    // per verify side, but it is codegen'd and cheaper than eagerly
    // materializing the fingerprint arrays (measured 5.1 s → 6.2 s at
    // sf0.1 with a localCheckpoint here)
    val fp = mat.select(col("id"),
      expr("array_distinct(transform(set, x -> xxhash64(x)))").as("fps"),
      size(col("set")).as("n"))
    val sa = fp.select(col("id").as("a_id"), col("fps").as("seta"),
      col("n").as("na"))
    val sb = fp.select(col("id").as("b_id"), col("fps").as("setb"),
      col("n").as("nb"))
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("i", size(array_intersect(col("seta"), col("setb"))))
      // J ≥ τ ⟺ i·tDen ≥ (na + nb − i)·tNum, decided in integers
      .filter(col("i") * tDen >= (col("na") + col("nb") - col("i")) * tNum)
      .select(col("a_id"), col("b_id"), col("i").cast("long").as("i"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
  }
}
