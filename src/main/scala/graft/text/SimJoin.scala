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

  // ---------------------------------------------------------------------
  // Persisted prefix index + incremental exact join — the steady-state
  // ingest path for the EXACT dedup family (q123/q134/q149/q152's core),
  // mirroring NearDup.writeIndex/incrementalPairs for the LSH family:
  // dedup the corpus ONCE, then join each ingest batch's prefixes
  // against the stored postings — per-batch cost |batch| + its
  // candidates, never the |corpus|² rebuild.
  //
  // Order-freezing argument (what makes the incremental join EXACT):
  // the prefix theorem needs ONE total token order shared by every set;
  // WHICH order is arbitrary for correctness (rarest-first is only the
  // fast choice). The index freezes the build-time (dfreq, fingerprint)
  // order; a batch token unseen at build time gets dfreq 0 — sorting
  // before every indexed token. Base documents cannot contain unseen
  // tokens (dfreq 0 ⟺ absent from the base corpus), so extending the
  // order this way never re-ranks any base document's tokens — stored
  // base prefixes stay valid verbatim, and recall stays 1.0. What DOES
  // drift as batches accumulate is rarest-FIRST-ness (frozen counts go
  // stale), which degrades candidate pruning, not correctness — the
  // standard compaction trigger: rebuild the index when batch volume
  // rivals the base.
  // ---------------------------------------------------------------------

  /** Prefix postings of `tok(id, n, w)` under the (dfreq, w) order;
    * unseen tokens rank rarest (dfreq 0) — see the order-freezing note. */
  private def prefixOf(tok: DataFrame, dfreq: DataFrame,
                       tNum: Int, tDen: Int): DataFrame =
    tok.join(dfreq, Seq("w"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy("dfreq", "w")))
      .filter(col("pos") <=
        col("n") - expr(s"($tNum * n + $tDen - 1) div $tDen") + lit(1))
      .select(col("id"), col("n"), col("w"))

  private def tokOf(mat: DataFrame): DataFrame =
    mat.select(col("id"), size(col("set")).as("n"),
      explode(col("set")).as("w0"))
      .select(col("id"), col("n"), xxhash64(col("w0")).as("w"))

  private def fpOf(mat: DataFrame): DataFrame =
    mat.select(col("id"),
      expr("array_distinct(transform(set, x -> xxhash64(x)))").as("fps"),
      size(col("set")).as("n"))

  /** Exact verify of candidate `(a_id, b_id)` pairs against fingerprint
    * arrays; same integer threshold as [[jaccardJoin]]. */
  private def verify(cand: DataFrame, fp: DataFrame,
                     tNum: Int, tDen: Int): DataFrame =
    cand
      .join(fp.select(col("id").as("a_id"), col("fps").as("seta"),
        col("n").as("na")), "a_id")
      .join(fp.select(col("id").as("b_id"), col("fps").as("setb"),
        col("n").as("nb")), "b_id")
      .withColumn("i", size(array_intersect(col("seta"), col("setb"))))
      .filter(col("i") * tDen >= (col("na") + col("nb") - col("i")) * tNum)
      .select(col("a_id"), col("b_id"), col("i").cast("long").as("i"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))

  /** Persist the prefix index of `sets(id, set)` under `dir`: the frozen
    * token order (`dfreq`), the prefix postings (`prefix`), and the
    * verify fingerprints (`fp`). Thresholds are part of the layout —
    * prefix lengths encode τ — so probes must use the same tNum/tDen. */
  def writeIndex(sets: DataFrame, dir: String, tNum: Int, tDen: Int): Unit = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    val mat = sets.select(col("id"), col("set")).localCheckpoint()
    val tok = tokOf(mat).localCheckpoint() // feeds dfreq AND the prefix rank
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfreq"))
    dfreq.write.mode("overwrite").parquet(s"$dir/dfreq")
    prefixOf(tok, dfreq, tNum, tDen)
      .write.mode("overwrite").parquet(s"$dir/prefix")
    fpOf(mat).write.mode("overwrite").parquet(s"$dir/fp")
  }

  /** Right-to-be-forgotten: rewrite the victims' rows out of the
    * `prefix` and `fp` relations under a composition fence at the
    * family root (both are flat → O(index) rewrites of per-document
    * derived data; a lost race rebuilds via [[writeIndex]]). The
    * `dfreq` token order stays FROZEN — it is part of the on-disk
    * layout like IVF centroids: prefix lengths were computed under it,
    * and prefix-filter exactness needs one CONSISTENT total order, not
    * a current-frequency one, so deletion never invalidates it (a
    * re-train is an explicit writeIndex rebuild). */
  def forget(spark: org.apache.spark.sql.SparkSession, dir: String,
             ids: Seq[Long]): Unit = {
    import graft.operators.IndexForget
    IndexForget.fence(spark, dir)
    IndexForget.forgetFlat(spark, s"$dir/prefix", col("id").isin(ids: _*))
    IndexForget.forgetFlat(spark, s"$dir/fp", col("id").isin(ids: _*))
    IndexForget.unfence(spark, dir)
  }

  /** All ≥τ pairs WITHIN the indexed corpus, derived from the persisted
    * relations alone (no re-tokenization — the probe-side twin of
    * NearDup.pairsFromIndex). */
  def pairsFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                     tNum: Int, tDen: Int): DataFrame = {
    // deletion fence (composition marker at the family root — forget
    // spans the prefix AND fp relations)
    graft.operators.IndexForget.assertClean(spark, dir)
    val prefix = spark.read.parquet(s"$dir/prefix")
    val cand = prefix.select(col("id").as("a_id"), col("n").as("pna"), col("w"))
      .join(prefix.select(col("id").as("b_id"), col("n").as("pnb"), col("w")), "w")
      .filter(col("a_id") < col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .select(col("a_id"), col("b_id"))
      .distinct()
    verify(cand, spark.read.parquet(s"$dir/fp"), tNum, tDen)
  }

  /** Every ≥τ pair INVOLVING a batch document — batch-vs-index plus
    * batch-vs-batch, exact under the frozen order (see the class note):
    * `pairsFromIndex(base) ∪ incrementalJaccard(batch)` equals
    * `jaccardJoin(base ∪ batch)` as a set (SimJoinSpec pins it). Batch
    * ids must be disjoint from indexed ids (caller contract — same as
    * NearDup.incrementalPairs). Pairs are oriented `a_id < b_id`.
    * Cost: |batch| postings join the stored postings on the token key —
    * the index side never re-scans its documents, and base-base pairs
    * never re-form. */
  def incrementalJaccard(spark: org.apache.spark.sql.SparkSession,
                         dir: String, newSets: DataFrame,
                         tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    graft.operators.IndexForget.assertClean(spark, dir)
    val mat = newSets.select(col("id"), col("set")).localCheckpoint()
    val dfreq = spark.read.parquet(s"$dir/dfreq")
    val newPrefix = prefixOf(tokOf(mat), dfreq, tNum, tDen)
      .localCheckpoint() // probes the index AND self-joins
    val basePrefix = spark.read.parquet(s"$dir/prefix")
    val np = newPrefix.select(col("id").as("a_id"), col("n").as("pna"), col("w"))
    val candBase = np
      .join(basePrefix.select(col("id").as("b_id"), col("n").as("pnb"),
        col("w")), "w")
      .filter(col("a_id") =!= col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
    val candNew = np
      .join(newPrefix.select(col("id").as("b_id"), col("n").as("pnb"),
        col("w")), "w")
      .filter(col("a_id") < col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .select(col("a_id"), col("b_id"))
    val cand = candBase.unionByName(candNew).distinct()
    val fp = spark.read.parquet(s"$dir/fp").unionByName(fpOf(mat))
    verify(cand, fp, tNum, tDen)
  }
}
