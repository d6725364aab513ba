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
  def containmentJoin(sets: DataFrame, tNum: Int, tDen: Int): DataFrame =
    containmentJoinMat(matOf(sets), tNum, tDen)

  /** [[containmentJoin]] over TOKEN arrays `docs(id, toks)` — shingles
    * hash natively (matOfTokens), no trigram strings materialize. */
  def containmentJoinTokens(docs: DataFrame, tNum: Int, tDen: Int): DataFrame =
    containmentJoinMat(matOfTokens(docs), tNum, tDen)

  private def containmentJoinMat(mat: DataFrame, tNum: Int,
                                 tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    val tok = tokOf(mat)
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfreq"))
    // ONE global-order rank pass (dfreq join + row_number) shared by the
    // probe prefixes AND the full inverted index — the probe side is a
    // filter of the same ranked relation, and the index side's positions
    // feed the positional upper bound below (r18: the pre-verify prune)
    val ranked = tok.join(dfreq, "w")
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy("dfreq", "w")))
      .select(col("id"), col("n"), col("w"), col("pos"))
      .localCheckpoint()
    val probe = ranked
      .filter(col("pos") <=
        col("n") - expr(s"($tNum * n + $tDen - 1) div $tDen") + lit(1))
      .select(col("id").as("a_id"), col("n").as("pna"), col("w"),
        col("pos").as("ppa"))
    // candidate pairs grouped with the PPJoin positional upper bound
    // (Xiao et al. WWW'08): common tokens past the last co-matched
    // positions number ≤ min(na−mpa, nb−mpb) under the single global
    // order, so pairs with cnt + min(na−mpa, nb−mpb) below the required
    // overlap ⌈τ·na⌉ can never verify — pruned BEFORE the fingerprint
    // join (no false negatives; the verify threshold is unchanged)
    val cand = probe
      .join(ranked.select(col("id").as("b_id"), col("n").as("pnb"),
        col("w"), col("pos").as("ppb")), "w")
      .filter(col("a_id") =!= col("b_id") &&
        col("pnb") * tDen >= col("pna") * tNum)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("cnt"), max(col("ppa")).as("mpa"),
        max(col("ppb")).as("mpb"), max(col("pna")).as("cna"),
        max(col("pnb")).as("cnb"))
      .filter((col("cnt") +
          least(col("cna") - col("mpa"), col("cnb") - col("mpb"))) * tDen >=
        col("cna") * tNum)
      .select(col("a_id"), col("b_id"))
    verify(cand, fpOf(mat), tNum, tDen, containment = true)
  }

  def jaccardJoin(sets: DataFrame, tNum: Int, tDen: Int): DataFrame =
    jaccardJoinMat(matOf(sets), tNum, tDen)

  /** [[jaccardJoin]] over TOKEN arrays `docs(id, toks)` — the r19
    * native-shingle path: matOfTokens derives the sorted distinct
    * fingerprints in ONE expression pass over the tokens
    * ([[graft.functions.expressions.ShingleFps]]), so no trigram string
    * is ever materialized or checkpointed. `n` is the distinct-shingle
    * count (equal to the distinct trigram-STRING count except under a
    * 2⁻⁶⁴-class fingerprint collision — the same documented trade the
    * string path already makes for `i`). */
  def jaccardJoinTokens(docs: DataFrame, tNum: Int, tDen: Int): DataFrame =
    jaccardJoinMat(matOfTokens(docs), tNum, tDen)

  private def jaccardJoinMat(mat: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    val tok = tokOf(mat)
    // global rarity order: document frequency, ties broken on the
    // fingerprint — any total order is correct; rarest-first is the fast
    // one (hot tokens stay OUT of prefixes)
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfreq"))
    // both sides of the candidate self-join read this relation —
    // materialize it or the dfreq join + rank window run twice
    val prefix = prefixOf(tok, dfreq, tNum, tDen).localCheckpoint()
    verify(candJaccard(prefix, prefix, tNum, tDen), fpOf(mat), tNum, tDen)
  }

  /** Ordered (a < b) candidate pairs of two PREFIX relations
    * `(id, n, w, pos)` under the shared global order: share a prefix
    * fingerprint, pass the length filter (J ≥ τ forces τ·max ≤ min),
    * and survive the PPJoin positional upper bound (Xiao et al.
    * WWW'08) — common tokens past the last co-matched prefix positions
    * number ≤ min(na−mpa, nb−mpb) under ONE global order, so a pair
    * with cnt + that slack below the required overlap
    * ⌈τ·(na+nb)/(1+τ)⌉ can never verify and is pruned before the
    * fingerprint join (no false negatives — the verify threshold is
    * unchanged). The grouped aggregation replaces the old distinct():
    * same single exchange, plus the prune. */
  private def candJaccard(pa: DataFrame, pb: DataFrame,
                          tNum: Int, tDen: Int): DataFrame =
    pa.select(col("id").as("a_id"), col("n").as("pna"), col("w"),
        col("pos").as("ppa"))
      .join(pb.select(col("id").as("b_id"), col("n").as("pnb"), col("w"),
        col("pos").as("ppb")), "w")
      .filter(col("a_id") < col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("cnt"), max(col("ppa")).as("mpa"),
        max(col("ppb")).as("mpb"), max(col("pna")).as("cna"),
        max(col("pnb")).as("cnb"))
      // i ≥ ⌈τ(na+nb)/(1+τ)⌉ ⟺ i·(tNum+tDen) ≥ tNum·(na+nb)
      .filter((col("cnt") +
          least(col("cna") - col("mpa"), col("cnb") - col("mpb"))) *
          (tNum + tDen) >= (col("cna") + col("cnb")) * tNum)
      .select(col("a_id"), col("b_id"))

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

  /** Prefix postings `(id, n, w, pos)` of `tok(id, n, w)` under the
    * (dfreq, w) order; unseen tokens rank rarest (dfreq 0) — see the
    * order-freezing note. `pos` (the token's 1-based rank in its set
    * under the global order) rides along for the candidate join's
    * positional upper bound. */
  private def prefixOf(tok: DataFrame, dfreq: DataFrame,
                       tNum: Int, tDen: Int): DataFrame =
    tok.join(dfreq, Seq("w"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy("dfreq", "w")))
      .filter(col("pos") <=
        col("n") - expr(s"($tNum * n + $tDen - 1) div $tDen") + lit(1))
      .select(col("id"), col("n"), col("w"), col("pos"))

  /** Materialized HASHED form of `sets(id, set)`: one row per set,
    * `(id, n, fps)` — `n` the PRE-hash set size (exact, feeds every
    * threshold), `fps` the SORTED distinct 64-bit token fingerprints.
    * Tokens hash exactly ONCE, here: the prefix pipeline explodes
    * `fps`, and the verify uses the arrays verbatim (r18 — the old
    * shape checkpointed the wide string arrays and re-hashed them once
    * for the token relation plus once per verify side). Sortedness is
    * what lets the verify intersect run as an allocation-free merge
    * walk ([[graft.functions.expressions.SortedIntersectCount]]).
    * Within-set hash collisions can make |fps| < n; every prefix
    * length/threshold below keeps using `n`, which only LENGTHENS
    * prefixes relative to the deduped fingerprint set — conservative,
    * never a lost candidate (same 2⁻⁶⁴-collision class the class doc
    * records). */
  private def matOf(sets: DataFrame): DataFrame =
    sets.select(col("id"), size(col("set")).as("n"),
      expr("sort_array(array_distinct(transform(set, x -> xxhash64(x))))")
        .as("fps"))
      .localCheckpoint()

  /** [[matOf]] from TOKEN arrays `docs(id, toks)`: the sorted distinct
    * shingle fingerprints come from ONE native pass over the tokens
    * ([[graft.functions.expressions.ShingleFps]] — token hashes chained
    * per trigram, deduped, sorted), so the checkpoint holds long arrays
    * that no trigram STRING ever preceded. `n` = |fps| — the distinct
    * trigram count except under a 2⁻⁶⁴-class collision (where the
    * string path's `n` would differ from its own deduped fps length the
    * same way; see the class doc's collision note). */
  private def matOfTokens(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    docs.select(col("id"),
        GraftPlanBridge.column(graft.functions.expressions.ShingleFps(
          GraftPlanBridge.expression(col("toks")))).as("fps"))
      .select(col("id"), size(col("fps")).as("n"), col("fps"))
      .localCheckpoint()
  }

  private def tokOf(mat: DataFrame): DataFrame =
    mat.select(col("id"), col("n"), explode(col("fps")).as("w"))

  private def fpOf(mat: DataFrame): DataFrame =
    mat.select(col("id"), col("fps"), col("n"))

  /** Exact verify of candidate `(a_id, b_id)` pairs against sorted
    * fingerprint arrays; integer threshold — Jaccard
    * (i·tDen ≥ (na+nb−i)·tNum) by default, containment
    * (i·tDen ≥ na·tNum) when `containment`. */
  private def verify(cand: DataFrame, fp: DataFrame,
                     tNum: Int, tDen: Int,
                     containment: Boolean = false): DataFrame =
    cand
      .join(fp.select(col("id").as("a_id"), col("fps").as("seta"),
        col("n").as("na")), "a_id")
      .join(fp.select(col("id").as("b_id"), col("fps").as("setb"),
        col("n").as("nb")), "b_id")
      // direct expression construction (r18 ADVICE): resolving through
      // the SQL registry made every SimJoin API analysis-fail in a
      // session created without the GraftExtensions extension
      .withColumn("i", org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.expressions.SortedIntersectCount(
          org.apache.spark.sql.GraftPlanBridge.expression(col("seta")),
          org.apache.spark.sql.GraftPlanBridge.expression(col("setb")))))
      .filter(
        if (containment) col("i") * tDen >= col("na") * tNum
        else col("i") * tDen >= (col("na") + col("nb") - col("i")) * tNum)
      .select(col("a_id"), col("b_id"), col("i").cast("long").as("i"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))

  // ---------------------------------------------------------------------
  // Index FORMAT stamp (r18 ADVICE): the r18 verify switched to
  // sorted_intersect_count, which silently UNDER-COUNTS on the unsorted
  // fps arrays pre-r18 writeIndex persisted — and the r19 tokens path
  // additionally changes the fingerprint DOMAIN (token-hash chains vs
  // xxhash64 of trigram strings), which a probe must match exactly.
  // writeIndex stamps `_SIMJOIN_FORMAT` with version + domain; every
  // probe refuses a missing/mismatched stamp loudly (rebuild via
  // writeIndex) instead of silently dropping qualifying pairs.
  // ---------------------------------------------------------------------
  private val FormatFile = "_SIMJOIN_FORMAT"
  private val FormatSortedPrefix = "sorted-v2:" // fps sorted+distinct
  private[text] val DomainStringFp = "stringfp" // xxhash64(trigram string)
  private[text] val DomainTokenFp = "tokenfp"   // ShingleFps token chain

  private def stampFormat(spark: org.apache.spark.sql.SparkSession,
                          dir: String, domain: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, FormatFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write((FormatSortedPrefix + domain).getBytes("UTF-8"))
    out.close()
  }

  private def assertFormat(spark: org.apache.spark.sql.SparkSession,
                           dir: String, domain: Option[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, FormatFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"simjoin index at $dir carries no $FormatFile stamp — a pre-r18 " +
        "index stored UNSORTED fingerprints the sorted-merge verify " +
        "would silently under-count; rebuild it via writeIndex")
    val in = fs.open(p)
    val tag = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    require(tag.startsWith(FormatSortedPrefix),
      s"simjoin index at $dir has unsupported format '$tag' — rebuild " +
        "via writeIndex")
    domain.foreach { d =>
      require(tag == FormatSortedPrefix + d,
        s"simjoin index at $dir was built with fingerprint domain " +
          s"'${tag.stripPrefix(FormatSortedPrefix)}' but this probe " +
          s"hashes '$d' — batch and index fingerprints would never " +
          "match; rebuild the index with the same API family")
    }
  }

  /** Persist the prefix index of `sets(id, set)` under `dir`: the frozen
    * token order (`dfreq`), the prefix postings (`prefix`), the verify
    * fingerprints (`fp`), and the format stamp. Thresholds are part of
    * the layout — prefix lengths encode τ — so probes must use the same
    * tNum/tDen. */
  def writeIndex(sets: DataFrame, dir: String, tNum: Int, tDen: Int): Unit =
    writeIndexMat(matOf(sets), dir, tNum, tDen, DomainStringFp)

  /** [[writeIndex]] over TOKEN arrays `docs(id, toks)` (native shingle
    * fingerprints — probes must come through the Tokens APIs). */
  def writeIndexTokens(docs: DataFrame, dir: String, tNum: Int,
                       tDen: Int): Unit =
    writeIndexMat(matOfTokens(docs), dir, tNum, tDen, DomainTokenFp)

  private def writeIndexMat(mat: DataFrame, dir: String, tNum: Int,
                            tDen: Int, domain: String): Unit = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    val tok = tokOf(mat) // cheap explode off the hashed checkpoint
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfreq"))
    dfreq.write.mode("overwrite").parquet(s"$dir/dfreq")
    prefixOf(tok, dfreq, tNum, tDen)
      .write.mode("overwrite").parquet(s"$dir/prefix")
    fpOf(mat).write.mode("overwrite").parquet(s"$dir/fp")
    stampFormat(mat.sparkSession, dir, domain)
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
    // any sorted-fps domain works: within-index pairs never mix domains
    assertFormat(spark, dir, domain = None)
    val prefix = spark.read.parquet(s"$dir/prefix")
    verify(candJaccard(prefix, prefix, tNum, tDen),
      spark.read.parquet(s"$dir/fp"), tNum, tDen)
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
                         tNum: Int, tDen: Int): DataFrame =
    incrementalJaccardMat(spark, dir, matOf(newSets), tNum, tDen,
      DomainStringFp)

  /** [[incrementalJaccard]] over TOKEN arrays `newDocs(id, toks)` —
    * requires an index built by [[writeIndexTokens]] (the stamp check
    * enforces the matching fingerprint domain). */
  def incrementalJaccardTokens(spark: org.apache.spark.sql.SparkSession,
                               dir: String, newDocs: DataFrame,
                               tNum: Int, tDen: Int): DataFrame =
    incrementalJaccardMat(spark, dir, matOfTokens(newDocs), tNum, tDen,
      DomainTokenFp)

  private def incrementalJaccardMat(spark: org.apache.spark.sql.SparkSession,
                                    dir: String, mat: DataFrame,
                                    tNum: Int, tDen: Int,
                                    domain: String): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"simjoin: threshold must be in (0,1], got $tNum/$tDen")
    graft.operators.IndexForget.assertClean(spark, dir)
    // batch fingerprints must live in the index's domain or the token
    // join and the verify would silently miss every batch-base pair
    assertFormat(spark, dir, Some(domain))
    val dfreq = spark.read.parquet(s"$dir/dfreq")
    val newPrefix = prefixOf(tokOf(mat), dfreq, tNum, tDen)
      .localCheckpoint() // probes the index AND self-joins
    val basePrefix = spark.read.parquet(s"$dir/prefix")
    val np = newPrefix.select(col("id").as("a_id"), col("n").as("pna"),
      col("w"), col("pos").as("ppa"))
    // batch-vs-base matches oriented a_id < b_id BEFORE the pair
    // grouping, carrying each side's (n, pos) through the swap so the
    // positional upper bound (see candJaccard) applies identically
    val candBase = np
      .join(basePrefix.select(col("id").as("b_id"), col("n").as("pnb"),
        col("w"), col("pos").as("ppb")), "w")
      .filter(col("a_id") =!= col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .select(least(col("a_id"), col("b_id")).as("oa"),
        greatest(col("a_id"), col("b_id")).as("ob"),
        when(col("a_id") < col("b_id"), col("pna")).otherwise(col("pnb"))
          .as("na1"),
        when(col("a_id") < col("b_id"), col("pnb")).otherwise(col("pna"))
          .as("nb1"),
        when(col("a_id") < col("b_id"), col("ppa")).otherwise(col("ppb"))
          .as("pa1"),
        when(col("a_id") < col("b_id"), col("ppb")).otherwise(col("ppa"))
          .as("pb1"))
    val candNew = np
      .join(newPrefix.select(col("id").as("b_id"), col("n").as("pnb"),
        col("w"), col("pos").as("ppb")), "w")
      .filter(col("a_id") < col("b_id") &&
        greatest(col("pna"), col("pnb")) * tNum <=
          least(col("pna"), col("pnb")) * tDen)
      .select(col("a_id").as("oa"), col("b_id").as("ob"),
        col("pna").as("na1"), col("pnb").as("nb1"),
        col("ppa").as("pa1"), col("ppb").as("pb1"))
    // one grouped aggregation replaces the old distinct() (batch-base
    // and batch-batch pair sets are disjoint, so the union never merges
    // counts across legs), then the same positional prune as candJaccard
    val cand = candBase.unionByName(candNew)
      .groupBy(col("oa").as("a_id"), col("ob").as("b_id"))
      .agg(count(lit(1)).as("cnt"), max(col("pa1")).as("mpa"),
        max(col("pb1")).as("mpb"), max(col("na1")).as("cna"),
        max(col("nb1")).as("cnb"))
      .filter((col("cnt") +
          least(col("cna") - col("mpa"), col("cnb") - col("mpb"))) *
          (tNum + tDen) >= (col("cna") + col("cnb")) * tNum)
      .select(col("a_id"), col("b_id"))
    val fp = spark.read.parquet(s"$dir/fp").unionByName(fpOf(mat))
    verify(cand, fp, tNum, tDen)
  }
}
