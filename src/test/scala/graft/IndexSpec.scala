package graft

import java.nio.file.Files
import graft.functions.Ivf
import graft.text.{NearDup, TextOps}
import org.apache.spark.sql.functions._

/** Persisted near-dup / ANN indexes: the probe path must (a) return
  * byte-identical results to the inline operators that are oracle-gated
  * (q40/q48b), and (b) actually READ the index — no signature derivation
  * or centroid-assignment join may appear in the probe plan. This is the
  * 100 TB posture: signatures and cell assignments are computed once and
  * band-joined / partition-pruned from files ever after. */
class IndexSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** documents + planted copies (same recipe as q40): guaranteed non-empty
    * pair sets at the smallest SF. */
  private lazy val corpus = {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    docs.unionAll(
        docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" xdup marker")).as("text")))
      .withColumn("w", TextOps.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"))
  }

  test("persisted MinHash index: pairs == inline lshPairs; probe plan reads parquet, derives nothing") {
    val dir = tmp("lsh_index")
    NearDup.writeIndex(corpus, "doc_id", "w", dir, k = 16, nBands = 4)

    val inline = NearDup.lshPairs(corpus, "doc_id", "w",
      k = 16, nBands = 4, threshold = 0.3)
    val indexed = NearDup.pairsFromIndex(spark, dir, threshold = 0.3)

    val a = inline.collect().map(_.toString).toSet
    val b = indexed.collect().map(_.toString).toSet
    assert(a.nonEmpty, "planted copies must yield pairs — vacuous otherwise")
    assert(a === b)

    // the probe never re-derives: no shingle/minhash expression anywhere,
    // and both join sides come from the parquet index
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("shingle_hashes"), s"probe re-derives shingles:\n$plan")
    assert(!plan.contains("xxhash64"), s"probe re-derives signatures:\n$plan")
    assert(plan.contains("FileScan parquet"), s"probe does not scan the index:\n$plan")
  }

  test("incremental ingest: new-batch band join == full self-join restricted to pairs touching new docs") {
    val dir = tmp("lsh_index_inc")
    val oldDocs = corpus.filter(col("doc_id") % 100000 >= 50)
    val newDocs = corpus.filter(col("doc_id") % 100000 < 50)
    NearDup.writeIndex(oldDocs, "doc_id", "w", dir, k = 16, nBands = 4)

    val inc = NearDup.incrementalPairs(
      spark.read.parquet(dir),
      NearDup.signatureRelation(newDocs, "doc_id", "w", k = 16, nBands = 4)
        .localCheckpoint(),
      threshold = 0.3)

    val isNew = (c: org.apache.spark.sql.Column) => c % 100000 < 50
    val expected = NearDup.lshPairs(corpus, "doc_id", "w",
        k = 16, nBands = 4, threshold = 0.3)
      .filter(isNew(col("a_id")) || isNew(col("b_id")))

    val got = inc.collect().map(_.toString).toSet
    val exp = expected.collect().map(_.toString).toSet
    assert(exp.nonEmpty, "split must leave cross/new pairs — vacuous otherwise")
    assert(got === exp)
  }

  test("persisted sign-LSH index: top-k == inline annTopK; probe plan partition-prunes to the probe buckets") {
    import graft.functions.Ann
    val dir = tmp("ann_index")
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val query = emb.filter(col("vec_id") === 7).select(col("embedding"))

    Ann.writeIndex(emb, "vec_id", "embedding", dir)
    val inline = Ann.annTopK(emb, query, "vec_id", "embedding", k = 10)
      .collect().toSeq
    val indexed = Ann.annTopKIndexed(spark, dir, query, "embedding", k = 10)
    assert(indexed.collect().toSeq === inline)

    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket IN (...) did not become a partition filter:\n$plan")
  }

  test("persisted IVF index: top-k == inline ivfTopK; probe plan partition-prunes to the nprobe cells") {
    val dir = tmp("ivf_index")
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val query = emb.filter(col("vec_id") === 7).select(col("embedding"))

    val centroids = Ivf.writeIndex(emb, "vec_id", "embedding",
      nlist = 16, dir, iters = 2, sampleMod = 7)
    // round-trip: the persisted centroids ARE the trained ones, in order
    assert(Ivf.readCentroids(spark, dir) === centroids)

    val inline = Ivf.ivfTopK(emb, query, "vec_id", "embedding",
      k = 10, centroids, nprobe = 4).collect().toSeq
    val indexed = Ivf.ivfTopKIndexed(spark, dir, query, "embedding",
      k = 10, nprobe = 4)
    assert(indexed.collect().toSeq === inline)

    // pruning: the cell predicate must be a PARTITION filter (directory
    // pruning before any row is read), and the probe must not re-run the
    // centroid-assignment join
    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell IN (...) did not become a partition filter:\n$plan")
    assert(!plan.contains("__cvec"), s"probe re-assigns cells:\n$plan")
  }

  test("persisted span index: substring-dedup counts == inline; probe plan reads parquet, derives nothing") {
    import graft.text.Spans
    val dir = tmp("span_index")
    // planted 23-token tail on doc_id%7 (q104's recipe) → guaranteed
    // cross-doc repeated windows at the smallest SF
    val tail = " the quick brown fox jumps over the lazy dog while " +
      "reading terms and conditions that apply to all subscribers of " +
      "this newsletter today"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat(col("text"), when(pmod(col("doc_id"), lit(7)) === 0,
          lit(tail)).otherwise(lit(""))).as("t"))
      .withColumn("w", TextOps.tokens(col("t")))
      .select(col("doc_id"), col("w"))

    Spans.writeIndex(docs, "doc_id", "w", dir)
    val inline = Spans.maskedCounts(
      Spans.spanRelation(docs, "doc_id", "w").localCheckpoint(), window = 20)
    val indexed = Spans.maskedCounts(Spans.fromIndex(spark, dir), window = 20)

    val a = inline.collect().map(_.toString).toSet
    val b = indexed.collect().map(_.toString).toSet
    assert(a.exists(_.contains("2")), "planted tail must mask positions — vacuous otherwise")
    assert(a === b)

    // the probe never re-tokenizes or re-hashes windows: the span relation
    // comes entirely from the parquet index
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("md5") && !plan.contains("xxhash64"),
      s"probe re-derives window hashes:\n$plan")
    assert(plan.contains("FileScan parquet"), s"probe does not scan the index:\n$plan")
  }

  test("span index append: old-index + new-batch spans == one index over the union") {
    import graft.text.Spans
    val dir = tmp("span_index_inc")
    val tail = " the quick brown fox jumps over the lazy dog while " +
      "reading terms and conditions that apply to all subscribers of " +
      "this newsletter today"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat(col("text"), when(pmod(col("doc_id"), lit(7)) === 0,
          lit(tail)).otherwise(lit(""))).as("t"))
      .withColumn("w", TextOps.tokens(col("t")))
      .select(col("doc_id"), col("w"))
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    val newDocs = docs.filter(col("doc_id") % 2 =!= 0)

    Spans.writeIndex(oldDocs, "doc_id", "w", dir)
    // ingest: the new batch appends its own span rows only
    Spans.appendToIndex(newDocs, "doc_id", "w", dir)

    val full = Spans.maskedCounts(
      Spans.spanRelation(docs, "doc_id", "w").localCheckpoint(), window = 20)
    val appended = Spans.maskedCounts(Spans.fromIndex(spark, dir), window = 20)
    assert(appended.collect().map(_.toString).toSet ===
      full.collect().map(_.toString).toSet)
  }

  test("IVF ingest append: old-index + appended batch probes == one index over the union") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val oldVecs = emb.filter(col("vec_id") % 5 =!= 0)
    val newVecs = emb.filter(col("vec_id") % 5 === 0)
    val query = emb.filter(col("vec_id") === 7).select(col("embedding"))

    // incremental: train+write on the old corpus, append the new batch
    val dirInc = tmp("ivf_inc")
    val centroids = Ivf.writeIndex(oldVecs, "vec_id", "embedding",
      nlist = 16, dirInc, iters = 2, sampleMod = 7)
    Ivf.appendToIndex(newVecs, "vec_id", "embedding", dirInc)

    // oracle: the inline probe over the FULL corpus with the SAME
    // centroids (assignment is a pure function of vector + centroids,
    // so append-then-probe must equal assign-all-then-probe)
    val inline = Ivf.ivfTopK(emb, query, "vec_id", "embedding",
      k = 10, centroids, nprobe = 4).collect().toSeq
    val appended = Ivf.ivfTopKIndexed(spark, dirInc, query, "embedding",
      k = 10, nprobe = 4).collect().toSeq
    assert(appended === inline)
  }

  test("persisted PQ index: ADC top-k == inline adcTopK; ADC scan column-prunes the raw vectors") {
    import graft.functions.Pq
    val dir = tmp("pq_index")
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val query = emb.filter(col("vec_id") === 7).select(col("embedding"))

    val cb = Pq.writeIndex(emb, "vec_id", "embedding",
      m = 8, ksub = 16, dir, iters = 2, sampleMod = 7)
    // round-trip: the persisted codebooks ARE the trained ones, in order
    assert(Pq.readCodebooks(spark, dir) === cb)

    val inlineDf = Pq.adcTopK(emb, query, "vec_id", "embedding",
      k = 10, cb, rerankC = 50)
    val inline = inlineDf.collect().toSeq
    val indexed = Pq.adcTopKIndexed(spark, dir, query, "embedding",
      k = 10, rerankC = 50)
    assert(indexed.collect().toSeq === inline)

    // encode + ADC + candidate selection is map-only: the codebooks are
    // literal constants, so the whole inline path runs without a single
    // data shuffle (broadcast/single-partition limit exchanges only)
    val inlinePlan = inlineDf.queryExecution.executedPlan.toString
    assert(!inlinePlan.contains("Exchange hashpartitioning"),
      s"PQ encode/ADC must not shuffle data:\n$inlinePlan")

    // every persisted code vector is m entries, each in [0, ksub)
    val bad = spark.read.parquet(s"$dir/codes")
      .filter(size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16))
      .count()
    assert(bad === 0L, "malformed PQ codes in the persisted index")

    // the compression must materialize in the plan: the ADC leg's scan
    // reads (nn_id, codes) ONLY — raw vectors stay on disk until the
    // rerank joins the O(rerankC) survivor ids
    val plan = indexed.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(s => s.contains("codes") && !s.contains("cv")),
      s"ADC scan did not column-prune the vectors:\n$plan")
  }

  test("PQ ingest append: old-index + appended batch == inline over the union with the same codebooks") {
    import graft.functions.Pq
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val oldVecs = emb.filter(col("vec_id") % 5 =!= 0)
    val newVecs = emb.filter(col("vec_id") % 5 === 0)
    val query = emb.filter(col("vec_id") === 7).select(col("embedding"))

    // incremental: train+write on the old corpus, append the new batch
    val dirInc = tmp("pq_inc")
    val cb = Pq.writeIndex(oldVecs, "vec_id", "embedding",
      m = 8, ksub = 16, dirInc, iters = 2, sampleMod = 7)
    Pq.appendToIndex(newVecs, "vec_id", "embedding", dirInc)

    // oracle: the inline probe over the FULL corpus with the SAME
    // codebooks (encoding is a pure function of vector + codebooks, so
    // append-then-probe must equal encode-all-then-probe)
    val inline = Pq.adcTopK(emb, query, "vec_id", "embedding",
      k = 10, cb, rerankC = 50).collect().toSeq
    val appended = Pq.adcTopKIndexed(spark, dirInc, query, "embedding",
      k = 10, rerankC = 50).collect().toSeq
    assert(appended === inline)
  }

  test("IVF-PQ index: probe prunes to nprobe cells, ADC leg column-prunes vectors, recall holds on a planted neighbor") {
    import graft.functions.IvfPq
    val dir = tmp("ivfpq_index")
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val query = emb.filter(col("vec_id") === 7).select(col("embedding"))
    // a planted near-copy of the query (component 0 + 0.001): the probe
    // MUST retrieve it at rank 1-2 or the residual scoring is broken
    val planted = query.select(lit(900001L).as("vec_id"),
      transform(col("embedding"),
        (x, j) => when(j === 0, x + lit(0.001)).otherwise(x)).as("embedding"))
    val corpus = emb.unionAll(planted).localCheckpoint()

    IvfPq.writeIndex(corpus, "vec_id", "embedding",
      nlist = 16, m = 8, ksub = 16, dir, iters = 2, sampleMod = 7)
    val top = IvfPq.topKIndexed(spark, dir, query, "embedding",
      k = 10, nprobe = 4, rerankC = 50)
    val ids = top.collect().map(_.getLong(0)).toSeq
    assert(ids.take(2).toSet === Set(7L, 900001L),
      s"query itself + planted copy must lead the ranking, got $ids")

    val plan = top.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell IN (...) did not become a partition filter:\n$plan")
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(s => s.contains("codes") && !s.contains("cv")),
      s"ADC scan did not column-prune the vectors:\n$plan")
    assert(!plan.contains("__cvec"), s"probe re-assigns cells:\n$plan")
  }

  test("persisted phrase index: hits == inline; probe prunes to the terms' buckets; k-term chain counts overlaps") {
    import graft.text.Phrase
    val dir = tmp("phrase_index")
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("w"))

    Phrase.writeIndex(toks, "doc_id", "w", dir, nBuckets = 64)
    val inline = Phrase
      .phraseHits(Phrase.postings(toks, "doc_id", "w"), Seq("merge", "join"))
      .collect().map(_.toString).toSet
    val indexed = Phrase.phraseHitsIndexed(spark, dir, Seq("merge", "join"),
      nBuckets = 64)
    assert(inline.nonEmpty, "corpus must contain the phrase — vacuous otherwise")
    assert(indexed.collect().map(_.toString).toSet === inline)

    // directory pruning: the term buckets become a PARTITION filter
    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket IN (...) did not become a partition filter:\n$plan")

    // k>2 chain + overlapping occurrences + duplicate phrase terms, on a
    // planted relation: "a b a b a" contains "a b a" at positions 0 and 2
    import spark.implicits._
    val planted = Seq((1L, Seq("a", "b", "a", "b", "a")),
      (2L, Seq("a", "b", "b")), (3L, Seq("x", "a", "b", "a")))
      .toDF("doc_id", "w")
    val got = Phrase
      .phraseHits(Phrase.postings(planted, "doc_id", "w"), Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 3L -> 1L))
  }

  test("sketch shelf through disk: parquet-roundtripped HLL/KMV merge == inline merge, exactly") {
    import graft.operators.{Hll, Kmv}
    val docs = Tables.documents(spark, sf)
    val shard = pmod(abs(hash(col("doc_id"))), lit(2))
    val shards = Seq(docs.filter(shard === 0), docs.filter(shard === 1))

    def ests(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r => ("" + r.get(0)) -> r.getDouble(1)).toMap

    // HLL: registers are bytes in a binary column — the parquet roundtrip
    // must preserve them bit-for-bit, so the folded estimate is EXACTLY
    // the inline one (not within-tolerance: identical)
    val hllInline = ests(Hll.estimateDistinct(
      Hll.merge(shards.map(Hll.build(_, "lang", "doc_id")): _*)))
    val hllDir = tmp("hll_shelf")
    shards.zipWithIndex.foreach { case (s0, i) =>
      Hll.build(s0, "lang", "doc_id")
        .write.mode("overwrite").parquet(s"$hllDir/shard$i") }
    val hllDisk = ests(Hll.estimateDistinct(Hll.merge(
      (0 until 2).map(i => spark.read.parquet(s"$hllDir/shard$i")): _*)))
    assert(hllInline.nonEmpty && hllDisk === hllInline,
      s"disk-merged HLL diverged: $hllDisk vs $hllInline")

    // KMV: sketch rows are (grp, key, h, rn, k) — deterministic md5
    // bottom-k, so disk-merge == inline-merge row-for-row
    val kmvInline = ests(Kmv.estimateDistinct(
      Kmv.merge(shards.map(Kmv.build(_, "lang", "doc_id", k = 64)): _*)))
    val kmvDir = tmp("kmv_shelf")
    shards.zipWithIndex.foreach { case (s0, i) =>
      Kmv.build(s0, "lang", "doc_id", k = 64)
        .write.mode("overwrite").parquet(s"$kmvDir/shard$i") }
    val kmvDisk = ests(Kmv.estimateDistinct(Kmv.merge(
      (0 until 2).map(i => spark.read.parquet(s"$kmvDir/shard$i")): _*)))
    assert(kmvInline.nonEmpty && kmvDisk === kmvInline,
      s"disk-merged KMV diverged: $kmvDisk vs $kmvInline")
  }

  test("persisted copy index: bucket-pruned probe == flat recompute; probe partition-prunes to the batch's fingerprint buckets only; compaction collapses re-ingested duplicates without changing answers") {
    import graft.text.CopyIndex
    val dir = tmp("copy_index")
    // corpus = originals (< 100) + near-verbatim dups (≥ 100000): every
    // dup shares its full text run with its original, so probes are
    // provably non-empty. One materialization — consumed 5× below.
    val sel = TextOps.winnowRelPos(corpus,
      "doc_id", transform(TextOps.trigramsAll(col("w")),
        g => TextOps.fingerprint(g)), w = 4)
      .localCheckpoint()
    val idxSel = sel.filter(col("id") < 100000)
    // a SMALL batch (2 docs) — its fingerprints cannot cover all 64
    // buckets, so the containment check below proves real pruning
    val batchSel = sel.filter(col("id").isin(100000L, 100001L))
    CopyIndex.writeIndex(idxSel, dir)

    def key(r: org.apache.spark.sql.Row): (Long, Long) =
      (r.getLong(r.fieldIndex("idx_id")), r.getLong(r.fieldIndex("new_id")))
    val inline = CopyIndex.localize(
        idxSel.select(col("id").as("idx_id"), col("pos").as("idx_pos"),
            col("fp"))
          .join(batchSel.select(col("id").as("new_id"),
            col("pos").as("new_pos"), col("fp")), Seq("fp")),
        "idx", "new", minShared = 2)
      .collect().map(r => key(r) -> r).toMap
    val probed = CopyIndex.probe(spark, dir, batchSel)
    val got = probed.collect().map(r => key(r) -> r).toMap
    assert(inline.nonEmpty, "planted dups must match — vacuous otherwise")
    assert(got === inline, "disk probe diverged from the flat recompute")
    // each dup must localize against ITS original over (nearly) the
    // whole shared run — the SIGMOD'03 payoff, not just "docs match"
    assert(got.contains((0L, 100000L)) && got.contains((1L, 100001L)))

    // the fp bucket predicate must be a PARTITION filter (directory
    // pruning before any row is read) …
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket IN (...) did not become a partition filter:\n$plan")
    // … and the probe's index read touches ONLY files under the batch's
    // bucket directories (trailing separator: "bucket=1" would also
    // match bucket=10..15)
    val want = CopyIndex.bucketsOf(batchSel).toSet
    assert(want.nonEmpty && want.size < CopyIndex.DefaultBuckets,
      s"batch covers all ${CopyIndex.DefaultBuckets} buckets — containment check vacuous")
    // runtime input_file_name(), not .inputFiles — the latter lists the
    // whole table before partition pruning and would fail spuriously
    val touched = CopyIndex.prunedIndex(spark, dir, want.toSeq)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty &&
      touched.forall(f => want.exists(b => f.contains(s"bucket=$b/"))),
      s"probe read outside the batch's buckets $want: ${touched.mkString(", ")}")

    // the fan-out is baked into the layout: a caller whose constant
    // drifted must fail LOUDLY (a wrong-modulus probe would silently
    // read as "no copies found" on the contamination path)
    val drift = intercept[IllegalArgumentException](
      CopyIndex.probe(spark, dir, batchSel, nBuckets = 16))
    assert(drift.getMessage.contains("p=64"), drift.getMessage)
    val driftA = intercept[IllegalArgumentException](
      CopyIndex.appendToIndex(batchSel, dir, nBuckets = 16))
    assert(driftA.getMessage.contains("p=64"), driftA.getMessage)

    // RE-INGESTION: append the same batch twice (duplicate rows), probe
    // answers must not move (COUNT(DISTINCT fp) + min/max spans are
    // duplicate-blind) …
    CopyIndex.appendToIndex(batchSel, dir)
    CopyIndex.appendToIndex(batchSel, dir)
    val withSelf = CopyIndex.probe(spark, dir, batchSel)
      .collect().map(r => key(r) -> r).toMap
    // … the batch now OVERLAPS the index (re-ingestion): a document must
    // never read as "copying itself" — self-pairs are filtered in probe —
    // while its genuine cross-doc matches survive
    assert(withSelf.keys.forall { case (i, n) => i != n },
      s"re-ingested batch produced self-pair alerts: ${withSelf.keys}")
    assert(inline.keySet.subsetOf(withSelf.keySet),
      "re-ingestion lost cross-doc matches")
    val before = spark.read.parquet(dir).count()
    // … then compaction reclaims the duplicate rows, same layout, same
    // probe answer
    CopyIndex.compactIndex(spark, dir)
    val after = spark.read.parquet(dir)
    assert(after.count() < before, "compaction reclaimed nothing")
    assert(after.count() ===
      after.select("id", "pos", "fp").distinct().count())
    val recheck = CopyIndex.probe(spark, dir, batchSel)
      .collect().map(r => key(r) -> r).toMap
    assert(recheck === withSelf, "compaction changed probe answers")
  }
}
