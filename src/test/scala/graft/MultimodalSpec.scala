package graft

import graft.functions.{Ann, VectorOps}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Stub-codec multimodal plumbing (schema, batch boundary, determinism) and
  * the LSH ANN scale path (recall vs brute force, candidate efficiency). */
class MultimodalSpec extends SparkTestBase {

  test("decode pipeline: schema, row parity, and determinism") {
    val docs = Tables.documents(spark, sf)
    val f1 = Multimodal.features(spark, docs).toDF()
    val f2 = Multimodal.features(spark, docs, partitions = 7).toDF()
    assert(f1.columns.toSeq ===
      Seq("media_id", "kind", "n_bytes", "width", "height", "features"))
    assert(f1.count() === docs.count())
    // partitioning must not change results (pure per-row codec)
    assert(f1.exceptAll(f2).count() === 0)
    // features are a 4-wide simplex (histogram ratios sum to 1)
    val sums = f1.select(aggregate(col("features"), lit(0.0),
      (a, x) => a + x.cast("double")).as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-5))
  }

  test("frame sampling touches only videos and is deterministic and partition-invariant") {
    import org.apache.spark.sql.Encoders
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.mediaFromDocuments(docs)
      .as[Multimodal.Media](Encoders.product[Multimodal.Media])
    val frames = Multimodal.sampleFrames(media, k = 16).toDF()
    // videos only (doc_id % 3 == 2), every 16th byte offset, starting at 0
    assert(frames.filter(col("media_id") % 3 =!= 2).count() === 0)
    assert(frames.filter(col("frame_id") % 16 =!= 0).count() === 0)
    assert(frames.filter(col("frame_id") === 0).count() ===
      docs.filter(col("doc_id") % 3 === 2).count())
    val again = Multimodal.sampleFrames(
      media.repartition(7, col("media_id")), k = 16).toDF()
    assert(frames.exceptAll(again).count() === 0)
    assert(again.exceptAll(frames).count() === 0)
  }

  test("resize stage restamps dimensions and preserves features and row count") {
    val feats = Multimodal.features(spark, Tables.documents(spark, sf))
    val out = Multimodal.resizeAll(feats, 32, 24).toDF()
    assert(out.count() === feats.count())
    assert(out.filter(col("width") =!= 32 || col("height") =!= 24).count() === 0)
    // only the grid changes: ids + features survive untouched
    assert(out.select("media_id", "kind", "n_bytes", "features")
      .exceptAll(feats.toDF().select("media_id", "kind", "n_bytes", "features"))
      .count() === 0)
  }

  test("payload metadata matches the source text byte-for-byte") {
    val docs = Tables.documents(spark, sf)
    val bad = Multimodal.mediaFromDocuments(docs)
      .join(docs, col("media_id") === col("doc_id"))
      .filter(octet_length(col("payload")) =!= length(col("text")))
    assert(bad.count() === 0) // corpus is ASCII → octet length == char length
  }

  test("ANN recalls planted near-neighbors and prunes the candidate space") {
    // LSH's contract is recalling NEAR neighbors (sim ≈ 1), not ranking the
    // nearly-orthogonal tail of a random corpus (that's brute-force q37's
    // job). Plant 10 perturbed copies of vector 0 (one component halved →
    // cosine ≈ 0.99) and require the ANN top-10 to find them.
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val query = e.filter(col("vec_id") === 0)
    val planted = query.crossJoin((0 until 10).toDF("j"))
      .select((col("j") + 10000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === col("j"), x * 0.5f).otherwise(x)).as("embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).unionByName(planted)

    val approx = Ann.annTopK(corpus, query, "vec_id", "embedding", k = 10)
      .collect().map(_.getLong(0)).toSet
    val found = approx.count(_ >= 10000L)
    assert(found >= 8, s"only $found/10 planted near-neighbors recalled: $approx")

    // pruning: the probed buckets cover a small fraction of the corpus
    val planes = Ann.hyperplanes(64, 8)
    val probed = query.select(
      explode(Ann.probes(Ann.signature(col("embedding"), planes), 8)).as("p"))
      .collect().map(_.getLong(0)).toSet
    val candidates = corpus.select(
      Ann.signature(col("embedding"), planes).as("b"))
      .collect().count(r => probed.contains(r.getLong(0)))
    val total = corpus.count()
    assert(candidates.toDouble / total < 0.25,
      s"probed candidates $candidates/$total — no pruning")
  }

  test("ANN signatures are deterministic across runs") {
    val planes = Ann.hyperplanes(64, 4)
    val e = Tables.embeddings(spark, sf).limit(50)
    val s1 = e.select(col("vec_id"), Ann.signature(col("embedding"), planes).as("b"))
    val s2 = e.select(col("vec_id"), Ann.signature(col("embedding"), planes).as("b"))
    assert(s1.exceptAll(s2).count() === 0)
  }

  test("IVF recalls planted near-neighbors, prunes cells, and trains deterministically") {
    import graft.functions.Ivf
    import spark.implicits._
    // same planted-near-dup protocol as the LSH test: 10 perturbed copies
    // of vector 0 (cosine ≈ 0.99) must surface in the IVF top-10
    val e = Tables.embeddings(spark, sf)
    val query = e.filter(col("vec_id") === 0)
    val planted = query.crossJoin((0 until 10).toDF("j"))
      .select((col("j") + 10000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === col("j"), x * 0.5f).otherwise(x)).as("embedding"))
    val corpus = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).unionByName(planted)

    val centroids = Ivf.train(corpus, "vec_id", "embedding", nlist = 16, iters = 2)
    assert(centroids.size === 16)
    // unit-norm centroids (spherical k-means invariant)
    centroids.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    // training is deterministic: same corpus → same centroids exactly
    val again = Ivf.train(corpus, "vec_id", "embedding", nlist = 16, iters = 2)
    assert(centroids === again)

    val found = Ivf.ivfTopK(corpus, query, "vec_id", "embedding",
      k = 10, centroids, nprobe = 4)
      .collect().map(_.getLong(0)).count(_ >= 10000L)
    assert(found >= 8, s"only $found/10 planted near-neighbors recalled")

    // pruning: nprobe/nlist of the cells must bound the candidate share;
    // cells are data-adaptive so allow slack for uneven occupancy
    val probed = query.select(explode(Ivf.probeCells(
      Ivf.unit(col("embedding")), centroids, 4)).as("p"))
      .collect().map(_.getInt(0)).toSet
    val assigned = corpus.select(Ivf.cellOf(Ivf.unit(col("embedding")),
      centroids).as("c")).collect().map(_.getInt(0))
    val candShare = assigned.count(probed.contains).toDouble / assigned.length
    assert(candShare < 0.6, f"probed cells hold $candShare%.2f of the corpus — no pruning")
  }

  test("native quantizer expressions are bit-identical to their HOF references (cellExpr/codesExpr/adcExpr)") {
    // r19: cellExpr/codesExpr/adcExpr dispatch to native single-pass
    // expressions (functions/expressions/VectorQuant.scala); the HOF
    // forms they replaced stay as *Hof references. Exact equality — the
    // dot fold order, the −‖c‖²/2 term, and first-argmax ties must all
    // match, or assignments (hence trained centroids, hence gated
    // results) would drift.
    import graft.functions.{Ivf, Pq}
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Ivf.unit(col("embedding")).as("vu"))
      .localCheckpoint()
    val centroids = e.orderBy("vec_id").limit(16)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val cellDiff = e.select(
        Ivf.cellExpr(col("vu"), centroids).as("got"),
        Ivf.cellExprHof(col("vu"), centroids).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(cellDiff === 0, s"$cellDiff rows: native cell != HOF cell")

    val dim = centroids.head.size
    val dsub = dim / 8
    val cb: Pq.Codebooks = Seq.tabulate(8)(s =>
      centroids.take(16).map(_.slice(s * dsub, (s + 1) * dsub)))
    val codesDiff = e.select(
        Pq.codesExpr(col("vu"), cb).as("got"),
        Pq.codesExprHof(col("vu"), cb).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(codesDiff === 0, s"$codesDiff rows: native codes != HOF codes")

    val lut = Pq.lut(centroids.head, cb)
    val adcDiff = e.select(Pq.codesExpr(col("vu"), cb).as("codes"))
      .select(Pq.adcExpr(col("codes"), lut).as("got"),
        Pq.adcExprHof(col("codes"), lut).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(adcDiff === 0, s"$adcDiff rows: native adc != HOF adc")
  }

  test("IVF train falls back to the full corpus on an under-sized sample and fails clearly on an under-sized corpus") {
    import graft.functions.Ivf
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // sampleMod far above every id ⇒ the sample is just vec_id 0 — train
    // must fall back to the unsampled corpus, not fit 1 centroid silently
    val centroids = Ivf.train(e, "vec_id", "embedding",
      nlist = 8, iters = 1, sampleMod = 1000000000)
    assert(centroids.size === 8)
    // corpus smaller than nlist: loud failure, not centroids.head NPE
    val ex = intercept[IllegalArgumentException] {
      Ivf.train(e.filter(col("vec_id") < 3), "vec_id", "embedding", nlist = 8)
    }
    assert(ex.getMessage.contains("nlist"), ex.getMessage)
  }
}
