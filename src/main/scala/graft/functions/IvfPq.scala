package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the composite of the [[Ivf]] coarse quantizer and [[Pq]]
  * residual codes — the industry-standard large-scale ANN index (FAISS's
  * IVFPQ; Jégou et al. 2011, §IV "non-exhaustive search"). The corpus is
  * partitioned into `nlist` cells; each vector stores only its cell id
  * and the PQ codes of its RESIDUAL (unit vector minus cell centroid), so
  * a probe (a) prunes to `nprobe` cell directories and (b) ADC-scans just
  * codes inside them:
  *
  *   dot(q, v) = dot(q, c_cell) + dot(q, v - c_cell)
  *             ≈ [driver-computed centroid term] + [m LUT lookups]
  *
  * Everything expensive happens once at build: coarse training (O(KB)
  * driver traffic per Lloyd round), one broadcast-join cell assignment,
  * residual codebook training (same O(KB) rounds), and a map-only encode.
  * A query is driver-side O(parameters) math (probe cells + LUT) plus a
  * pruned scan that reads (nn_id, codes) only — the rerank joins the
  * `rerankC` survivor ids back against the probed cells' vectors.
  */
object IvfPq {

  /** Build and persist the index: `path/cells` partitioned by cell with
    * (nn_id, codes, cn, cv), `path/centroids`, `path/codebooks`. Returns
    * (centroids, codebooks). */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nlist: Int, m: Int, ksub: Int, path: String,
                 iters: Int = 3, sampleMod: Int = 1)
      : (Seq[Seq[Double]], Pq.Codebooks) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (centroids, effMod) =
      Ivf.trainWithSampleMod(corpus, idCol, vecCol, nlist, iters, sampleMod)
    val cdf = broadcast(centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "cvec"))
    // one assignment join; the residual derives map-side from the
    // broadcast centroid row (assignCells keeps only (id, vector)-derived
    // columns, so the unit vector re-derives from cv — map-only)
    val assigned = Ivf.assignCells(
        corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
          VectorOps.l2(col(vecCol)).as("cn"), Ivf.unit(col(vecCol)).as("vu")),
        "nn_id", "vu", centroids, keep = Seq("cv", "cn"))
      .join(cdf, "cell")
      .withColumn("res",
        zip_with(Ivf.unit(col("cv")), col("cvec"), (x, c) => x - c))
      // cvec is dead once the residual exists (constant per cell and
      // broadcast-resident) — drop it before materializing the corpus
      .select("nn_id", "cell", "cv", "cn", "res")
      .localCheckpoint() // feeds codebook training AND the encode pass
    val cb = Pq.train(assigned, "nn_id", "res", m, ksub, iters,
      sampleMod, unit = false)
    assigned
      .withColumn("codes", Pq.codesExpr(col("res"), cb))
      .select("nn_id", "codes", "cn", "cv", "cell")
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/cells")
    Ivf.writeCentroids(spark, centroids, path)
    Ivf.writeTrainMeta(spark, effMod, path)
    Pq.writeCodebooks(spark, cb, path)
    (centroids, cb)
  }

  /** Approximate top-k against a persisted index. Probe cells, the
    * centroid score term, and the residual LUT are all resolved
    * driver-side from O(parameters) values; the scan prunes to the
    * `nprobe` cell directories and projects (nn_id, codes, cell) for the
    * ADC pass; the exact rerank touches `rerankC` rows. */
  def topKIndexed(spark: SparkSession, path: String, query: DataFrame,
                  vecCol: String, k: Int, nprobe: Int = 4,
                  rerankC: Int = 100): DataFrame = {
    // deletion fence: refuse a shelf a forget() died on
    graft.operators.IndexForget.assertClean(spark, s"$path/cells")
    val centroids = Ivf.readCentroids(spark, path)
    val cb = Pq.readCodebooks(spark, path)
    val qu = Pq.queryUnit(query, vecCol)
    // driver math: per-cell centroid dot + the nprobe highest cells
    // (ties to the lowest cell id, matching Ivf.probeCells)
    val cellDot = centroids.map(c =>
      c.zip(qu).foldLeft(0.0) { case (a, (x, y)) => a + x * y })
    val probes = cellDot.zipWithIndex
      .sortBy { case (d, i) => (-d, i) }.take(nprobe).map(_._2)
    val lutV = Pq.lut(qu, cb)

    val cells = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(probes: _*))
    val cand = cells.select(col("nn_id"), col("codes"), col("cell"))
      .withColumn("adc",
        element_at(typedLit(cellDot), col("cell") + 1)
          + Pq.adcExpr(col("codes"), lutV))
      .orderBy(col("adc").desc, col("nn_id"))
      .limit(rerankC)
      .select(col("nn_id").as("cand_id"))
    val vecs = cells.select(col("nn_id"), col("cv"), col("cn"))
      .join(broadcast(cand), col("nn_id") === col("cand_id"))
      .select("nn_id", "cv", "cn")
    Pq.rerank(vecs, query, vecCol, k)
  }
}
