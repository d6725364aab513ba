package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O39 scale path #3: product quantization (PQ) with asymmetric distance
  * computation (ADC) — the vector-COMPRESSION counterpart to the
  * cell-PRUNING in [[Ivf]] and the bucket hashing in [[Ann]]. The unit
  * vector is split into `m` subspaces; each subspace is vector-quantized
  * against its own `ksub`-entry codebook, so a dim-64 float vector becomes
  * m = 8 small integers (32× smaller). A query never decompresses anything:
  * it precomputes a lookup table LUT[s][j] = <q_s, codebook[s][j]> (m × ksub
  * doubles, driver-side O(parameters) math) and scores a row with m table
  * lookups — then exact-reranks only the top ADC candidates.
  *
  * Plan shape at 100 TB (what each stage costs):
  *   - training is `iters` rounds of (map-only assignment expression →
  *     one partial-agg shuffle of m × ksub × dsub means); only those
  *     means ever reach the driver — O(KB) regardless of corpus size;
  *   - encoding is a PURE PROJECTION: the codebooks are literal constants
  *     inside one codegen'd expression, so corpus encode is map-only —
  *     zero shuffles, zero joins (Ivf.assignCells/cellExpr applies the
  *     same shape to the coarse quantizer);
  *   - the ADC scan reads ONLY the `codes` column (m bytes of info per
  *     row, parquet column pruning drops the raw vectors — IndexSpec pins
  *     `ReadSchema` on the persisted layout), scores with m lookups per
  *     row, and TakeOrdered keeps the top `rerankC`;
  *   - the exact rerank touches `rerankC` rows — constant, not O(corpus).
  *
  * Everything is deterministic: init = sub-vectors of the `ksub` lowest-id
  * rows, all arithmetic is DOUBLE folds in array order, argmax ties resolve
  * to the lowest code (array_position returns the first match).
  *
  * Reference scope: the reference stack ships embeddings to a managed
  * vector store (cdk_stacks/ops.py); PQ/ADC is the standard
  * re-expression of that serving path when the index must live in the
  * engine itself (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  */
object Pq {

  /** Codebooks: cb(s)(j) = the dsub-dim centroid j of subspace s. */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** Subspace s (0-based) of a unit-vector column, as array<double>. */
  private def subVec(vu: Column, s: Column, dsub: Int): Column =
    slice(vu, s * dsub + 1, lit(dsub))

  /** Per-row PQ codes as one map-only expression: for each subspace s,
    * the code j maximizing <sub_s(v), cb(s)(j)> - ||cb(s)(j)||²/2 (the
    * argmin-L2 centroid — the row-constant ||sub_s(v)||² term cancels).
    * r19: dispatches to the NATIVE
    * [[graft.functions.expressions.PqEncode]] single-pass loop — the
    * r18 HOF form nested transform(sequence)×transform(sequence)
    * INTERPRETED per corpus row (m×ksub lambda dispatches plus m score
    * arrays), and encoding runs once per Lloyd round plus once at
    * encode. Identical dot arithmetic, −‖c‖²/2 fold, and first-argmax
    * tie semantics as [[codesExprHof]] — parity pinned in
    * MultimodalSpec. */
  def codesExpr(vu: Column, cb: Codebooks): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.expressions.PqEncode(
        org.apache.spark.sql.GraftPlanBridge.expression(vu), cb))

  /** HOF reference formulation of [[codesExpr]] (bit-identical). */
  def codesExprHof(vu: Column, cb: Codebooks): Column = {
    val m = cb.size
    val ksub = cb.head.size
    val dsub = cb.head.head.size
    val cbLit = typedLit(cb)
    // -||c||²/2 per (s, j), folded driver-side into a literal
    val halfN = typedLit(cb.map(_.map(c => -c.map(x => x * x).sum / 2)))
    transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = subVec(vu, s, dsub)
      val scores = transform(sequence(lit(0), lit(ksub - 1)), j =>
        call_function("vec_dot", sub, element_at(element_at(cbLit, s + 1), j + 1))
          + element_at(element_at(halfN, s + 1), j + 1))
      (array_position(scores, array_max(scores)) - 1).cast("int")
    })
  }

  /** Train per-subspace codebooks with `iters` Lloyd rounds of plain
    * k-means (subspace residuals are not on the unit sphere — means are
    * NOT renormalized, unlike [[Ivf.train]]'s spherical variant).
    * Deterministic init: the `ksub` lowest-id rows' sub-vectors. Each
    * round collects only the m × ksub × dsub means; empty cells keep
    * their previous centroid.
    *
    * `unit = false` trains on the vectors AS GIVEN (array<double>) —
    * the IVF-PQ residual path, where inputs are differences from a cell
    * centroid and renormalizing would distort them. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int, iters: Int = 3,
            sampleMod: Int = 1, unit: Boolean = true): Codebooks = {
    def prep(c: Column): Column =
      if (unit) Ivf.unit(c) else c.cast("array<double>")
    val sampled =
      if (sampleMod <= 1) corpus
      else corpus.filter(col(idCol) % sampleMod === 0)
    var vu = sampled.select(col(idCol).as("id"), prep(col(vecCol)).as("vu"))

    var seed = vu.orderBy("id").limit(ksub)
      .select("vu").collect().map(_.getSeq[Double](0).toSeq).toSeq
    if (seed.size < ksub && sampleMod > 1) {
      // deterministic sample under-shot — train unsampled rather than
      // silently fitting fewer codes than asked for (Ivf.train's rule)
      vu = corpus.select(col(idCol).as("id"), prep(col(vecCol)).as("vu"))
      seed = vu.orderBy("id").limit(ksub)
        .select("vu").collect().map(_.getSeq[Double](0).toSeq).toSeq
    }
    require(seed.size >= ksub,
      s"PQ train: corpus has only ${seed.size} vectors, need at least " +
        s"ksub=$ksub — lower ksub or grow the corpus")
    val dim = seed.head.size
    require(dim % m == 0, s"PQ train: dim=$dim not divisible by m=$m")
    val dsub = dim / m

    var cb: Codebooks =
      Seq.tabulate(m)(s => seed.map(_.slice(s * dsub, (s + 1) * dsub)))
    for (_ <- 0 until iters) {
      // assignment is the same map-only expression encoding uses; the
      // mean reduces to m × ksub × dsub (sub, code, pos, avg) rows
      // before anything moves
      val means = vu
        .select(posexplode(codesExpr(col("vu"), cb)).as(Seq("sub", "code")),
          col("vu"))
        .select(col("sub"), col("code"),
          posexplode(subVec(col("vu"), col("sub"), dsub)).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos").agg(avg(col("x")).as("mu"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      cb = cb.zipWithIndex.map { case (book, s) =>
        book.zipWithIndex.map { case (old, j) =>
          if (!means.contains((s, j, 0))) old
          else Seq.tabulate(dsub)(p => means((s, j, p)))
        }
      }
    }
    cb
  }

  /** ADC lookup table for one query unit-vector: LUT(s)(j) =
    * <q_s, cb(s)(j)> — pure driver math over O(parameters) doubles. */
  def lut(qUnit: Seq[Double], cb: Codebooks): Seq[Seq[Double]] = {
    val dsub = cb.head.head.size
    cb.zipWithIndex.map { case (book, s) =>
      val qs = qUnit.slice(s * dsub, (s + 1) * dsub)
      book.map(c => c.zip(qs).foldLeft(0.0) { case (a, (x, y)) => a + x * y })
    }
  }

  /** ADC score of a `codes` column against a literal LUT: m lookups and
    * a fold — approximates cosine(q, v) because both sides were encoded
    * from unit vectors. r19: native single-pass
    * ([[graft.functions.expressions.PqAdc]]) — the HOF form
    * (transform + aggregate) ran interpreted per scanned row on the ADC
    * scan, the hot loop of every PQ probe. Identical left-to-right sum
    * from 0.0 ([[adcExprHof]] is the pinned reference). */
  def adcExpr(codes: Column, lutV: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.expressions.PqAdc(
        org.apache.spark.sql.GraftPlanBridge.expression(codes), lutV))

  /** HOF reference formulation of [[adcExpr]] (bit-identical). */
  def adcExprHof(codes: Column, lutV: Seq[Seq[Double]]): Column = {
    val lutLit = typedLit(lutV)
    aggregate(
      transform(codes, (c, s) => element_at(element_at(lutLit, s + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Unit-normalized query vector collected off a ONE-ROW DataFrame —
    * O(dim) driver traffic (the [[Ivf.ivfTopKIndexed]] probe-resolution
    * rule: parameters may cross the driver, data rows never). */
  private[functions] def queryUnit(query: DataFrame, vecCol: String): Seq[Double] =
    query.select(Ivf.unit(col(vecCol)).as("qu"))
      .collect().head.getSeq[Double](0).toSeq

  /** Approximate top-k cosine neighbors of one query vector via PQ/ADC:
    * encode the corpus (map-only), ADC-score, TakeOrdered the top
    * `rerankC` candidates, exact-rerank those `rerankC` rows only. */
  def adcTopK(corpus: DataFrame, query: DataFrame, idCol: String,
              vecCol: String, k: Int, cb: Codebooks,
              rerankC: Int = 100): DataFrame = {
    val prep = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
      VectorOps.l2(col(vecCol)).as("cn"), Ivf.unit(col(vecCol)).as("vu"))
    val lutV = lut(queryUnit(query, vecCol), cb)
    val cand = prep
      .withColumn("adc", adcExpr(codesExpr(col("vu"), cb), lutV))
      .orderBy(col("adc").desc, col("nn_id"))
      .limit(rerankC)
    rerank(cand, query, vecCol, k)
  }

  /** Exact cosine top-k over an O(rerankC)-row candidate set carrying
    * (nn_id, cv, cn) — shared by the PQ paths and [[IvfPq]]. */
  private[functions] def rerank(cand: DataFrame, query: DataFrame,
                                vecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("qv"),
      VectorOps.l2(col(vecCol)).as("qn")))
    cand.crossJoin(q)
      .withColumn("sim",
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .select(col("nn_id"), col("sim"))
      .orderBy(col("sim").desc, col("nn_id"))
      .limit(k)
  }

  /** Persist the PQ index: one parquet relation (nn_id, codes, cn, cv)
    * under `path/codes` — the ADC scan projects (nn_id, codes) ONLY, so
    * parquet column pruning never reads the raw vectors (the 32×
    * compression materializes as scan bytes, and IndexSpec pins the
    * pruned ReadSchema); the rerank re-reads (nn_id, cv, cn) for the
    * `rerankC` survivors. Codebooks land under `path/codebooks` as
    * (sub, code, cvec) rows. Training and encoding run exactly once. */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 m: Int, ksub: Int, path: String, iters: Int = 3,
                 sampleMod: Int = 1): Codebooks = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = train(corpus, idCol, vecCol, m, ksub, iters, sampleMod)
    corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
        VectorOps.l2(col(vecCol)).as("cn"), Ivf.unit(col(vecCol)).as("vu"))
      .withColumn("codes", codesExpr(col("vu"), cb))
      .select("nn_id", "codes", "cn", "cv")
      .write.mode("overwrite").parquet(s"$path/codes")
    writeCodebooks(spark, cb, path)
    cb
  }

  /** Persist codebooks as (sub, code, cvec) rows under `path/codebooks`
    * — shared by [[writeIndex]] and [[IvfPq.writeIndex]]. */
  private[functions] def writeCodebooks(spark: SparkSession, cb: Codebooks,
                                        path: String): Unit = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c) }
    }.toDF("sub", "code", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Ingest path: encode a NEW batch with the index's EXISTING codebooks
    * (encoding is a pure function of (vector, codebooks) — map-only) and
    * append. Training never re-runs; steady-state cost is |batch|. */
  def appendToIndex(newVecs: DataFrame, idCol: String, vecCol: String,
                    path: String): Unit = {
    val cb = readCodebooks(newVecs.sparkSession, path)
    newVecs.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
        VectorOps.l2(col(vecCol)).as("cn"), Ivf.unit(col(vecCol)).as("vu"))
      .withColumn("codes", codesExpr(col("vu"), cb))
      .select("nn_id", "codes", "cn", "cv")
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Codebooks back from a persisted index, in (sub, code) order. */
  def readCodebooks(spark: SparkSession, path: String): Codebooks =
    spark.read.parquet(s"$path/codebooks").orderBy("sub", "code")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
      }

  /** [[adcTopK]] against a persisted index: the ADC pass scans ONLY
    * (nn_id, codes) — column pruning drops cv/cn from the read — and the
    * exact rerank joins the `rerankC` survivor ids (a broadcast of
    * O(rerankC) longs) back against a second pruned (nn_id, cv, cn)
    * scan. Identical results to the inline path for the same codebooks. */
  def adcTopKIndexed(spark: SparkSession, path: String, query: DataFrame,
                     vecCol: String, k: Int,
                     rerankC: Int = 100): DataFrame = {
    val cb = readCodebooks(spark, path)
    val lutV = lut(queryUnit(query, vecCol), cb)
    val codes = spark.read.parquet(s"$path/codes")
    val cand = codes.select(col("nn_id"), col("codes"))
      .withColumn("adc", adcExpr(col("codes"), lutV))
      .orderBy(col("adc").desc, col("nn_id"))
      .limit(rerankC)
      .select(col("nn_id").as("cand_id"))
    val vecs = codes.select(col("nn_id"), col("cv"), col("cn"))
      .join(broadcast(cand), col("nn_id") === col("cand_id"))
      .select("nn_id", "cv", "cn")
    rerank(vecs, query, vecCol, k)
  }
}
