package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O39 scale path #2: IVF (inverted-file) approximate nearest neighbor —
  * the coarse-quantizer counterpart to the random-hyperplane LSH in
  * [[Ann]]. A small set of centroids partitions the corpus into `nlist`
  * cells; a query probes only its `nprobe` nearest cells and exact-reranks
  * the candidates, touching |corpus| × nprobe / nlist rows in expectation.
  *
  * Where LSH buckets are data-independent, IVF adapts to the corpus: a few
  * Lloyd iterations of spherical k-means pull centroids toward the data's
  * actual clusters, which is what makes IVF the standard coarse index for
  * embedding search at scale.
  *
  * Plan shape at 100 TB:
  *   - training touches only means: each iteration is one partial-agg
  *     shuffle of nlist × dim doubles (the assignment pass is a
  *     broadcast join against the centroid table + argmax aggregate —
  *     codegen stays one loop at any nlist), and only the nlist
  *     centroids ever reach the driver — never data rows;
  *   - cell assignment of the corpus is a broadcast join + argmax
  *     aggregate (one exchange on the (id, vector) key), computed once
  *     and ideally persisted next to the vectors (like the LSH
  *     signatures);
  *   - a query broadcasts its nprobe cell ids; the corpus is filtered on
  *     its (pre-computable) cell column, so the exact-rerank cosine runs
  *     over a nprobe/nlist fraction of the data with no shuffle.
  *
  * Everything is deterministic: init = the nlist lowest-id vectors, all
  * arithmetic is DOUBLE left-folds in array order, ties in argmax resolve
  * to the lowest cell index.
  */
object Ivf {

  /** Unit-normalized DOUBLE copy of a float-vector column (spherical
    * k-means works on the unit sphere: mean-then-renormalize centroids,
    * cosine == dot). Zero vectors normalize to zero (never NaN). */
  def unit(v: Column): Column = {
    val n = VectorOps.l2(v)
    transform(v, x => when(n > 0.0, x.cast("double") / n).otherwise(0.0))
  }

  /** Native codegen dot against a literal centroid (vec_dot handles
    * array<double> too) — the HOF fold allocates per element, and cell
    * assignment runs nlist of these per row. */
  private def dotLit(v: Column, c: Seq[Double]): Column =
    call_function("vec_dot", v, typedLit(c))

  /** Index (0-based) of the max-dot centroid — lowest index wins ties
    * (array_position returns the FIRST match). Literal-unrolled: one
    * vec_dot column per centroid, so codegen cost grows with nlist —
    * reserve for SINGLE-ROW inputs (the query vector); corpus-wide
    * assignment goes through [[assignCells]]. */
  def cellOf(vUnit: Column, centroids: Seq[Seq[Double]]): Column = {
    val dots = array(centroids.map(c => dotLit(vUnit, c)): _*)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Index (0-based) of the max-dot centroid as ONE map-only expression —
    * assignment needs no join, no broadcast table, and no argmax
    * aggregate (the [[Pq.codesExpr]] shape applied to the coarse
    * quantizer). r19: dispatches to the NATIVE
    * [[graft.functions.expressions.IvfCellAssign]] single-pass loop —
    * the r18 HOF form (transform over a literal centroid array +
    * array_position/array_max) ran INTERPRETED per corpus row, nlist
    * lambda dispatches and an intermediate dots array each. Identical
    * dot arithmetic (the vec_dot left fold) and tie semantics (highest
    * dot, then LOWEST cell) as [[cellExprHof]]/[[cellOf]] — parity
    * pinned in MultimodalSpec. */
  def cellExpr(vuCol: Column, centroids: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.expressions.IvfCellAssign(
        org.apache.spark.sql.GraftPlanBridge.expression(vuCol), centroids))

  /** HOF reference formulation of [[cellExpr]] (bit-identical). */
  def cellExprHof(vuCol: Column, centroids: Seq[Seq[Double]]): Column = {
    val dots = transform(typedLit(centroids),
      c => call_function("vec_dot", vuCol, c))
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Corpus-wide cell assignment: dedup on (id, vector), then the
    * map-only [[cellExpr]]. The dedup key is (id, vector), NOT id alone:
    * a corpus with repeated ids (re-ingested embeddings awaiting dedup)
    * keeps one row per distinct vector. `keep` columns must be functions
    * of (id, vector) (e.g. norms of the same vector) so the within-group
    * first() is deterministic. r18: assignment itself is a pure
    * projection (guide §1.2 step 1 — the former broadcast-crossJoin ×
    * nlist + argmax exchange shipped every row nlist times into a wide
    * aggregate; now the only exchange is the dedup's, and it carries
    * each row once). */
  def assignCells(df: DataFrame, idCol: String, vuCol: String,
                  centroids: Seq[Seq[Double]],
                  keep: Seq[String] = Nil): DataFrame = {
    val aggKeep = keep.filterNot(k => k == idCol || k == vuCol)
    val dedup =
      if (aggKeep.isEmpty)
        df.select(col(idCol), col(vuCol)).dropDuplicates(Seq(idCol, vuCol))
      else {
        val aggs = aggKeep.map(k => first(col(k)).as(k))
        df.select((idCol +: vuCol +: aggKeep).map(col): _*)
          .groupBy(col(idCol), col(vuCol))
          .agg(aggs.head, aggs.tail: _*)
      }
    dedup.withColumn("cell", cellExpr(col(vuCol), centroids))
      .select(col(idCol) +: col("cell") +: keep.map(col): _*)
  }

  /** Spherical k-means coarse quantizer: deterministic init (the `nlist`
    * lowest-id vectors), `iters` Lloyd rounds. Collects ONLY the
    * nlist × dim centroid means per round — O(KB) driver traffic
    * regardless of corpus size. Empty cells keep their previous centroid. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int, iters: Int = 3,
            sampleMod: Int = 1): Seq[Seq[Double]] =
    trainWithSampleMod(corpus, idCol, vecCol, nlist, iters, sampleMod)._1

  /** As [[train]], additionally returning the EFFECTIVE sample modulus:
    * `sampleMod` when the deterministic sample held ≥ nlist vectors, 1
    * when training fell back to the full corpus (small or sparse-id
    * inputs). Callers deriving a HELD-OUT set from the modulus — the
    * drift baseline, whose whole point is that training rows sit
    * unnaturally close to their own centroids — must use this value:
    * after a fallback there IS no held-out complement, and a baseline
    * over `id % requestedMod != 0` would silently include trained-on
    * rows (biased high, false-flagging in-distribution arrivals). */
  def trainWithSampleMod(corpus: DataFrame, idCol: String, vecCol: String,
                         nlist: Int, iters: Int = 3,
                         sampleMod: Int = 1): (Seq[Seq[Double]], Int) = {
    // Coarse quantizers train on a corpus sample (the standard IVF
    // recipe): centroid quality needs the distribution, not every row.
    // The sample is deterministic — id % sampleMod — so training stays
    // reproducible; assignment/search always use the full corpus.
    val sampled =
      if (sampleMod <= 1) corpus
      else corpus.filter(col(idCol) % sampleMod === 0)
    var vu = sampled.select(col(idCol).as("id"), unit(col(vecCol)).as("vu"))
    var effMod = math.max(sampleMod, 1)

    var centroids: Seq[Seq[Double]] = vu.orderBy("id").limit(nlist)
      .select("vu").collect().map(_.getSeq[Double](0).toSeq).toSeq
    if (centroids.size < nlist && sampleMod > 1) {
      // the deterministic sample can under-shoot (or miss entirely) on a
      // small or sparse-id corpus — fall back to training unsampled
      // rather than silently fitting fewer cells than asked for
      vu = corpus.select(col(idCol).as("id"), unit(col(vecCol)).as("vu"))
      centroids = vu.orderBy("id").limit(nlist)
        .select("vu").collect().map(_.getSeq[Double](0).toSeq).toSeq
      effMod = 1
    }
    require(centroids.size >= nlist,
      s"IVF train: corpus has only ${centroids.size} vectors, need at " +
        s"least nlist=$nlist — lower nlist or grow the corpus")
    val dim = centroids.head.size

    for (_ <- 0 until iters) {
      // assignment is a broadcast join + argmax agg (assignCells — one
      // vec_dot loop regardless of nlist); the mean reduces to
      // nlist × dim (cell, pos, avg) rows before anything moves
      val means = assignCells(vu, "id", "vu", centroids, keep = Seq("vu"))
        .select(col("cell"), posexplode(col("vu")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (!means.contains((c, 0))) old
        else {
          val m = Seq.tabulate(dim)(p => means((c, p)))
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n > 0) m.map(_ / n) else old
        }
      }
    }
    (centroids, effMod)
  }

  /** The query's `nprobe` nearest cells, as an array column: argsort of
    * the centroid dots via sort_array on (dot, -index) structs (descending
    * dot, ascending index on ties). */
  def probeCells(qUnit: Column, centroids: Seq[Seq[Double]],
                 nprobe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(dotLit(qUnit, c).as("dot"), lit(-i).as("negidx"))
    }: _*)
    transform(slice(sort_array(scored, asc = false), 1, nprobe),
      s => -s.getField("negidx"))
  }

  /** Persist the IVF index: cell assignments of the whole corpus under
    * `path/cells` PARTITIONED BY cell (a probe touches nprobe of nlist
    * directories — partition pruning does the cell filter before any row
    * is read), centroids under `path/centroids`. The expensive pieces —
    * training and the corpus-wide assignment join — run exactly once;
    * every later query reads files. Returns the trained centroids. */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nlist: Int, path: String, iters: Int = 3,
                 sampleMod: Int = 1): Seq[Seq[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (centroids, effMod) =
      trainWithSampleMod(corpus, idCol, vecCol, nlist, iters, sampleMod)
    assignCells(
      corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
        VectorOps.l2(col(vecCol)).as("cn"), unit(col(vecCol)).as("vu")),
      "nn_id", "vu", centroids, keep = Seq("cv", "cn"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/cells")
    writeCentroids(spark, centroids, path)
    writeTrainMeta(spark, effMod, path)
    centroids
  }

  /** Persist centroids as (cell, cvec) rows under `path/centroids` —
    * shared by [[writeIndex]] and [[IvfPq.writeIndex]]. */
  private[functions] def writeCentroids(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[Seq[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Ingest path: assign a NEW batch of vectors to the index's EXISTING
    * cells and append their rows — training never re-runs, the old rows
    * never rewrite, and the append lands inside the per-cell partition
    * layout (steady-state cost is |batch|, not |corpus|). Standard IVF
    * practice: centroids drift only on explicit re-train; probes see old
    * and new vectors uniformly because assignment is a pure function of
    * (vector, centroids). */
  def appendToIndex(newVecs: DataFrame, idCol: String, vecCol: String,
                    path: String): Unit = {
    val centroids = readCentroids(newVecs.sparkSession, path)
    assignCells(
      newVecs.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
        VectorOps.l2(col(vecCol)).as("cn"), unit(col(vecCol)).as("vu")),
      "nn_id", "vu", centroids, keep = Seq("cv", "cn"))
      .write.partitionBy("cell").mode("append").parquet(s"$path/cells")
  }

  /** Persist the EFFECTIVE training-sample modulus next to the
    * centroids — the provenance the drift baseline needs (see
    * [[trainWithSampleMod]]): after a full-corpus fallback the value is
    * 1, and a baseline reader must not assume the requested modulus
    * carved out a holdout. */
  private[functions] def writeTrainMeta(
      spark: org.apache.spark.sql.SparkSession,
      effectiveSampleMod: Int, path: String): Unit = {
    import spark.implicits._
    Seq(effectiveSampleMod).toDF("sample_mod")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/train_meta")
  }

  /** The persisted effective training-sample modulus; None on an index
    * written before train metadata existed. */
  def readTrainMeta(spark: org.apache.spark.sql.SparkSession,
                    path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/train_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).head().getInt(0))
  }

  /** Centroids back from a persisted index, in cell order. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/centroids").orderBy("cell")
      .select("cvec").collect().map(_.getSeq[Double](0).toSeq).toSeq

  /** [[ivfTopK]] against a persisted index: the query's nprobe cell ids
    * are resolved driver-side (O(nprobe) integers off a ONE-ROW query —
    * not a corpus collect) into a literal `cell IN (...)` predicate, so
    * the scan prunes to nprobe/nlist of the cell directories and the
    * exact rerank never touches the rest. Identical results to the
    * inline path for the same centroids/nprobe. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     query: DataFrame, vecCol: String, k: Int,
                     nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    // deletion fence: refuse a shelf a forget() died on
    graft.operators.IndexForget.assertClean(spark, s"$path/cells")
    val centroids = readCentroids(spark, path)
    val probes = query.select(
      explode(probeCells(unit(col(vecCol)), centroids, nprobe)).as("p"))
      .as[Int].collect().toSeq
    val q = broadcast(query.select(col(vecCol).as("qv"),
      VectorOps.l2(col(vecCol)).as("qn")))
    spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(probes: _*))
      .crossJoin(q)
      .withColumn("sim",
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .select(col("nn_id"), col("sim"))
      .orderBy(col("sim").desc, col("nn_id"))
      .limit(k)
  }

  /** Right-to-be-forgotten on a persisted IVF (or IVF-PQ — same cell
    * layout) shelf: delete every vector row of `ids`, rewriting only
    * the cells holding victim rows — each vector lives in exactly ONE
    * cell, so the rewrite is ≤ |ids| cell directories of nlist (the
    * [[graft.operators.IndexForget]] protocol: marker-fenced,
    * crash-recoverable, idempotent). Centroids are unchanged — they
    * are training artifacts, not member data; recall for the survivors
    * is exactly what the same centroids gave before. */
  def forget(spark: org.apache.spark.sql.SparkSession, path: String,
             ids: Seq[Long]): Seq[String] =
    graft.operators.IndexForget.forget(spark, s"$path/cells", "cell",
      "nn_id", ids)

  /** Approximate top-k cosine neighbors of one query vector via IVF:
    * filter the corpus to the query's nprobe cells, exact-rerank.
    * `centroids` comes from [[train]] (or a persisted copy). */
  def ivfTopK(corpus: DataFrame, query: DataFrame, idCol: String,
              vecCol: String, k: Int, centroids: Seq[Seq[Double]],
              nprobe: Int = 4): DataFrame = {
    val cand = assignCells(
      corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
        VectorOps.l2(col(vecCol)).as("cn"), unit(col(vecCol)).as("vu")),
      "nn_id", "vu", centroids, keep = Seq("cv", "cn"))
    val q = broadcast(query.select(col(vecCol).as("qv"),
      VectorOps.l2(col(vecCol)).as("qn"),
      explode(probeCells(unit(col(vecCol)), centroids, nprobe)).as("probe")))
    cand.join(q, col("cell") === col("probe"))
      .withColumn("sim",
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .select(col("nn_id"), col("sim"))
      .orderBy(col("sim").desc, col("nn_id"))
      .limit(k)
  }
}
