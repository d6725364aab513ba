package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O39 scale path: approximate nearest neighbor via random-hyperplane LSH
  * (sign-random-projection — the cosine-distance LSH family), built from
  * deterministic seeded hyperplanes and HOF arithmetic only.
  *
  * Plan shape at scale: corpus signatures are one stateless projection
  * (computed once, ideally persisted next to the vectors); a query probes
  * its own bucket plus all 1-bit-flip neighbors (multi-probe), so the
  * candidate set is |corpus| / 2^nBits × (nBits+1) in expectation instead
  * of the full corpus — the exact cosine re-rank then touches only
  * candidates. No shuffle of the corpus: the probe list broadcasts.
  */
object Ann {

  /** Deterministic ±1 hyperplanes (seeded), as literal arrays baked into
    * the plan — no data-dependent randomness, so signatures are stable
    * across runs and engines. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 47L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  private def dotLit(v: Column, plane: Seq[Double]): Column =
    aggregate(zip_with(v, typedLit(plane), (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x)

  /** nBits-bit bucket id: bit j = sign of the projection onto plane j. */
  def signature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dotLit(v, p) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe set: the bucket itself plus every 1-bit flip. */
  def probes(bucket: Column, nBits: Int): Column =
    array(bucket +: (0 until nBits).map(b => bucket.bitwiseXOR(lit(1L << b))): _*)

  /** Approximate top-k cosine neighbors of one query vector.
    * `corpus`: (idCol, vecCol); `query`: single row with vecCol. `dim`
    * MUST equal the vector width: a mismatched dim null-pads the
    * projection and silently degrades every signature to bucket 0 (no
    * pruning), so it is an explicit parameter, not a buried constant. */
  def annTopK(corpus: DataFrame, query: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int = 64, nBits: Int = 8): DataFrame = {
    val planes = hyperplanes(dim, nBits)
    val cand = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
      VectorOps.l2(col(vecCol)).as("cn"),
      signature(col(vecCol), planes).as("bucket"))
    val q = broadcast(query.select(col(vecCol).as("qv"),
      VectorOps.l2(col(vecCol)).as("qn"),
      explode(probes(signature(col(vecCol), planes), nBits)).as("probe")))
    cand.join(q, col("bucket") === col("probe"))
      .withColumn("sim",
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .select(col("nn_id"), col("sim"))
      .dropDuplicates("nn_id")
      .orderBy(col("sim").desc, col("nn_id"))
      .limit(k)
  }

  /** Persist the sign-LSH index: (id, vector, norm, bucket) PARTITIONED
    * BY bucket, so a probe reads nBits+1 of 2^nBits directories. The
    * hyperplanes are seed-deterministic — the index and any later probe
    * agree on signatures by construction, nothing else to store. */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 path: String, dim: Int = 64, nBits: Int = 8): Unit = {
    val planes = hyperplanes(dim, nBits)
    corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv"),
        VectorOps.l2(col(vecCol)).as("cn"),
        signature(col(vecCol), planes).as("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
  }

  /** [[annTopK]] against a persisted index: the query's probe buckets
    * resolve driver-side (nBits+1 longs off a one-row query) into a
    * literal `bucket IN (...)`, so the scan partition-prunes before any
    * vector is read. Identical results to the inline path. */
  def annTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     query: DataFrame, vecCol: String, k: Int,
                     dim: Int = 64, nBits: Int = 8): DataFrame = {
    import spark.implicits._
    val planes = hyperplanes(dim, nBits)
    val probeIds = query.select(
      explode(probes(signature(col(vecCol), planes), nBits)).as("p"))
      .as[Long].collect().toSeq
    val q = broadcast(query.select(col(vecCol).as("qv"),
      VectorOps.l2(col(vecCol)).as("qn")))
    spark.read.parquet(path)
      .filter(col("bucket").isin(probeIds: _*))
      .crossJoin(q)
      .withColumn("sim",
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .select(col("nn_id"), col("sim"))
      .dropDuplicates("nn_id")
      .orderBy(col("sim").desc, col("nn_id"))
      .limit(k)
  }
}
