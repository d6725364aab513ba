package graft.tools

import graft.SparkEntry
import graft.functions.{Ivf, VectorOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness behind q230b's verdict thresholds: sweeps
  * nprobe and reports, per setting, (a) the BAND RECALL of the
  * persisted-IVF hard-negative leg against the exact band answer and
  * (b) whether each anchor's unbanded index top-1 is its planted
  * near-copy — then runs the gate itself and reports its verdict
  * column. The numbers here justify the gate's ≥ 60% recall floor at
  * nprobe = 10 (measured 84/76/84% across the three SFs); re-run per
  * SF when the testdata regenerates. The plant/band construction is
  * the GATE'S OWN (Media.hardNegInputs/hardNegBand) so the sweep can
  * never desynchronize from what it prices; the scoring and ranking
  * here are an independent recompute.
  *
  * Usage: runMain graft.tools.HardNegIvf [sfDir]
  */
object HardNegIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the gate's own plant/band construction (shared, cannot drift);
    // scoring and ranking below are an independent recompute
    val off = graft.queries.Media.PlantedIdOffset
    val (q, corpus) = graft.queries.Media.hardNegInputs(spark, sfDir)
    val band = graft.queries.Media.hardNegBand
    val qb = broadcast(q.withColumn("qn", VectorOps.l2(col("qe"))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("simd").desc, col("b_id"))
    val exact = band(corpus.crossJoin(qb)
        .select(col("q_id"), col("vec_id").as("b_id"),
          round(VectorOps.dot(col("embedding"), col("qe")) /
            (VectorOps.l2(col("embedding")) * col("qn")), 4)
            .cast(graft.Norm.Dec94).as("simd")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "b_id").localCheckpoint()

    val path = s"/tmp/graft_hardneg_ivf/${new java.io.File(sfDir).getName}"
    val t0 = System.nanoTime()
    Ivf.writeIndex(corpus, "vec_id", "embedding", nlist = 16, path,
      iters = 2, sampleMod = 7)
    println(f"[hardneg] index build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val centroids = Ivf.readCentroids(spark, path)
    val total = exact.count()
    Seq(4, 6, 8, 10, 12).foreach { nprobe =>
      val probed = broadcast(q.select(col("q_id"), col("qe"),
        VectorOps.l2(col("qe")).as("qn"),
        explode(Ivf.probeCells(Ivf.unit(col("qe")), centroids, nprobe))
          .as("probe")))
      val wanted = probed.select("probe").distinct()
        .collect().map(_.getInt(0)).toSeq
      val cand = spark.read.parquet(s"$path/cells")
        .filter(col("cell").isin(wanted: _*))
        .join(probed, col("cell") === col("probe"))
        .select(col("q_id"), col("nn_id").as("b_id"),
          round(VectorOps.dot(col("cv"), col("qe")) /
            (col("cn") * col("qn")), 4)
            .cast(graft.Norm.Dec94).as("simd"))
        .localCheckpoint()
      val ivfBand = band(cand)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("q_id", "b_id")
      val hits = exact.join(ivfBand, Seq("q_id", "b_id"), "leftsemi").count()
      val plantedTop = cand
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("b_id") === col("q_id") + off).count()
      println(f"[hardneg] nprobe=$nprobe: band recall $hits/$total " +
        f"(${100.0 * hits / math.max(total, 1)}%.1f%%), " +
        s"planted unbanded top-1: $plantedTop/${q.count()}, " +
        s"probed cells: ${wanted.size}/16")
    }

    // the gate itself (verdict column must agree with the numbers above)
    val rows = SparkEntry.queries("q230b_hard_negatives_ivf")(spark, sfDir)
      .collect()
    println(s"[hardneg] q230b: ${rows.length} rows, recall_ok=" +
      s"${rows.headOption.map(_.getAs[Long]("recall_ok"))}")
    spark.stop()
  }
}
