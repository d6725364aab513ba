package graft.tools

import graft.Tables
import graft.text.CopyIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-cost pricing for the bucketed winnow copy index (CopyIndex) on
  * a GenScaledData-replicated corpus — the measured form of SCALE.md's
  * "O(batch + touched buckets)" claim and of the P-SIZING LEVER behind
  * it: directory pruning prunes by |batch fingerprints| / P, so a
  * contamination POINT-CHECK (one document, ≈ 2·grams/(w+1)
  * selections) against a P = 1024 layout reads a few percent of the
  * index's files, while the identical probe against a FLAT layout
  * reads all of them. Bulk batches degenerate toward a full read on
  * ANY layout (thousands of near-uniform fingerprints touch every
  * bucket) — the cheap screen for those is q226's coverage aggregation;
  * the bucketed index is the point-lookup/alerting path
  * (CopyDetectMaintenance).
  *
  * Asserts probe PARITY (bucketed == flat, row for row) before either
  * time is worth reporting.
  *
  * Usage: runMain graft.tools.CopyIndexScale [scaledDir] [P] */
object CopyIndexScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val p = if (args.length > 1) args(1).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[copyindexscale] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val OFF = 1000000000000L
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val topRow = docs.agg(max(expr(s"doc_id div $OFF"))).first()
    require(!topRow.isNullAt(0),
      s"no documents under $sfDir — nothing to price")
    val topStripe = topRow.getLong(0)
    // topStripe == 0 would make the corpus side empty and the "probe"
    // cover the whole table — a vacuous parity/price, not a measurement
    require(topStripe > 0,
      s"$sfDir has a single id stripe — this tool needs a " +
        "GenScaledData-replicated corpus (run graft.tools.GenScaledData first)")
    val cut = topStripe * OFF
    // corpus = everything below the top replica stripe; the probe doc
    // comes from the stripe (unseen by the index — the ingest shape)
    val corpusSel = CopyIndex.selections(
      docs.filter(col("doc_id") < cut), "doc_id", "text")
    val probeSel = CopyIndex.selections(
        docs.filter(col("doc_id") >= cut).limit(1), "doc_id", "text")
      .localCheckpoint()
    val nFp = probeSel.count()

    val bDir = "/tmp/graft_copyindex_bucketed"
    val fDir = "/tmp/graft_copyindex_flat"
    timed(s"build bucketed index (P=$p)") {
      CopyIndex.writeIndex(corpusSel, bDir, p)
    }
    timed("build flat index") {
      corpusSel.write.mode("overwrite").parquet(fDir)
    }
    val idxRows = spark.read.parquet(fDir).count()
    println(s"[copyindexscale] index rows: $idxRows, probe fps: $nFp, " +
      s"buckets touched: ${CopyIndex.bucketsOf(probeSel, p).size}/$p")

    def flatProbe() = CopyIndex.localize(
      spark.read.parquet(fDir)
        .select(col("id").as("idx_id"), col("pos").as("idx_pos"), col("fp"))
        .join(probeSel.select(col("id").as("new_id"),
          col("pos").as("new_pos"), col("fp")), Seq("fp")),
      "idx", "new", minShared = 2)

    // parity FIRST — a wrong fast answer is worth nothing
    val a = CopyIndex.probe(spark, bDir, probeSel, p)
      .collect().map(_.toString).toSet
    val b = flatProbe().collect().map(_.toString).toSet
    require(a == b, s"bucketed probe diverged from flat: $a vs $b")
    println(s"[copyindexscale] parity ok (${a.size} matched pairs)")

    (1 to 3).foreach { i =>
      timed(s"bucketed point probe #$i") {
        CopyIndex.probe(spark, bDir, probeSel, p)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"flat point probe #$i") {
        flatProbe().write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
