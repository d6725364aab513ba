package graft.tools

import graft.operators.IndexForget
import graft.text.CopyIndex
import graft.Tables
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crossover pricing for the two [[IndexForget.forget]] execution
  * paths — the measured form of SCALE.md's mass-delete entry. The
  * per-dir path pays 2+ Spark jobs and 3 metadata round-trips PER
  * victim partition (sequential); the staged path pays ONE whole-index
  * read + write + one publish swap, flat in the victim count. This
  * tool builds a bucket-partitioned copy index once, then for each
  * victim tier copies it twice and times BOTH paths on identical
  * state — the ratio column is the number SCALE.md cites and the
  * [[IndexForget.StagedRebuildFraction]] default must justify.
  *
  * Victim tiers are doc batches (1, 4, 16, 64, 256 ids): winnow
  * selections spread each doc over ~dozens of buckets and bucket sets
  * UNION across a batch, so even small batches cover most of P — the
  * family where mass-forget degenerates fastest and the staged path
  * matters most (reference analog: the serving store's native DELETE
  * walkthrough, README.md:455-457 — an engine-owned index pays for
  * that request in partition rewrites).
  *
  * Usage: runMain graft.tools.StagedForgetScale [sfDir] [copies] [P]
  */
object StagedForgetScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 20
    val p = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path("/tmp").getFileSystem(conf)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Replicate.stripe(
        Tables.documents(spark, sfDir).select("doc_id", "text"),
        Seq("doc_id"), copies)
      .localCheckpoint()
    val nDocs = docs.count()
    val base = "/tmp/graft_stagedforget/base"
    fs.delete(new Path("/tmp/graft_stagedforget"), true)
    val sel = CopyIndex.selections(docs, "doc_id", "text").localCheckpoint()
    val (_, build) = timed(CopyIndex.writeIndex(sel, base, p))
    println(f"[stagedforget] corpus $nDocs%,d docs ($copies × $sfDir), " +
      f"P=$p, index build $build%.1f s")

    // deterministic nested victim batches: ids ≡ 7 mod shrinking moduli
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val tiers = Seq(1, 4, 16, 64, 256).filter(_ <= allIds.length)
    tiers.foreach { n =>
      val ids = allIds.filter(_ % 7 == 0).take(n).toSeq
      val a = s"/tmp/graft_stagedforget/perdir_$n"
      val b = s"/tmp/graft_stagedforget/staged_$n"
      Seq(a, b).foreach { d =>
        fs.delete(new Path(d), true)
        require(FileUtil.copy(fs, new Path(base), fs, new Path(d),
          false, conf))
      }
      val (vA, tPer) = timed(IndexForget.forget(spark, a, "bucket", "id",
        ids, stagedFraction = 2.0)) // pin per-dir
      val (_, tStg) = timed(IndexForget.forget(spark, b, "bucket", "id",
        ids, stagedFraction = 0.0)) // force staged
      // parity witness rides the pricing run: both paths must leave
      // identical survivor sets or the ratio prices two different ops
      val ra = spark.read.parquet(a).selectExpr("hash(id, pos, fp)")
        .agg(sum(col("hash(id, pos, fp)"))).collect()(0).get(0)
      val rb = spark.read.parquet(b).selectExpr("hash(id, pos, fp)")
        .agg(sum(col("hash(id, pos, fp)"))).collect()(0).get(0)
      require(ra == rb, s"paths diverged at tier $n: $ra vs $rb")
      val auto =
        if (vA.size >= IndexForget.StagedMinVictimParts &&
          vA.size.toDouble >= IndexForget.StagedRebuildFraction * p)
          "staged" else "per-dir"
      println(f"[stagedforget] tier $n%3d docs: ${vA.size}%4d/$p buckets " +
        f"(${100.0 * vA.size / p}%5.1f%%) per-dir $tPer%7.1f s, " +
        f"staged $tStg%6.1f s, ratio ${tPer / tStg}%5.2f×, auto=$auto")
    }
    spark.stop()
  }
}
