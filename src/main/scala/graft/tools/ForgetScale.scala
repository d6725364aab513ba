package graft.tools

import graft.functions.Ivf
import graft.text.{CopyIndex, NearDup}
import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten PRICING at century scale — the measured form
  * of SCALE.md's partition-bounded deletion claims (the CopyStreamScale
  * pattern applied to operators/IndexForget). Builds the two
  * partition-bounded index families ONCE over a `copies`-replicated
  * corpus (the GenScaledData recipe, 10^13 id offsets) and runs one
  * batched forget per victim tier, measuring wall seconds and the
  * REWRITTEN PARTITION FRACTION against the by-construction bounds:
  *
  *   - copy index (bucket-partitioned winnow selections): a victim's
  *     rows live in ≤ |its selections| buckets, so a point delete
  *     rewrites a few percent of P — but bucket sets UNION across a
  *     batch, so bulk tiers are EXPECTED to degenerate toward a full
  *     rewrite (≈ 1 − (1 − 1/P)^Σ|selections|): the scaladoc's
  *     "delete-heavy deployments batch ids into one call" advice is
  *     about paying that rewrite once, not avoiding it;
  *   - IVF shelf (cell-partitioned vectors): one cell per victim
  *     vector, ≤ min(|batch|, nlist) cells per batch;
  *   - flat families (NearDup signatures), the honest contrast: no
  *     partition bound exists, every forget — even one id — rewrites
  *     O(index).
  *
  * Victim tiers sweep point-delete to bulk (1 doc, 0.01%, 0.1%, 1%,
  * 10% of ids) so the curve shows where partition pruning stops
  * paying. Tiers NEST (id ≡ 7 under growing moduli) and run
  * cumulatively against one build — each tier's fresh victims dominate
  * its set, and one build keeps the tool inside a bench-sized budget.
  * Deterministic victims — reruns price the same work.
  *
  * Usage: runMain graft.tools.ForgetScale [sfDir] [copies] [P] [nlist]
  */
object ForgetScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val p = if (args.length > 2) args(2).toInt else 1024
    val nlist = if (args.length > 3) args(3).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
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
    val vecs = Replicate.stripe(
        Tables.embeddings(spark, sfDir).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v")),
        Seq("vec_id"), copies)
      .localCheckpoint()
    val nVecs = vecs.count()
    println(s"[forgetscale] corpus: $nDocs docs / $nVecs vectors " +
      s"($copies × $sfDir), P=$p, nlist=$nlist")

    val cDir = "/tmp/graft_forgetscale/copyindex"
    val iDir = "/tmp/graft_forgetscale/ivf"
    Seq(cDir, iDir, "/tmp/graft_forgetscale/neardup")
      .foreach(d => fs.delete(new Path(d), true))
    val sel = CopyIndex.selections(docs, "doc_id", "text").localCheckpoint()
    val (_, cBuild) = timed(CopyIndex.writeIndex(sel, cDir, p))
    val (_, iBuild) = timed(Ivf.writeIndex(vecs, "vec_id", "v", nlist,
      iDir, iters = 2, sampleMod = 7))
    println(f"[forgetscale] builds: copy index $cBuild%.1f s, " +
      f"IVF $iBuild%.1f s")

    // victim tiers, nested by construction (id ≡ 7 mod shrinking
    // moduli), run cumulatively against the one build. Each family's
    // victims come from ITS OWN id space — doc_id for the copy index,
    // vec_id for the IVF shelf — so each fraction prices a real batch
    // of that family (the populations differ in size).
    val tiers: Seq[(String, Option[Long])] = Seq(
      ("1 id", None), ("0.01%", Some(10000L)), ("0.1%", Some(1000L)),
      ("1%", Some(100L)), ("10%", Some(10L)))
    def tierPred(idCol: String, modulus: Option[Long]) = modulus
      .map(m => pmod(col(idCol), lit(m)) === 7L)
      .getOrElse(col(idCol) === 7L)

    tiers.foreach { case (label, modulus) =>
      // per-family guards: an id space with no victims at this tier
      // skips ITS leg only (IndexForget refuses an empty batch loudly)
      val docVictims = docs.filter(tierPred("doc_id", modulus))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val vecVictims = vecs.filter(tierPred("vec_id", modulus))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val copyLine =
        if (docVictims.isEmpty) "copy index skipped (no doc victims)"
        else {
          val (rewrote, cSec) =
            timed(CopyIndex.forget(spark, cDir, docVictims, p))
          f"copy index ${rewrote.size}/$p buckets " +
            f"(${100.0 * rewrote.size / p}%.1f%%) in $cSec%.1f s"
        }
      val ivfLine =
        if (vecVictims.isEmpty) "IVF skipped (no vec victims)"
        else {
          val (cells, iSec) = timed(Ivf.forget(spark, iDir, vecVictims))
          f"IVF ${cells.size}/$nlist cells " +
            f"(${100.0 * cells.size / nlist}%.1f%%) in $iSec%.1f s " +
            f"(bound min(|batch|, nlist) = " +
            f"${math.min(vecVictims.size, nlist)})"
        }
      println(f"[forgetscale] tier $label (${docVictims.size}%,d doc / " +
        f"${vecVictims.size}%,d vec ids): $copyLine; $ivfLine")
    }

    // flat contrast: one id already costs the full rewrite
    val ndDir = "/tmp/graft_forgetscale/neardup"
    val toks = docs
      .withColumn("w", graft.text.TextOps.tokens(col("text")))
      .filter(size(col("w")) >= 3).select("doc_id", "w")
    val (_, bSec) = timed(NearDup.writeIndex(toks, "doc_id", "w", ndDir))
    val (_, fSec) = timed(NearDup.forget(spark, ndDir, Seq(8L)))
    println(f"[forgetscale] flat contrast (NearDup, 1 id): forget " +
      f"$fSec%.1f s vs build $bSec%.1f s — O(index) by layout, " +
      "rebuildable derived relation")
    spark.stop()
  }
}
