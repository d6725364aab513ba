package graft.tools

import java.nio.file.{Files, Paths}
import graft.streaming.{ArchiveCompaction, DocIngest}
import graft.streaming.DocIngest.Sinks
import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Century-scale pricing for the STREAMING DOCUMENT INGEST tenant —
  * the measured form of SCALE.md's DocIngest entry (until round 17 the
  * one tenant priced by analogy to the IndexForget/FoldProtocol
  * primitives instead of its own curve; composition is where this
  * codebase's surprises have lived, so the composition gets measured).
  * Reference analog: the idempotent delivery/visibility loop the
  * pipeline implements (README.md:451-457) at its 0.33 rec/s offered
  * load — this tenant's per-trigger cost at 100× is the comparison.
  *
  * Three phases against ONE tenant (same checkpoint, resumed):
  *
  *  A. BUILD — the base corpus streams in over `buildFiles` triggers
  *     with the near-dup index on and `consolidateAfter` folding.
  *     Prints per-trigger rows + wall ms: the curve must stay FLAT
  *     (the fold bounds the probe's listing; without it trigger N
  *     lists N dirs). A control tenant with consolidateAfter=0 runs
  *     the same input for the fold's amortized cost and the unbounded
  *     listing it prevents.
  *  B. STEADY-STATE DEDUP — `copies−1` suffix-perturbed replicas of
  *     every base doc (distinct digests, so they pass the exact-dedup
  *     state and exercise the BAND JOIN against the persisted index)
  *     stream through in `dedupFiles` triggers. Cost must scale with
  *     |batch|, not |corpus|²; the replicas mostly reject as
  *     near-dups (accepted/rejected printed — band recall is
  *     probabilistic, the honest number rides the output).
  *  C. FORGET — 1 doc / 1% / 10% of the accepted ids, timed across
  *     all four roots (corpus, rejects, neardup-rejects, index).
  *
  * Usage: runMain graft.tools.DocIngestScale [sfDir] [copies]
  *        [buildFiles] [dedupFiles] */
object DocIngestScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val buildFiles = if (args.length > 2) args(2).toInt else 8
    val dedupFiles = if (args.length > 3) args(3).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // each timed tenant gets its OWN session (stop + getOrCreate, the
    // Bench streaming-pair pattern): on one shared session the tenant
    // walls were ORDER-confounded (the control read 23 s as the
    // session's 2nd tenant and 50 s as its 3rd, same input), which
    // forced round 17 to withdraw the fold-cost claim entirely. JVM
    // JIT survives the restarts (symmetric for both tenants, warmed by
    // the untimed warmup tenant); session-scoped state does not.
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    val spark0 = newSession()
    val fs = new Path("/tmp").getFileSystem(
      spark0.sparkContext.hadoopConfiguration)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val work = "/tmp/graft_docingestscale"
    fs.delete(new Path(work), true)

    val base = Tables.documents(spark0, sfDir).select("doc_id", "text")
      .localCheckpoint()
    val nBase = base.count()
    println(s"[docingest] base corpus $nBase docs; replicas ×${copies - 1} " +
      s"= ${nBase * (copies - 1)} steady-state lines")

    // JSONL trigger files with ASCENDING event times (2 h apart,
    // lateness 1 h): digest state evicts as the stream advances — the
    // steady-state posture, not an ever-growing state store
    val t0 = java.time.Instant.parse("2026-08-12T00:00:00Z")
    def writeFile(dir: String, i: Int, rows: org.apache.spark.sql.DataFrame,
                  seq: Int): Unit = {
      val ts = t0.plusSeconds(seq * 7200L).toString
      val lines = rows
        .select(to_json(struct(col("doc_id"), col("text"),
          lit("crawl").as("source"), lit(ts).as("ingest_ts"))))
        .collect().map(_.getString(0))
      val p = Paths.get(f"$dir/f$i%03d.jsonl")
      Files.createDirectories(p.getParent)
      Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
      require(p.toFile.setLastModified(1700000000000L + seq * 60000L))
    }

    val srcDir = s"$work/src"
    (0 until buildFiles).foreach { i =>
      writeFile(srcDir, i, base.filter(pmod(col("doc_id"),
        lit(buildFiles.toLong)) === i.toLong), i)
    }

    def runTenant(s: SparkSession, root: String, consolidateAfter: Int,
                  src: String): Seq[(Long, Long, Long)] = {
      val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
        s"$root/checkpoint")
      val (m, r, d) = DocIngest.start(
        s.readStream.option("maxFilesPerTrigger", "1").text(src),
        sinks, Trigger.AvailableNow(), nearDupIndex = Some(s"$root/idx"),
        nearDupThreshold = 0.5, consolidateAfter = consolidateAfter)
      require(m.awaitTermination(3600000), "main stream timed out")
      require(r.awaitTermination(600000), "rejects stream timed out")
      require(d.awaitTermination(600000), "dlq stream timed out")
      m.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map(p => (p.batchId, p.numInputRows,
          p.durationMs.getOrDefault("triggerExecution", -1L).toLong))
    }

    // A. BUILD, folded vs unfolded control, as INTERLEAVED fresh-
    // session pairs (the Bench streaming-pair discipline, in full):
    // each timed leg gets its own session, WARMED by an untimed tenant
    // run inside THAT session — context-scoped warm state (state-store
    // init, executor bring-up, file-status caches) dies with a
    // session, so a warmup in a prior session warms nothing but JIT —
    // and every stop() is followed by a gc so no leg pays the previous
    // session's heap debt. One pair is one sample; the per-pair
    // difference LIST is the published fold cost (single same-input
    // walls have swung 23→50 s on this box).
    spark0.stop()
    System.gc()
    val root = s"$work/tenant_1"
    def timedLeg(tag: String, legRoot: String, consolidate: Int)
        : (Seq[(Long, Long, Long)], Double, (Option[Long], Seq[Long])) = {
      val s = newSession()
      try {
        runTenant(s, s"$work/warm_$tag", consolidate, srcDir): Unit
        val (prog, t) = timed(runTenant(s, legRoot, consolidate, srcDir))
        (prog, t, DocIngest.indexParts(s, s"$legRoot/idx", Long.MaxValue))
      } finally { s.stop(); System.gc() }
    }
    val pairs = (1 to 2).map { i =>
      val (progA, tA, (c0, t0ids)) =
        timedLeg(s"a$i", s"$work/tenant_$i", consolidate = 4)
      if (i == 1) {
        progA.foreach { case (b, n, ms) =>
          println(f"[docingest] build trigger $b%2d: $n%6d rows $ms%6d ms") }
        println(s"[docingest] probe listing after build: consol=$c0 " +
          s"tail=${t0ids.size} dirs (bound = threshold+2 = 6)")
      }
      val (_, tC, (cc, tc)) =
        timedLeg(s"c$i", s"$work/control_$i", consolidate = 0)
      if (i == 1)
        println(s"[docingest] control listing (no fold): consol=$cc " +
          s"tail=${tc.size} dirs")
      println(f"[docingest] build pair $i: folded $tA%.1f s, " +
        f"control $tC%.1f s, fold cost ${tA - tC}%+.1f s")
      (tA, tC)
    }
    val foldCosts = pairs.map { case (a, c) => a - c }
    println(f"[docingest] build phase ($buildFiles triggers, " +
      f"consolidateAfter=4): fold-cost pair list " +
      s"${foldCosts.map(d => f"$d%+.1f").mkString("[", ", ", "]")} s " +
      "(per interleaved fresh-session pair; scatter across pairs = " +
      "box noise floor for the difference)")
    val spark = newSession()
    // warm the phase-B session the same way before the TIMED dedup
    // triggers resume the tenant's checkpoint
    runTenant(spark, s"$work/warm_b", consolidateAfter = 4, srcDir): Unit

    // B. STEADY-STATE DEDUP: suffix-perturbed replicas (stripes 1..n)
    // appended to the SAME source dir (a file source's path is part of
    // its checkpoint; the resumed query picks up only the new files).
    // base is re-read here: the original localCheckpoint died with the
    // warmup session's context.
    val base2 = Tables.documents(spark, sfDir).select("doc_id", "text")
      .localCheckpoint()
    val replicas = Replicate.stripe(base2, Seq("doc_id"), copies)
      .filter(col("doc_id") >= Replicate.Stripe) // copy 0 = already ingested
      .withColumn("text", concat(col("text"), lit(" replica "),
        (col("doc_id") / Replicate.Stripe).cast("long")))
    (0 until dedupFiles).foreach { i =>
      writeFile(srcDir, buildFiles + i, replicas.filter(pmod(col("doc_id"),
        lit(dedupFiles.toLong)) === i.toLong), buildFiles + i)
    }
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val (mD, rD, dD) = DocIngest.start(
      spark.readStream.option("maxFilesPerTrigger", "1").text(srcDir),
      sinks, Trigger.AvailableNow(), nearDupIndex = Some(s"$root/idx"),
      nearDupThreshold = 0.5, consolidateAfter = 4)
    val okD = mD.awaitTermination(3600000)
    rD.awaitTermination(600000); dD.awaitTermination(600000)
    require(okD, "dedup phase timed out")
    val progD = mD.recentProgress.toSeq.filter(_.numInputRows > 0)
    progD.foreach { p =>
      val ms = p.durationMs.getOrDefault("triggerExecution", -1L).toLong
      println(f"[docingest] dedup trigger ${p.batchId}%2d: " +
        f"${p.numInputRows}%6d rows ${ms}%6d ms " +
        f"(${p.numInputRows * 1000.0 / ms}%.0f rec/s)")
    }
    val accepted = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0))
    val nRej = spark.read.parquet(s"$root/rejects_neardup").count()
    println(f"[docingest] steady state: ${accepted.length}%,d accepted " +
      f"total, $nRej%,d near-dup rejected; final listing " +
      s"${DocIngest.indexParts(spark, s"$root/idx", Long.MaxValue)}")

    // C. FORGET across all four roots. Tiers are PROVABLY disjoint
    // residue classes (5 mod 10, 3 mod 100 ⊂ 3 mod 10, 4 mod 10), so
    // no later tier re-forgets an earlier tier's already-deleted ids
    // and each timing prices real work
    val baseAccepted = accepted.filter(_ < Replicate.Stripe).sorted
    val tiers = Seq(
      ("1 doc", baseAccepted.filter(_ % 10 == 5).take(1).toSeq),
      ("1%", baseAccepted.filter(_ % 100 == 3).toSeq),
      ("10%", baseAccepted.filter(_ % 10 == 4).toSeq))
    tiers.foreach { case (label, ids) =>
      if (ids.isEmpty) println(s"[docingest] forget tier $label: no ids")
      else {
        val (_, sec) = timed(
          DocIngest.forget(spark, sinks, ids, Some(s"$root/idx")))
        val corpusDirs = ArchiveCompaction.batchIds(spark, s"$root/corpus")
        println(f"[docingest] forget tier $label (${ids.size}%,d ids): " +
          f"$sec%.1f s across 4 roots (${corpusDirs.size} corpus dirs)")
      }
    }
    spark.stop()
  }
}
