package graft.tools

import graft.Tables
import graft.streaming.CopyDetectMaintenance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Century-scale pricing for the STREAMING copy-detect tenant
  * (CopyDetectMaintenance) — the streaming extension of
  * [[CopyIndexScale]], which prices only the one-shot probe. Replays
  * `nTriggers` bulk batches of a `copies`-replicated documents corpus
  * through the tenant TWICE — consolidation disabled vs enabled — and
  * reports, per trigger: wall seconds, the dir count a probe at that
  * point lists (the O(triggers) quantity consolidation exists to
  * bound), and where the folds fired. Alert parity between the two
  * runs is asserted before any number is reported (a fast wrong tenant
  * is worth nothing); both must equal trigger-order-independent union
  * semantics by construction.
  *
  * What to expect (and what round-14's run showed): per-trigger PROBE
  * bytes grow with the prior index either way — bulk batches touch
  * every bucket, so consolidation changes METADATA cost (dirs listed,
  * files opened, here also files read: T dirs × P buckets × files vs
  * threshold+1 dirs), not pruned data bytes; the fold itself is an
  * O(index-so-far) rewrite amortized over `threshold` triggers. On
  * cold object storage the listing/open half dominates long before
  * data I/O does — locally it shows up as the growing per-trigger gap
  * between the two runs.
  *
  * Heap: in PAIRS mode size the forked JVM via SPARK_DRIVER_MEM — the
  * late triggers carry the quadratic alert volume (a single trigger's
  * alert write at 100× is ~18M pairs) and 8g runs at the edge there;
  * 16g+ is comfortable through the distributed parity step. COVERAGE
  * mode (the aggregated alert layout, `update(aggregateAlerts=true)`)
  * is the bounded answer for replica-heavy corpora: each trigger
  * persists ≤ |batch| coverage rows however quadratic the pair volume,
  * and the whole 100× run fits the 8g default (measured — SCALE.md).
  * The per-pair localization still computes in-stream (minShared is
  * defined on pairs); what coverage mode bounds is everything
  * DOWNSTREAM of it: the write, the alert history, the monitor read,
  * the fold. Mode parity vs a rollup of the raw relation is pinned by
  * StreamingSpec; this tool asserts off/on parity within the mode.
  *
  * Usage: runMain graft.tools.CopyStreamScale [srcSfDir] [copies]
  *          [nTriggers] [threshold] [mode: pairs|coverage] */
object CopyStreamScale {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val nTriggers = if (args.length > 2) args(2).toInt else 12
    val threshold = if (args.length > 3) args(3).toInt else 4
    val coverageMode = args.length > 4 && args(4) == "coverage"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Replicate.stripe(
        Tables.documents(spark, srcDir).select("doc_id", "text"),
        Seq("doc_id"), copies)
      .localCheckpoint()
    val nDocs = docs.count()
    println(s"[copystream] corpus: $nDocs docs ($copies × $srcDir), " +
      s"$nTriggers triggers, threshold $threshold, " +
      s"mode=${if (coverageMode) "coverage" else "pairs"}")

    def run(tag: String, root: String, after: Int): Seq[Double] = {
      val idx = s"$root/index"
      val alerts = s"$root/alerts"
      (0 until nTriggers).map { t =>
        val batch = docs.filter(pmod(col("doc_id"), lit(nTriggers)) === t)
        val t0 = System.nanoTime()
        CopyDetectMaintenance.update(idx, alerts, batch, t,
          idCol = "doc_id", textCol = "text", consolidateAfter = after,
          aggregateAlerts = coverageMode)
        val sec = (System.nanoTime() - t0) / 1e9
        val (consol, tail) =
          CopyDetectMaintenance.indexParts(spark, idx, t + 1)
        println(f"[copystream] $tag trigger $t%2d: $sec%6.2f s, probe " +
          s"lists ${consol.size + tail.size} dirs " +
          s"(consol=${consol.getOrElse("-")}, tail=${tail.size})")
        sec
      }
    }

    val offRoot = "/tmp/graft_copystream_off"
    val onRoot = "/tmp/graft_copystream_on"
    Seq(offRoot, onRoot).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
    val off = run("off", offRoot, 0)
    val on = run(s"on($threshold)", onRoot, threshold)

    // parity before pricing: identical alert unions — DISTRIBUTED
    // (except + counts): this corpus's alert volume is quadratic in the
    // replica count (100× of sf0.1 → 108.49M pairs: every doc shares
    // its full text with 99 replicas), so a driver-side collect of the
    // union is exactly the anti-pattern the engine bans
    def alertsOf(root: String) =
      if (coverageMode)
        CopyDetectMaintenance.coverage(spark, s"$root/alerts")
          .select("doc_id", "n_partners", "shared_total", "shared_max",
            "lo", "hi")
      else
        CopyDetectMaintenance.alerts(spark, s"$root/alerts")
          .select("a_id", "b_id", "shared", "a_lo", "a_hi", "b_lo", "b_hi")
    val a = alertsOf(offRoot)
    val b = alertsOf(onRoot)
    val aOnly = a.exceptAll(b).count()
    val bOnly = b.exceptAll(a).count()
    require(aOnly == 0 && bOnly == 0,
      s"consolidated tenant diverged: $aOnly off-only / $bOnly on-only rows")
    println(s"[copystream] parity ok (${a.count()} alert rows, " +
      s"mode=${if (coverageMode) "coverage" else "pairs"})")
    println(f"[copystream] totals: off=${off.sum}%.1f s, on=${on.sum}%.1f s; " +
      f"last-4-trigger mean: off=${off.takeRight(4).sum / 4}%.2f s, " +
      f"on=${on.takeRight(4).sum / 4}%.2f s")
    spark.stop()
  }
}
