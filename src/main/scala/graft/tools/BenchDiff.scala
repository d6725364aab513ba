package graft.tools

/** Cross-round bench comparison — the overlap discipline the round
  * verdicts apply, as a tool instead of an ad-hoc script: given two
  * bench artifacts, print the per-query overlap's geometric-mean ratio
  * and the largest movers in both directions.
  *
  * Accepts either artifact shape:
  *   - the driver's BENCH_r{N}.json (query map under `parsed.queries`,
  *     or a `tail` string holding the metric line),
  *   - the local sidecar BENCH_LAST_LOCAL.json (`queries_full` with
  *     per-iteration times — the `min` is used).
  *
  * Interpretation guard, learned the measured way: a roughly UNIFORM
  * ratio across queries whose code did not change is BOX DRIFT, not a
  * regression (round 11→12 saw geomean 1.42× with untouched queries at
  * 1.6–2.1×); only a query moving far off the pack's geomean deserves a
  * BenchOne investigation — and always re-measure the OLD binary on the
  * CURRENT box before calling it real. No JSON library rides along —
  * the two shapes are line-regular enough for regex extraction.
  *
  * Usage: runMain graft.tools.BenchDiff <oldArtifact> <newArtifact> [topK]
  */
object BenchDiff {

  /** query -> seconds from either artifact shape. */
  private[tools] def timesOf(raw: String): Map[String, Double] = {
    // the driver artifact embeds the metric line inside a JSON string
    // field ("tail"), so its quotes arrive escaped — normalize first
    val text = raw.replace("\\\"", "\"")
    // sidecar: "name":{"r1":1.0,"r2":1.1,"min":1.0}
    // q<digit> prefix: the registry's names — keeps container keys like
    // "queries_full" from matching across their nested objects
    val full = """"(q\d[\w]*)":\{[^}]*?"min":(-?[0-9.]+)""".r
    val fromFull = full.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    if (fromFull.nonEmpty) fromFull
    else {
      // driver artifact / metric line: "name":1.234 inside "queries":{...}
      val qBlock = """"queries":\{([^}]*)\}""".r
      qBlock.findFirstMatchIn(text).map(_.group(1)) match {
        case None => Map.empty
        case Some(block) =>
          """"(q\d[\w]*)":(-?[0-9.]+)""".r.findAllMatchIn(block)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff <oldArtifact.json> <newArtifact.json> [topK]")
    val topK = if (args.length > 2) args(2).toInt else 8
    // read + quote-normalize each artifact ONCE; every extraction below
    // (query times, both probe fields) works off this text
    val text: Map[String, String] = args.take(2).map { p =>
      p -> new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8").replace("\\\"", "\"")
    }.toMap
    def load(p: String) = timesOf(text(p))
    val (prev, cur) = (load(args(0)), load(args(1)))
    val overlap = prev.keySet.intersect(cur.keySet).toSeq
      .filter(k => prev(k) > 0 && cur(k) > 0).sortBy(identity)
    require(overlap.nonEmpty,
      s"no overlapping successful queries between ${args(0)} and ${args(1)}")
    val ratios = overlap.map(k => k -> cur(k) / prev(k))
    val geo = math.exp(ratios.map(r => math.log(r._2)).sum / ratios.size)
    println(f"overlap ${overlap.size} queries; geomean new/old = $geo%.3f" +
      f" (uniform shift ~ box drift, not code)")
    // round-13 artifacts carry a fixed synthetic probe — when BOTH
    // sides have one, its ratio prices the box directly and the
    // remaining geomean/probe quotient is the code's own movement
    def probeField(p: String, field: String): Option[Double] =
      ("\"" + field + """":(-?[0-9.]+)""").r
        .findFirstMatchIn(text(p))
        .map(_.group(1).toDouble).filter(_ > 0)
    def probeOf(p: String): Option[Double] =
      probeField(p, "calibration_probe_sec")
    // r17+ artifacts carry a SECOND probe sample taken after the
    // streaming phase — when a side's two samples disagree, its start
    // probe scattered and the normalized list below overstates in the
    // scatter's direction; flag it rather than silently normalizing
    args.take(2).foreach { p =>
      for (s <- probeOf(p); e <- probeField(p, "calibration_probe_end_sec"))
        if (math.abs(s - e) / math.min(s, e) > 0.25)
          println(f"WARNING: $p start/end probes disagree " +
            f"($s%.3f vs $e%.3f s) — probe scatter; discount the " +
            "normalized numbers for this artifact")
    }
    (probeOf(args(0)), probeOf(args(1))) match {
      case (Some(a), Some(b)) =>
        val box = b / a
        println(f"calibration probe $a%.3f -> $b%.3f s ($box%.3fx box); " +
          f"probe-normalized geomean = ${geo / box}%.3f")
        // the full regression list the round verdicts ask for: every
        // query > 1.15x slower AFTER pricing out the box — these are
        // the BenchOne candidates, not the raw movers below
        val slow = ratios.map { case (k, r) => k -> r / box }
          .filter(_._2 > 1.15).sortBy(-_._2)
        if (slow.isEmpty)
          println("probe-normalized >1.15x slowdowns: none")
        else {
          println(s"probe-normalized >1.15x slowdowns (${slow.size}):")
          slow.foreach { case (k, r) =>
            println(f"  $k%-28s ${prev(k)}%7.2f -> ${cur(k)}%7.2f  ($r%.2fx norm)")
          }
        }
      case _ =>
        println("calibration probe absent on one side — " +
          "normalize by hand (pre-round-13 artifact)")
    }
    def show(tag: String, rs: Seq[(String, Double)]): Unit = {
      println(s"-- $tag --")
      rs.foreach { case (k, r) =>
        println(f"  $k%-28s ${prev(k)}%7.2f -> ${cur(k)}%7.2f  ($r%.2fx," +
          f" ${r / geo}%.2fx vs pack)")
      }
    }
    show("largest slowdowns", ratios.sortBy(-_._2).take(topK))
    show("largest speedups", ratios.sortBy(_._2).take(topK))
    // a driver artifact clips to the 40 slowest, so a sidecar-vs-driver
    // diff legitimately has hundreds of one-sided names — count + sample
    def onlyIn(tag: String, ks: Set[String]): Unit = if (ks.nonEmpty) {
      val s = ks.toSeq.sorted
      println(s"only in $tag: ${s.size} " +
        s"(${s.take(8).mkString(",")}${if (s.size > 8) ",…" else ""})")
    }
    onlyIn("old", prev.keySet -- cur.keySet)
    onlyIn("new", cur.keySet -- prev.keySet)
  }
}
