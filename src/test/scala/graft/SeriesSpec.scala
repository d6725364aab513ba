package graft

/** Series-query invariants beyond the oracle gate (queries/Series.scala). */
class SeriesSpec extends SparkTestBase {

  test("q126: interpolated points lie on the segment between their flanking observations") {
    val rows = SparkEntry.queries("q126_interpolate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      // output is already day-ordered within a type
      val vs = series.map(r =>
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      vs.zipWithIndex.foreach {
        case ((Some(v), 1L), ix) =>
          val prev = vs.take(ix).reverse.collectFirst { case (Some(x), 0L) => x }
          val next = vs.drop(ix + 1).collectFirst { case (Some(x), 0L) => x }
          assert(prev.isDefined && next.isDefined, "filled=1 without flanks")
          val (lo, hi) = (math.min(prev.get, next.get), math.max(prev.get, next.get))
          // truncation can land 1 below the exact segment on falling spans
          assert(v >= lo - 1 && v <= hi, s"interp $v outside [$lo,$hi]")
        case ((None, f), _) => assert(f === 2L, "null value must be an edge row")
        case _ => ()
      }
    }
  }
}
