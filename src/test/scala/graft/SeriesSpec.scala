package graft

/** Series-query invariants beyond the oracle gate (queries/Series.scala). */
class SeriesSpec extends SparkTestBase {

  test("q139: the ordered fold matches the sequential EWMA recurrence, including 1-row groups") {
    val rows = SparkEntry.queries("q139_ewma")(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive one user's fold from raw events, driver-side
    val first = rows.head.getLong(0)
    val cs = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id") === first &&
        org.apache.spark.sql.functions.col("value") >= 0)
      // ts may surface as TIMESTAMP_NTZ (LocalDateTime) — order via the
      // ISO string rendering, which sorts chronologically
      .selectExpr("CAST(ts AS STRING) AS tss", "event_id",
        "CAST(CAST(value AS DOUBLE) * 100 AS BIGINT) AS c")
      .collect().sortBy(r => (r.getString(0), r.getLong(1))).map(_.getLong(2))
    val want = cs.tail.foldLeft(cs.head)((acc, x) => (acc + x) / 2)
    assert(rows.head.getLong(2) === want)
    assert(rows.head.getLong(1) === cs.length.toLong)
  }

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
