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

  test("SeqFold: streamed sorted fold == whole-history fold, across partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random histories with ts TIES (event_id breaks
    // them) and key skew (key 0 holds half the rows) — the chunked/
    // streamed fold must equal the driver's whole-history fold no matter
    // where the external sorter's chunk boundaries fall
    val rng = new scala.util.Random(47)
    val rows = (0 until 4000).map { i =>
      val k = if (i % 2 == 0) 0L else (i % 13).toLong
      (k, new java.sql.Timestamp(1700000000000L + rng.nextInt(50) * 1000L),
        i.toLong, rng.nextInt(100000).toLong)
    }
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("user_id", "ts", "event_id", "cents")
        .repartition(parts)
      val got = graft.operators.SeqFold.ewmaCents(df)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val cs = g.sortBy(t => (t._2.getTime, t._3)).map(_._4)
        k -> (cs.length.toLong, cs.tail.foldLeft(cs.head)((a, x) => (a + x) / 2))
      }
      assert(got === want, s"parts=$parts")
      val paths = graft.operators.SeqFold.orderedTrigrams(
          df.withColumn("event_type", concat(lit("e"), pmod(col("cents"), lit(3)))))
        .groupBy("path").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val wantPaths = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(t => (t._2.getTime, t._3)).map(t => s"e${t._4 % 3}")
          .sliding(3).filter(_.size == 3).map(_.mkString(" "))
      }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      assert(paths === wantPaths, s"paths parts=$parts")
    }
  }

  test("SeqFold.countGreedy: automaton == regex scan on random sequences") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val letters = Seq("click", "view", "purchase", "error", "signup")
    val rng = new scala.util.Random(47)
    val rows = (0 until 3000).map { i =>
      ((i % 40).toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toLong, letters(rng.nextInt(5)))
    }
    val got = graft.operators.SeqFold.countGreedy(
        rows.toDF("user_id", "ts", "event_id", "event_type").repartition(5),
        "click", "view", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).flatMap { case (k, g) =>
      val s = g.sortBy(t => (t._2.getTime, t._3)).map(_._4.head).mkString
      val n = "cv*p".r.findAllIn(s).length.toLong
      if (n > 0) Some(k -> n) else None
    }
    assert(got === want)
  }

  test("SeqFold.clampedBalance: streamed fold == driver model; the clamp is load-bearing") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val rows = (0 until 2000).map { i =>
      ((i % 25).toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toLong, rng.nextInt(200).toLong - 100)
    }
    val got = graft.operators.SeqFold.clampedBalance(
        rows.toDF("user_id", "ts", "event_id", "delta").repartition(6))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.sortBy(t => (t._2.getTime, t._3)).map(_._4)
        .foldLeft(0L)((acc, x) => math.max(0L, acc + x))
    }
    assert(got === want)
    // the floor must actually reset state somewhere, or the gate is a
    // plain (clamped-at-the-end) sum in disguise
    val plain = rows.groupBy(_._1).map { case (k, g) =>
      k -> math.max(0L, g.map(_._4).sum)
    }
    assert(got.exists { case (k, v) => v != plain(k) })
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
