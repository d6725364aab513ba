package graft.queries

import graft.{GatedQuery, Tables}
import graft.GatedQuery.gated
import graft.Norm._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the events stream: date-spine gap filling
  * with last-observation-carried-forward, and interval-overlap (peak
  * concurrency) via the +1/-1 sweep — the two staples of turning an
  * event log into a dense, chartable series.
  *
  * Scale posture: the spine is days × types (calendar-bounded, tiny at
  * any data size) and broadcasts into the left join; the sparse side
  * aggregates BEFORE joining, so the exchange carries group cardinality.
  * The sweep is a partial-aggregatable groupBy plus a running sum
  * partitioned by (key, coarse time bucket) with per-bucket boundary
  * offsets folded in a second tiny pass — the standard two-level scan
  * statistic, so no single task ever sorts a whole key's history.
  */
object Series {

  /** The shared two-pass exact-selection scaffold q148 (percentile_disc)
    * and q194 (percentile_cont) both ride — ONE copy of the cents
    * projection, the per-group extent+count (lineage cut: it feeds the
    * bucketing, the rank derivation, and the final n), the exact integer
    * value-range bucketing, and the histogram cumsum. Returns
    * (bucketed rows, group extents `g`, histogram cumsum `cum`); the
    * queries differ only in which ranks they derive from `g` and how the
    * crossing-bucket selections combine. A tweak to the bucket formula
    * or the before/cum algebra lands in both gates or neither. */
  private def twoPassSelect(s: org.apache.spark.sql.SparkSession, d: String,
                            b: Int): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)").as("cents"))
    val g = ev.groupBy("event_type")
      .agg(min("cents").as("lo"), max("cents").as("hi"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    // (cents-lo)*B div (hi-lo+1) is exact integer bucketing (no float),
    // monotone in cents — equal values never span a bucket boundary
    val bucketed = ev.join(broadcast(g), "event_type")
      .withColumn("bucket", expr(s"((cents - lo) * $b) div (hi - lo + 1)"))
    val wcum = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("before", col("cum") - col("c"))
    (bucketed, g, cum)
  }

  val all: Seq[GatedQuery] = Seq(

    // ---- gap filling + LOCF: a sparse cohort's daily totals densified
    //      over the GLOBAL date spine (sequence + explode), missing days
    //      imputed by the last prior observation (last value IGNORE
    //      NULLS over an unbounded-preceding frame). Days before a
    //      series' first observation stay NULL — imputing them would
    //      invent data; the flag column marks every imputed row. The
    //      cohort (user_id % 499 = 1) is sparse at every SF, so filled
    //      rows are guaranteed non-vacuous. ----
    gated("q94_gap_fill",
      """WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS lo,
        |                       CAST(max(ts) AS DATE) AS hi FROM events),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        |          FROM events WHERE user_id % 499 = 1
        |          GROUP BY event_type, CAST(ts AS DATE)),
        |g AS (SELECT t.event_type, s.day, d.v
        |      FROM spine s CROSS JOIN types t
        |      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |       CAST(last_value(v IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS v,
        |       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
        |FROM g ORDER BY event_type, day""") { (s, d) =>
      val ev = Tables.events(s, d)
      val daily = ev.filter(pmod(col("user_id"), lit(499)) === 1)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sumDec2(col("value")).as("v"))
      val spine = ev.agg(to_date(min("ts")).as("lo"), to_date(max("ts")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val types = ev.select("event_type").distinct()
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          last(col("v"), ignoreNulls = true).over(w).cast("string").as("v"),
          when(col("v").isNull, 1L).otherwise(0L).as("filled"))
        .orderBy("event_type", "day")
    },

    // ---- interval overlap / peak concurrency: each event opens a
    //      30-minute interval; the sweep turns starts into +1 and
    //      (exclusive) ends into -1, collapses equal instants by
    //      aggregation (so the running sum is order-independent — ends
    //      sort before starts at the same instant via dl asc), and the
    //      peak per event type is the max running total.
    //
    //      The running sum is the two-level scan statistic: the row-level
    //      window partitions by (event_type, day bucket) — thousands of
    //      partitions that each fit one task — giving per-bucket local
    //      running maxima and totals in ONE pass; a second pass over the
    //      per-bucket aggregate (rows = types × days, calendar-bounded
    //      and tiny at any data size) folds prefix offsets, since the
    //      true running sum inside bucket b is (sum of prior buckets'
    //      totals) + local run. A window keyed on event_type alone would
    //      sort the whole collapsed point set in 5 tasks — the 100×
    //      scale-up killer this formulation avoids. ----
    gated("q95_interval_overlap",
      """WITH pts AS (
        |  SELECT event_type, ts AS t, CAST(1 AS BIGINT) AS dl FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 30 MINUTE AS t, CAST(-1 AS BIGINT) AS dl
        |  FROM events),
        |g AS (SELECT event_type, t, dl, SUM(dl) AS net
        |      FROM pts GROUP BY event_type, t, dl),
        |r AS (SELECT event_type,
        |        SUM(net) OVER (PARTITION BY event_type ORDER BY t, dl
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |      FROM g)
        |SELECT event_type, CAST(MAX(run) AS BIGINT) AS peak
        |FROM r GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("ts"))
      val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("dl"))
        .unionAll(ev.select(col("event_type"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("t"), lit(-1L).as("dl")))
      // ONE explicit exchange on (type, day bucket) serves everything
      // below it: the instant-collapse groupBy (bkt is a function of t,
      // so adding it to the keys changes nothing), the local-running-sum
      // window, the per-bucket aggregate, and the final per-type max all
      // have their clustering satisfied by this partitioning. Tradeoff
      // vs aggregating before the shuffle: the exchange carries raw
      // sweep points instead of collapsed instants — at µs event
      // resolution collapse saves almost nothing, and one full exchange
      // fewer wins at any scale.
      val g = pts.withColumn("bkt", date_trunc("day", col("t")))
        .repartition(col("event_type"), col("bkt"))
        .groupBy("event_type", "bkt", "t", "dl").agg(sum("dl").as("net"))
      // pass 1: local running sum within (type, day); keep only each
      // bucket's max and total — all a bucket contributes to the peak
      val wLoc = Window.partitionBy("event_type", "bkt")
        .orderBy(col("t"), col("dl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perBucket = g.withColumn("lrun", sum("net").over(wLoc))
        .groupBy("event_type", "bkt")
        .agg(max("lrun").as("lmax"), sum("net").as("btot"))
      // pass 2 (tiny: one row per type × day): prefix offset + local max
      val wOff = Window.partitionBy("event_type").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      perBucket
        .select(col("event_type"),
          (coalesce(sum("btot").over(wOff), lit(0L)) + col("lmax")).as("cand"))
        .groupBy("event_type").agg(max("cand").as("peak"))
        .orderBy("event_type")
    },

    // ---- Linear interpolation over the date spine — the numeric
    //      companion to q94's LOCF: missing days take the straight line
    //      between the flanking observed days. All arithmetic is exact
    //      integer cents; the one division truncates toward zero on BOTH
    //      engines (DuckDB `//` and Spark `div` agree, verified on
    //      negative slopes) — a decimal or double division here would
    //      hang the gate on cross-engine rounding of ties, and a
    //      floor-vs-truncate mismatch flips every falling segment by one
    //      cent. Edges (no flanking point on one side) stay
    //      NULL, flagged 2. Scale: identical shape to q94 — calendar
    //      spine broadcast, sparse side pre-aggregated, two window
    //      passes over days × types rows. ----
    gated("q126_interpolate",
      """WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS lo,
        |                       CAST(max(ts) AS DATE) AS hi FROM events),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vc
        |          FROM events WHERE user_id % 499 = 2
        |          GROUP BY 1, 2),
        |g AS (SELECT t.event_type, s.day, d.vc
        |      FROM spine s CROSS JOIN types t
        |      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day),
        |w AS (SELECT event_type, day, vc,
        |        last_value(vc IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |        last_value(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS) OVER (
        |          PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
        |        first_value(vc IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |        first_value(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS) OVER (
        |          PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
        |      FROM g)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(CASE WHEN vc IS NOT NULL THEN vc
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         pv + (nv - pv) * date_diff('day', pd, day) // date_diff('day', pd, nd)
        |       ELSE NULL END AS BIGINT) AS v_cents,
        |  CAST(CASE WHEN vc IS NOT NULL THEN 0
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 1 ELSE 2 END AS BIGINT) AS filled
        |FROM w ORDER BY event_type, day""") { (s, d) =>
      val ev = Tables.events(s, d)
      val daily = ev.filter(pmod(col("user_id"), lit(499)) === 2)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sumDec2(col("value")) * 100).cast("long").as("vc"))
      val spine = ev.agg(to_date(min("ts")).as("lo"), to_date(max("ts")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val types = ev.select("event_type").distinct()
      val before = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val after = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
      val obsDay = when(col("vc").isNotNull, col("day"))
      val w = spine.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .withColumn("pv", last(col("vc"), ignoreNulls = true).over(before))
        .withColumn("pd", last(obsDay, ignoreNulls = true).over(before))
        .withColumn("nv", first(col("vc"), ignoreNulls = true).over(after))
        .withColumn("nd", first(obsDay, ignoreNulls = true).over(after))
      // both engines truncate toward zero (DuckDB `//`, Spark `div`) —
      // verified on negative slopes, so the same expression is exact
      val interp = col("pv") +
        expr("((nv - pv) * datediff(day, pd)) div datediff(nd, pd)")
      w.select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          when(col("vc").isNotNull, col("vc"))
            .when(col("pv").isNotNull && col("nv").isNotNull, interp)
            .otherwise(lit(null)).cast("long").as("v_cents"),
          when(col("vc").isNotNull, lit(0L))
            .when(col("pv").isNotNull && col("nv").isNotNull, lit(1L))
            .otherwise(lit(2L)).as("filled"))
        .orderBy("event_type", "day")
    },

    // ---- EWMA (α = 1/2) as an ORDERED FOLD — the recurrence
    //      e_i = (e_{i−1} + c_i) div 2 is inherently sequential (and
    //      provably non-composable in bounded integers: the exact chunk
    //      summary carries 2^L-scaled weights — see
    //      operators/SeqFold.scala), which no window frame expresses.
    //      The scale shape is a STREAMED sorted-group fold: the key's
    //      history arrives as a spillable sorted iterator and the fold
    //      holds O(1) state — never a whole-history array in one
    //      aggregation buffer. Order and α = 1/2 truncating arithmetic
    //      match DuckDB's list(… ORDER BY) + list_reduce exactly. ----
    gated("q139_ewma",
      """WITH c AS (SELECT user_id, ts, event_id,
        |                  CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events WHERE value >= 0),
        |g AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS cs FROM c GROUP BY user_id)
        |SELECT user_id, CAST(len(cs) AS BIGINT) AS n,
        |       CAST(list_reduce(cs, (acc, x) -> (acc + x) // 2) AS BIGINT) AS ewma
        |FROM g ORDER BY user_id""") { (s, d) =>
      graft.operators.SeqFold.ewmaCents(
        Tables.events(s, d)
          .filter(col("value") >= 0)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)").as("cents")))
        .orderBy("user_id")
    },

    // ---- Per-group linear trend, exact: ordinary least squares over
    //      (day index, daily cents) reported as the integer rational
    //      num/den = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) plus a scaled
    //      truncating quotient — every sum is exact BIGINT (day indexes
    //      are calendar-small, cents are bounded), so the slope gate is
    //      exact with NO float anywhere; truncation toward zero agrees
    //      cross-engine on both signs. Scale: one partial-aggregated
    //      pass builds the five moments per group — the classic
    //      "regression as an aggregate" shape, never a per-pair join. ----
    gated("q140_trend",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                      CAST(SUM(CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS y
        |               FROM events GROUP BY 1, 2),
        |x0 AS (SELECT MIN(day) AS d0 FROM daily),
        |pts AS (SELECT event_type, date_diff('day', x0.d0, day) AS x, y FROM daily CROSS JOIN x0),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |             SUM(x*y) AS sxy, SUM(x*x) AS sxx
        |      FROM pts GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |       CAST(n*sxy - sx*sy AS BIGINT) AS num,
        |       CAST(n*sxx - sx*sx AS BIGINT) AS den,
        |       CAST((1000000 * (n*sxy - sx*sy)) // (n*sxx - sx*sx) AS BIGINT) AS slope_micro
        |FROM s ORDER BY event_type""") { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)")).as("y"))
      val d0 = daily.agg(min("day").as("d0"))
      val pts = daily.crossJoin(broadcast(d0))
        .select(col("event_type"), datediff(col("day"), col("d0")).as("x"),
          col("y"))
      pts.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .select(col("event_type"), col("n"),
          expr("n * sxy - sx * sy").as("num"),
          expr("n * sxx - sx * sx").as("den"),
          expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)")
            .as("slope_micro"))
        .orderBy("event_type")
    },

    // ---- Sequential path mining: the top-10 3-step behavioral paths
    //      across all user journeys — q85's transition matrix extended
    //      to order-3 n-grams over event SEQUENCES. Emission is a
    //      STREAMED sorted-group scan (operators/SeqFold.scala): each
    //      user's ordered journey arrives as a spillable iterator and a
    //      2-token ring emits trigrams with O(1) state — no per-user
    //      sequence array. Exact counts, TakeOrdered top-10; the path
    //      vocabulary is |event_types|³ regardless of corpus size, so
    //      the count aggregation shuffles a constant-cardinality
    //      relation. ----
    gated("q143_event_paths",
      """WITH s AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS sq
        |           FROM events GROUP BY user_id),
        |p AS (SELECT unnest([sq[i] || ' ' || sq[i+1] || ' ' || sq[i+2]
        |                    for i in range(1, len(sq)-1)]) AS path
        |      FROM s WHERE len(sq) >= 3)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS c
        |FROM p GROUP BY path ORDER BY c DESC, path LIMIT 10""") { (s, d) =>
      graft.operators.SeqFold.orderedTrigrams(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")))
        .groupBy("path").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("path"))
        .limit(10)
    },

    // ---- Gap-based sessionization: a >30-minute silence starts a new
    //      session — the batch twin of the O31 session window (q31
    //      gates the streaming session_window; this gates the
    //      analytical lag-and-cumsum form on history). All arithmetic
    //      in epoch MICROSECONDS (exact integers on both engines; a
    //      'seconds' date_diff would count boundary crossings in DuckDB
    //      but truncate in Spark). Scale: one hash exchange on user_id,
    //      then two spillable window passes over each user's history —
    //      no collect, no array. ----
    gated("q145_sessionize",
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS um,
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, event_id, um,
        |             SUM(brk) OVER (PARTITION BY user_id ORDER BY um, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM x)
        |SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST((MAX(um) - MIN(um)) // 1000000 AS BIGINT) AS dur_s,
        |       MIN(event_id) AS first_event
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_idx""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("um", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("um"))
        .withColumn("brk",
          when(col("um") - lag(col("um"), 1).over(w) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess", sum(col("brk"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess").as("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          expr("(MAX(um) - MIN(um)) div 1000000").as("dur_s"),
          min(col("event_id")).as("first_event"))
        .select(col("user_id"), col("session_idx").cast("long"),
          col("n_events"), col("dur_s"), col("first_event"))
        .orderBy("user_id", "session_idx")
    },

    // ---- EXACT per-group percentiles (percentile_disc semantics: the
    //      value at position ⌈p·n⌉ of the sorted group) — the SLO/
    //      latency-report primitive where approx sketches (q115 HLL,
    //      QuantileSample) trade exactness for one pass; this is the
    //      exact path, gated cell-for-cell. Position arithmetic is all
    //      integer (⌈p·n⌉ = (p·n + 99) div 100), the selected CENTS
    //      value is tie-order-invariant (event_id only breaks rank
    //      ties, never changes the value at a position; equal cents
    //      always land in the same bucket, so no tie spans a bucket
    //      boundary).
    //
    //      TWO-PASS DISTRIBUTED SELECTION (round-10, replacing the
    //      per-group full-sort window that was the century smoke's worst
    //      known at 25.2 s / 100×): the row_number form shuffles EVERY
    //      row on the group key and sorts each group end-to-end — at five
    //      groups that is five multi-million-row external sorts. Instead:
    //      pass 1 prices each group's extent+count and a B=1024 value-
    //      range histogram (two map-side-combined hash aggs — exchanges
    //      carry ≤ groups×B rows, never data); a window cumsum over the
    //      TINY histogram locates, per percentile, the one bucket whose
    //      cumulative count crosses ⌈p·n⌉ and the residual rank inside
    //      it; pass 2 re-scans, keeps ONLY crossing-bucket rows (a
    //      broadcast semi-join, expected n/B ≈ 0.1% of rows per
    //      percentile), and row_numbers that sliver. Degenerate skew
    //      (all rows one value) collapses to the old cost, never worse.
    //      Three scans + three small exchanges instead of one scan + a
    //      full-data sort exchange: at 100 TB the sort never happens. ----
    gated("q148_percentile_exact",
      """WITH c AS (SELECT event_type, event_id,
        |                  CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events),
        |r AS (SELECT event_type, cents,
        |             ROW_NUMBER() OVER (PARTITION BY event_type
        |                                ORDER BY cents, event_id) AS rn,
        |             COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM c)
        |SELECT event_type,
        |       MAX(CASE WHEN rn = (50*n + 99) // 100 THEN cents END) AS p50,
        |       MAX(CASE WHEN rn = (90*n + 99) // 100 THEN cents END) AS p90,
        |       MAX(CASE WHEN rn = (99*n + 99) // 100 THEN cents END) AS p99,
        |       CAST(MAX(n) AS BIGINT) AS n
        |FROM r GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val (bucketed, g, cum) = twoPassSelect(s, d, 1024)
      // crossing bucket + residual rank per (group, percentile):
      // before < ⌈p·n⌉ ≤ cum — a join of two histogram-sized relations
      val ranks = g.select(col("event_type"), explode(array(
          struct(lit(50L).as("p"), expr("(50*n + 99) div 100").as("k")),
          struct(lit(90L).as("p"), expr("(90*n + 99) div 100").as("k")),
          struct(lit(99L).as("p"), expr("(99*n + 99) div 100").as("k"))))
          .as("t"))
        .select(col("event_type"), col("t.p").as("p"), col("t.k").as("k"))
      val crossing = ranks.join(cum, Seq("event_type"))
        .filter(col("before") < col("k") && col("k") <= col("cum"))
        .select(col("event_type"), col("p"), col("bucket"),
          (col("k") - col("before")).as("ik"))
      // pass 2: exact select inside the one crossing bucket per
      // percentile — the only rows that ever reach a sort
      val wsel = Window.partitionBy("event_type", "p")
        .orderBy("cents", "event_id")
      bucketed.join(broadcast(crossing), Seq("event_type", "bucket"))
        .withColumn("rn", row_number().over(wsel))
        .filter(col("rn") === col("ik"))
        .groupBy("event_type")
        .agg(max(when(col("p") === 50, col("cents"))).as("p50"),
          max(when(col("p") === 90, col("cents"))).as("p90"),
          max(when(col("p") === 99, col("cents"))).as("p99"))
        .join(broadcast(g.select(col("event_type"), col("n"))), "event_type")
        .select(col("event_type"), col("p50"), col("p90"), col("p99"),
          col("n"))
        .orderBy("event_type")
    },

    // ---- EXACT percentile_cont (linear interpolation between the two
    //      bracketing order statistics — the ANSI/NIST definition:
    //      position pos = p·(n−1)/100, value = v_lo·(100−frac) +
    //      v_hi·frac, reported ×100 so the result stays an exact
    //      BIGINT) — the interpolated sibling of q148's
    //      percentile_disc, through the SAME two-pass distributed
    //      selection: the crossing-bucket relation now carries TWO
    //      target ranks per percentile (⌊pos⌋+1 and its successor,
    //      labeled lo/hi) and the final combine interpolates. Still
    //      three scans + histogram-sized exchanges; the full-data sort
    //      never happens. Oracle affords the plain rank window. ----
    gated("q194_percentile_cont",
      """WITH c AS (SELECT event_type, event_id,
        |                  CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events),
        |r AS (SELECT event_type, cents,
        |             ROW_NUMBER() OVER (PARTITION BY event_type
        |                                ORDER BY cents, event_id) AS rn,
        |             COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM c),
        |v AS (SELECT event_type, MAX(n) AS n,
        |             MAX(CASE WHEN rn = (50*(n-1)) // 100 + 1 THEN cents END) AS lo50,
        |             MAX(CASE WHEN rn = (50*(n-1)) // 100 + 1
        |                        + CASE WHEN (50*(n-1)) % 100 > 0 THEN 1 ELSE 0 END
        |                      THEN cents END) AS hi50,
        |             MAX(CASE WHEN rn = (90*(n-1)) // 100 + 1 THEN cents END) AS lo90,
        |             MAX(CASE WHEN rn = (90*(n-1)) // 100 + 1
        |                        + CASE WHEN (90*(n-1)) % 100 > 0 THEN 1 ELSE 0 END
        |                      THEN cents END) AS hi90
        |      FROM r GROUP BY event_type)
        |SELECT event_type,
        |       CAST(lo50 * (100 - (50*(n-1)) % 100)
        |            + hi50 * ((50*(n-1)) % 100) AS BIGINT) AS p50_x100,
        |       CAST(lo90 * (100 - (90*(n-1)) % 100)
        |            + hi90 * ((90*(n-1)) % 100) AS BIGINT) AS p90_x100,
        |       CAST(n AS BIGINT) AS n
        |FROM v ORDER BY event_type""") { (s, d) =>
      val (bucketed, g, cum) = twoPassSelect(s, d, 1024)
      // two bracketing ranks per percentile: lo = ⌊p(n−1)/100⌋+1,
      // hi = lo + (frac > 0); frac travels with the rank row
      val ranks = g.select(col("event_type"), explode(array(Seq(50, 90).flatMap {
          p => Seq(
            struct(lit(p.toLong).as("p"), lit("lo").as("role"),
              expr(s"($p*(n-1)) div 100 + 1").as("k"),
              expr(s"($p*(n-1)) % 100").as("fn")),
            struct(lit(p.toLong).as("p"), lit("hi").as("role"),
              expr(s"($p*(n-1)) div 100 + 1 + " +
                s"(CASE WHEN ($p*(n-1)) % 100 > 0 THEN 1 ELSE 0 END)").as("k"),
              expr(s"($p*(n-1)) % 100").as("fn")))
        }: _*)).as("t"))
        .select(col("event_type"), col("t.p").as("p"),
          col("t.role").as("role"), col("t.k").as("k"), col("t.fn").as("fn"))
      val crossing = ranks.join(cum, Seq("event_type"))
        .filter(col("before") < col("k") && col("k") <= col("cum"))
        .select(col("event_type"), col("p"), col("role"), col("fn"),
          col("bucket"), (col("k") - col("before")).as("ik"))
      val wsel = Window.partitionBy("event_type", "p", "role")
        .orderBy("cents", "event_id")
      bucketed.join(broadcast(crossing), Seq("event_type", "bucket"))
        .withColumn("rn", row_number().over(wsel))
        .filter(col("rn") === col("ik"))
        .groupBy("event_type")
        .agg(
          max(when(col("p") === 50 && col("role") === "lo", col("cents"))).as("lo50"),
          max(when(col("p") === 50 && col("role") === "hi", col("cents"))).as("hi50"),
          max(when(col("p") === 90 && col("role") === "lo", col("cents"))).as("lo90"),
          max(when(col("p") === 90 && col("role") === "hi", col("cents"))).as("hi90"),
          max(when(col("p") === 50, col("fn"))).as("fn50"),
          max(when(col("p") === 90, col("fn"))).as("fn90"))
        .join(broadcast(g.select(col("event_type"), col("n"))), "event_type")
        .select(col("event_type"),
          (col("lo50") * (lit(100) - col("fn50")) +
            col("hi50") * col("fn50")).as("p50_x100"),
          (col("lo90") * (lit(100) - col("fn90")) +
            col("hi90") * col("fn90")).as("p90_x100"),
          col("n"))
        .orderBy("event_type")
    },

    // ---- ROBUST outlier days: |y − median| > 3·MAD per event_type —
    //      the median/MAD twin of q88's mean/σ z-score. On skewed or
    //      contaminated series the mean and σ are dragged by the very
    //      outliers being hunted; the median and MAD have a 50%
    //      breakdown point. Both medians are EXACT position selections
    //      ((n+1) div 2 of the sorted group, q148's machinery applied
    //      twice), the flag compare is pure integer — no float anywhere.
    //      Scale: two window passes + two joins, all partitioned by
    //      event_type; daily relations are calendar-bounded. ----
    gated("q156_robust_outliers",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                      CAST(SUM(CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS y
        |               FROM events GROUP BY 1, 2),
        |r1 AS (SELECT event_type, day, y,
        |              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y, day) AS rn,
        |              COUNT(*) OVER (PARTITION BY event_type) AS n
        |       FROM daily),
        |med AS (SELECT event_type, MAX(CASE WHEN rn = (n+1)//2 THEN y END) AS med
        |        FROM r1 GROUP BY event_type),
        |dev AS (SELECT d.event_type, d.day, d.y, ABS(d.y - m.med) AS dev
        |        FROM daily d JOIN med m ON d.event_type = m.event_type),
        |r2 AS (SELECT event_type, day, y, dev,
        |              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, day) AS rn,
        |              COUNT(*) OVER (PARTITION BY event_type) AS n
        |       FROM dev),
        |mad AS (SELECT event_type, MAX(CASE WHEN rn = (n+1)//2 THEN dev END) AS mad
        |        FROM r2 GROUP BY event_type)
        |SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.y, d.dev, m2.mad
        |FROM dev d JOIN mad m2 ON d.event_type = m2.event_type
        |WHERE d.dev > 3 * m2.mad
        |ORDER BY d.event_type, d.day""") { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)")).as("y"))
        .localCheckpoint() // feeds the median rank, the dev join, twice
      def median(df: org.apache.spark.sql.DataFrame, v: String, out: String) = {
        val w = Window.partitionBy("event_type").orderBy(col(v), col("day"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
          .groupBy("event_type")
          .agg(max(when(col("rn") === expr("(n + 1) div 2"), col(v))).as(out))
      }
      val dev = daily.join(median(daily, "y", "med"), "event_type")
        .select(col("event_type"), col("day"), col("y"),
          abs(col("y") - col("med")).as("dev"))
        .localCheckpoint() // feeds the MAD rank AND the flag join
      dev.join(median(dev, "dev", "mad"), "event_type")
        .filter(col("dev") > lit(3) * col("mad"))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("y"), col("dev"), col("mad"))
        .orderBy("event_type", "day")
    },

    // ---- Time-weighted average (metering/billing semantics): each
    //      observation holds until the next one, so TWA = Σ vᵢ·Δtᵢ /
    //      Σ Δtᵢ over lead() gaps — irregular samples weighted by how
    //      long they were current, NOT the row-count mean (a sensor
    //      that reports once an hour at 10 and once a second at 0 has
    //      mean ≈ 0 but TWA ≈ 10). Gaps in whole truncated SECONDS
    //      (both engines truncate), weights cents·seconds in BIGINT
    //      (≤ 10⁹ per gap — no overflow at any per-user history), the
    //      display quotient one truncating division over the exact
    //      num/den rationals also gated. ----
    gated("q158_time_weighted_avg",
      """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS um,
        |                  CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events WHERE value >= 0),
        |w AS (SELECT user_id, cents, um,
        |             LEAD(um) OVER (PARTITION BY user_id
        |                            ORDER BY um, event_id) AS nxt
        |      FROM c),
        |g AS (SELECT user_id,
        |             CAST(SUM(cents * ((nxt - um) // 1000000)) AS BIGINT) AS num_w,
        |             CAST(SUM((nxt - um) // 1000000) AS BIGINT) AS den_w
        |      FROM w WHERE nxt IS NOT NULL GROUP BY user_id)
        |SELECT user_id, num_w, den_w,
        |       CAST(num_w // den_w AS BIGINT) AS twa_cents
        |FROM g WHERE den_w > 0 ORDER BY user_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("um", "event_id")
      Tables.events(s, d)
        .filter(col("value") >= 0)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("um"),
          expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)").as("cents"))
        .withColumn("nxt", lead(col("um"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("user_id")
        .agg(sum(expr("cents * ((nxt - um) div 1000000)")).as("num_w"),
          sum(expr("(nxt - um) div 1000000")).as("den_w"))
        .filter(col("den_w") > 0)
        .select(col("user_id"), col("num_w"), col("den_w"),
          expr("num_w div den_w").as("twa_cents"))
        .orderBy("user_id")
    },

    // ---- Event-PATTERN matching (MATCH_RECOGNIZE / CEP lite): count
    //      leftmost non-overlapping `click view* purchase` runs per
    //      user — "purchases reached directly from a click through only
    //      views", the sequence-pattern primitive Spark SQL lacks. The
    //      engine runs an O(1)-state streaming automaton over each
    //      user's sorted history (operators/SeqFold.countGreedy —
    //      provably the regex scan's semantics); the oracle builds the
    //      per-user letter string and counts regexp_extract_all(seq,
    //      'cv*p') — two independent formulations of one pattern
    //      language. ----
    gated("q161_pattern_match",
      """WITH s AS (SELECT user_id,
        |             string_agg(CASE event_type WHEN 'click' THEN 'c'
        |                        WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
        |                        WHEN 'error' THEN 'e' ELSE 's' END, ''
        |                        ORDER BY ts, event_id) AS seq
        |           FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CAST(len(regexp_extract_all(seq, 'cv*p')) AS BIGINT) AS n_matches
        |FROM s WHERE len(regexp_extract_all(seq, 'cv*p')) > 0
        |ORDER BY user_id""") { (s, d) =>
      graft.operators.SeqFold.countGreedy(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")),
        start = "click", middle = "view", end = "purchase")
        .orderBy("user_id")
    },

    // ---- Clamped running balance: acc ← max(0, acc + δ), purchases
    //      debit, everything else credits — the inventory/credit fold
    //      whose floor RESETS state, making it non-associative and
    //      non-linear: no window frame, no prefix-sum decomposition,
    //      not even an EWMA-style weighted composition exists. The
    //      third SeqFold tenant (streamed sorted iterator, O(1)
    //      state); the oracle seeds DuckDB's list_reduce with a
    //      prepended 0 so the first delta clamps identically. ----
    gated("q165_clamped_balance",
      """WITH c AS (SELECT user_id, ts, event_id,
        |             CASE WHEN event_type = 'purchase'
        |                  THEN -CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT)
        |                  ELSE CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) END AS delta
        |           FROM events),
        |g AS (SELECT user_id, list(delta ORDER BY ts, event_id) AS ds
        |      FROM c GROUP BY user_id)
        |SELECT user_id, CAST(len(ds) AS BIGINT) AS n,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ds),
        |                        (acc, x) -> GREATEST(CAST(0 AS BIGINT), acc + x)) AS BIGINT) AS balance
        |FROM g ORDER BY user_id""") { (s, d) =>
      graft.operators.SeqFold.clampedBalance(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "purchase",
              -expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)"))
              .otherwise(expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)"))
              .as("delta")))
        .orderBy("user_id")
    },

    // ---- One-sided CUSUM changepoint monitor per user (Page 1954):
    //      s ← max(0, s + (cents − k)), alarm + reset at s ≥ h — the
    //      sequential drift detector ops teams run per tenant/device
    //      (has THIS series started spending above its allowance?).
    //      The clamp and the post-alarm reset are BOTH non-associative
    //      nonlinearities, so no window frame, prefix sum, or chunk
    //      composition expresses the fold — the fourth SeqFold
    //      streaming tenant (O(1) state per key over a spillable
    //      sorted iterator; the oracle folds the same two-field state
    //      through list_reduce over [s, alarms] pairs). k = 5000,
    //      h = 30000 fire 154 alarms across 103 of the 150 sf0.01
    //      users — discriminating, not vacuous. ----
    gated("q191_cusum",
      """WITH c AS (SELECT user_id, ts, event_id,
        |             CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events),
        |g AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS cs
        |      FROM c GROUP BY user_id),
        |f AS (SELECT user_id, CAST(len(cs) AS BIGINT) AS n,
        |             list_reduce(
        |               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
        |                            [[x, CAST(0 AS BIGINT)] for x in cs]),
        |               (acc, v) -> CASE
        |                 WHEN GREATEST(CAST(0 AS BIGINT), acc[1] + v[1] - 5000) >= 30000
        |                 THEN [CAST(0 AS BIGINT), acc[2] + 1]
        |                 ELSE [GREATEST(CAST(0 AS BIGINT), acc[1] + v[1] - 5000), acc[2]]
        |               END) AS st
        |      FROM g)
        |SELECT user_id, n, CAST(st[2] AS BIGINT) AS alarms,
        |       CAST(st[1] AS BIGINT) AS final_s
        |FROM f ORDER BY user_id""") { (s, d) =>
      graft.operators.SeqFold.cusum(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)").as("cents")),
        k = 5000L, h = 30000L)
        .orderBy("user_id")
    },

    // ---- LAST-TOUCH ATTRIBUTION: each purchase's revenue credits the
    //      most recent preceding click/view by the same user within a
    //      7-day lookback, else 'none' — the marketing-attribution
    //      primitive every growth report runs (first/last-touch are the
    //      two degenerate Shapley points; last-touch shown, the window
    //      flips to `first` for first-touch). ONE analytic window does
    //      it: last non-null touch struct over the user's (ts,
    //      event_id)-ordered history up to the row BEFORE the purchase
    //      (rowsBetween(-∞, -1) — a purchase can't attribute to
    //      itself), then an epoch-µs lookback compare and a tiny
    //      channel rollup. One hash exchange on user_id; the lookback
    //      compare is exact integer µs on both engines. ----
    gated("q192_attribution",
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |                  epoch_us(ts) AS um,
        |                  CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events),
        |t AS (SELECT *,
        |        LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
        |                        THEN struct_pack(tum := um, tt := event_type)
        |                   END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY um, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |      FROM e)
        |SELECT CASE WHEN touch IS NOT NULL AND um - touch.tum <= 604800000000
        |            THEN touch.tt ELSE 'none' END AS channel,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("um", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("um"),
          expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)").as("cents"))
        .withColumn("touch",
          last(when(col("event_type").isin("click", "view"),
            struct(col("um").as("tum"), col("event_type").as("tt"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          when(col("touch").isNotNull &&
              col("um") - col("touch.tum") <= 604800000000L,
            col("touch.tt")).otherwise("none").as("channel"),
          col("cents"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"))
        .orderBy("channel")
    },

    // ---- FIRST-TOUCH attribution — q192's other Shapley endpoint: the
    //      EARLIEST click/view inside the 7-day lookback gets the
    //      credit. A range frame in exact epoch-µs bounds the lookback
    //      ([-7d, -1µs] — again self-attribution-proof), and the
    //      earliest touch is MIN over a (um, event_id, type) struct —
    //      lexicographic struct-min, NOT first_value, because rows tied
    //      on the range-frame ordering key have no deterministic frame
    //      order on either engine; the struct's event_id component
    //      makes the pick total. Same single user-keyed exchange. ----
    gated("q195_first_touch",
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |                  epoch_us(ts) AS um,
        |                  CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM events),
        |t AS (SELECT *,
        |        MIN(CASE WHEN event_type IN ('click', 'view')
        |                 THEN struct_pack(tum := um, tid := event_id,
        |                                  tt := event_type) END)
        |          OVER (PARTITION BY user_id ORDER BY um
        |                RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS touch
        |      FROM e)
        |SELECT COALESCE(touch.tt, 'none') AS channel,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("um")
        .rangeBetween(-604800000000L, -1L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("um"),
          expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)").as("cents"))
        .withColumn("touch",
          min(when(col("event_type").isin("click", "view"),
            struct(col("um").as("tum"), col("event_id").as("tid"),
              col("event_type").as("tt")))).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("touch.tt"), lit("none")).as("channel"),
          col("cents"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"))
        .orderBy("channel")
    },

    // ---- EXACT ROC-AUC as a rank statistic (Mann-Whitney U): does the
    //      stopword-density score separate English documents? — the
    //      classifier-evaluation primitive every quality-filter tuning
    //      loop needs, computed WITHOUT the n² pair join or a float
    //      rank: group by score, order once, and 2U = Σ_s (2·pos_s·
    //      neg_below_s + pos_s·neg_s) counts wins twice and ties once —
    //      exact integers end-to-end, AUC reported in ppm by integer
    //      division. One tiny hash agg on the score + one window over
    //      score cardinality (≤ 1001 rows) — the corpus never sorts.
    //      Measured AUC on the fixture: 0.529 — the synthetic corpus
    //      draws tokens near-uniformly across langs, and the evaluator
    //      reports exactly that (a near-random classifier), which is
    //      the point of an EXACT eval: ties and weak signals are
    //      counted (as half-wins), not rounded away. ----
    gated("q193_auc",
      """WITH t AS (SELECT doc_id, lang,
        |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |           FROM documents),
        |m AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |             CAST(1000 * len(list_filter(w, x -> x IN ('a','the'))) AS BIGINT)
        |               // CAST(len(w) AS BIGINT) AS score
        |      FROM t WHERE len(w) >= 1),
        |g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS p,
        |             CAST(SUM(1 - pos) AS BIGINT) AS q
        |      FROM m GROUP BY score),
        |c AS (SELECT score, p, q,
        |             SUM(q) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - q AS nb
        |      FROM g)
        |SELECT CAST(SUM(p) AS BIGINT) AS npos, CAST(SUM(q) AS BIGINT) AS nneg,
        |       CAST(SUM(2 * p * nb + p * q) AS BIGINT) AS u2,
        |       CAST(SUM(2 * p * nb + p * q) * 500000
        |            // (SUM(p) * SUM(q)) AS BIGINT) AS auc_ppm
        |FROM c""") { (s, d) =>
      import graft.text.TextOps
      val m = Tables.documents(s, d)
        .withColumn("w", TextOps.tokens(col("text")))
        .filter(size(col("w")) >= 1)
        .select(when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          TextOps.markerHits(col("w"), Seq("a", "the")).cast("long")
            .as("stop"), size(col("w")).cast("long").as("n"))
        .select(col("pos"), expr("(1000 * stop) div n").as("score"))
      // score cardinality ≤ 1001 — the window runs over the tiny grouped
      // relation, never the corpus (two-level: agg shuffles score
      // cardinality, cumsum is histogram-sized)
      val g = m.groupBy("score")
        .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("q"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("nb", sum(col("q")).over(w) - col("q"))
        .agg(sum(col("p")).as("npos"), sum(col("q")).as("nneg"),
          sum(lit(2) * col("p") * col("nb") + col("p") * col("q")).as("u2"),
          expr("CAST(SUM(2 * p * nb + p * q) * 500000 div (SUM(p) * SUM(q)) AS BIGINT)")
            .as("auc_ppm"))
    },

    // ---- CALIBRATION / reliability bins — q193's companion evaluator:
    //      decile-bin the score, and per bin report volume, observed
    //      positive rate (exact ppm), and mean score (exact integer
    //      div) — the reliability-diagram table that tells you WHERE a
    //      classifier is over/under-confident, where AUC only ranks.
    //      One hash agg on the bin key; everything integer. ----
    gated("q198_calibration",
      """WITH t AS (SELECT doc_id, lang,
        |             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |           FROM documents),
        |m AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |             CAST(1000 * len(list_filter(w, x -> x IN ('a','the'))) AS BIGINT)
        |               // CAST(len(w) AS BIGINT) AS score
        |      FROM t WHERE len(w) >= 1)
        |SELECT LEAST(CAST(9 AS BIGINT), score // 100) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(pos) AS BIGINT) AS n_pos,
        |       CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS rate_ppm,
        |       CAST(SUM(score) // COUNT(*) AS BIGINT) AS mean_score
        |FROM m GROUP BY 1 ORDER BY 1""") { (s, d) =>
      import graft.text.TextOps
      Tables.documents(s, d)
        .withColumn("w", TextOps.tokens(col("text")))
        .filter(size(col("w")) >= 1)
        .select(when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          TextOps.markerHits(col("w"), Seq("a", "the")).cast("long")
            .as("stop"), size(col("w")).cast("long").as("n"))
        .select(col("pos"), expr("(1000 * stop) div n").as("score"))
        .groupBy(least(lit(9L), expr("score div 100")).as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          expr("CAST(SUM(pos) * 1000000 div COUNT(*) AS BIGINT)")
            .as("rate_ppm"),
          expr("CAST(SUM(score) div COUNT(*) AS BIGINT)").as("mean_score"))
        .orderBy("bin")
    },

    // ---- Lag-1 autocorrelation MOMENTS per series (seasonality /
    //      momentum detection): over consecutive observed days, the
    //      exact BIGINT rationals n·Σab − ΣaΣb (covariance numerator)
    //      and both variance numerators — q140's
    //      regression-as-aggregate machinery applied to the
    //      (yₜ, yₜ₊₁) pair stream; the correlation is num/√(da·db)
    //      for the consumer, every gated cell exact. ----
    gated("q166_autocorr",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                      CAST(SUM(CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS y
        |               FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, y AS a,
        |             LEAD(y) OVER (PARTITION BY event_type ORDER BY day) AS b
        |      FROM daily)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(COUNT(*) * SUM(a*b) - SUM(a) * SUM(b) AS BIGINT) AS num,
        |       CAST(COUNT(*) * SUM(a*a) - SUM(a) * SUM(a) AS BIGINT) AS den_a,
        |       CAST(COUNT(*) * SUM(b*b) - SUM(b) * SUM(b) AS BIGINT) AS den_b
        |FROM p WHERE b IS NOT NULL GROUP BY event_type
        |ORDER BY event_type""") { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)")).as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("b", lead(col("y"), 1).over(w))
        .filter(col("b").isNotNull)
        .withColumnRenamed("y", "a")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("count(1) * sum(a*b) - sum(a) * sum(b)").as("num"),
          expr("count(1) * sum(a*a) - sum(a) * sum(a)").as("den_a"),
          expr("count(1) * sum(b*b) - sum(b) * sum(b)").as("den_b"))
        .orderBy("event_type")
    },

    // ---- Inter-arrival time percentiles: per event type, the exact
    //      p50/p90 of the gap (whole seconds) since the user's PREVIOUS
    //      event of the same type — the cadence profile behind
    //      retention models and rate-limit tuning; q145 sessionizes on
    //      a fixed 30-min gap, this measures what the gap distribution
    //      actually IS. Percentile_disc position selection (q148
    //      machinery) over the lag-derived gaps — all integer. Scale:
    //      one exchange on (user, type) for the lag, one on type for
    //      the rank window; per-group sorts spill, nothing collects. ----
    gated("q182_interarrival",
      """WITH g AS (
        |  SELECT event_type, event_id,
        |         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |            PARTITION BY user_id, event_type
        |            ORDER BY ts, event_id)) // 1000000 AS gap_s
        |  FROM events),
        |v AS (SELECT event_type, event_id, gap_s FROM g WHERE gap_s IS NOT NULL),
        |r AS (SELECT event_type, gap_s,
        |        ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY gap_s, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM v)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
        |       MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN gap_s END) AS p50_s,
        |       MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN gap_s END) AS p90_s
        |FROM r GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val lagW = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      val rankW = Window.partitionBy("event_type").orderBy("gap_s", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("um"))
        .withColumn("gap_s",
          expr("(um - LAG(um) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)) div 1000000"))
        .filter(col("gap_s").isNotNull)
        .withColumn("rn", row_number().over(rankW))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max(col("n")).as("n_gaps"),
          max(when(col("rn") === expr("(50 * n + 99) div 100"),
            col("gap_s"))).as("p50_s"),
          max(when(col("rn") === expr("(90 * n + 99) div 100"),
            col("gap_s"))).as("p90_s"))
        .orderBy("event_type")
    },

    // ---- Seasonality-aware deviation ranking: each (event type,
    //      calendar day)'s count vs the MEDIAN count for that type on
    //      that DAY OF WEEK — Mondays compare to Mondays, so weekly
    //      rhythm doesn't read as anomaly (the flaw in q88/q156's
    //      global baselines). Reported as the top-5 most-deviant days
    //      per type by |(1000·n) div med − 1000| per-mille — a RANKING,
    //      not a threshold, so the gate is never vacuous on quiet data.
    //      The dow label only PARTITIONS (never surfaces), so the
    //      engines' different week-numbering conventions can't leak.
    //      Exact integers end-to-end. Scale: the daily-count agg is the
    //      only data-sized pass; medians and ranks run over
    //      calendar-bounded rows (types × days). ----
    gated("q183_dow_anomaly",
      """WITH dc AS (SELECT event_type, date_trunc('day', ts) AS day,
        |              dayofweek(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS n
        |            FROM events GROUP BY 1, 2, 3),
        |r AS (SELECT event_type, dow, n,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, dow ORDER BY n) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type, dow) AS cnt
        |      FROM dc),
        |m AS (SELECT event_type, dow,
        |        MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n END) AS med
        |      FROM r GROUP BY event_type, dow),
        |dev AS (SELECT dc.event_type, dc.day, dc.n, m.med,
        |          abs((1000 * dc.n) // m.med - 1000) AS dev_pm
        |        FROM dc JOIN m ON dc.event_type = m.event_type AND dc.dow = m.dow),
        |top AS (SELECT event_type, day, n, med, dev_pm,
        |          ROW_NUMBER() OVER (PARTITION BY event_type
        |                             ORDER BY dev_pm DESC, day) AS pick
        |        FROM dev)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n, med,
        |       CAST(dev_pm AS BIGINT) AS dev_pm
        |FROM top WHERE pick <= 5 ORDER BY event_type, dev_pm DESC, day""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"),
          dayofweek(col("ts")).as("dow"))
        .agg(cntLong.as("n"))
      val w = Window.partitionBy("event_type", "dow").orderBy("n")
      val m = dc
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy("event_type", "dow")))
        .groupBy(col("event_type").as("met"), col("dow").as("mdow"))
        .agg(max(when(col("rn") === expr("(cnt + 1) div 2"), col("n")))
          .as("med"))
      val pick = Window.partitionBy("event_type")
        .orderBy(col("dev_pm").desc, col("day"))
      dc.join(m, col("event_type") === col("met") && col("dow") === col("mdow"))
        .withColumn("dev_pm", expr("abs((1000 * n) div med - 1000)"))
        .withColumn("pick", row_number().over(pick))
        .filter(col("pick") <= 5)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("med"), col("dev_pm").cast("long"))
        .orderBy(col("event_type"), col("dev_pm").desc, col("day"))
    }
  )
}
