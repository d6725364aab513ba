package graft.queries

import graft.{GatedQuery, Tables}
import graft.GatedQuery.gated
import graft.Norm._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StringType, StructField, StructType}

/** Extended operator coverage: remaining outer-join variants (O5),
  * time-window generalizations (O30 sliding, O31 session — both expressible
  * in DuckDB via bucket-union / gap-sessionization, so gated rather than
  * golden-only), approx distinct (O12, estimator-specific → ungated here,
  * pinned by a ±5% Spark-side spec), and the CSV leg of O1 over a
  * checked-in SF-invariant fixture.
  */
object Extended {

  private val nationCsvPath = "/root/repo/fixtures/nation.csv"
  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val all: Seq[GatedQuery] = Seq(

    // ---- O5: right outer join ----
    gated("q04b_right_outer_join",
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS cnt
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("cnt"))
        .orderBy("c_custkey")
    },

    // ---- O5: full outer join — both sides filtered to overlapping but
    //      non-identical key ranges so null-extension fires on each side ----
    gated("q04c_full_outer_join",
      """SELECT COALESCE(c_custkey, o_custkey) AS k,
        |       CAST(COUNT(o_orderkey) AS BIGINT) AS cnt,
        |       CAST(COUNT(c_name) AS BIGINT) AS named
        |FROM (SELECT * FROM customer WHERE c_custkey <= 1000) c
        |FULL JOIN (SELECT * FROM orders WHERE o_custkey >= 500) o
        |  ON c_custkey = o_custkey
        |GROUP BY k
        |ORDER BY k""") { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_custkey") <= 1000)
      val o = Tables.orders(s, d).filter(col("o_custkey") >= 500)
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .groupBy(coalesce(col("c_custkey"), col("o_custkey")).as("k"))
        .agg(count(col("o_orderkey")).as("cnt"),
          count(col("c_name")).as("named"))
        .orderBy("k")
    },

    // ---- O30: sliding time window (10 min window, 5 min slide — each
    //      event lands in exactly 2 epoch-aligned buckets; the oracle
    //      states the same bucket set as a two-branch union) ----
    gated("q30_sliding_window",
      """SELECT strftime(make_timestamp(b*1000000), '%Y-%m-%d %H:%M:%S') AS ws,
        |       event_type, CAST(COUNT(*) AS BIGINT) AS c
        |FROM (
        |  SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS b, event_type FROM events
        |  UNION ALL
        |  SELECT CAST(floor(epoch(ts)/300)*300 - 300 AS BIGINT), event_type FROM events)
        |GROUP BY b, event_type
        |ORDER BY ws, event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(cntLong.as("c"))
        .select(tsStr(col("window.start")).as("ws"), col("event_type"), col("c"))
        .orderBy("ws", "event_type")
    },

    // ---- O31: session window (30 min gap). Spark's session_window merges
    //      an event into the open session iff ts < session_end (= last ts
    //      + gap); the oracle's gap-sessionization (new session when the
    //      inter-event gap >= 30 min) is the identical partition of each
    //      user's timeline. ----
    gated("q31_session_window",
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, ts,
        |             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x)
        |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS ss,
        |       CAST(COUNT(*) AS BIGINT) AS c
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, ss""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("start"), cntLong.as("c"))
        .select(col("user_id"), tsStr(col("start")).as("ss"), col("c"))
        .orderBy("user_id", "ss")
    },

    // ---- O21: intersect ALL — multiplicity-preserving (min of the two
    //      sides' counts: doubling customer keys makes the ALL semantics
    //      observable against orders' natural multiplicities) ----
    gated("q22b_intersect_all",
      """SELECT x FROM (
        |  SELECT c_custkey AS x FROM customer
        |  UNION ALL SELECT c_custkey FROM customer)
        |INTERSECT ALL SELECT o_custkey FROM orders
        |ORDER BY x""") { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_custkey").as("x"))
      c.unionByName(c)
        .intersectAll(Tables.orders(s, d).select(col("o_custkey").as("x")))
        .orderBy("x")
    },

    // ---- O21: except ALL — bag difference (orders keys minus one
    //      occurrence per customer key) ----
    gated("q23b_except_all",
      """SELECT o_custkey AS x FROM orders
        |EXCEPT ALL SELECT c_custkey FROM customer
        |ORDER BY x""") { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("x"))
        .exceptAll(Tables.customer(s, d).select(col("c_custkey").as("x")))
        .orderBy("x")
    },

    // ---- O23: date/time arithmetic — datediff, interval add, epoch ----
    gated("q25b_datetime_arith",
      """SELECT o_orderkey,
        |       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS dd,
        |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS plus30,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS ep,
        |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        |       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom
        |FROM orders
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"),
            lit("1995-01-01").cast("timestamp")).cast("long").as("dd"),
          tsStr(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
          unix_timestamp(col("o_orderdate")).as("ep"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"))
        .orderBy("o_orderkey")
    },

    // ---- S15 stats surface: exact interpolated percentiles (the
    //      OpenSearch percentiles aggregation analog). Spark `percentile`
    //      and DuckDB `quantile_cont` share the same linear-interpolation
    //      definition, so this gates exactly; the approximate scale path
    //      is `approx_percentile` (same shape as O12's estimator story). ----
    gated("q54_percentiles",
      """SELECT event_type,
        |       CAST(CAST(ROUND(quantile_cont(value, 0.5), 2) AS DECIMAL(18,2)) AS VARCHAR) AS p50,
        |       CAST(CAST(ROUND(quantile_cont(value, 0.9), 2) AS DECIMAL(18,2)) AS VARCHAR) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(decStr(round(expr("percentile(value, 0.5)"), 2)).as("p50"),
          decStr(round(expr("percentile(value, 0.9)"), 2)).as("p90"))
        .orderBy("event_type")
    },

    // ---- O12-family: approximate percentiles — the 100 TB path for q54.
    //      `approx_percentile`'s mergeable sketch aggregates in two phases
    //      (bounded memory per task); exact `percentile` buffers every
    //      value per group. Estimator-specific output → gated like q11b:
    //      the oracle pins the EXACT quantiles and a within-tolerance
    //      verdict on the estimate, so a drifting sketch flips the gate. ----
    gated("q54b_approx_percentiles",
      """SELECT event_type,
        |       CAST(CAST(ROUND(quantile_cont(value, 0.5), 2) AS DECIMAL(18,2)) AS VARCHAR) AS p50,
        |       CAST(1 AS BIGINT) AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("ex"),
          expr("approx_percentile(value, 0.5, 10000)").as("ap"),
          max(abs(col("value"))).as("mx"))
        .select(col("event_type"),
          decStr(round(col("ex"), 2)).as("p50"),
          // estimate within 5% of the exact median, relative to the value
          // range (medians can sit near zero)
          (abs(col("ap") - col("ex")) <= col("mx") * 0.05)
            .cast("long").as("approx_ok"))
        .orderBy("event_type")
    },

    // ---- S15 stats surface: second-moment aggregates. Both engines use
    //      numerically stable one-pass formulations whose results agree
    //      far below the rounded scales gated here. ----
    gated("q55_stats_agg",
      """SELECT event_type,
        |       CAST(CAST(ROUND(stddev_samp(value), 2) AS DECIMAL(18,2)) AS VARCHAR) AS sd,
        |       CAST(CAST(ROUND(var_samp(value), 1) AS DECIMAL(18,1)) AS VARCHAR) AS vr,
        |       CAST(CAST(ROUND(corr(value, CAST(user_id AS DOUBLE)), 4) AS DECIMAL(9,4)) AS VARCHAR) AS cr
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(stddev_samp(col("value")), 2).cast(DecimalType(18, 2))
            .cast("string").as("sd"),
          round(var_samp(col("value")), 1).cast(DecimalType(18, 1))
            .cast("string").as("vr"),
          dec4Str(round(corr(col("value"), col("user_id").cast("double")), 4))
            .as("cr"))
        .orderBy("event_type")
    },

    // ---- S15: ordered string aggregation (collect_list is
    //      order-nondeterministic in a distributed run — array_sort before
    //      joining makes the output a pure function of the group) ----
    gated("q56_string_agg",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""") { (s, d) =>
      Tables.nation(s, d)
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
        .orderBy("n_regionkey")
    },

    // ---- S15: numeric histogram (the date_histogram analog for value
    //      axes): fixed-width bins via floor division — exact in double
    //      on both engines ----
    gated("q57_histogram",
      """SELECT CAST(floor(value/20.0) AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS c
        |FROM events GROUP BY bin ORDER BY bin""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / 20.0).cast("long").as("bin"))
        .agg(cntLong.as("c"))
        .orderBy("bin")
    },

    // ---- O22/O24 companion: conditional scalar expressions ----
    gated("q58_conditionals",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 250000 THEN 'hi' ELSE 'lo' END AS bucket,
        |       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status,
        |       CAST(GREATEST(o_custkey, o_orderkey % 1000) AS BIGINT) AS g,
        |       CAST(LEAST(o_custkey, o_orderkey % 1000) AS BIGINT) AS l
        |FROM orders ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 250000, "hi").otherwise("lo").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status"),
          greatest(col("o_custkey"), col("o_orderkey") % 1000).cast("long").as("g"),
          least(col("o_custkey"), col("o_orderkey") % 1000).cast("long").as("l"))
        .orderBy("o_orderkey")
    },

    // ---- O14 companion: boolean aggregates + count_if ----
    gated("q59_bool_aggs",
      """SELECT event_type,
        |       CAST(bool_and(value >= 0) AS BIGINT) AS ba,
        |       CAST(bool_or(value > 400) AS BIGINT) AS bo,
        |       CAST(COUNT(*) FILTER (WHERE value > 400) AS BIGINT) AS ci
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(bool_and(col("value") >= 0).cast("long").as("ba"),
          bool_or(col("value") > 400).cast("long").as("bo"),
          count_if(col("value") > 400).as("ci"))
        .orderBy("event_type")
    },

    // ---- O22 companion: string transforms (regexp_replace/translate/
    //      lpad/reverse/repeat — Spark replaces all matches by default;
    //      DuckDB needs the 'g' flag for the same semantics) ----
    gated("q60_string_transforms",
      """SELECT p_partkey,
        |       regexp_replace(p_name, ' ', '_', 'g') AS r,
        |       translate(p_type, 'AEIOU', 'aeiou') AS t,
        |       lpad(p_brand, 10, '.') AS lp,
        |       reverse(p_name) AS rv,
        |       repeat('x', p_size % 3) AS rp
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          regexp_replace(col("p_name"), " ", "_").as("r"),
          translate(col("p_type"), "AEIOU", "aeiou").as("t"),
          lpad(col("p_brand"), 10, ".").as("lp"),
          reverse(col("p_name")).as("rv"),
          repeat(lit("x"), col("p_size") % 3).as("rp"))
        .orderBy("p_partkey")
    },

    // ---- O15 companion: ntile quartiles (deterministic via the total
    //      order inside each partition) ----
    gated("q62_ntile",
      """SELECT o_orderkey,
        |       CAST(ntile(4) OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS nt
        |FROM orders ORDER BY o_orderkey""") { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), ntile(4).over(w).cast("long").as("nt"))
        .orderBy("o_orderkey")
    },

    // ---- O12: approx distinct (HLL++). The raw estimate differs from
    //      DuckDB's estimator, so the estimate itself can't hash-match;
    //      instead the gate carries the EXACT distinct count plus a
    //      within-5% verdict on the estimate — the oracle pins the exact
    //      count and asserts the verdict is true, so a broken or wildly
    //      drifting sketch flips the gate red. ApproxSpec additionally
    //      pins the ±5% envelope Spark-side at the configured 2% rsd. ----
    gated("q11b_approx_distinct",
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cnt,
        |       CAST(1 AS BIGINT) AS approx_ok
        |FROM orders""") { (s, d) =>
      Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("exact_cnt"),
          approx_count_distinct(col("o_custkey"), 0.02).as("acd"))
        .select(col("exact_cnt"),
          (abs(col("acd") - col("exact_cnt")).cast("double") /
            col("exact_cnt").cast("double") <= 0.05)
            .cast("long").as("approx_ok"))
    },

    // ---- O28: posexplode — ordinal-preserving lateral expansion ----
    gated("q50_posexplode",
      """SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS word
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |      FROM documents WHERE doc_id < 20) t
        |ORDER BY doc_id, pos""") { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
        .orderBy("doc_id", "pos")
    },

    // ---- Entry point C stage 1 (SURVEY §3.3): the SQL front-end. A
    //      scalar subquery through spark.sql — Catalyst parses, rewrites
    //      (RewriteCorrelatedScalarSubquery), and plans the same engine
    //      operators the DataFrame API declares. ----
    gated("q51_sql_entry",
      """SELECT o_orderkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.9
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderkey,
          |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS price
          |FROM orders
          |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.9
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- SQL EXISTS decorrelation (RewritePredicateSubquery → semi join) ----
    gated("q51b_sql_exists",
      """SELECT o_orderkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM events e
        |              WHERE e.user_id = o.o_custkey AND e.event_type = 'purchase')
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        """SELECT o_orderkey FROM orders o
          |WHERE EXISTS (SELECT 1 FROM events e
          |              WHERE e.user_id = o.o_custkey AND e.event_type = 'purchase')
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- O13/O14: pivot — conditional aggregation in matrix form ----
    gated("q52_pivot",
      """SELECT user_id,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase
        |FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .count()
        .na.fill(0L, Seq("click", "view", "purchase"))
        .orderBy("user_id")
    },

    // ---- Scale op: explicit bloom-filter join pruning — the fact side is
    //      probed against a broadcast sketch of the (filtered) dim keys
    //      BEFORE the join's exchange, so only might-match rows shuffle.
    //      bloom_contains has no false negatives, so prune-then-join is
    //      exactly the plain join — which is what the oracle runs. The
    //      sketch is sized to the filtered dim (false positives only waste
    //      shuffle rows, never change the result). ----
    gated("q73_bloom_join",
      """SELECT o_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS rev
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""") { (s, d) =>
      val dim = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      // size the sketch to the actual filtered-dim cardinality (one cheap
      // dim-side count — dims are small by definition; Catalyst's own
      // InjectRuntimeFilter sizes from stats the same way): a 1M-item
      // default for a ~3k-key dim is a 350× oversized build + broadcast
      val fact = graft.operators.BloomPrune.prune(
        Tables.lineitem(s, d), "l_orderkey", dim, "o_orderkey",
        estimatedItems = math.max(dim.count(), 1024L))
      dim.join(fact, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(decStr(sumDec2(col("l_extendedprice"))).as("rev"))
        .orderBy("o_orderkey")
    },

    // ---- Serve-side analytics: sessionized conversion funnel — per user,
    //      first click → earliest purchase within the next 24 hours (the
    //      classic event-sequence dashboard query; composes O10 aggs with
    //      an O8-style range join). Two user-keyed aggregations + one
    //      user-keyed range join: everything shuffles once on user_id,
    //      uniform at any scale. ----
    gated("q80_funnel",
      """WITH fc AS (SELECT user_id, MIN(ts) AS first_click
        |            FROM events WHERE event_type = 'click' GROUP BY user_id),
        |conv AS (SELECT f.user_id, MIN(p.ts) AS first_purchase
        |         FROM fc f JOIN events p ON p.user_id = f.user_id
        |         WHERE p.event_type = 'purchase'
        |           AND p.ts >= f.first_click
        |           AND p.ts <= f.first_click + INTERVAL 24 HOUR
        |         GROUP BY f.user_id)
        |SELECT f.user_id,
        |       strftime(f.first_click, '%Y-%m-%d %H:%M:%S') AS first_click,
        |       CAST(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS converted,
        |       CAST(CASE WHEN c.user_id IS NULL THEN -1
        |                 ELSE (epoch_us(c.first_purchase) - epoch_us(f.first_click))
        |                      // 1000000
        |            END AS BIGINT) AS secs_to_convert
        |FROM fc f LEFT JOIN conv c ON f.user_id = c.user_id
        |ORDER BY f.user_id""") { (s, d) =>
      val ev = Tables.events(s, d)
      val fc = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("first_click"))
      val conv = fc.join(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("pu"), col("ts").as("pts")),
          col("pu") === col("user_id") &&
            col("pts") >= col("first_click") &&
            col("pts") <= col("first_click") + expr("INTERVAL 24 HOUR"))
        .groupBy(col("user_id").as("cu"))
        .agg(min(col("pts")).as("first_purchase"))
      fc.join(conv, col("user_id") === col("cu"), "left")
        .select(col("user_id"),
          tsStr(col("first_click")).as("first_click"),
          when(col("cu").isNull, 0L).otherwise(1L).as("converted"),
          // exact µs diff, floor-divided to whole seconds — per-timestamp
          // second truncation (unix_timestamp) disagrees with the oracle
          // whenever the two fractional parts straddle a second boundary
          when(col("cu").isNull, -1L)
            // .cast("timestamp"): the driver-regenerated parquet carries
            // timestamp[us] with isAdjustedToUTC=false, which Spark 4
            // reads as TIMESTAMP_NTZ — and unix_micros strictly requires
            // TIMESTAMP. Session TZ is pinned UTC, so the NTZ wall-clock
            // reinterprets exactly; the cast is semantics-preserving under
            // either testdata flavor.
            .otherwise(floor((unix_micros(col("first_purchase").cast("timestamp")) -
              unix_micros(col("first_click").cast("timestamp"))) / 1000000.0).cast("long"))
            .as("secs_to_convert"))
        .orderBy("user_id")
    },

    // ---- O1 (CSV leg): explicit-schema CSV scan of the checked-in
    //      SF-invariant nation fixture, joined to the parquet region table
    //      (region/nation are schema-bounded → broadcast is safe at any
    //      SF). header=true + pinned types on both engines — no inference
    //      in the query path. ----
    gated("q01b_csv_scan",
      s"""SELECT r_name, CAST(COUNT(*) AS BIGINT) AS c, MIN(n_name) AS mn
         |FROM read_csv('$nationCsvPath', header=true,
         |     columns={'n_nationkey':'INTEGER','n_name':'VARCHAR','n_regionkey':'INTEGER'}) n
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r_name
         |ORDER BY r_name""") { (s, d) =>
      s.read.option("header", "true").schema(nationSchema).csv(nationCsvPath)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(cntLong.as("c"), min(col("n_name")).as("mn"))
        .orderBy("r_name")
    },

    // ---- O2 companion: UNPIVOT / melt — wide measure columns to long
    //      (metric, value) rows, the inverse of q52's pivot. Map-only
    //      (a generate/expand node, no shuffle beyond the harness ORDER
    //      BY); column names become data, so both engines must agree on
    //      the emitted metric labels, not just values. ----
    gated("q96_unpivot",
      """SELECT l_orderkey, l_linenumber, metric,
        |       CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR) AS v
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |             l_discount, l_tax
        |      FROM lineitem WHERE l_orderkey < 1000)
        |UNPIVOT (v FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, metric, v""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "v")
        .select(col("l_orderkey"), col("l_linenumber"), col("metric"),
          decStr(col("v")).as("v"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        // (746 dup keys at sf0.01) — v completes the total order
        .orderBy("l_orderkey", "l_linenumber", "metric", "v")
    },

    // ---- O15/O16 completeness: the distribution window functions.
    //      percent_rank and cume_dist are each ONE IEEE division of
    //      small exact integers ((rank−1)/(n−1), k/n) — identical
    //      cross-engine; the ROUND→DECIMAL render relies on both
    //      engines rounding doubles half-AWAY-from-zero (verified:
    //      DuckDB ROUND(1/32·2⁻⁵ ties) == Spark HALF_UP), and no group
    //      under the filter is 2ᵏ+1 rows so no representable tie
    //      exists anyway. nth_value pins the full-partition frame. ----
    gated("q130_window_dist",
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(ROUND(PERCENT_RANK() OVER w, 4) AS DECIMAL(9,4)) AS VARCHAR) AS pr,
        |  CAST(CAST(ROUND(CUME_DIST() OVER w, 4) AS DECIMAL(9,4)) AS VARCHAR) AS cd,
        |  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          dec4Str(round(percent_rank().over(w), 4)).as("pr"),
          dec4Str(round(cume_dist().over(w), 4)).as("cd"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_ok"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- O10 completeness: bitwise aggregates — bit_and/bit_or/bit_xor
    //      are associative-commutative integer folds, exact on any
    //      shuffle order (xor in particular is the order-free set
    //      digest, the same role md5-sum plays in q93's reconcile). ----
    gated("q131_bit_aggs",
      """SELECT event_type, BIT_AND(user_id) AS ba, BIT_OR(user_id) AS bo,
        |       BIT_XOR(user_id) AS bx
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(bit_and(col("user_id")).as("ba"), bit_or(col("user_id")).as("bo"),
          bit_xor(col("user_id")).as("bx"))
        .orderBy("event_type")
    },

    // ---- NULL-semantics torture cell: the corners engines silently
    //      disagree on, pinned in one gate. Nulls are PLANTED (negative
    //      values; every 7th event's type) so each corner is
    //      non-vacuous: a NULL group key groups as its own group;
    //      COUNT(*) counts rows while COUNT(v)/COUNT(DISTINCT v) skip
    //      nulls; SUM over an all-null slice is NULL (coalesced loud);
    //      null-safe IS NOT DISTINCT FROM counts the null rows
    //      themselves; and the ORDER BY pins NULLS FIRST explicitly —
    //      Spark defaults nulls first ASC, DuckDB defaults nulls LAST,
    //      the classic silent divergence. ----
    gated("q160_null_semantics",
      """WITH e AS (SELECT event_id,
        |             CASE WHEN event_id % 7 = 0 OR event_id % 11 = 0 THEN NULL
        |                  ELSE CAST(trunc(CAST(value AS DOUBLE) * 100) AS BIGINT) END AS v,
        |             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS et
        |           FROM events)
        |SELECT et, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(v) AS BIGINT) AS n_vals,
        |       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_dist,
        |       CAST(COALESCE(SUM(v), -1) AS BIGINT) AS sum_v,
        |       CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_v
        |FROM e GROUP BY et ORDER BY et NULLS FIRST""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          when(pmod(col("event_id"), lit(7)) === 0 ||
              pmod(col("event_id"), lit(11)) === 0, lit(null))
            .otherwise(expr("CAST(CAST(value AS DOUBLE) * 100 AS BIGINT)")).as("v"),
          when(pmod(col("event_id"), lit(7)) === 0, lit(null))
            .otherwise(col("event_type")).as("et"))
        .groupBy("et")
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_vals"),
          countDistinct(col("v")).as("n_dist"),
          coalesce(sum(col("v")), lit(-1L)).as("sum_v"),
          sum(when(col("v") <=> lit(null), 1).otherwise(0)).as("n_null_v"))
        .orderBy(col("et").asc_nulls_first)
    }
  )
}
