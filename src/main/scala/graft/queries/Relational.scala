package graft.queries

import graft.{GatedQuery, Norm, Tables}
import graft.GatedQuery.gated
import graft.Norm._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational batch core (SURVEY.md §2.2 O1–O24, O29; declared queries
  * D-Q01–D-Q26, D-Q29). Every query is a declarative DataFrame program —
  * Catalyst supplies pushdown, pruning, join selection, and AQE re-planning;
  * the only scale decisions made here are explicit broadcasts of tables
  * whose cardinality is bounded by the schema, not the scale factor
  * (region: 5 rows, nation: 25 rows — safe at any SF). Tables that grow
  * with SF (customer, orders, ...) carry NO broadcast hint: AQE picks
  * broadcast while they fit and shuffled-hash/sort-merge beyond.
  *
  * Reference capability citations: serve-side filter/search
  * (reference README.md:344-367), sort (README.md:488-490), aggregations
  * (README.md:2-4), selection rules
  * (cdk_stacks/dms_aurora_mysql_to_kinesis.py:96-107).
  */
object Relational {

  val all: Seq[GatedQuery] = Seq(

    // ---- O1/O2/O3: scan + projection + predicate (pushed to parquet) ----
    gated("q01_scan_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) AS l_quantity
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          decStr(col("l_quantity")).as("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- O4: inner equi-join. No broadcast hint: customer scales with SF
    //      (fact-sized at 100 TB), so join selection is left to Catalyst +
    //      AQE — broadcast while it fits, shuffled hash/SMJ beyond. ----
    gated("q02_inner_join",
      """SELECT o_orderkey, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey, c_name""") { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey", "c_name")
    },

    // ---- O4 multiway + O10 ----
    gated("q03_multiway_join",
      """SELECT n_name, r_name, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name
        |ORDER BY n_name, r_name, cnt""") { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name", "r_name").agg(cntLong.as("cnt"))
        .orderBy("n_name", "r_name", "cnt")
    },

    // ---- O5: outer join (null-generating side aggregated) ----
    gated("q04_outer_join",
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("cnt"))
        .orderBy("c_custkey")
    },

    // ---- O6: left semi (EXISTS) ----
    gated("q05_semi_join",
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100)
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    // ---- O6: left anti (NOT EXISTS). Anti-joins against high-value orders
    //      so the result is non-empty at every SF (every customer has SOME
    //      order in this data; ~4% lack one above 450k — 57/538/5518 rows at
    //      sf0.001/0.01/0.1, measured). ----
    gated("q06_anti_join",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    // ---- O7: cross join ----
    gated("q07_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""") { (s, d) =>
      Tables.region(s, d).select("r_name")
        .crossJoin(Tables.nation(s, d).select("n_name"))
        .orderBy("r_name", "n_name")
    },

    // ---- O8: range (band) join — equi on user_id, range residual on ts;
    //      compiles to a shuffled equi-join, NOT a nested loop ----
    gated("q08_range_join",
      """SELECT a.event_id AS a_event_id, b.event_id AS b_event_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |ORDER BY a_event_id, b_event_id""") { (s, d) =>
      val e = Tables.events(s, d)
      val a = e.filter(col("event_type") === "click")
        .select(col("event_id").as("a_event_id"),
          col("user_id").as("a_user_id"), col("ts").as("a_ts"))
      val b = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("b_event_id"),
          col("user_id").as("b_user_id"), col("ts").as("b_ts"))
      a.join(b, col("a_user_id") === col("b_user_id") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .select("a_event_id", "b_event_id")
        .orderBy("a_event_id", "b_event_id")
    },

    // ---- O9: as-of join, aggregate formulation (MAX over bounded range) ----
    gated("q09_asof_join_agg",
      """SELECT p.event_id AS event_id, MAX(c.event_id) AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id AND c.event_type = 'click'
        | AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id
        |ORDER BY event_id, click_id""") { (s, d) =>
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("p_user_id"),
          col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      p.join(c, col("p_user_id") === col("c_user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
        .groupBy("event_id").agg(max(col("c_event_id")).as("click_id"))
        .orderBy("event_id", "click_id")
    },

    // ---- O9: as-of proper — latest prior click by (ts, event_id) ----
    gated("q09b_asof_join_latest",
      """SELECT event_id, click_id FROM (
        |  SELECT p.event_id, c.event_id AS click_id,
        |         ROW_NUMBER() OVER (PARTITION BY p.event_id
        |                            ORDER BY c.ts DESC, c.event_id DESC) rn
        |  FROM events p JOIN events c
        |    ON p.user_id = c.user_id AND c.event_type = 'click'
        |   AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
        |  WHERE p.event_type = 'purchase')
        |WHERE rn = 1
        |ORDER BY event_id""") { (s, d) =>
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("p_user_id"),
          col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event_id"),
          col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("c_ts").desc, col("c_event_id").desc)
      p.join(c, col("p_user_id") === col("c_user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("c_event_id").as("click_id"))
        .orderBy("event_id")
    },

    // ---- O9: as-of join, CUSTOM OPERATOR form (plans/AsOfJoin.scala —
    //      logical node + planner strategy + co-partitioned sort-merge
    //      exec injected via GraftExtensions). Same semantics as the
    //      q09/q09b compositions but with NO pair materialization: one
    //      hash exchange + one sort per side, then a single forward merge
    //      pass with O(1) state — the shape that survives dense per-key
    //      histories at 100 TB, where the range-join form's (purchase ×
    //      in-window clicks) intermediate is quadratic. Clicks dedupe to
    //      unique (user, ts) first so the survivor is pinned on BOTH
    //      engines; oracle = DuckDB's native ASOF JOIN. ----
    gated("q121_asof_custom",
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, MAX(event_id) AS click_id
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT event_id, click_id FROM (
        |  SELECT p.event_id,
        |         CASE WHEN c.ts > p.ts - INTERVAL 1 HOUR
        |              THEN c.click_id END AS click_id
        |  FROM p ASOF JOIN c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts)
        |WHERE click_id IS NOT NULL
        |ORDER BY event_id""") { (s, d) =>
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.operators.AsOf.join(p, c,
          leftOn = Seq(p.col("p_user")), rightOn = Seq(c.col("c_user")),
          leftTs = p.col("p_ts"), rightTs = c.col("c_ts"),
          toleranceUs = Some(3600L * 1000000L), leftOuter = false)
        .select(col("event_id"), col("click_id"))
        .orderBy("event_id")
    },

    // ---- O9: custom as-of exec, LEFT-OUTER + TIE-BREAK paths (the
    //      null-bind projection at plans/AsOfJoin.scala and the
    //      rightTieBreak sort key). The testdata has no duplicate
    //      (user, ts) clicks, so ties are PLANTED: every 7th user's
    //      clicks gain a same-timestamp twin with a LARGER event_id —
    //      the result is wrong unless the tie-break picks max(event_id).
    //      The oracle pre-aggregates the same survivor and uses DuckDB's
    //      native ASOF LEFT JOIN, with out-of-tolerance matches nulled
    //      on both engines. ----
    gated("q121b_asof_custom_outer",
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |raw AS (SELECT event_id, user_id, ts FROM events
        |        WHERE event_type = 'click'
        |        UNION ALL
        |        SELECT event_id + 5000000, user_id, ts FROM events
        |        WHERE event_type = 'click' AND user_id % 7 = 0),
        |c AS (SELECT user_id, ts, MAX(event_id) AS click_id
        |      FROM raw GROUP BY user_id, ts)
        |SELECT p.event_id,
        |       CASE WHEN c.ts > p.ts - INTERVAL 1 HOUR
        |            THEN c.click_id END AS click_id
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY event_id""") { (s, d) =>
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val rawClicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"))
      val c = rawClicks.unionAll(
        rawClicks.filter(pmod(col("c_user"), lit(7)) === 0)
          .withColumn("click_id", col("click_id") + lit(5000000L)))
      graft.operators.AsOf.join(p, c,
          leftOn = Seq(p.col("p_user")), rightOn = Seq(c.col("c_user")),
          leftTs = p.col("p_ts"), rightTs = c.col("c_ts"),
          rightTieBreak = Seq(c.col("click_id")),
          toleranceUs = Some(3600L * 1000000L), leftOuter = true)
        .select(col("event_id"), col("click_id"))
        .orderBy("event_id")
    },

    // ---- O10: two-phase hash aggregation (TPC-H Q1 shape) ----
    gated("q10_hash_agg",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_qty,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(decStr(sumDec2(col("l_quantity"))).as("sum_qty"),
          decStr(sumDec2(col("l_extendedprice"))).as("sum_price"),
          cntLong.as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- O11: count distinct ----
    gated("q11_count_distinct",
      """SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cd FROM orders""") {
      (s, d) =>
        Tables.orders(s, d)
          .agg(countDistinct(col("o_custkey")).as("cd"))
    },

    // ---- O13: grouping sets ----
    gated("q12_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS c
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c""") {
      (s, d) =>
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(cntLong.as("c"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first, col("c"))
    },

    // ---- O13: rollup ----
    gated("q13_rollup",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS c
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c""") {
      (s, d) =>
        Tables.orders(s, d)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(cntLong.as("c"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first, col("c"))
    },

    // ---- O13: cube ----
    gated("q14_cube",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS c
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c""") {
      (s, d) =>
        Tables.orders(s, d)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(cntLong.as("c"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first, col("c"))
    },

    // ---- O14: conditional / filtered aggregation ----
    gated("q15_filtered_agg",
      """SELECT event_type,
        |       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS hi,
        |       CAST(SUM(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS lo
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(when(col("value") > 100, 1)).as("hi"),
          sum(when(col("value") <= 100, 1).otherwise(0)).cast("long").as("lo"))
        .orderBy("event_type")
    },

    // ---- O15: ranking window functions ----
    gated("q16_rank_window",
      """SELECT o_custkey, o_orderkey,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
        |       CAST(RANK() OVER (PARTITION BY o_custkey
        |                         ORDER BY o_orderstatus) AS BIGINT) AS rk
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val wrn = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wrk = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderstatus"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(wrn).cast("long").as("rn"),
          rank().over(wrk).cast("long").as("rk"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- O16: analytic window functions (lag + running sum) ----
    gated("q17_analytic_window",
      """SELECT event_id, LAG(event_id) OVER w AS prev,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DECIMAL(18,2)) AS VARCHAR) AS run
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev"),
          decStr(sum(dec2(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("run"))
        .orderBy("event_id")
    },

    // ---- O17: range-frame window (1 h trailing count on epoch seconds) ----
    gated("q18_range_frame_window",
      """SELECT event_id,
        |       CAST(COUNT(*) OVER (PARTITION BY user_id
        |                           ORDER BY epoch_us(ts) // 1000000
        |                           RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS c
        |FROM events ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec")).rangeBetween(-3599, 0)
      Tables.events(s, d)
        .withColumn("sec", unix_timestamp(col("ts")))
        .select(col("event_id"), count(lit(1)).over(w).as("c"))
        .orderBy("event_id")
    },

    // ---- O18: top-k per group (WindowGroupLimit pushes rn<=3 in 4.x) ----
    gated("q19_topk_per_group",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn", "o_orderkey")
    },

    // ---- O19: global sort + limit (TakeOrderedAndProject) ----
    gated("q20_global_sort_limit",
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
        |FROM orders
        |ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey LIMIT 10""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), dec2(col("o_totalprice")).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), decStr(col("price")).as("price"))
    },

    // ---- O20: union all + aggregate ----
    gated("q21_union_all",
      """SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT o_custkey AS x FROM orders
        |  UNION ALL SELECT c_custkey FROM customer)
        |GROUP BY x ORDER BY x""") { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("x"))
        .unionByName(Tables.customer(s, d).select(col("c_custkey").as("x")))
        .groupBy("x").agg(cntLong.as("cnt"))
        .orderBy("x")
    },

    // ---- O20: union distinct ----
    gated("q21b_union_distinct",
      """SELECT c_custkey AS x FROM customer
        |UNION SELECT o_custkey FROM orders ORDER BY x""") { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("x"))
        .unionByName(Tables.orders(s, d).select(col("o_custkey").as("x")))
        .distinct()
        .orderBy("x")
    },

    // ---- O21: intersect ----
    gated("q22_intersect",
      """SELECT c_custkey FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .intersect(Tables.orders(s, d).select("o_custkey"))
        .orderBy("c_custkey")
    },

    // ---- O21: except (against high-value orders so the difference is
    //      non-empty at every SF; same thresholds as q06) ----
    gated("q23_except",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .except(Tables.orders(s, d).filter(col("o_totalprice") > 450000)
          .select("o_custkey"))
        .orderBy("c_custkey")
    },

    // ---- O22/O3: string functions + LIKE/regex predicates. Patterns chosen
    //      to hit the generated data ('red widget' names, 'ECONOMY' types):
    //      57/526/5483 rows at sf0.001/0.01/0.1, measured. ----
    gated("q24_string_funcs",
      """SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 5)) AS u,
        |       CAST(LENGTH(p_type) AS BIGINT) AS l,
        |       CONCAT(TRIM(p_brand), '/', LOWER(p_type)) AS b,
        |       REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS w
        |FROM part
        |WHERE p_name LIKE '%red%' OR regexp_matches(p_type, '^ECONOMY')
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%red%") || col("p_type").rlike("^ECONOMY"))
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 5)).as("u"),
          length(col("p_type")).cast("long").as("l"),
          concat(trim(col("p_brand")), lit("/"), lower(col("p_type"))).as("b"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("w"))
        .orderBy("p_partkey")
    },

    // ---- O23: date/time functions ----
    gated("q25_datetime_funcs",
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS m,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        |       CAST(COUNT(*) AS BIGINT) AS c
        |FROM orders GROUP BY 1, 2 ORDER BY m, y, c""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(tsStr(date_trunc("month", col("o_orderdate"))).as("m"),
          year(col("o_orderdate")).cast("long").as("y"))
        .agg(cntLong.as("c"))
        .orderBy("m", "y", "c")
    },

    // ---- O24: math functions (exact decimal arithmetic) ----
    gated("q26_math_funcs",
      """SELECT l_orderkey,
        |       CAST(CAST(ROUND(ABS(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                      CAST(1 - l_discount AS DECIMAL(18,2))), 2)
        |            AS DECIMAL(18,2)) AS VARCHAR) AS net,
        |       CAST(l_orderkey % 7 AS BIGINT) AS m
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          decStr(round(abs(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))), 2))
            .as("net"),
          (col("l_orderkey") % 7).cast("long").as("m"))
        .orderBy("l_orderkey")
    },

    // ---- O29/O23: tumbling time window (hourly) over the event stream ----
    gated("q29_tumbling_window",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        |       event_type, CAST(COUNT(*) AS BIGINT) AS c,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS v
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(cntLong.as("c"), decStr(sumDec2(col("value"))).as("v"))
        .select(tsStr(col("window.start")).as("h"), col("event_type"),
          col("c"), col("v"))
        .orderBy("h", "event_type")
    }
  )
}
