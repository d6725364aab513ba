package graft

import graft.operators.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join operator (plans/AsOfJoin.scala): semantics
  * against the window-form reference composition, the left-outer and
  * null edges, tie-break pinning, and the plan shape that justifies the
  * custom exec — one exchange + one sort per side, no pair blow-up. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  /** (key, ts µs as long-typed timestamp col, payload) helper frames. */
  private def frame(rows: Seq[(String, Long, Long)], pre: String): DataFrame =
    rows.toDF(s"${pre}_key", s"${pre}_ts", s"${pre}_id")
      .withColumn(s"${pre}_ts", timestamp_micros(col(s"${pre}_ts")))

  private def asof(l: DataFrame, r: DataFrame, tol: Option[Long],
                   outer: Boolean): DataFrame =
    AsOf.join(l, r,
      leftOn = Seq(l.col("l_key")), rightOn = Seq(r.col("r_key")),
      leftTs = l.col("l_ts"), rightTs = r.col("r_ts"),
      rightTieBreak = Seq(r.col("r_id")),
      toleranceUs = tol, leftOuter = outer)

  test("asof inner matches the window-form composition on real data") {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val custom = AsOf.join(p, c,
        leftOn = Seq(p.col("p_user")), rightOn = Seq(c.col("c_user")),
        leftTs = p.col("p_ts"), rightTs = c.col("c_ts"),
        toleranceUs = Some(3600L * 1000000L), leftOuter = false)
      .select("event_id", "click_id")
    val w = Window.partitionBy("event_id").orderBy(col("c_ts").desc)
    val reference = p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "click_id")
    assert(custom.exceptAll(reference).isEmpty &&
      reference.exceptAll(custom).isEmpty,
      "custom as-of != window-form reference")
    assert(custom.count() > 0, "vacuous parity check")
  }

  test("left outer pads unmatched; tolerance rejects stale matches") {
    val l = frame(Seq(("a", 100L, 1L), ("a", 500L, 2L), ("b", 100L, 3L)), "l")
    val r = frame(Seq(("a", 90L, 10L), ("a", 140L, 11L)), "r")
    // tolerance 50µs: l1@100 matches r@90 (gap 10); l2@500's latest prior
    // is r@140 but gap 360 > 50 → padded; key b has no right rows → padded
    val got = asof(l, r, Some(50L), outer = true)
      .select(col("l_id"), col("r_id")).as[(Long, Option[Long])]
      .collect().toSet
    assert(got === Set((1L, Some(10L)), (2L, None), (3L, None)))
    // inner drops the padded rows
    val inner = asof(l, r, Some(50L), outer = false)
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
    assert(inner === Set((1L, 10L)))
  }

  test("equal-ts right rows: tie-break pins the max survivor; equal " +
    "left/right ts is inclusive") {
    val l = frame(Seq(("a", 100L, 1L)), "l")
    val r = frame(Seq(("a", 100L, 7L), ("a", 100L, 9L), ("a", 40L, 5L)), "r")
    val got = asof(l, r, None, outer = false)
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 9L)), "survivor must be max tie-break at ts==ts")
  }

  test("null keys and null timestamps never match, matching join semantics") {
    val l = Seq((Some("a"), Some(100L), 1L), (None, Some(100L), 2L),
        (Some("a"), None, 3L))
      .toDF("l_key", "l_us", "l_id")
      .withColumn("l_ts", timestamp_micros(col("l_us"))).drop("l_us")
    val r = Seq((Some("a"), Some(90L), 10L), (None, Some(80L), 11L),
        (Some("a"), None, 12L))
      .toDF("r_key", "r_us", "r_id")
      .withColumn("r_ts", timestamp_micros(col("r_us"))).drop("r_us")
    val got = AsOf.join(l, r,
        leftOn = Seq(l.col("l_key")), rightOn = Seq(r.col("r_key")),
        leftTs = l.col("l_ts"), rightTs = r.col("r_ts"),
        rightTieBreak = Seq(r.col("r_id")), leftOuter = true)
      .select(col("l_id"), col("r_id")).as[(Long, Option[Long])]
      .collect().toSet
    assert(got === Set((1L, Some(10L)), (2L, None), (3L, None)))
  }

  test("plan shape: AsOfJoinExec with one exchange + one sort per side, " +
    "no window, no pair-materializing join") {
    val q = SparkEntry.queries("q121_asof_custom")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("WindowGroupLimit"),
      "as-of fell back to a window composition")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "pair blow-up join present")
    // inputs arrive hash-partitioned and sorted — EnsureRequirements
    // planned the same exchanges a sort-merge equi-join would get
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2,
      s"co-partitioning exchanges missing:\n$plan")
    assert("[Ss]ort ".r.findAllIn(plan).size >= 2, "merge inputs unsorted")
  }
}
