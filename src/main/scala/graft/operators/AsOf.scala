package graft.operators

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** DataFrame-level API for the custom as-of join (plans/AsOfJoin.scala).
  *
  * {{{
  * AsOf.join(purchases, clicks,
  *   leftOn = Seq(purchases("user_id")), rightOn = Seq(clicks("c_user")),
  *   leftTs = purchases("ts"), rightTs = clicks("c_ts"),
  *   rightTieBreak = Seq(clicks("c_event_id")),
  *   toleranceUs = Some(3600L * 1000000), leftOuter = false)
  * }}}
  *
  * Joins each left row to the latest right row with equal keys and
  * `rightTs <= leftTs` (within `toleranceUs` when set). Columns must come
  * from the two input frames (resolved attributes); name the sides apart
  * before joining — the output carries both schemas. */
object AsOf {

  def join(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[Column], rightOn: Seq[Column],
      leftTs: Column, rightTs: Column,
      rightTieBreak: Seq[Column] = Nil,
      toleranceUs: Option[Long] = None,
      leftOuter: Boolean = false): DataFrame = {
    require(leftOn.size == rightOn.size && leftOn.nonEmpty,
      "asof join: leftOn and rightOn must be non-empty and the same size")
    def e(c: Column): Expression = GraftPlanBridge.expression(c)
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(
        GraftPlanBridge.analyzed(left), GraftPlanBridge.analyzed(right),
        leftOn.map(e), rightOn.map(e), e(leftTs), e(rightTs),
        rightTieBreak.map(e), toleranceUs, leftOuter))
  }
}
