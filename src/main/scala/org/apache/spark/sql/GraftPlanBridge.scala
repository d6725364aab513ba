package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** The one sanctioned crossing between graft's custom logical plans and
  * the session: `Dataset.ofRows` is `private[sql]`, so the adapter lives
  * in this package — the standard technique for Spark-native libraries
  * that introduce their own `LogicalPlan` nodes (Delta, Sedona, and the
  * connector ecosystem all ship exactly this shim). Everything else in
  * the repo stays out of Spark's namespace. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Analyzed plan of a DataFrame, for building composite plans. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed

  /** Catalyst expression behind a Column (Spark 4 wraps ColumnNode). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Column over a Catalyst expression — the inverse crossing. Engine
    * operators build their native expressions through this instead of
    * the SQL registry (`expr("fn(...)")`), so they stay usable in a
    * session created WITHOUT the GraftExtensions extension (r18 ADVICE:
    * registry resolution made every SimJoin API analysis-fail there). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
