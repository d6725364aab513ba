package graft

import graft.functions.expressions.RollingHash
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extensions, installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` on every
  * session this engine creates (Verify, Bench, tests, tools) — the
  * documented public path for registering native Catalyst expressions
  * (SURVEY.md §4 extension ladder, tier (b)/(c)). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
  }
}
