package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Determinism helpers implementing SURVEY.md §2.3's normative rules so that
  * result byte streams hash-match the DuckDB oracle:
  *   1. total ORDER BY on every query;
  *   2. money/double aggregates via exact DECIMAL(18,2) (order-independent);
  *   3. timestamps rendered "yyyy-MM-dd HH:mm:ss" in UTC;
  *   4. integer-ish outputs widened to LONG (DuckDB defaults to BIGINT).
  */
object Norm {
  val Dec2: DecimalType = DecimalType(18, 2)
  val Dec4: DecimalType = DecimalType(18, 4)
  val Dec94: DecimalType = DecimalType(9, 4)

  /** Exact money cast — inputs are 2-dp doubles, so the cast is lossless. */
  def dec2(c: Column): Column = c.cast(Dec2)
  def dec4(c: Column): Column = c.cast(Dec4)

  /** Terminal rendering of a DECIMAL output column. The driver's hasher
    * renders Spark-written decimals and DuckDB decimals through different
    * paths (`17.0` vs `17.00` for integral values — all 5 round-1 hash
    * failures), so money columns leave the engine as fixed-scale strings:
    * Spark `Decimal.toString` and DuckDB `CAST(dec AS VARCHAR)` both emit
    * the full declared scale. Internally everything stays DECIMAL (exact,
    * order-independent); only the final select changes. */
  def decStr(c: Column): Column = c.cast(Dec2).cast("string")

  /** Same, at scale 4 (cosine similarities, rates). */
  def dec4Str(c: Column): Column = c.cast(DecimalType(9, 4)).cast("string")

  /** Order-independent exact SUM, re-narrowed to DECIMAL(18,2) to match the
    * oracle's final CAST (Spark widens sums to DECIMAL(28,2) internally). */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast(Dec2)

  /** Rule 3: render timestamps as UTC strings — immune to parquet physical
    * precision differences between engines. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** DuckDB COUNT(*) is BIGINT; Spark count already LONG — kept for intent. */
  def cntLong: Column = count(lit(1)).cast(LongType)
}
