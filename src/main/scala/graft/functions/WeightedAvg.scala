package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the weighted-average UDAF (price weighted by discount). */
case class WPoint(price: Double, weight: Double)

/** Exact intermediate sums — DECIMAL semantics so the merge is
  * order-independent across partitions (SURVEY.md §2.3 rule 2). */
case class WBuf(num: BigDecimal, den: BigDecimal)

/** O41: UDAF surface — a typed `Aggregator` registered through
  * `functions.udaf` (SURVEY.md §2.2 O41, D-Q38). Semantics pinned to the
  * oracle's arithmetic: inputs cast to DECIMAL(18,2)/DECIMAL(18,4) before
  * accumulation (exact, order-independent partial aggregation — Spark runs
  * this as a two-phase agg with `merge` combining partition buffers), the
  * final division in DOUBLE, rounded half-up to 2 dp, rendered as a
  * fixed-scale string.
  */
object WeightedAvg extends Aggregator[WPoint, WBuf, String] {
  private def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
  private def d4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
  def reduce(b: WBuf, p: WPoint): WBuf =
    WBuf(b.num + d2(p.price) * d4(p.weight), b.den + d4(p.weight))
  def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.num + b.num, a.den + b.den)
  def finish(b: WBuf): String =
    if (b.den.signum == 0) null
    else BigDecimal(b.num.toDouble / b.den.toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString

  def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
  def outputEncoder: Encoder[String] = Encoders.STRING
}
