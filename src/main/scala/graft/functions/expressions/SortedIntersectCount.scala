package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native |A∩B| over two SORTED-ASCENDING, DISTINCT `array<long>`
  * columns — a single merge walk, no per-row hash set, no intermediate
  * array. Equal to `size(array_intersect(a, b))` whenever both inputs
  * are sorted ascending with distinct non-null elements (the caller
  * contract; SimJoin's fingerprint arrays are built
  * `sort_array(array_distinct(...))`).
  *
  * Why it exists: the exact-similarity verify (text/SimJoin) evaluates
  * one intersection per CANDIDATE PAIR — `array_intersect` allocates
  * and fills an OpenHashSet plus an output array per evaluation, which
  * made the verify stage the hottest loop of the whole q123/q134/q149
  * family (guide §1.2 step 2: per-task work, after the candidate count
  * itself is pruned). The merge walk is allocation-free and stays one
  * JIT-compiled method inside whole-stage codegen, the same SURVEY §4
  * tier-(b) pattern as [[FloatVecDot]]/[[JaccardSets]].
  *
  * Null elements are not expected under the contract; for safety a null
  * slot is skipped (never counted, never dereferenced). Unsorted input
  * would silently under-count — callers must sort, and SimJoinSpec pins
  * parity against `array_intersect` on the gated pipeline.
  * Registered as SQL `sorted_intersect_count` by
  * [[graft.GraftExtensions]]. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SortedIntersectCount" +
        s".compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Merge walk over two sorted-distinct long arrays; null slots are
    * skipped. Called from both eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    cnt
  }
}
