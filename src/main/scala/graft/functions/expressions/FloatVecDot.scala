package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` (or two `array<double>`)
  * columns, accumulating in DOUBLE — bit-identical to the HOF formulation
  * (`aggregate(zip_with(a,b,(x,y)->xd*yd), 0d, +)`: same left-to-right
  * fold), but without materializing the intermediate product array per row
  * pair. On the near-dup/top-k joins this is the per-pair inner loop, so
  * the allocation saving is the whole win (SURVEY §4: custom `Expression`
  * once profiling shows HOF overhead). Registered as SQL `vec_dot` by
  * [[graft.GraftExtensions]].
  *
  * Mismatched lengths fold over the shorter prefix (callers join
  * fixed-width embedding columns).
  *
  * A NULL element in either array nulls the whole result — the same
  * propagation the HOF formulation has (`x*NULL` is NULL and the `+` fold
  * absorbs it), so the bit-parity claim holds on `containsNull=true`
  * inputs too (parquet-read arrays default to nullable elements even when
  * no element is ever null).
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean =
    left.nullable || right.nullable || Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  /** Element type shared by both sides (float or double), or None. */
  private def elemType: Option[DataType] = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => Some(FloatType)
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> or two array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val dbl = elemType.contains(DoubleType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc +=
        (if (dbl) x.getDouble(i) * y.getDouble(i)
         else x.getFloat(i).toDouble * y.getFloat(i).toDouble)
      i += 1
    }
    acc
  }

  /** Whether either input's ELEMENTS can be null (drives the per-element
    * null check; input-level nulls are nullSafeCodeGen's job). */
  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get = if (elemType.contains(DoubleType)) "getDouble" else "getFloat"
      // when no element can be null, `nullable` can be false and
      // nullSafeCodeGen then never declares ${ev.isNull} — referencing it
      // would make the generated Java fail to compile (and silently fall
      // back to interpreted mode), so the check is emitted conditionally
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
