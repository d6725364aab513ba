package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Upper-triangle second-moment products of a quantized embedding row in
  * ONE native pass — the per-row kernel of [[graft.functions.Pca]]'s
  * moment relation (q133's gate). Element k of the output is
  * `q(i)·q(j)` for the k-th (i ≤ j) pair in row-major order
  * (i = 1..d, j = i..d), where `q(x) = CAST(CAST(x AS DOUBLE)·10⁶ AS
  * BIGINT)` — the exact micro-unit quantization the HOF form applied
  * (double→long truncates toward zero; embeddings are in [-1, 1], far
  * from overflow). Replaces the interpreted nested
  * `flatten(transform(sequence, i -> transform(sequence, j -> struct)))`
  * pipeline, which paid ~2·d(d+1)/2 lambda dispatches plus a struct
  * allocation per product PER ROW (the q133 profile read one 2.2 s
  * serial task at sf0.1).
  *
  * Positions where i or j exceed the row's length yield NULL — exactly
  * `element_at` past the end under the HOF form — so short rows degrade
  * identically (the downstream `sum` skips nulls). */
case class UpperTriProducts(child: Expression, d: Int)
  extends UnaryExpression {

  require(d >= 1, s"upper_tri_products: d must be >= 1, got $d")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "upper_tri_products"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType == ArrayType(FloatType, true) ||
      child.dataType == ArrayType(FloatType, false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val n = math.min(arr.numElements(), d)
    val q = new Array[Long](n)
    val qNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) qNull(i) = true
      else {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = (x * 1000000d).toLong // CAST(double AS BIGINT): trunc to zero
      }
      i += 1
    }
    val out = new Array[Any](d * (d + 1) / 2)
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) =
          if (i >= n || j >= n || qNull(i) || qNull(j)) null
          else java.lang.Long.valueOf(q(i) * q(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$expr.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UpperTriProducts =
    copy(child = newChild)
}
