package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native single-pass forms of the vector-quantization hot loops
  * (functions/Ivf.cellExpr, Pq.codesExpr, Pq.adcExpr). The HOF
  * formulations are correct but run INTERPRETED — Catalyst's
  * higher-order functions are CodegenFallback, so every corpus row pays
  * lambda dispatch plus an intermediate array per `transform`, nested
  * m×ksub deep for PQ encoding (two Lloyd passes + the encode pass per
  * index build). Each expression here reproduces its HOF twin's DOUBLE
  * arithmetic exactly: dots accumulate left-to-right like vec_dot
  * ([[FloatVecDot]]), argmax resolves ties to the LOWEST index under
  * the same total order `array_position(xs, array_max(xs))` uses
  * (java.lang.Double.compare — first strict improvement wins), and the
  * ADC fold sums in code order from 0.0. Parity is pinned per
  * expression in MultimodalSpec against the HOF forms.
  *
  * The quantizer tables ride the expression as constructor payloads
  * (driver-resolved literals, exactly like the `typedLit` forms they
  * replace) — O(parameters), never data. */
private[graft] object VectorQuant {
  /** argmax under Double.compare, first index on ties — the
    * array_position(xs, array_max(xs)) contract. */
  def argmax(scores: Array[Double]): Int = {
    var best = scores(0)
    var idx = 0
    var j = 1
    while (j < scores.length) {
      if (java.lang.Double.compare(scores(j), best) > 0) {
        best = scores(j); idx = j
      }
      j += 1
    }
    idx
  }
}

/** `ivf_cell(vu)`: 0-based index of the max-dot centroid — the native
  * twin of [[graft.functions.Ivf.cellExpr]]. */
case class IvfCellAssign(child: Expression, centroids: Seq[Seq[Double]])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Int = {
    val v = arr.toDoubleArray()
    val cs = cents
    val scores = new Array[Double](cs.length)
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      val n = math.min(v.length, cv.length) // vec_dot's shorter-prefix fold
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v(i) * cv(i); i += 1 }
      scores(c) = acc
      c += 1
    }
    VectorQuant.argmax(scores)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $expr.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCellAssign =
    copy(child = newChild)
}

/** `pq_encode(vu)`: the m PQ codes of a vector against literal
  * codebooks — the native twin of [[graft.functions.Pq.codesExpr]]:
  * code s = argmax_j ( <sub_s(v), cb(s)(j)> − ‖cb(s)(j)‖²/2 ), the
  * −‖c‖²/2 term folded driver-side exactly as codesExpr folds it. */
case class PqEncode(child: Expression, cb: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  @transient private lazy val books: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray
  // -||c||²/2 per (s, j) — identical accumulation order to Pq.codesExpr's
  // driver-side fold (-c.map(x => x*x).sum / 2)
  @transient private lazy val halfN: Array[Array[Double]] =
    cb.map(_.map(c => -c.map(x => x * x).sum / 2).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val v = arr.toDoubleArray()
    val bs = books
    val hn = halfN
    val m = bs.length
    val dsub = if (m > 0 && bs(0).length > 0) bs(0)(0).length else 0
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = bs(s)
      val off = s * dsub
      val scores = new Array[Double](book.length)
      var j = 0
      while (j < book.length) {
        val cv = book(j)
        // vec_dot over slice(vu, off+1, dsub): the slice is at most dsub
        // wide (shorter when the vector runs out — same shorter-prefix
        // fold the HOF slice+vec_dot pair performs)
        val n = math.min(math.max(v.length - off, 0), dsub)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v(off + i) * cv(i); i += 1 }
        scores(j) = acc + hn(s)(j)
        j += 1
      }
      codes(s) = VectorQuant.argmax(scores)
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$expr.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(codes)`: ADC score — Σ_s LUT(s)(codes(s)), summing
  * left-to-right from 0.0 exactly like [[graft.functions.Pq.adcExpr]]'s
  * aggregate fold. */
case class PqAdc(child: Expression, lut: Seq[Seq[Double]])
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.catalogString}")
  }

  @transient private lazy val table: Array[Array[Double]] =
    lut.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Double = {
    val t = table
    val m = arr.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) { acc += t(s)(arr.getInt(s)); s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $expr.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
