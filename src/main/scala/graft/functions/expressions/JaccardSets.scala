package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native exact Jaccard over two `array<string>` shingle columns —
  * |A∩B| / |A∪B| with set (distinct) semantics, one hash pass, no
  * intermediate arrays. Bit-identical to the HOF formulation
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (integer set
  * sizes, one double division; 0/0 ⇒ NaN matches the built-in pair),
  * but the pair-join inner loop (q45/q71/q78/q90 and the LSH re-rank)
  * no longer materializes two intermediate arrays per candidate pair.
  * SURVEY §4 extension ladder tier (b); registered as SQL `jaccard_sets`
  * by [[graft.GraftExtensions]].
  *
  * Null ELEMENTS are skipped (our tokenizers never produce them; the
  * HOF reference path is only gated over non-null shingles). Codegen
  * emits a static call — the hash-set loop stays one JIT-compiled
  * method inside the whole-stage pipeline, the pattern Spark's own
  * collection built-ins use. */
case class JaccardSets(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sets"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSets.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaccardSets.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSets =
    copy(left = newLeft, right = newRight)
}

object JaccardSets {
  /** One hash pass: |A∩B| and |A∪B| from set A plus a membership sweep
    * of distinct B. Called from both eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    var inter = 0
    var onlyB = 0
    var j = 0
    while (j < b.numElements()) {
      if (!b.isNullAt(j)) {
        val s = b.getUTF8String(j)
        if (seenB.add(s)) {
          if (setA.contains(s)) inter += 1 else onlyB += 1
        }
      }
      j += 1
    }
    val union = setA.size + onlyB
    inter.toDouble / union.toDouble // 0/0 => NaN, as the HOF pair yields
  }
}
