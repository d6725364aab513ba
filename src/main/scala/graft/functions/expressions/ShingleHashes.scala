package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Distinct word-trigram hashes in one pass: hashes each token once
  * (Murmur3), combines each consecutive triple into a 64-bit shingle hash,
  * and dedupes — replacing the HOF pipeline
  * `array_distinct(transform(sequence, concat_ws(...)))` + per-shingle
  * re-hash, which materializes ~|tokens| intermediate strings per document.
  * Downstream MinHash/banding and Jaccard operate on the hash values
  * (collision probability 2^-64 — immaterial for candidate generation).
  * Registered as SQL `shingle_hashes` by [[graft.GraftExtensions]]. */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) 0L else {
        val t = arr.getUTF8String(i)
        Murmur3_x86_32.hashUnsafeBytes(
          t.getBaseObject, t.getBaseOffset, t.numBytes, 42).toLong
      }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i + 2 < n) {
      seen.add((th(i) * 1000003L + th(i + 1)) * 1000003L + th(i + 2))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  // Interpreted eval is already allocation-light (primitive arrays + one
  // hash set); codegen falls back to it via the default UnaryExpression
  // path to keep the generated code simple.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$expr.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
