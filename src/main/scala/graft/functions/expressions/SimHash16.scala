package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native 16-bit SimHash over a token array: one pass, one Murmur3 hash per
  * token, vote accumulation in a stack array — replaces the HOF
  * formulation's per-token 16-wide vote vector allocation
  * (`NearDup.simhash16`) on the hot path. Sketch semantics (near-dups at
  * small Hamming distance) are pinned by TextVectorSpec on planted pairs;
  * the hash family differs from the HOF version (Murmur3 vs xxhash64),
  * which is fine — SimHash quality depends only on hash independence.
  * Registered as SQL `simhash16` by [[graft.GraftExtensions]]. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](16)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = Murmur3_x86_32.hashUnsafeBytes(
          t.getBaseObject, t.getBaseOffset, t.numBytes, 42)
        var b = 0
        while (b < 16) {
          votes(b) += (if (((h >> b) & 1) == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val sketch = ctx.freshName("sketch")
      s"""
         |int[] $votes = new int[16];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $t = $a.getUTF8String($i);
         |    int $h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42);
         |    for (int $b = 0; $b < 16; $b++) {
         |      $votes[$b] += ((($h >> $b) & 1) == 1) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sketch = 0L;
         |for (int $b = 0; $b < 16; $b++) {
         |  if ($votes[$b] > 0) $sketch |= (1L << $b);
         |}
         |${ev.value} = $sketch;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
