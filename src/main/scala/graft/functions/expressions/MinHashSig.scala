package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-slot MinHash signature in ONE pass over the shingle-hash array —
  * bit-identical to the HOF reference formulation
  * `array((0 until k).map(i => array_min(transform(sh, h =>
  * xxhash64(lit(i), h)))))` (text/NearDup.minhashSignature), which
  * evaluates k INTERPRETED HigherOrderFunction passes per document and
  * allocates k intermediate arrays. Here the k per-slot seeds
  * `S_i = XXH64.hashInt(i, 42)` fold driver-side once (exactly the
  * state `xxhash64(lit(i), ...)` reaches after its first child — the
  * built-in's seed is 42), and one traversal updates all k running
  * minimums with `XXH64.hashLong(h, S_i)` per slot.
  *
  * Edge parity with the reference: an EMPTY shingle array yields k NULL
  * slots (`array_min` of an empty transform is null); a NULL element
  * contributes `S_i` to slot i (`xxhash64` skips null children, leaving
  * its accumulated seed). A null input row nulls the whole signature
  * (UnaryExpression null propagation — `array()` of the HOF form never
  * sees the row either way, both formulations sit under the same
  * projection). Registered as SQL `minhash_sig(sh, k)` by
  * [[graft.GraftExtensions]]; k must be a foldable positive int. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"minhash_sig: k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  // the k per-slot seeds: xxhash64(lit(i), h) == hashLong(h, hashInt(i, 42))
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // k nulls
    val s = seeds
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // xxhash64(lit(slot), NULL) leaves the accumulated seed untouched
        var j = 0
        while (j < k) { if (s(j) < mins(j)) mins(j) = s(j); j += 1 }
      } else {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = XXH64.hashLong(h, s(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$expr.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
