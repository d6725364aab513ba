package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SORTED DISTINCT 64-bit word-trigram fingerprints straight from a
  * token array — the exact-similarity family's set materialization
  * (text/SimJoin.matOf) fused into one pass. Replaces the pipeline
  * `sort_array(array_distinct(transform(array_distinct(trigrams), x ->
  * xxhash64(x))))` over trigram STRINGS, which materializes ~|tokens|
  * intermediate `concat_ws` strings per document before hashing them
  * (TextOps.trigrams + matOf — the family's checkpoint-stage cost).
  *
  * Hash domain: each token hashes ONCE via XXH64 over its UTF-8 bytes
  * (seed 42, the engine-wide xxhash64 seed), and a trigram fingerprint
  * chains the three 64-bit token hashes through XXH64.hashLong — the
  * same accumulation xxhash64(t1, t2, t3) performs. Two distinct
  * trigrams collide only at the 2⁻⁶⁴ class the SimJoin scaladoc already
  * documents for its string fingerprints (the full 64-bit token-hash
  * chain keeps it there; a 32-bit token hash would not). The VALUES
  * differ from `xxhash64(trigram string)` — fingerprints are internal
  * join/intersect keys, never query output — and |fps| equals the
  * distinct trigram-string count except under such a collision, so the
  * set size `n` the thresholds use is byte-identical on real corpora.
  *
  * Fewer than 3 tokens → empty array (no trigram exists). Null tokens
  * hash as the empty string (TextOps.tokens never emits null — this is
  * a defensive total function, matching ShingleHashes' null handling
  * class). Output is sorted ascending and distinct — the contract
  * [[SortedIntersectCount]] verifies against. Registered as SQL
  * `shingle_fps` by [[graft.GraftExtensions]]. */
case class ShingleFps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    // one 64-bit hash per token
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) XXH64.hashUnsafeBytes(null, 0L, 0, 42L)
      else {
        val t = arr.getUTF8String(i)
        XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      }
      i += 1
    }
    // chain each consecutive triple, then sort + dedupe in place
    val fp = new Array[Long](n - 2)
    i = 0
    while (i + 2 < n) {
      fp(i) = XXH64.hashLong(th(i + 2),
        XXH64.hashLong(th(i + 1), XXH64.hashLong(th(i), 42L)))
      i += 1
    }
    java.util.Arrays.sort(fp)
    var w = 1
    i = 1
    while (i < fp.length) {
      if (fp(i) != fp(w - 1)) { fp(w) = fp(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == fp.length) fp else java.util.Arrays.copyOf(fp, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$expr.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleFps =
    copy(child = newChild)
}
