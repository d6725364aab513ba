package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O39: vector similarity over `ArrayType(FloatType)` embedding columns,
  * built from higher-order functions only (`zip_with` + `aggregate`) — no
  * UDF, so the arithmetic stays inside whole-stage codegen and is
  * column-pruned/pushed like any other expression (SURVEY.md §2.2 O39, §4).
  *
  * All arithmetic is promoted to DOUBLE before accumulation: both engines
  * then execute the identical left-to-right fold over the array, so results
  * agree bit-for-bit (the DuckDB oracle mirrors this with
  * `list_transform(... CAST AS DOUBLE)` + `list_sum`).
  */
object VectorOps {

  /** Left-fold sum of an array column in element order. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product of two equal-length float-array columns, in double.
    * Dispatches to the native `vec_dot` expression (same left fold, no
    * per-row intermediate array) when the session has GraftExtensions —
    * every session this engine creates does; `dotHof` is the
    * engine-agnostic reference formulation. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** HOF reference formulation of [[dot]] (bit-identical fold). */
  def dotHof(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm, in double. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** HOF reference formulation of [[l2]]. */
  def l2Hof(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity in [-1, 1]; NaN when either side is a zero vector. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2(a) * l2(b))
}
