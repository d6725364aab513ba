package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit bloom-filter join pruning — the 100 TB semi-join technique
  * Catalyst's InjectRuntimeFilter applies automatically when it can, made
  * available as a first-class operator for when it can't (the build side
  * behind a non-join boundary, a multi-use sketch, or a pruning predicate
  * the optimizer won't infer).
  *
  * Shape: reduce the dim side to one ~MB-scale binary sketch (two-phase
  * aggregate, map-side partials), broadcast it, and probe each fact row
  * BEFORE the join's shuffle. No false negatives (bloom_contains returns
  * true for every present key), so prune-then-join ≡ join; false positives
  * only cost wasted shuffle rows, bounded by the sketch's fpp. At 100 TB
  * the win is the shuffle: a 1% -selectivity dim turns a full-fact exchange
  * into a ~1% exchange for the price of one broadcast.
  */
object BloomPrune {

  /** Filter `fact` down to rows whose `factKey` might appear in
    * `dim.dimKey`. Exact superset of the semi-join; compose with the real
    * join afterwards for exact results.
    *
    * The sketch aggregate executes eagerly here and re-enters the probe
    * plan as a binary literal — might_contain requires a constant (or
    * scalar-subquery) filter, and this is precisely how Catalyst's
    * InjectRuntimeFilter runs its own bloom subquery before the main
    * query. One driver round-trip of a ~MB sketch, then the probe ships
    * to every task like any literal. Re-call prune() if `dim` changes. */
  def prune(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
            estimatedItems: Long = 1000000L): DataFrame = {
    // call_function (not string-interpolated expr): column names needing
    // quoting resolve correctly and nothing in dimKey can be parsed as SQL
    val sketch = dim
      .agg(call_function("bloom_agg", col(dimKey), lit(estimatedItems))
        .as("__bf"))
      .head().getAs[Array[Byte]]("__bf")
    // empty (or all-null-key) dim → the aggregate yields a NULL sketch; a
    // null literal would fail might_contain's Binary type check, and the
    // semantically right answer is "no key can match" — same as the
    // semi-join against an empty dim
    if (sketch == null) fact.where(lit(false))
    else fact.where(call_function("bloom_contains", lit(sketch), col(factKey)))
  }
}
