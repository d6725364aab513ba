package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Ordered per-key sequence folds with BOUNDED memory — the scale path
  * for inherently sequential recurrences (EWMA, n-gram path mining) that
  * no window frame expresses.
  *
  * Why not collect-sort-fold (the q139/q143 shape through round 8): a
  * `collect_list` per key materializes the key's WHOLE history as one
  * array value — at 100 TB a hot key's multi-GB history must fit a
  * single aggregation buffer, which is exactly the OOM the watermark /
  * chunking disciplines elsewhere in this repo exist to avoid.
  *
  * Why not a chunked fold with composed summaries: the EWMA step
  * e' = (e + c) div 2 DOES compose — by the exact integer identity
  * floor((floor(a/b) + c) / d) = floor((a + b·c) / (b·d)), a chunk of
  * length L collapses to e' = (e + Σ cᵢ·2^(i−1)) div 2^L — but the
  * composed numerator carries 2^L-scaled weights, so bounded arithmetic
  * (even DECIMAL(38)) caps L at ~120 before overflow: the associative
  * scan exists mathematically but not in fixed-width integers. The
  * recurrence is inherently sequential in bounded arithmetic.
  *
  * The honest scale shape is therefore a STREAMED sorted fold:
  * `flatMapSortedGroups` sorts each partition with Spark's spillable
  * external sorter (same machinery as sort-merge join — disk-backed, no
  * whole-history array), then hands each key an ORDERED ITERATOR the
  * fold consumes with O(1) state — per-(key,chunk) local work with the
  * carried seed implicit in the accumulator, chunk boundaries being
  * whatever the sorter spilled. One shuffle on the key, identical to
  * the collect form's aggregation exchange. */
object SeqFold {

  /** Exact integer EWMA (α = 1/2) per user over (ts, event_id)-ordered
    * cents: e₁ = c₁, eᵢ = (eᵢ₋₁ + cᵢ) div 2 — DuckDB's init-less
    * `list_reduce` seeding, truncating division (all values
    * non-negative here, so truncation == floor on both engines).
    * Input columns: user_id (long), ts, event_id, cents (long, ≥ 0).
    * Output: (user_id, n, ewma) — one row per user with ≥ 1 event. */
  def ewmaCents(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.groupByKey(_.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapSortedGroups(col("ts"), col("event_id")) { (uid, it) =>
        var n = 0L
        var acc = 0L
        it.foreach { r =>
          val c = r.getAs[Long]("cents")
          acc = if (n == 0L) c else (acc + c) / 2
          n += 1
        }
        if (n == 0L) Iterator.empty else Iterator.single((uid, n, acc))
      }
      .toDF("user_id", "n", "ewma")
  }

  /** Leftmost non-overlapping matches of the pattern `start middle* end`
    * over each user's (ts, event_id)-ordered event_type sequence — the
    * MATCH_RECOGNIZE / CEP primitive Spark SQL lacks, as an O(1)-state
    * streaming automaton. Semantics are EXACTLY a regex scan of
    * `s m* e` over the sequence string (the oracle's
    * regexp_extract_all): `pending` means some candidate start has seen
    * only `middle`s since; `start` (re)arms it, `middle` preserves it,
    * `end` completes a match and consumes it (non-overlap), anything
    * else kills it. The three letters must be distinct. Returns
    * (user_id, n_matches) for users with ≥ 1 match. */
  def countGreedy(df: DataFrame, start: String, middle: String,
                  end: String): DataFrame = {
    require(Set(start, middle, end).size == 3,
      "countGreedy: pattern letters must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    df.groupByKey(_.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapSortedGroups(col("ts"), col("event_id")) { (uid, it) =>
        var pending = false
        var n = 0L
        it.foreach { r =>
          r.getAs[String]("event_type") match {
            case `start`  => pending = true
            case `middle` => // pending unchanged
            case `end`    => if (pending) { n += 1; pending = false }
            case _        => pending = false
          }
        }
        if (n == 0L) Iterator.empty else Iterator.single((uid, n))
      }
      .toDF("user_id", "n_matches")
  }

  /** Clamped running balance per user: acc ← max(0, acc + delta) over
    * the (ts, event_id)-ordered deltas, seeded at 0 — the
    * inventory/credit-balance fold where the floor RESETS the state, so
    * no window frame or prefix-sum decomposition expresses it (the
    * clamp makes the fold non-associative AND non-linear; unlike EWMA
    * there is not even an exponentially-weighted composition). Returns
    * (user_id, n, balance). Input: user_id, ts, event_id, delta (long,
    * any sign). */
  def clampedBalance(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.groupByKey(_.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapSortedGroups(col("ts"), col("event_id")) { (uid, it) =>
        var n = 0L
        var acc = 0L
        it.foreach { r =>
          acc = math.max(0L, acc + r.getAs[Long]("delta"))
          n += 1
        }
        if (n == 0L) Iterator.empty else Iterator.single((uid, n, acc))
      }
      .toDF("user_id", "n", "balance")
  }

  /** One-sided CUSUM drift monitor per user (Page 1954 — the classic
    * sequential changepoint statistic): over the (ts, event_id)-ordered
    * cents, s ← max(0, s + (c − k)); when s reaches the decision
    * threshold h an ALARM fires and the statistic restarts at 0 (the
    * standard post-alarm reset). The clamp AND the reset both make the
    * fold non-associative with no algebraic chunk composition (same
    * argument as [[clampedBalance]], plus a second reset nonlinearity) —
    * the fourth streamed-fold tenant. All arithmetic in exact integers;
    * k is the drift allowance, h the alarm threshold. Returns
    * (user_id, n, alarms, final_s) per user with ≥ 1 event. */
  def cusum(df: DataFrame, k: Long, h: Long): DataFrame = {
    require(h > 0 && k >= 0, s"cusum: need h > 0, k >= 0; got k=$k h=$h")
    val spark = df.sparkSession
    import spark.implicits._
    df.groupByKey(_.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapSortedGroups(col("ts"), col("event_id")) { (uid, it) =>
        var n = 0L
        var s = 0L
        var alarms = 0L
        it.foreach { r =>
          s = math.max(0L, s + r.getAs[Long]("cents") - k)
          if (s >= h) { alarms += 1; s = 0L }
          n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((uid, n, alarms, s))
      }
      .toDF("user_id", "n", "alarms", "final_s")
  }

  /** Ordered trigram paths per user: for each user's (ts, event_id)-
    * ordered event_type sequence, emit every consecutive 3-step path as
    * "a b c" — O(1) state (a 2-token ring), users with < 3 events emit
    * nothing. Input columns: user_id (long), ts, event_id, event_type. */
  def orderedTrigrams(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.groupByKey(_.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapSortedGroups(col("ts"), col("event_id")) { (_, it) =>
        var p1: String = null // t-2
        var p2: String = null // t-1
        it.flatMap { r =>
          val cur = r.getAs[String]("event_type")
          val out =
            if (p1 != null) p1 + " " + p2 + " " + cur :: Nil else Nil
          p1 = p2
          p2 = cur
          out
        }
      }
      .toDF("path")
  }
}
