package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC table validation — the "did replication actually converge?"
  * operator a DMS-style pipeline runs after (or alongside) a migration:
  * compare a replicated snapshot against an independently computed source
  * of truth WITHOUT shipping either table (the managed counterpart is
  * DMS table validation; the reference pipeline relies on spot checks,
  * reference README.md:417-451).
  *
  * Design for 100 TB: each side is reduced scan-side to (key, digest) —
  * the full-width row never survives the scan — then a single per-key
  * join compares digests, and the report aggregates to `buckets` rows
  * (per key-range bucket: row count, content checksum, mismatch/missing/
  * extra counts). Validating a 100 TB replica ships kilobytes. The digest
  * is the poly-31 mod 1e9+7 rolling hash both engines express exactly
  * ([[graft.functions.expressions.RollingHash]], q44), so SUM(digest) is
  * an order-independent table fingerprint either engine can recompute —
  * and per-bucket checksums let an operator bisect a corruption to a key
  * range without re-scanning everything.
  */
object Reconcile {

  /** Per-row content digest: rolling poly-hash over the concatenation of
    * each column's md5 hex (NULL → 32 zeros). The fixed-width per-column
    * rendering makes the digest injective up to md5 collisions — a
    * '|'-joined rendering was not: concat_ws silently skips NULLs, so
    * ("a", NULL) and (NULL, "a") rendered identically, and a value
    * containing the delimiter forged column boundaries — either way a
    * corrupted replica could digest equal to the truth. */
  def digest(cols: Seq[Column]): Column =
    call_function("rolling_hash",
      concat(cols.map(c => coalesce(md5(c.cast("string")), lit("0" * 32))): _*))

  /** Reconcile `left` (the replica) against `right` (the recomputed
    * source of truth) on integer key `key`: per bucket (key mod
    * `buckets`) — replica row count and content checksum, plus
    * mismatched / missing (right-only) / extra (left-only) key counts.
    * A healthy replica reports 0 / 0 / 0 in every bucket. */
  def reconcile(left: DataFrame, right: DataFrame, key: String,
                dataCols: Seq[String], buckets: Int = 4): DataFrame = {
    val l = left.select(col(key).as("k"),
      digest(dataCols.map(left(_))).as("ldg"))
    val r = right.select(col(key).as("rk"),
      digest(dataCols.map(right(_))).as("rdg"))
    l.join(r, col("k") === col("rk"), "full_outer")
      .select(pmod(coalesce(col("k"), col("rk")), lit(buckets))
          .cast("long").as("bucket"),
        col("k"), col("rk"), col("ldg"), col("rdg"))
      .groupBy("bucket")
      .agg(
        sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_rows"),
        // DECIMAL(38,0) accumulator: digests average ~5e8, so a BIGINT
        // sum overflows past ~1.8e10 rows per bucket — exactly the
        // 100 TB table this operator exists for (ANSI would throw;
        // non-ANSI would wrap while the recomputing engine does not).
        // Rendered as STRING at the boundary: wide-decimal surface
        // renderings diverge across engines/versions, and a checksum is
        // compared, never arithmetic'd, downstream.
        sum(coalesce(col("ldg"), lit(0L))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("checksum"),
        sum(when(col("k").isNotNull && col("rk").isNotNull &&
          col("ldg") =!= col("rdg"), 1L).otherwise(0L)).as("n_mismatch"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("rk").isNull, 1L).otherwise(0L)).as("n_extra"))
      .orderBy("bucket")
  }
}
