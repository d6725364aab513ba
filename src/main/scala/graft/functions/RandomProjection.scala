package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with a ±1 (Achlioptas-style)
  * sign matrix derived from md5 — the cheap, data-independent
  * dimensionality reduction in front of ANN / clustering / dedup when
  * even PCA's one training pass is too much. JL: k = O(log n / ε²)
  * output dims preserve pairwise distances within (1±ε) w.h.p.; ±1
  * entries (vs Gaussians) keep the arithmetic EXACT in integer
  * micro-units, so the projection is bit-reproducible on any engine
  * and any shuffle order — and oracle-gateable (q136).
  *
  * The sign matrix is a pure function of (k, j) through md5 — no RNG
  * state, no seed file: any engine (and the DuckDB oracle) derives the
  * SAME matrix from the same strings. It is built ONCE driver-side
  * (k·d md5 calls) and shipped as a literal into a codegen'd
  * zip_with/aggregate — map-only, no shuffle, no UDF; the same
  * broadcast-the-tiny-model shape as Pca.whiten. */
object RandomProjection {

  /** Deterministic ±1 sign: parity of the first hex digit of
    * md5("k:j") (1-based), identical to the oracle's SQL derivation. */
  def sign(k: Int, j: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$k:$j".getBytes("UTF-8"))
    // first hex digit = high nibble of byte 0
    if (((hex(0) >> 4) & 0x1) == 0) 1L else -1L
  }

  /** Projection column for `vecCol` (float array, 1-based dims 1..d) to
    * `k` exact integer components: y_k = Σ_j s(k,j)·trunc(1e6·x_j).
    * Pure column expression — no data pass, usable on any frame. */
  def project(vecCol: String, d: Int, k: Int): Column = {
    val rows = (1 to k).map(r =>
      (1 to d).map(j => sign(r, j).toString).mkString("array(", "L, ", "L)"))
      .mkString("array(", ", ", ")")
    expr(s"""transform($rows, r ->
            |  aggregate(
            |    zip_with(r, transform($vecCol,
            |      x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)),
            |      (s, v) -> s * v),
            |    0L, (acc, p) -> acc + p))""".stripMargin)
  }
}
