package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA whitening for embedding columns — the classic train-small /
  * apply-distributed decomposition (SemDeDup and embedding-dedup
  * pipelines whiten before cosine so one dominant direction doesn't
  * swamp similarity; retrieval stacks whiten before quantization).
  *
  * Split of labor, the only split that scales:
  *   - MOMENTS are computed distributed and EXACTLY (q133 gates the
  *     integer second-moment relation cross-engine): one pass, explode
  *     of the d(d+1)/2 upper-triangle products per row, partial
  *     aggregation combining map-side — the shuffle carries ≤ d²
  *     rows per partition regardless of corpus size.
  *   - The EIGENDECOMPOSITION runs on the driver over the d×d matrix
  *     (d = 64 here): O(d²) driver data, O(d³) driver compute — the
  *     same O(parameters) collect discipline as the k-means/PQ
  *     codebooks. Cyclic Jacobi, deterministic, no library.
  *   - The PROJECTION broadcasts the k×d whitening matrix back as a
  *     literal and applies via codegen'd higher-order functions
  *     (zip_with + aggregate per output component) — map-only, no
  *     shuffle, no UDF. */
object Pca {

  /** Driver-side cyclic Jacobi eigendecomposition of a symmetric d×d
    * matrix. Returns (eigenvalues, eigenvectors as rows), sorted by
    * eigenvalue descending; deterministic sweep order. */
  def jacobi(a0: Array[Array[Double]], sweeps: Int = 16): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var off = Double.MaxValue
    while (s < sweeps && off > 1e-22) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-30) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - sn * aiq
            a(i)(q) = sn * aip + c * aiq
          }
          for (j <- 0 until d) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - sn * aqj
            a(q)(j) = sn * apj + c * aqj
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - sn * viq
            v(i)(q) = sn * vip + c * viq
          }
        }
      }
      s += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(j => v(j)(i)).toArray).toArray)
  }

  /** Exact integer second-moment relation (i, j, m) over `vecCol`
    * (1-based upper triangle, elements quantized to micro-units —
    * CAST(double(x)·1e6 AS BIGINT), identical on every engine and
    * every shuffle order). Also the q133 gate's engine side.
    *
    * r19: the per-row product kernel is the native
    * [[graft.functions.expressions.UpperTriProducts]] single pass (the
    * interpreted nested-HOF struct pipeline was a 2.2 s serial stage at
    * sf0.1); rows explode by POSITION and the (i, j) coordinates attach
    * AFTER the aggregation from two d(d+1)/2-element literal lookup
    * arrays — the group key the exchange carries is one int, and the
    * 2080-row post-agg projection is where the pair labels re-enter.
    * Products, quantization, null/short-row behavior and the final
    * (i, j, m) values are identical to the HOF form (PcaSpec +
    * q133's oracle pin it). */
  def momentRelation(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val is = for (i <- 1 to d; j <- i to d) yield i
    val js = for (i <- 1 to d; j <- i to d) yield j
    df.select(posexplode(org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.expressions.UpperTriProducts(
          org.apache.spark.sql.GraftPlanBridge.expression(col(vecCol)), d)))
        .as(Seq("pos", "p")))
      .groupBy("pos").agg(sum("p").as("m"))
      .select(element_at(typedLit(is), col("pos") + 1).as("i"),
        element_at(typedLit(js), col("pos") + 1).as("j"), col("m"))
  }

  /** Exact per-component micro-unit sums (1-based), O(d) driver data —
    * integer, so deterministic on any shuffle order. */
  private def intSums(df: DataFrame, vecCol: String): Map[Int, Long] =
    df.select(explode(expr(
        s"""transform(transform($vecCol, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)),
           |          (x, i) -> struct(i + 1 AS i, x AS s))""".stripMargin)).as("g"))
      .groupBy(col("g.i").as("i")).agg(sum(col("g.s")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Mean-centered covariance from the exact moment relation plus the
    * (also exact) sum vector; O(d²) driver data. */
  def covariance(df: DataFrame, vecCol: String, d: Int): Array[Array[Double]] = {
    val n = df.count().toDouble
    val sums = intSums(df, vecCol)
    val mom = momentRelation(df, vecCol, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cov = Array.ofDim[Double](d, d)
    for (i <- 1 to d; j <- i to d) {
      // E[xy] − E[x]E[y], in (micro-unit)² then rescaled
      val c = (mom((i, j)).toDouble / n -
        (sums(i).toDouble / n) * (sums(j).toDouble / n)) / 1e12
      cov(i - 1)(j - 1) = c
      cov(j - 1)(i - 1) = c
    }
    cov
  }

  /** Whitening projection: y = Λ_k^{−1/2} · U_kᵀ · (x − μ), applied
    * map-only through broadcast literals + codegen HOFs. Components with
    * eigenvalue ≤ `floor` are dropped (degenerate directions). */
  def whiten(df: DataFrame, vecCol: String, d: Int, k: Int,
             floor: Double = 1e-9): Column = {
    val n = df.count().toDouble
    val sums = intSums(df, vecCol) // exact ⇒ the mean is deterministic
    val (ev, u) = jacobi(covariance(df, vecCol, d))
    val kept = (0 until k).filter(ev(_) > floor)
    val w = kept.map(c => (0 until d).map(j => u(c)(j) / math.sqrt(ev(c))))
    val mu = (1 to d).map(i => sums(i).toDouble / 1e6 / n)
    // the k×d matrix and the mean ship as SQL array literals
    // (Double.toString round-trips bit-exactly), applied by codegen'd
    // HOFs — one sequential dot per output component, map-only
    val centered =
      s"zip_with($vecCol, ${sqlArr(mu)}, (x, m) -> CAST(x AS DOUBLE) - m)"
    expr(s"transform(${sqlMat(w)}, r -> " +
      s"aggregate(zip_with(r, $centered, (a, b) -> a * b), 0D, (acc, p) -> acc + p))")
  }

  private def sqlArr(xs: Seq[Double]): String =
    xs.map(x => s"CAST(${java.lang.Double.toString(x)} AS DOUBLE)")
      .mkString("array(", ", ", ")")

  private def sqlMat(m: Seq[Seq[Double]]): String =
    m.map(sqlArr).mkString("array(", ", ", ")")
}
