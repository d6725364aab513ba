package graft

import graft.functions.Pca
import org.apache.spark.sql.functions._

/** PCA whitening (functions/Pca.scala, q133): Jacobi eigensolver
  * correctness, whitened-sample covariance ≈ I, and the distributed
  * projection matching a driver-side reference. */
class PcaSpec extends SparkTestBase {

  test("jacobi: recovers a known spectrum and orthonormal vectors") {
    // A = U diag(5,2,1) U^T for a hand-rolled orthonormal U (rotations)
    val d = 3
    val lam = Array(5.0, 2.0, 1.0)
    val th1 = 0.3; val th2 = 0.7
    // rotation in (0,1) then (1,2)
    def rot(axis: Int, th: Double): Array[Array[Double]] = {
      val m = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      val (a, b) = (axis, axis + 1)
      m(a)(a) = math.cos(th); m(a)(b) = -math.sin(th)
      m(b)(a) = math.sin(th); m(b)(b) = math.cos(th)
      m
    }
    def mul(x: Array[Array[Double]], y: Array[Array[Double]]) =
      Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => x(i)(k) * y(k)(j)).sum)
    val u = mul(rot(0, th1), rot(1, th2))
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => u(i)(k) * lam(k) * u(j)(k)).sum)
    val (ev, vec) = Pca.jacobi(a)
    assert(ev.zip(lam).forall { case (got, want) => math.abs(got - want) < 1e-10 })
    // rows orthonormal
    for (r1 <- vec; r2 <- vec) {
      val dot = r1.zip(r2).map { case (x, y) => x * y }.sum
      val want = if (r1 eq r2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10)
    }
    // eigen equation A v = λ v
    ev.zip(vec).foreach { case (l, v) =>
      val av = (0 until d).map(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      assert(av.zip(v).forall { case (x, y) => math.abs(x - l * y) < 1e-9 })
    }
  }

  test("whiten: sample covariance of the projected embeddings is the identity") {
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val k = 8
    val proj = emb.select(Pca.whiten(emb, "embedding", 64, k).as("y"))
      .collect().map(_.getSeq[Double](0).toArray)
    assert(proj.head.length === k)
    val n = proj.length.toDouble
    val mu = (0 until k).map(c => proj.map(_(c)).sum / n)
    for (c1 <- 0 until k; c2 <- c1 until k) {
      val cov = proj.map(p => (p(c1) - mu(c1)) * (p(c2) - mu(c2))).sum / n
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(cov - want) < 0.05,
        s"whitened cov($c1,$c2) = $cov, want $want")
    }
  }

  test("jl projection: pairwise distances preserved within the lemma's tolerance") {
    import graft.functions.RandomProjection
    val emb = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"),
        RandomProjection.project("embedding", 64, 16).as("y"))
      .collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble * 1e6).toArray,
        r.getSeq[Long](2).map(_.toDouble).toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      (i, ix) <- emb.zipWithIndex; j <- emb.drop(ix + 1)
      orig = d2(i._1, j._1) if orig > 0
    } yield (d2(i._2, j._2) / 16.0) / orig // E[|y|²] = k·|x|² for ±1 JL
    // k = 16 is small, so the tolerance is loose — but the MEDIAN ratio
    // must hug 1 and no pair may collapse to zero or blow past 4x
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    assert(math.abs(median - 1.0) < 0.35, s"median ratio $median")
    assert(sorted.head > 0.05 && sorted.last < 5.0,
      s"extremes ${sorted.head} .. ${sorted.last}")
  }

  test("whiten: distributed projection equals the driver-side reference row-for-row") {
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val k = 4
    val rows = emb.select(col("vec_id"), col("embedding"),
        Pca.whiten(emb, "embedding", 64, k).as("y"))
      .orderBy("vec_id").limit(5).collect()
    // driver reference from the same deterministic moments
    val n = emb.count().toDouble
    val cov = Pca.covariance(emb, "embedding", 64)
    val (ev, u) = Pca.jacobi(cov)
    val sums = emb.select(explode(expr(
        """transform(transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)),
          |          (x, i) -> struct(i + 1 AS i, x AS s))""".stripMargin)).as("g"))
      .groupBy(col("g.i").as("i")).agg(sum(col("g.s")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mu = (1 to 64).map(i => sums(i).toDouble / 1e6 / n)
    rows.foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble)
      val got = r.getSeq[Double](2)
      val want = (0 until k).map(c =>
        (0 until 64).map(j => (u(c)(j) / math.sqrt(ev(c))) * (x(j) - mu(j))).sum)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"vec ${r.getLong(0)}: $g vs $w")
      }
    }
  }
}
