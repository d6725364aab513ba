package graft

import graft.text.{SimJoin, TextOps}
import org.apache.spark.sql.functions._

/** Prefix-filtered exact similarity join (text/SimJoin.scala, q123):
  * recall-1.0 parity against brute force, exact boundary decisions, and
  * the pruning that is the operator's whole point. */
class SimJoinSpec extends SparkTestBase {

  import spark.implicits._

  /** Brute-force all-pairs exact Jaccard — the spec SimJoin must equal. */
  private def brute(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int): Set[(Long, Long, Long)] =
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = sa.toSet.intersect(sb.toSet).size.toLong
      if i * tDen >= (sa.size + sb.size - i) * tNum
    } yield (a, b, i)).toSet

  private def run(sets: Seq[(Long, Seq[String])], tNum: Int, tDen: Int): Set[(Long, Long, Long)] =
    SimJoin.jaccardJoin(sets.toDF("id", "set"), tNum, tDen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("simjoin: parity with brute force on random token sets across thresholds") {
    val rnd = new scala.util.Random(47)
    val vocab = (0 until 60).map(i => f"t$i%02d")
    val sets = (0L until 80L).map { id =>
      val n = 4 + rnd.nextInt(12)
      id -> rnd.shuffle(vocab).take(n).distinct
    }
    // 1/100 is q78/q220's production threshold (near-zero τ — prefixes
    // approach whole sets, the prefix filter's degenerate corner)
    for ((tn, td) <- Seq((1, 100), (1, 2), (3, 10), (4, 5)))
      assert(run(sets, tn, td) === brute(sets, tn, td), s"tau=$tn/$td")
  }

  test("sorted_intersect_count == size(array_intersect) on sorted-distinct long arrays (incl. empty/disjoint/identical)") {
    // the verify merge walk (r18) must agree with the built-in it
    // replaced, on the exact input class SimJoin feeds it
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted
      val b = (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
      .select(col("i"), expr("sorted_intersect_count(a, b)").as("got"),
        size(expr("array_intersect(a, b)")).as("want"))
    val bad = df.filter(col("got") =!= col("want")).count()
    assert(bad === 0, s"$bad rows disagree with array_intersect")
  }

  test("simjoin: J == tau boundary pair is INCLUDED (integer cross-multiplication, no float cut)") {
    // |a|=|b|=3, i=2 -> J = 2/4 = 1/2 exactly
    val sets = Seq(1L -> Seq("x", "y", "p"), 2L -> Seq("x", "y", "q"))
    assert(run(sets, 1, 2) === Set((1L, 2L, 2L)))
    // and excluded one notch above: tau = 51/100 > 1/2
    assert(run(sets, 51, 100) === Set.empty[(Long, Long, Long)])
  }

  test("simjoin: disjoint and identical sets behave at the extremes") {
    val sets = Seq(1L -> Seq("a", "b"), 2L -> Seq("c", "d"), 3L -> Seq("a", "b"))
    assert(run(sets, 1, 1) === Set((1L, 3L, 2L))) // tau=1: only exact duplicates
  }

  test("simjoin: prefix relation is strictly smaller than the token relation (pruning is real)") {
    val docs = Tables.documents(spark, sf)
      .withColumn("w", TextOps.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id").as("id"), TextOps.trigrams(col("w")).as("set"))
      .localCheckpoint()
    val tokRows = docs.select(explode(col("set"))).count()
    // re-derive the prefix row count the operator keeps at tau=1/2:
    // n - ceil(n/2) + 1 = floor(n/2) + 1 tokens per set
    val prefixRows = docs
      .select((expr("size(set) div 2") + lit(1)).as("p"))
      .agg(sum(col("p"))).first().getLong(0)
    assert(prefixRows * 3 < tokRows * 2, // prefixes carry < 2/3 of the tokens
      s"prefix $prefixRows vs tokens $tokRows")
  }

  test("persisted index + incremental join == one-shot rebuild (frozen-order exactness)") {
    val rnd = new scala.util.Random(123)
    val vocab = (0 until 50).map(i => f"t$i%02d")
    val base = (0L until 60L).map { id =>
      val n = 4 + rnd.nextInt(10)
      id -> rnd.shuffle(vocab).take(n).distinct
    }
    // batch: disjoint ids; near-dups of base docs (new-old pairs), a
    // near-dup pair within the batch (new-new), and a doc carrying
    // tokens UNSEEN at index-build time (the dfreq-0 order extension)
    val batch = Seq(
      200L -> base(3)._2,                       // exact twin of base 3
      201L -> (base(7)._2 :+ "zz1").distinct,   // near-dup of base 7
      202L -> Seq("zz1", "zz2", "zz3", "zz4"),  // all-unseen tokens
      203L -> Seq("zz1", "zz2", "zz3", "zz5"))  // near-dup of 202 (new-new)
    val dir = java.nio.file.Files.createTempDirectory("graft_sj_idx").toString
    for ((tn, td) <- Seq((1, 2), (4, 5))) {
      SimJoin.writeIndex(base.toDF("id", "set"), s"$dir/$tn", tn, td)
      val basePairs = SimJoin.pairsFromIndex(spark, s"$dir/$tn", tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val incPairs = SimJoin.incrementalJaccard(spark, s"$dir/$tn",
          batch.toDF("id", "set"), tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the base leg alone equals the base-only join
      assert(basePairs === brute(base, tn, td), s"base tau=$tn/$td")
      // every incremental pair involves a batch doc — base-base pairs
      // never re-form on ingest
      assert(incPairs.forall(p => p._1 >= 200L || p._2 >= 200L),
        s"base-base pair leaked tau=$tn/$td")
      // union == the full rebuild, exactly
      assert(basePairs ++ incPairs === brute(base ++ batch, tn, td),
        s"incremental != rebuild tau=$tn/$td")
      // and the planted relationships actually surface at tau=1/2
      if (tn == 1) {
        assert(incPairs.exists(p => p._1 === 3L && p._2 === 200L))
        assert(incPairs.exists(p => p._1 === 202L && p._2 === 203L))
      }
    }
  }

  test("containment join: parity with brute force; asymmetry shows (small⊂big kept, reverse dropped)") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 60).map(i => f"t$i%02d")
    val sets = (0L until 60L).map { id =>
      val n = 3 + rnd.nextInt(12)
      id -> rnd.shuffle(vocab).take(n).distinct
    } :+ (900L -> vocab.take(4)) :+ (901L -> vocab.take(20)) // planted subset
    def bruteC(tNum: Int, tDen: Int): Set[(Long, Long, Long)] =
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        i = sa.toSet.intersect(sb.toSet).size.toLong
        if i * tDen >= sa.size.toLong * tNum
      } yield (a, b, i)).toSet
    for ((tn, td) <- Seq((2, 3), (1, 2), (1, 1))) {
      val got = SimJoin.containmentJoin(sets.toDF("id", "set"), tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === bruteC(tn, td), s"tau=$tn/$td")
    }
    // the planted pair is directional at tau=1: 900's 4 tokens all sit
    // inside 901, the converse does not hold
    val exact = SimJoin.containmentJoin(sets.toDF("id", "set"), 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((900L, 901L)) && !exact.contains((901L, 900L)))
  }

  test("sorted-neighborhood: pairs equal the single-window model regardless of partitioning") {
    import graft.operators.SortedNeighborhood
    val rnd = new scala.util.Random(47)
    val recs = (0L until 300L).map(i => (i, f"k${rnd.nextInt(100)}%03d-$i"))
    def model(w: Int): Set[(Long, Long, Long)] = {
      val sorted = recs.sortBy { case (id, k) => (k, id) }
      (for {
        (a, ia) <- sorted.zipWithIndex; (b, ib) <- sorted.zipWithIndex
        if ib > ia && ib <= ia + w
      } yield (a._1, b._1, (ib - ia).toLong)).toSet
    }
    for (w <- Seq(1, 5)) {
      val got = SortedNeighborhood.candidates(recs.toDF("id", "key"), w)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
      assert(got === model(w), s"w=$w")
    }
  }

  test("prefix sum: equals the driver model (negative values included) and never collapses to one task") {
    import graft.operators.PrefixSum
    val rnd = new scala.util.Random(47)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(200).toLong - 50))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("id", "v").repartition(parts)
      val out = PrefixSum.global(df, Seq(col("id")), col("v"))
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val want = rows.sortBy(_._1)
        .scanLeft((-1L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
        .drop(1).toMap
      assert(got === want, s"parts=$parts")
      assert(!out.queryExecution.executedPlan.toString.contains("SinglePartition"),
        "global prefix sum collapsed to one task")
    }
    // empty input keeps the schema, zero rows
    val empty = PrefixSum.global(
      Seq.empty[(Long, Long)].toDF("id", "v"), Seq(col("id")), col("v"))
    assert(empty.columns.contains("cum") && empty.count() === 0)
  }

  test("sorted-neighborhood: the global sequence never runs through a single-task window") {
    import graft.operators.SortedNeighborhood
    val recs = (0L until 50L).map(i => (i, s"key$i"))
    val plan = SortedNeighborhood.candidates(recs.toDF("id", "key"), 3)
      .queryExecution.executedPlan.toString
    // an empty partitionBy would appear as "Window [...]" with no
    // partition spec and a SinglePartition exchange above it
    assert(!plan.contains("SinglePartition"),
      s"global window collapsed to one task:\n$plan")
  }

  test("skyline: parity with the quadratic dominance model; duplicate frontier points survive together") {
    import graft.operators.Skyline
    def brute(pts: Seq[(Long, Double, Long)]): Set[Long] =
      pts.filter { p =>
        !pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
          (q._2 < p._2 || q._3 > p._3))
      }.map(_._1).toSet
    val rnd = new scala.util.Random(47)
    val pts = (0L until 400L).map(i =>
      (i, (rnd.nextInt(50) / 2.0), rnd.nextInt(40).toLong)) ++
      Seq((9001L, 0.5, 39L), (9002L, 0.5, 39L)) // duplicate frontier point
    val got = Skyline.pareto2(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet
    val want = brute(pts)
    assert(got === want)
    assert(got.contains(9001L) === got.contains(9002L)) // together or not at all
  }

  // ---- r19 native-shingle (tokens) path ------------------------------

  /** Random token sequences; the brute reference computes over the
    * DISTINCT TRIGRAM STRING sets — exactly what the string path fed
    * jaccardJoin — so tokens-path parity here proves the native
    * fingerprints (ShingleFps) lose/invent nothing on real-shaped data. */
  private def tokenDocs(seed: Int, n: Int): Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 30).map(i => f"w$i%02d")
    (0L until n.toLong).map { id =>
      val len = 3 + rnd.nextInt(15)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
    }
  }

  private def trigramSets(docs: Seq[(Long, Seq[String])]): Seq[(Long, Seq[String])] =
    docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq.distinct
    }

  test("jaccardJoinTokens: parity with brute force over the trigram-string sets, across thresholds") {
    val docs = tokenDocs(47, 80)
    val want = trigramSets(docs)
    for ((tn, td) <- Seq((1, 100), (1, 2), (4, 5))) {
      val got = SimJoin.jaccardJoinTokens(docs.toDF("id", "toks"), tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(want, tn, td), s"tau=$tn/$td")
    }
  }

  test("containmentJoinTokens: parity with the string-set containment model") {
    val docs = tokenDocs(11, 60)
    val sets = trigramSets(docs)
    def bruteC(tNum: Int, tDen: Int): Set[(Long, Long, Long)] =
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        i = sa.toSet.intersect(sb.toSet).size.toLong
        if i * tDen >= sa.size.toLong * tNum
      } yield (a, b, i)).toSet
    for ((tn, td) <- Seq((2, 3), (1, 1))) {
      val got = SimJoin.containmentJoinTokens(docs.toDF("id", "toks"), tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === bruteC(tn, td), s"tau=$tn/$td")
    }
  }

  test("tokens index: writeIndexTokens + incremental == rebuild; stamp gates domain and pre-r18 indexes") {
    val base = tokenDocs(123, 50)
    val batch = Seq(
      200L -> base(3)._2,                               // twin of base 3
      201L -> (base(7)._2 ++ Seq("zq1", "zq2", "zq3")), // unseen tokens
      202L -> Seq("zq1", "zq2", "zq3", "zq1", "zq2"))   // near-dup of 201's tail
    val dir = java.nio.file.Files.createTempDirectory("graft_sj_tok").toString
    SimJoin.writeIndexTokens(base.toDF("id", "toks"), s"$dir/i", 1, 2)
    val basePairs = SimJoin.pairsFromIndex(spark, s"$dir/i", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val incPairs = SimJoin.incrementalJaccardTokens(spark, s"$dir/i",
        batch.toDF("id", "toks"), 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(basePairs === brute(trigramSets(base), 1, 2))
    assert(incPairs.forall(p => p._1 >= 200L || p._2 >= 200L))
    assert(basePairs ++ incPairs ===
      brute(trigramSets(base ++ batch), 1, 2), "incremental != rebuild")
    // domain mismatch refuses loudly: a string-fp batch against the
    // token-fp index would never match a fingerprint
    val ex = intercept[IllegalArgumentException] {
      SimJoin.incrementalJaccard(spark, s"$dir/i",
        trigramSets(batch).toDF("id", "set"), 1, 2)
    }
    assert(ex.getMessage.contains("domain"))
    // a stampless (pre-r18) index refuses instead of under-counting
    val fs = new org.apache.hadoop.fs.Path(s"$dir/i")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/i/_SIMJOIN_FORMAT"), false)
    val ex2 = intercept[IllegalArgumentException] {
      SimJoin.pairsFromIndex(spark, s"$dir/i", 1, 2)
    }
    assert(ex2.getMessage.contains("rebuild"))
  }

  test("q123 matches the q45 family: every reported pair really clears tau on raw trigram sets") {
    val rows = SparkEntry.queries("q123_simjoin_prefix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (i, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(2 * i >= na + nb - i, s"pair ${r.getLong(0)}-${r.getLong(1)} below tau")
    }
  }
}
