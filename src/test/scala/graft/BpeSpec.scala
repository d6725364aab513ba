package graft

import graft.text.Bpe

/** BPE tokenizer (text/Bpe.scala): the Sennrich toy corpus trains the
  * known merge sequence, segmentation round-trips, the distributed
  * count equals the driver model, and training is deterministic. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private val toy = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train: the classic corpus produces the classic first merges (ties broken lexicographically)") {
    val merges = Bpe.train(toy, 3)
    // e+s, es+t, est+</w> each carry weight 9 (newest 6 + widest 3); the
    // documented tie-break picks them in lexicographic order
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)))
  }

  test("segment: concatenating segments reconstructs word + end marker; trained suffixes apply") {
    val merges = Bpe.train(toy, 10)
    for (w <- Seq("lowest", "newest", "low", "wide", "zzz")) {
      val segs = Bpe.segment(w, merges)
      assert(segs.mkString === w + Bpe.Eow, s"roundtrip broke for $w")
    }
    // est</w> exists as a merged token => 'lowest' ends in one piece
    assert(Bpe.segment("lowest", merges).last === "est" + Bpe.Eow)
  }

  test("train: deterministic — same corpus, same merges, twice") {
    assert(Bpe.train(toy, 8) === Bpe.train(toy, 8))
  }

  test("tokenCounts: distributed join-back equals per-doc driver segmentation") {
    val docs = Seq((1L, "the low tide"), (2L, "newest widest low"), (3L, "lower"))
    val words = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val merges = Bpe.train(words, 20)
    val got = Bpe.tokenCounts(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.map { case (id, t) =>
      id -> t.split(" ").map(w => Bpe.segment(w, merges).length.toLong).sum
    }.toMap
    assert(got === want)
  }

  test("topWords: the training collect is bounded by the cap, highest-count words first") {
    // 50 distinct words, cap 5 — the driver map must hold exactly the cap,
    // and exactly the most frequent words (ties lexicographic)
    val docs = (0 until 50).map(i => (i.toLong, (s"w$i " * (i + 1)).trim))
    val top = Bpe.topWords(docs.toDF("doc_id", "text"), "text", 5)
    assert(top.size === 5)
    assert(top.keySet === Set("w49", "w48", "w47", "w46", "w45"))
    assert(top("w49") === 50L)
  }

  test("trainFull: state agrees with per-word greedy segmentation on this corpus") {
    val (merges, state) = Bpe.trainFull(toy, 10)
    state.foreach { case (w, syms) =>
      assert(syms === Bpe.segment(w, merges).toVector, s"state vs encode diverged for $w")
    }
  }

  test("tokenCounts: a doc with zero words reports n_tokens = 0, not absence") {
    val docs = Seq((1L, "low tide"), (2L, ""), (3L, "    "))
    val merges = Bpe.train(Map("low" -> 1L, "tide" -> 1L), 5)
    val got = Bpe.tokenCounts(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === 0L && got(3L) === 0L && got(1L) > 0L)
  }

  test("tokenCounts: segmentation work is vocabulary-bounded (per distinct word, not per occurrence)") {
    // 200 occurrences of 3 distinct words: the distinct-word relation the
    // segmenter runs over must have 3 rows — pinned via the plan's
    // aggregate on word before the mapPartitions boundary
    val docs = (0L until 200L).map(i => (i, "alpha beta alpha gamma"))
    val merges = Bpe.train(Map("alpha" -> 1L, "beta" -> 1L, "gamma" -> 1L), 5)
    val out = Bpe.tokenCounts(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
    assert(out.count() === 200)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Deduplicate") || plan.contains("Aggregate"),
      s"no distinct-word stage before segmentation:\n$plan")
  }
}
