package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Literal-DataFrame unit layer (SURVEY §5 "tiny literal DataFrames; exact
  * expected rows"): pins the null/boundary semantics of the relational core
  * — the classic cross-engine divergence surface that SF-scaled test data
  * (which is largely null-free) never exercises. */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val left = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c"))
    .toDF("k", "v")
  private lazy val right = Seq((Some(1L), "x"), (None, "y")).toDF("k", "w")

  test("equi-join never matches null keys") {
    val j = left.join(right, left("k") === right("k"))
    assert(j.count() === 1)
    assert(j.select(left("k")).head().getLong(0) === 1L)
  }

  test("left outer join null-extends unmatched and null-keyed rows") {
    val j = left.join(right, left("k") === right("k"), "left_outer")
    assert(j.count() === 3)
    assert(j.filter(col("w").isNull).count() === 2) // k=2 and k=null
  }

  test("anti join keeps null-keyed probe rows (NOT EXISTS semantics)") {
    val a = left.join(right, left("k") === right("k"), "left_anti")
    assert(a.select("v").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("b", "c"))
  }

  test("null-safe equality <=> matches null to null") {
    val j = left.join(right, left("k") <=> right("k"))
    assert(j.count() === 2) // 1=1 and null<=>null
  }

  test("set ops treat null as a single distinct value") {
    val a = Seq(Some(1), None, None).toDF("x")
    val b = Seq(Option.empty[Int], Some(2)).toDF("x")
    assert(a.intersect(b).count() === 1) // just the null
    assert(a.union(b).distinct().count() === 3) // 1, 2, null
    assert(a.except(b).collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("grouping_id distinguishes data nulls from rollup-generated nulls") {
    val df = Seq((Some("g"), 1), (None, 2)).toDF("g", "v")
    val r = df.rollup(col("g")).agg(sum(col("v")).as("s"),
      grouping_id().as("gid"))
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2)))
      .toSet
    // data-null group has gid 0; the rollup total has gid 1
    assert(r === Set((Some("g"), 1L, 0L), (None, 2L, 0L), (None, 3L, 1L)))
  }

  test("aggregates skip nulls; count(*) does not") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val r = df.agg(count(lit(1)).as("all"), count(col("x")).as("nn"),
      sum(col("x")).as("s"), avg(col("x")).as("a")).head()
    assert(r.getLong(0) === 3 && r.getLong(1) === 2)
    assert(r.getDouble(2) === 4.0 && r.getDouble(3) === 2.0) // avg over 2, not 3
  }

  test("range frame includes exact boundary values") {
    val df = Seq((1L, 0L), (2L, 3599L), (3L, 3600L)).toDF("id", "sec")
    val w = Window.orderBy(col("sec")).rangeBetween(-3599, 0)
    val c = df.select(col("id"), count(lit(1)).over(w).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c === Map(1L -> 1L, 2L -> 2L, 3L -> 2L)) // 3600-3599=1 in range; 0 is not
  }

  test("window rank vs dense_rank vs row_number on ties") {
    val df = Seq(("a", 1), ("b", 1), ("c", 2)).toDF("id", "s")
    val w = Window.orderBy(col("s"), col("id"))
    val wt = Window.orderBy(col("s"))
    val r = df.select(col("id"), row_number().over(w).as("rn"),
      rank().over(wt).as("rk"), dense_rank().over(wt).as("dr"))
      .collect().map(x => x.getString(0) -> (x.getInt(1), x.getInt(2), x.getInt(3)))
      .toMap
    assert(r("a") === ((1, 1, 1)))
    assert(r("b") === ((2, 1, 1)))
    assert(r("c") === ((3, 3, 2)))
  }

  test("dropDuplicates on a key subset keeps exactly one row per key") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val d = df.dropDuplicates(Seq("k"))
    assert(d.count() === 2)
    assert(d.select("k").collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
  }

  test("union is by position, unionByName by name") {
    val a = Seq((1, "x")).toDF("n", "s")
    val b = Seq(("y", 2)).toDF("s", "n")
    val byName = a.unionByName(b).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(byName.toSet === Set((1, "x"), (2, "y")))
  }

  test("transformation rules: empty list and all-miss list are identity") {
    import graft.cdc.Transformation
    import graft.cdc.Transformation.TransformationRule
    val df = Seq((1L, "x")).toDF("id", "v")
    assert(Transformation.shape(df, "s", "t", Nil).columns.toSeq ===
      Seq("id", "v"))
    val missed = Transformation.shape(df, "s", "t", Seq(
      TransformationRule("column", "remove-column", "other", "%", "%"),
      TransformationRule("column", "remove-prefix",
        columnName = "zz%", value = "zz")))
    assert(missed.collect().toSeq === df.collect().toSeq)
  }

  test("span relation: documents shorter than the window emit no rows; window-length doc emits one") {
    import graft.text.Spans
    val docs = Seq(
      (1L, (1 to 19).map(i => s"t$i")),   // 19 toks < window → nothing
      (2L, (1 to 20).map(i => s"t$i")))   // exactly one window
      .toDF("doc_id", "w")
    val spans = Spans.spanRelation(docs, "doc_id", "w")
    assert(spans.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(2L -> 1L))
    // the counts stage reports the short doc not at all (it holds no
    // maskable position), and the 20-token doc as 20 unmasked tokens
    val counts = Spans.maskedCounts(spans, window = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(counts.toSeq === Seq((2L, 20L, 0L)))
  }

  test("phrase search: single term counts occurrences, phrases never cross doc bounds, empty phrase rejected") {
    import graft.text.Phrase
    val docs = Seq((1L, Seq("a", "b", "a")), (2L, Seq("c")))
      .toDF("doc_id", "w")
    val post = Phrase.postings(docs, "doc_id", "w")
    // single-term phrase = occurrence count
    assert(Phrase.phraseHits(post, Seq("a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(1L -> 2L))
    // absent term, and a phrase spanning two documents' tokens: no rows
    assert(Phrase.phraseHits(post, Seq("zz")).count() === 0L)
    assert(Phrase.phraseHits(post, Seq("c", "a")).count() === 0L)
    intercept[IllegalArgumentException](Phrase.phraseHits(post, Nil))
  }

  test("fuzzy: single-char terms collide on the empty delete key but only distance ≤ 1 pairs survive") {
    import graft.text.Fuzzy
    val a = Seq("a", "b", "xy").toDF("qa")
    val b = Seq("c", "ab", "x", "zz").toDF("tb")
    val got = Fuzzy.fuzzyPairs(a, "qa", b, "tb").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // every single-char × single-char pair is distance 1 (substitution);
    // "xy"–"x" is one deletion; "zz" is ≥ 2 from everything on the left
    assert(got === Set(("a", "c"), ("a", "ab"), ("a", "x"),
      ("b", "c"), ("b", "ab"), ("b", "x"), ("xy", "x")))

    // both sides naming the same column (vocabulary vs vocabulary) must
    // work, with the right side disambiguated so the result stays
    // addressable by name, not just position
    val sameName = Fuzzy.fuzzyPairs(
        Seq("a", "xy").toDF("term"), "term",
        Seq("x", "zz").toDF("term"), "term")
    assert(sameName.columns.toSeq === Seq("term", "term_b"))
    assert(sameName.select(col("term"), col("term_b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
      === Set(("a", "x"), ("xy", "x")))
  }

  test("PQ: dimension not divisible by m and ksub beyond the corpus are rejected") {
    import graft.functions.Pq
    val three = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(0.0, 1.0, 0.0)))
      .toDF("id", "v")
    intercept[IllegalArgumentException](
      Pq.train(three, "id", "v", m = 2, ksub = 2, iters = 1))
    intercept[IllegalArgumentException](
      Pq.train(three, "id", "v", m = 3, ksub = 16, iters = 1))
  }

  test("testdata temporal types match what the query board assumes") {
    // The driver regenerates /root/testdata between rounds, and the
    // parquet temporal flavor has ALREADY drifted once (round 7:
    // TIMESTAMP(NANOS) → timestamp[us] isAdjustedToUTC=false, i.e.
    // Spark TIMESTAMP_NTZ — which silently broke q80's strict-TIMESTAMP
    // unix_micros call). Pin the accepted flavors here so the NEXT regen
    // fails loudly with a message naming the drift instead of surfacing
    // as an AnalysisException deep inside one query. Both flavors are
    // equivalent under the pinned-UTC session; anything else is not.
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val ok = Set[org.apache.spark.sql.types.DataType](
      TimestampType, TimestampNTZType)
    for ((tbl, colName, df) <- Seq(
        ("events", "ts", Tables.events(spark, sf)),
        ("orders", "o_orderdate", Tables.orders(spark, sf)),
        ("lineitem", "l_shipdate", Tables.lineitem(spark, sf)))) {
      val dt = df.schema(colName).dataType
      assert(ok.contains(dt),
        s"TESTDATA DRIFT: $tbl.$colName is $dt, expected TIMESTAMP or " +
          "TIMESTAMP_NTZ. The driver regenerated /root/testdata with a " +
          "new temporal flavor; audit every strict-TIMESTAMP call site " +
          "(grep unix_micros|unix_millis|to_utc_timestamp) and the " +
          "Tables.events nanos branch before trusting the board.")
    }
    // unix_micros is the one strict-TIMESTAMP function family in the
    // repo; the q80 site guards with .cast("timestamp"). Assert the
    // guarded expression analyzes against the CURRENT testdata flavor.
    val probe = Tables.events(spark, sf)
      .select(unix_micros(col("ts").cast("timestamp")).as("us")).limit(1)
    assert(probe.collect().nonEmpty, "unix_micros(cast) must analyze+run")
  }

  test("Verify.runAll surfaces a failing query as _failed.json, never a silently shorter board") {
    // Round 7's q80 vanished from CORRECTNESS because the old Verify
    // caught failures to stderr only; this pins the loud path.
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("verify_loud").toString
    val good = (s: org.apache.spark.sql.SparkSession, _: String) =>
      s.range(3).toDF("v")
    val bad = (_: org.apache.spark.sql.SparkSession, _: String) =>
      throw new RuntimeException("boom: planted failure")
    val failed = Verify.runAll(spark, sf, out,
      Seq("good_q" -> good, "bad_q" -> bad), Map("good_q" -> "SELECT 1"))
    assert(failed.keySet === Set("bad_q"))
    val fj = Files.readString(Paths.get(s"$out/_failed.json"))
    assert(fj.contains("bad_q") && fj.contains("boom"),
      s"_failed.json must name the query and the error, got: $fj")
    assert(Files.exists(Paths.get(s"$out/good_q")),
      "a failure must not stop the surviving queries from dumping")
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
  }

  test("semantic dedup at an unreachable threshold drops nothing") {
    import graft.functions.{Ivf, SemDedup}
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.001)),
      (3L, Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val cents = Ivf.train(corpus, "vec_id", "v", nlist = 2, iters = 1)
    // tau > 1 can never be reached by a cosine — every vector survives
    val surv = SemDedup.survivors(corpus, "vec_id", "v", cents, tau = 1.1)
      .select("sd_id").collect().map(_.getLong(0)).sorted
    assert(surv.toSeq === Seq(1L, 2L, 3L))
  }

  test("round-8 operators: degenerate inputs are sane or loud, never silently wrong") {
    import graft.operators.{MgSummary, PageRank, Reachability, Skyline, SortedNeighborhood, Triangles}
    import graft.text.{Bpe, SimJoin}
    // simjoin: singleton corpus and tau=1 self — no pairs, no crash
    assert(SimJoin.jaccardJoin(
      Seq((1L, Seq("a", "b"))).toDF("id", "set"), 1, 2).count() === 0)
    // pagerank: empty edges is LOUD (a silent empty rank relation would
    // read as 'no important nodes')
    intercept[IllegalArgumentException] {
      PageRank.run(Seq.empty[(String, String)].toDF("src", "dst"), 3)
    }
    intercept[IllegalArgumentException] {
      PageRank.personalized(Seq(("a", "b")).toDF("src", "dst"),
        Seq.empty[String].toDF("node"), 3)
    }
    // bfs: seeds with no outgoing edges → just the seeds at depth 0
    val lone = Reachability.bfs(Seq(("x", "y")).toDF("src", "dst"),
      Seq("z").toDF("node"), 3)
    assert(lone.collect().map(r => (r.getString(0), r.getInt(1))).toSeq === Seq(("z", 0)))
    // triangles: a single edge has none; empty result, not a crash
    assert(Triangles.perNode(Seq((1L, 2L)).toDF("u", "v")).count() === 0)
    // skyline: a single row is its own frontier
    assert(Skyline.pareto2(Seq((1L, 5.0, 3L)).toDF("id", "x", "y"), "x", "y")
      .count() === 1)
    // sorted-neighborhood: w=1 on two rows yields exactly the one pair
    assert(SortedNeighborhood.candidates(
      Seq((1L, "aa"), (2L, "ab")).toDF("id", "key"), 1).count() === 1)
    // sorted-neighborhood on EMPTY input: keeps the declared 5-column
    // schema (a zero-column emptyDataFrame would make downstream
    // a_key/gap references throw AnalysisException, as q129's
    // levenshtein verify does)
    val snEmpty = SortedNeighborhood.candidates(
      Seq.empty[(Long, String)].toDF("id", "key"), 2)
    assert(snEmpty.columns.toSeq === Seq("a_id", "a_key", "b_id", "b_key", "gap"))
    assert(snEmpty.filter(length(col("a_key")) >= 0).count() === 0)
    // incremental CC: empty prior labels == plain run; merging two
    // batches that BRIDGE clusters (1-2 then 2-3) relabels to the min
    import graft.operators.ConnectedComponents
    val b1 = Seq((1L, 2L), (7L, 8L)).toDF("a", "b")
    val lbl1 = ConnectedComponents.run(b1)
    val merged = ConnectedComponents.incremental(lbl1, Seq((2L, 3L)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))

    // MG: k=1 keeps at most one counter per group plus the sentinel
    val mg = MgSummary.build(
      Seq(("g", "a"), ("g", "a"), ("g", "b")).toDF("grp", "item"), "grp", "item", 1)
    assert(mg.filter(col("item").isNotNull).count() <= 1)
    assert(mg.filter(col("item").isNull).select("c").first().getLong(0) === 3L)
    // BPE: zero merges segments to characters; empty word list trains nothing
    assert(Bpe.train(Map.empty, 5) === Seq.empty)
    assert(Bpe.segment("ab", Seq.empty) === Seq("a", "b", Bpe.Eow))
  }

  test("shortest paths: degenerate inputs — empty seeds/edges, maxHops 0, self-loops") {
    import graft.operators.ShortestPaths
    val e = Seq(("a", "b", 2L), ("b", "b", 0L)).toDF("src", "dst", "w")
    def m(edges: org.apache.spark.sql.DataFrame,
          seeds: Seq[String], h: Int): Map[String, Long] =
      ShortestPaths.bellmanFord(edges, seeds.toDF("node"), h)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // empty seeds → empty dist (nothing reachable from nothing)
    assert(m(e, Seq.empty, 3) === Map.empty)
    // no edges → seeds at cost 0, nothing else
    assert(m(e.limit(0), Seq("a"), 3) === Map("a" -> 0L))
    // maxHops 0 → seeds only, even with outgoing edges
    assert(m(e, Seq("a"), 0) === Map("a" -> 0L))
    // zero-weight self-loop neither diverges nor changes the minimum
    assert(m(e, Seq("a"), 5) === Map("a" -> 0L, "b" -> 2L))
    // negative require
    intercept[IllegalArgumentException] {
      ShortestPaths.bellmanFord(e, Seq("a").toDF("node"), -1)
    }
  }

  test("winnowing: short-sequence floor, window-min model, shared-run guarantee, density bound") {
    import graft.text.TextOps
    def winnowOf(hashes: Seq[Long], w: Int): Set[Long] =
      TextOps.winnowRel(Seq((1L, hashes)).toDF("id", "kg"), "id",
          col("kg"), w)
        .collect().map(_.getLong(1)).toSet
    // shorter than one window → the global minimum, exactly one
    assert(winnowOf(Seq(7L, 3L, 9L), 4) === Set(3L))
    assert(winnowOf(Seq(42L), 4) === Set(42L))
    // window-min model: windows of 2 over [5,1,4,2] → mins {1,1,2} → {1,2}
    assert(winnowOf(Seq(5L, 1L, 4L, 2L), 2) === Set(1L, 2L))
    // the SIGMOD'03 guarantee on a planted shared run: two sequences
    // sharing a run of >= w consecutive gram hashes share >= 1 selection
    val shared = Seq(100L, 50L, 75L, 60L) // one full w=4 window
    val a = winnowOf(Seq(999L, 998L) ++ shared ++ Seq(997L), 4)
    val b = winnowOf(Seq(1L, 2L) ++ shared ++ Seq(3L, 4L), 4)
    assert((a & b).nonEmpty, s"shared window selected nothing: $a vs $b")
    // density: selections never exceed window starts (n - w + 1)
    val rng = new scala.util.Random(7)
    val long = Seq.fill(200)(rng.nextLong().abs)
    assert(winnowOf(long, 4).size <= 197)
    // and winnowing a permuted DISTINCT sequence keeps every selection a
    // member of the input (sanity on the slice arithmetic)
    assert(winnowOf(long, 4).subsetOf(long.toSet))
  }

  test("winnow copy detection: planted substring copies always detected; pairs, shared counts and spans equal the sliding-window model") {
    import graft.text.TextOps
    val W = 4 // winnow window (grams); g = 3 tokens per gram
    // the one copy of the gram hash, replicated as a Scala model
    // (TextOps.fingerprint: 31-ary char fold mod 1e9+7 over "t1 t2 t3")
    def fpOf(gram: String): Long =
      gram.foldLeft(0L)((acc, ch) => (acc * 31L + ch.toLong) % 1000000007L)
    // model selections (pos 1-based window start, fp = window min) —
    // the spec's independent re-derivation of winnowRelPos
    def modelSel(toks: Seq[String]): Seq[(Long, Long)] = {
      val h = toks.sliding(3).map(g => fpOf(g.mkString(" "))).toSeq
      if (h.size < W) Seq((1L, h.min))
      else (0 to h.size - W).map(i => ((i + 1).toLong, h.slice(i, i + W).min))
    }
    val rng = new scala.util.Random(20260815L)
    def tok() = s"t${rng.nextInt(500)}"
    (1 to 6).foreach { trial =>
      // 8 docs per trial: 0..5 independent random token sequences; docs
      // 6/7 PLANT a contiguous copy (length >= w+g-1 = 6 tokens, the
      // SIGMOD'03 guarantee bound) of a random slice of docs 0/1 at a
      // random offset — the substring-containment ground truth
      val free: Seq[Seq[String]] =
        (0 to 5).map(_ => Seq.fill(30 + rng.nextInt(30))(tok()))
      val planted: Seq[Seq[String]] = Seq(0, 1).map { srcId =>
        val source = free(srcId)
        val from = rng.nextInt(source.size - 16)
        val run = source.slice(from, from + 6 + rng.nextInt(10))
        val host = Seq.fill(15 + rng.nextInt(15))(tok())
        val at = rng.nextInt(host.size)
        host.take(at) ++ run ++ host.drop(at)
      }
      val docs = free ++ planted

      // Spark side: the q224 pipeline shape over these docs, threshold 1
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val sel = TextOps.winnowRelPos(
        df.select(col("doc_id"), TextOps.tokens(col("text")).as("w")),
        "doc_id",
        transform(TextOps.trigramsAll(col("w")),
          g => TextOps.fingerprint(g)), w = W)
      val a = sel.select(col("id").as("a_id"), col("pos").as("a_pos"),
        col("fp"))
      val b = sel.select(col("id").as("b_id"), col("pos").as("b_pos"),
        col("fp"))
      val got = a.join(b, Seq("fp")).filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(countDistinct(col("fp")).as("shared"),
          min(col("a_pos")).as("a_lo"), max(col("a_pos")).as("a_hi"),
          min(col("b_pos")).as("b_lo"), max(col("b_pos")).as("b_hi"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))
        .toMap

      // model side: identical join over the Scala selections
      val msel = docs.map(modelSel)
      val model = (for {
        i <- docs.indices; j <- docs.indices if i < j
        shared = msel(i).map(_._2).toSet & msel(j).map(_._2).toSet
        if shared.nonEmpty
        ai = msel(i).filter(s => shared(s._2)).map(_._1)
        bj = msel(j).filter(s => shared(s._2)).map(_._1)
      } yield (i.toLong, j.toLong) ->
        (shared.size.toLong, ai.min, ai.max, bj.min, bj.max)).toMap

      assert(got === model,
        s"trial $trial: winnow copy-detection diverged from the model")
      // the guarantee, on the ground truth: each planted pair detected
      Seq(0, 1).zipWithIndex.foreach { case (srcId, k) =>
        assert(model.contains((srcId.toLong, (6 + k).toLong)),
          s"trial $trial: planted copy ($srcId, ${6 + k}) not detected")
      }
    }
  }
}
