package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the properties that make these queries
  * survive a 100× scale-up are asserted on the optimized plans themselves,
  * so a refactor that silently loses pushdown or picks a nested loop fails
  * CI, not the cluster. */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q01: filters reach the parquet scan; unused columns pruned") {
    val p = planOf("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)"),
      s"predicate not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_discount:double>"), "column pruning lost")
  }

  test("q02: join strategy is size-based (no forced broadcast hint)") {
    val lp = SparkEntry.queries("q02_inner_join")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("UnresolvedHint"), "stray hint")
    // at sf0.001 AQE/statistics pick broadcast on their own
    assert(planOf("q02_inner_join").contains("Join"), "join missing")
  }

  test("q10: aggregation is two-phase (partial before the exchange)") {
    val p = planOf("q10_hash_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q19/q33: rank filters push as WindowGroupLimit below the shuffle") {
    Seq("q19_topk_per_group", "q33_cdc_materialize").foreach { q =>
      assert(planOf(q).contains("WindowGroupLimit"), s"$q lost WindowGroupLimit")
    }
  }

  test("q112/q114: sketch builds bound the window exchange (WindowGroupLimit) over a partial agg") {
    Seq("q112_kmv_sample", "q114_priority_sample").foreach { q =>
      val p = planOf(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost its map-side group limit:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q: consolidation pass lost its partial aggregation:\n$p")
    }
  }

  test("q119: quantile-sample builds truncate map-side (WindowGroupLimit × both shard builds)") {
    // two shard builds merge into one sketch — each build's rank filter
    // must truncate to ≤ k rows per group before its exchange, or the
    // shuffle carries the events table instead of sample rows
    val p = planOf("q119_quantile_sample")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"q119 lost a shard build's map-side group limit:\n$p")
  }

  test("q20: global sort+limit compiles to TakeOrderedAndProject") {
    assert(planOf("q20_global_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q37: the 1-row query side broadcasts; the corpus never shuffles before top-k") {
    val p = planOf("q37_cosine_topk")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"),
      s"query side not broadcast:\n$p")
  }

  test("pre-partitioned join reuses the partitioning (no third exchange)") {
    val o = Tables.orders(spark, sf).repartition(4, col("o_custkey"))
    val l = Tables.customer(spark, sf).repartition(4, col("c_custkey"))
    val joined = o.join(l, col("o_custkey") === col("c_custkey"))
    val p = joined.queryExecution.executedPlan.toString
    // exactly the two declared repartition exchanges — EnsureRequirements
    // must not add another one for the join
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"extra shuffle inserted:\n$p")
  }

  test("q63: hash split is map-only — no hash exchange anywhere in the plan") {
    val p = planOf("q63_hash_split")
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash split must not shuffle:\n$p")
  }

  test("q64: both window functions share ONE shuffle on the group digest") {
    val p = planOf("q64_canonical_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"rank and count must reuse the same partitioning:\n$p")
  }

  test("q65: thresholds broadcast; the corpus filter pass never hash-shuffles") {
    val p = planOf("q65_quality_band")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row threshold side must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus side must stay map-only:\n$p")
  }

  test("q68: both metadata predicates push to their parquet scans") {
    val p = planOf("q68_filtered_topk")
    assert(p.contains("Not(EqualTo(label,3))"),
      s"label filter not pushed to the embeddings scan:\n$p")
    assert(p.contains("EqualTo(lang,en)"),
      s"lang filter not pushed to the documents scan:\n$p")
  }

  test("q69/q72: chunking and repetition are map-only (explode/array math, no exchange before the final sort)") {
    Seq("q69_chunking", "q72_repetition").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not hash-shuffle:\n$p")
    }
  }

  test("q70: the packing cumsum is two-level — no row-level window keyed on lang alone") {
    val p = planOf("q70_seq_packing")
    // the row-level cumsum must partition by (lang, doc_id range) — a
    // windowspec of [lang] ordering by doc_id would sort a whole
    // language's corpus in one task
    assert(!"windowspecdefinition\\(lang#\\d+, doc_id".r.findFirstIn(p).isDefined,
      s"row-level cumsum keyed on lang alone:\n$p")
    assert("windowspecdefinition\\(lang#\\d+, rng#\\d+L?, doc_id".r.findFirstIn(p).isDefined,
      s"two-level cumsum window (lang, rng) missing:\n$p")
    // the prefix-offset side is tiny and must broadcast back, not shuffle
    // the corpus a second time
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"range offsets must broadcast:\n$p")
  }

  test("q103: the shard-layout rank is two-level — no row-level window keyed on shard alone") {
    val p = planOf("q103_train_shards")
    assert(!"windowspecdefinition\\(shard#\\d+L?, k#".r.findFirstIn(p).isDefined,
      s"row-level rank keyed on shard alone:\n$p")
    assert("windowspecdefinition\\(shard#\\d+L?, bkt#\\d+, k#".r.findFirstIn(p).isDefined,
      s"two-level rank window (shard, bkt) missing:\n$p")
  }

  test("q95: the sweep's running sum is two-level — no row-level window keyed on event_type alone") {
    val p = planOf("q95_interval_overlap")
    // the collapsed point set must be windowed by (event_type, day
    // bucket); [event_type] ordering by t would sort everything in
    // five tasks
    assert(!"windowspecdefinition\\(event_type#\\d+, t#".r.findFirstIn(p).isDefined,
      s"running sum keyed on event_type alone:\n$p")
    assert("windowspecdefinition\\(event_type#\\d+, bkt#\\d+, t#".r.findFirstIn(p).isDefined,
      s"two-level sweep window (event_type, bkt) missing:\n$p")
    // ONE row-level exchange: the declared (event_type, bkt) repartition
    // satisfies the collapse groupBy, the local window, the per-bucket
    // agg, and the final per-type agg; only the tiny offsets window adds
    // a second (bucket-cardinality) exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"extra row-level exchange crept in:\n$p")
  }

  test("q74: batched retrieval broadcasts the query block and partial-limits per task") {
    val p = planOf("q74_batch_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query block not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must push a partial limit below the exchange:\n$p")
  }

  test("q230: hard-negative mining keeps q74's shape — broadcast anchors, band filter BELOW the rank, partial top-k per task") {
    val p = planOf("q230_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"anchor block not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-anchor top-k must push a partial limit below the exchange:\n$p")
    // the similarity band must apply BEFORE the window exchange (it
    // fuses into the broadcast join's condition — rows outside the band
    // never materialize); anchor on the band's own decimal literal, not
    // a generic "Filter" (scan filters always print below the rank and
    // would make that check vacuous). In tree print children follow
    // parents, so below-the-rank == after WindowGroupLimit's line.
    assert(p.contains("0.9000"), s"band ceiling missing from the plan:\n$p")
    assert(p.indexOf("0.9000") > p.indexOf("WindowGroupLimit"),
      s"band must evaluate below the rank, not after it:\n$p")
  }

  test("q75: centroid aggregation is two-phase over ONE (label, dim) shuffle") {
    val p = planOf("q75_label_centroids")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"centroids must shuffle once:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q105: transformation rules compile to projections — no exchange beyond the snapshot's one") {
    val p = planOf("q105_transform_rules")
    // the rule list (rename/remove/prefix/map-record-to-document) must be
    // plan-invisible: exactly the materializer's single pk shuffle, and
    // the renames visible in the OUTPUT json struct (the removed column
    // still sits in from_json's fixed envelope parse schema — shared by
    // design — so absence is asserted on the to_json side's field list)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"rules added an exchange:\n$p")
    val out = "StructsToJsonEvaluator[^)]*\\)[^)]*StructType\\([^\\n]*"
      .r.findFirstIn(p).getOrElse(fail(s"no to_json in plan:\n$p"))
    assert(out.contains("StructField(c_customer_id") &&
      out.contains("StructField(ts,"), s"renames missing from output:\n$out")
    assert(!out.substring(0, out.indexOf("evaluate"))
      .contains("StructField(device"), s"removed column in output:\n$out")
  }

  test("q106: selection filters fold into the scan-side predicate — no shuffle, no extra scan") {
    val p = planOf("q106_selection_filters")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a pure selection must not shuffle:\n$p")
    assert("FileScan".r.findAllIn(p).size === 1, s"one scan expected:\n$p")
  }

  test("q71: decontamination shuffles on doc_id ONLY at the final aggregate") {
    val p = planOf("q71_decontamination")
    // the join/distinct exchanges key on the shingle (uniform); the single
    // permitted doc_id-keyed exchange is the post-join groupBy — a second
    // one would mean a join or window got keyed on the skewable doc side
    assert(p.contains("Join"), s"join missing:\n$p")
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size <= 1,
      s"extra doc_id-keyed exchange:\n$p")
  }

  test("q213: inventory agg is two-phase; scan pruned to the inventory columns; planning window runs on file rows") {
    val p = planOf("q213_compaction_plan")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"inventory build must partial-aggregate map-side:\n$p")
    // the planner never reads the non-inventory columns
    assert(!p.contains("user_id") && !p.contains("value"),
      s"column pruning lost:\n$p")
    // exactly one data-sized exchange (the inventory groupBy); the window
    // and bucket-agg exchanges move file rows, not data rows, and the
    // window is partitioned by table — never a global single partition
    assert(p.contains("windowspecdefinition(event_type"),
      s"planning window must partition by table:\n$p")
  }

  test("q214: chunk-stats passes partial-aggregate; the 1-row matched count broadcasts") {
    val p = planOf("q214_zonemap_prune")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"chunk stats must partial-aggregate:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"rows_matched must broadcast, never shuffle the audits:\n$p")
    assert(!p.contains("props"), s"column pruning lost:\n$p")
  }

  test("q216: value-count agg is two-phase; scalar relations broadcast into the estimate") {
    val p = planOf("q216_selectivity_estimate")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"value counts must partial-aggregate:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"n/actual scalars must broadcast:\n$p")
  }

  test("q222: winnowing is Generate + ONE window exchange on the doc id — never a nested HOF") {
    // The HOF form re-evaluated the gram-hash pipeline once per window
    // start (96.5 s on 300 docs); this pins the posexplode + frame-min
    // shape so a refactor back to array slicing fails here, not in the
    // bench. doc-id scan filter must also push.
    val p = planOf("q222_winnowing")
    assert(p.contains("Generate posexplode"),
      s"winnowing must posexplode gram hashes:\n$p")
    assert(p.contains("Window"), s"frame-min window lost:\n$p")
    assert(!p.contains("array_min(slice"),
      s"nested HOF slicing reintroduced:\n$p")
    assert(p.contains("LessThan(doc_id,300)"),
      s"doc bound not pushed to scan:\n$p")
  }

  test("q221: at most one corpus pass in the final plan; all scalar sides broadcast") {
    // the per-lang aggregate is localCheckpointed (L rows feed three
    // consumers), so the final plan reads `Scan ExistingRDD` — what this
    // pins is that the corpus parquet is NOT re-scanned per consumer
    // (the pre-checkpoint regression read it four times)
    val p = planOf("q221_mixture_weights")
    assert("Scan parquet".r.findAllIn(p).size <= 1,
      s"mixture weighting must not re-scan the corpus per consumer:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"the totals must broadcast, not shuffle L rows:\n$p")
  }

  test("q78/q220: the near-dup pair relation is token-keyed — no all-pairs Cartesian/BNLJ") {
    // asserted on the PAIR relation itself, not the gated query's final
    // frame: ConnectedComponents localCheckpoints per round, so the
    // final plan reads Scan ExistingRDD and would hide a resurrected
    // quadratic join in the derivation
    val p = graft.queries.Text.dupPairs(spark, sf, maxDocId = 100)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join resurfaced in the q78/q220 pair relation:\n$p")
  }

  test("topKLiveBatch: base cells prune by PARTITION filter, the probe relation broadcasts, and the per-probe top-k partial-limits (WindowGroupLimit)") {
    import spark.implicits._
    import graft.functions.Ivf
    import graft.streaming.IvfIngestMaintenance
    // a real shelf on disk — the scale claims live in the SCAN node
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = GatedQuery.indexScratch(sf, "planspec_topklivebatch")
    Ivf.writeIndex(e, "vec_id", "v", nlist = 8, path, iters = 1,
      sampleMod = 7)
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v"))
    val p = IvfIngestMaintenance
      .topKLiveBatch(spark, path, qs, "qid", "v", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    // the union of probed cells must reach the scan as a PARTITION
    // filter — a data filter (or none) would read all nlist dirs
    // drop(1): element 0 is the plan text ABOVE the first scan — its
    // first ']' could enclose an unrelated 'cell' attribute and
    // false-pass the exact claim this pins
    assert(p.contains("PartitionFilters: [") &&
      p.split("PartitionFilters: ", -1).drop(1).exists(s =>
        s.takeWhile(_ != ']').contains("cell")),
      s"cell pruning lost from the base scan:\n$p")
    // the parameter-sized probe relation broadcasts; the corpus side
    // never shuffles before the per-probe rank
    assert(p.contains("BroadcastExchange"),
      s"probe relation not broadcast:\n$p")
    // the per-probe top-k pushes a partial limit below the exchange —
    // the q74 shape the batched monitor's O(1)-jobs claim rides on
    assert(p.contains("WindowGroupLimit"),
      s"per-probe top-k lost WindowGroupLimit:\n$p")
  }
}
