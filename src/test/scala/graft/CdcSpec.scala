package graft

import graft.cdc.{Envelope, Materialize}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** O34/O35/O36 semantics pinned against an independent in-memory fold of the
  * same changelog (the "apply ops in order" reference model). */
class CdcSpec extends SparkTestBase {

  private lazy val changelog = Envelope.changelog(spark, Tables.cdcFixturePath)

  test("selection rule excludes other tables, schemas, and control records") {
    val parsed = Envelope.parse(spark, Tables.cdcFixturePath)
    assert(parsed.count() === 613)
    assert(changelog.count() === 600)
    // noise rows are flagged with amount 99999 — none may survive selection
    assert(changelog.filter(col("data.amount") === 99999).count() === 0)
  }

  test("wildcard rule list: include/exclude precedence, LIKE semantics, single-rule equivalence (S3)") {
    import spark.implicits._
    import Envelope.SelectionRule
    def env(sch: String, tbl: String, rt: String = "data") =
      s"""{"data": {"trans_id": 1}, "metadata": {"timestamp": "2022-01-01T00:00:00.000000Z", "record-type": "$rt", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "$sch", "table-name": "$tbl", "transaction-id": 1}}"""
    val parsed = Envelope.parseLines(Seq(
      env("testdb", "retail_trans"),        // plain include
      env("testdb", "retail_trans_eu"),     // wildcard include
      env("testdb", "retail_trans_backup"), // include hit, exclude wins
      env("testdb", "other_table"),         // no include hit
      env("testdb", "retailXtrans"),        // one-char variant: never matched
      env("otherdb", "retail_trans"),       // schema miss
      env("testdb", "retail_trans", rt = "control")) // never selected
      .toDF("value"))
    val rules = Seq(SelectionRule("testdb", "retail_trans%"),
      SelectionRule("%", "%backup", action = "exclude"))
    val kept = parsed.filter(Envelope.selection(rules))
      .select(col("metadata.`table-name`")).as[String].collect().sorted
    assert(kept.toSeq === Seq("retail_trans", "retail_trans_eu"))

    // '%' is the ONLY wildcard (DMS object-locator grammar); '_' is
    // literal both in exact locators (equality match — retail_tran_ and
    // retail_trans cannot cross-match, nor can retailXtrans) and inside
    // '%' patterns (escaped in the LIKE): retail_trans_% selects the
    // shards but NOT the bare table
    assert(parsed.filter(Envelope.selection(
      Seq(SelectionRule("testdb", "retail_tran_")))).count() === 0)
    val shards = parsed.filter(Envelope.selection(
      Seq(SelectionRule("testdb", "retail_trans_%"))))
      .select(col("metadata.`table-name`")).as[String].collect().sorted
    assert(shards.toSeq === Seq("retail_trans_backup", "retail_trans_eu"))

    // the defaulted single-table form IS a one-include rule list
    val a = parsed.filter(Envelope.selection()).count()
    val b = parsed.filter(Envelope.selection(
      Seq(SelectionRule("testdb", "retail_trans")))).count()
    assert(a === b && a === 1L)

    // an exclude-only rule set is a configuration error, loudly
    intercept[IllegalArgumentException] {
      Envelope.selection(Seq(SelectionRule("%", "%", action = "exclude")))
    }
    intercept[IllegalArgumentException] { SelectionRule("a", "b", "drop") }
  }

  test("per-table materialization keeps colliding pk ranges apart (S3 fan-out)") {
    val both = Envelope.parseLines(
      spark.read.text(Tables.cdcFixturePath, Tables.cdcShardFixturePath))
      .filter(Envelope.selection(Seq(
        Envelope.SelectionRule("testdb", "retail_trans%"),
        Envelope.SelectionRule("%", "%backup", action = "exclude"))))
      .drop("value")
    val byTable = Materialize.snapshotByTable(both)
    // 210 live keys in retail_trans, 60-12+5=53 in retail_trans_eu; the
    // shards share trans_id 1..60, so a pk-only key would collapse them
    val counts = byTable.groupBy("tbl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("retail_trans" -> 210L, "retail_trans_eu" -> 53L))
    // the eu shard's rows must be eu images, not main-fixture leftovers:
    // every (tbl, pk) pair is unique and no backup-trap amount leaked
    assert(byTable.filter(col("amount") === 99999).count() === 0)
    assert(byTable.groupBy("tbl", "trans_id").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("Envelope.corrupt is never NULL for any null combination (routing invariant)") {
    import spark.implicits._
    // crafted lines covering every null/missing-field shape the PERMISSIVE
    // parser can produce: the routing predicate must be a real boolean for
    // all of them, or rows vanish from both the main stream and the DLQ
    val lines = Seq(
      "not json at all",
      """{"metadata": null}""",
      """{"metadata": {}}""",
      """{"metadata": {"timestamp": "2022-01-01T00:00:00.000000Z"}}""",
      """{"metadata": {"record-type": "data"}}""",
      """{"metadata": {"record-type": "data", "timestamp": "2022-01-01T00:00:00.000000Z"}}""",
      """{"metadata": {"record-type": "control", "timestamp": "2022-01-01T00:00:00.000000Z"}}""",
      """{"data": {"trans_id": null}, "metadata": {"record-type": "data", "timestamp": "2022-01-01T00:00:00.000000Z"}}""",
      """{"data": {"trans_id": 1}, "metadata": {"record-type": "data", "timestamp": "2022-01-01T00:00:00.000000Z"}}""")
    val parsed = Envelope.parseLines(lines.toDF("value"))
    assert(parsed.filter(Envelope.corrupt.isNull).count() === 0)
    // and the two routes partition the input exactly
    val c = parsed.filter(Envelope.corrupt).count()
    val nc = parsed.filter(!Envelope.corrupt).count()
    assert(c + nc === lines.size.toLong)

    // a data record with NO operation is corrupt (DLQ), not a silent
    // delete-by-omission: `op =!= 'delete'` would go three-valued and
    // drop it from serving while the stateful materializer kept it live
    val noOp = Envelope.parseLines(Seq(
      """{"data": {"trans_id": 9}, "metadata": {"record-type": "data", "timestamp": "2022-01-01T00:00:00.000000Z", "transaction-id": 5, "schema-name": "testdb", "table-name": "retail_trans"}}""")
      .toDF("value"))
    assert(noOp.filter(Envelope.corrupt).count() === 1)

    // and the BATCH path enforces it too: changelog() excludes corrupt
    // records, so Materialize never sees the null-op row — batch snapshot
    // and the (DLQ-fed) stateful materializer agree on excluding it
    val mixed = Envelope.changelog(Seq(
      """{"data": {"trans_id": 9}, "metadata": {"record-type": "data", "timestamp": "2022-01-01T00:00:00.000000Z", "transaction-id": 5, "schema-name": "testdb", "table-name": "retail_trans"}}""",
      """{"data": {"trans_id": 10, "customer_id": "c", "event": "visit", "sku": "s", "amount": 1, "device": "pc", "trans_datetime": "2022-01-01 00:00:00"}, "metadata": {"record-type": "data", "operation": "insert", "timestamp": "2022-01-01T00:00:00.000000Z", "transaction-id": 6, "schema-name": "testdb", "table-name": "retail_trans"}}""")
      .toDF("value"))
    assert(mixed.count() === 1, "changelog must exclude corrupt records")
    val snap = Materialize.snapshot(mixed).select("trans_id").collect().map(_.getLong(0))
    assert(snap.toSeq === Seq(10L),
      "the null-op row must be DLQ-excluded, not silently delete-by-omission")
  }

  test("materialized snapshot equals a sequential fold of the changelog") {
    val snapshot = Materialize.snapshot(changelog)
      .collect().map(r => r.getLong(0) -> r).toMap

    // Reference model: sort every change by (timestamp, txid) and fold
    // last-write-wins with delete tombstones into a map.
    val folded = scala.collection.mutable.Map[Long, Option[Row]]()
    changelog
      .select(col("metadata.timestamp"), col("metadata.`transaction-id`"),
        col("metadata.operation"), col("data.*"))
      .collect()
      .sortBy(r => (r.getString(0), r.getLong(1)))
      .foreach { r =>
        val key = r.getLong(3) // data.trans_id
        if (r.getString(2) == "delete") folded(key) = None
        else folded(key) = Some(r)
      }
    val live = folded.collect { case (k, Some(r)) => k -> r }

    assert(snapshot.keySet === live.keySet)
    live.foreach { case (k, r) =>
      val s = snapshot(k)
      // columns after the 3 metadata ones: trans_id, customer_id, event,
      // sku, amount, device, trans_datetime
      assert(s.getString(1) === r.getString(4), s"customer_id for key $k")
      assert(s.getString(2) === r.getString(5), s"event for key $k")
      assert(s.getInt(4) === r.getInt(7), s"amount for key $k")
    }
  }

  test("snapshot accounts: 250 keys - 50 deletes + 10 re-inserts = 210 live") {
    assert(Materialize.snapshot(changelog).count() === 210)
  }

  test("same-timestamp ties resolve by transaction-id (larger wins)") {
    val ties = changelog
      .groupBy(col("data.trans_id").as("k"), col("metadata.timestamp").as("ts"))
      .agg(count(lit(1)).as("c"), max(col("metadata.`transaction-id`")).as("max_tx"))
      .filter(col("c") > 1)
    assert(ties.count() === 20)

    // For every tied (key, ts) that is the key's latest write, the snapshot
    // must carry the row of the LARGER transaction-id.
    val winner = Materialize.snapshot(changelog)
      .join(ties, col("trans_id") === col("k"))
    val expected = changelog
      .join(ties, changelog("data.trans_id") === ties("k") &&
        changelog("metadata.timestamp") === ties("ts") &&
        changelog("metadata.`transaction-id`") === ties("max_tx"))
      .select(col("data.trans_id").as("tid"), col("data.event").as("ev"))
    // Tied pairs planted at the key's final write position: snapshot event
    // must equal the max-txid row's event whenever that ts is the latest.
    val latestTs = changelog.groupBy(col("data.trans_id").as("tid2"))
      .agg(max(col("metadata.timestamp")).as("last_ts"))
    val mismatches = expected
      .join(latestTs, col("tid") === col("tid2"))
      .join(ties, col("tid") === col("k") && col("ts") === col("last_ts"))
      .join(Materialize.snapshot(changelog), col("tid") === col("trans_id"))
      .filter(col("ev") =!= col("event"))
    assert(mismatches.count() === 0)
  }

  test("materialization is idempotent under duplicate delivery") {
    val doubled = Materialize.snapshot(changelog.unionByName(changelog))
    val once = Materialize.snapshot(changelog)
    assert(doubled.exceptAll(once).count() === 0)
    assert(once.exceptAll(doubled).count() === 0)
  }

  test("selection source filters: OR within a filter, AND across filters, null never goes three-valued") {
    import spark.implicits._
    import Envelope.{FilterCondition, SelectionRule, SourceFilter}
    def env(id: Long, amount: String, device: String) =
      s"""{"data": {"trans_id": $id, "amount": $amount, "device": $device}, "metadata": {"timestamp": "2022-01-01T00:00:00.000000Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": $id}}"""
    val parsed = Envelope.parseLines(Seq(
      env(1, "150", "\"pc\""),        // in range, device ok      → kept
      env(2, "999", "\"pc\""),        // out of range             → dropped
      env(3, "null", "\"pc\""),       // null amount, null cond   → kept
      env(4, "150", "\"tablet\""),    // device excluded          → dropped
      env(5, "150", "null"))          // null device vs noteq     → dropped
      .toDF("value"))
    val rules = Seq(SelectionRule("testdb", "retail_trans", filters = Seq(
      SourceFilter("amount", Seq(FilterCondition("between", "100", "500"),
        FilterCondition("null"))),
      SourceFilter("device", Seq(FilterCondition("noteq", "tablet"))))))
    val kept = parsed.filter(Envelope.selection(rules))
      .select(col("data.trans_id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))

    // an EXCLUDE rule whose filter hits a null column must not null out
    // the whole selection: record 5 (null device) is NOT excluded by a
    // device-filtered exclude, so the include keeps it
    val rules2 = Seq(SelectionRule("testdb", "%"),
      SelectionRule("testdb", "retail_trans", action = "exclude",
        filters = Seq(SourceFilter("device",
          Seq(FilterCondition("eq", "tablet"))))))
    val kept2 = parsed.filter(Envelope.selection(rules2))
      .select(col("data.trans_id")).as[Long].collect().sorted
    assert(kept2.toSeq === Seq(1L, 2L, 3L, 5L))

    // misconfiguration is loud at construction
    intercept[IllegalArgumentException] { FilterCondition("lt", "5") }
    intercept[IllegalArgumentException] { FilterCondition("between", "1") }
    intercept[IllegalArgumentException] { FilterCondition("eq") }
    intercept[IllegalArgumentException] {
      SourceFilter("no_such_column", Seq(FilterCondition("eq", "x")))
    }
    intercept[IllegalArgumentException] { SourceFilter("amount", Nil) }
    // a type-invalid value must fail at selection() build (what start()
    // calls eagerly), not as an ANSI cast error at batch 0 of a running
    // stream
    intercept[IllegalArgumentException] {
      Envelope.selection(Seq(SelectionRule("testdb", "retail_trans",
        filters = Seq(SourceFilter("amount",
          Seq(FilterCondition("eq", "12x")))))))
    }
  }

  test("schema drift is surfaced, not silently nulled: added/renamed fields are listed per record") {
    import spark.implicits._
    val lines = Seq(
      // clean envelope: no drift
      """{"data": {"trans_id": 1, "customer_id": "c", "event": "visit", "sku": "S", "amount": 1, "device": "pc", "trans_datetime": "2022-01-01 00:00:00"}, "metadata": {"timestamp": "2022-01-01T00:00:00.000000Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": 1}}""",
      // a RENAMED source column (trans_datetime → txn_datetime): from_json
      // nulls the old name; the new name must surface as drift
      """{"data": {"trans_id": 2, "customer_id": "c", "event": "visit", "sku": "S", "amount": 1, "device": "pc", "txn_datetime": "2022-01-01 00:00:00"}, "metadata": {"timestamp": "2022-01-01T00:00:01.000000Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": 2}}""",
      // an ADDED column + an unknown top-level and metadata field
      """{"data": {"trans_id": 3, "customer_id": "c", "event": "visit", "sku": "S", "amount": 1, "device": "pc", "trans_datetime": "2022-01-01 00:00:00", "coupon_code": "X1"}, "metadata": {"timestamp": "2022-01-01T00:00:02.000000Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": 3, "shard-id": "7"}, "trace": "abc"}""",
      // not JSON at all: the DLQ's problem, not the drift detector's
      "garbage line")
    val parsed = Envelope.withDrift(
      Envelope.parseLines(lines.toDF("value")))
      .select(col("data.trans_id").as("id"), col("drift"))
      .collect().map(r => Option(r.get(0)) -> r.getSeq[String](1).toSeq).toMap
    assert(parsed(Some(1L)) === Seq.empty)
    assert(parsed(Some(2L)) === Seq("data.txn_datetime"))
    assert(parsed(Some(3L)).sorted === Seq("data.coupon_code",
      "metadata.shard-id", "trace"))
    assert(parsed(None) === Seq.empty)

    // the monitoring rollup counts per unknown field
    val stats = Envelope.driftStats(lines.toDF("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("data.txn_datetime" -> 1L, "data.coupon_code" -> 1L,
      "metadata.shard-id" -> 1L, "trace" -> 1L))
  }

  test("transformation rules: list order, locator grammar, inert misses, loud collisions (S4)") {
    import graft.cdc.Transformation
    import graft.cdc.Transformation.TransformationRule
    val df = spark.range(1).select(lit(1L).as("trans_id"),
      lit("c1").as("customer_id"), lit("d").as("device"))

    // rules apply IN LIST ORDER, each over the previous rule's output:
    // rename-then-prefix prefixes the NEW name ...
    val ab = Transformation.shape(df, "testdb", "retail_trans", Seq(
      TransformationRule("column", "rename",
        columnName = "customer_id", value = "cust"),
      TransformationRule("column", "add-prefix",
        columnName = "cust", value = "x_")))
    assert(ab.columns.toSeq === Seq("trans_id", "x_cust", "device"))
    // ... while prefix-then-rename finds no 'cust' column yet (inert)
    val ba = Transformation.shape(df, "testdb", "retail_trans", Seq(
      TransformationRule("column", "add-prefix",
        columnName = "cust", value = "x_"),
      TransformationRule("column", "rename",
        columnName = "customer_id", value = "cust")))
    assert(ba.columns.toSeq === Seq("trans_id", "cust", "device"))

    // locator: '%' is the only wildcard; '_' literal; schema/table misses
    // are inert; prefix/case edits; map-record-to-document wraps all
    assert(Transformation.locatorMatches("retail_trans", "retail_trans"))
    assert(!Transformation.locatorMatches("retail_tran_", "retail_trans"))
    assert(!Transformation.locatorMatches("retail_trans", "retailXtrans"))
    assert(Transformation.locatorMatches("retail%_eu", "retail_trans_eu"))
    val shaped = Transformation.shape(df, "testdb", "retail_trans", Seq(
      TransformationRule("column", "remove-column", "otherdb", "%", "%"),
      TransformationRule("column", "remove-column",
        "testdb", "retail_tran_", "%"),
      TransformationRule("column", "convert-uppercase", columnName = "device"),
      TransformationRule("column", "remove-prefix",
        columnName = "customer%", value = "customer_"),
      TransformationRule("record", "map-record-to-document")))
    assert(shaped.columns.toSeq === Seq("_doc"))
    assert(shaped.select(col("_doc.*")).columns.toSeq ===
      Seq("trans_id", "id", "DEVICE"))
    // row values pass through untouched
    assert(shaped.select(col("_doc.id")).collect().head.getString(0) === "c1")

    // misconfiguration is loud, at construction or application
    intercept[IllegalArgumentException] { // wildcard rename
      TransformationRule("column", "rename", columnName = "%", value = "x")
    }
    intercept[IllegalArgumentException] { // unknown action
      TransformationRule("column", "drop-column")
    }
    intercept[IllegalArgumentException] { // rename onto an existing name
      Transformation.shape(df, "t", "t", Seq(TransformationRule("column",
        "rename", columnName = "device", value = "customer_id")))
    }
    intercept[IllegalArgumentException] { // removing every column
      Transformation.shape(df, "t", "t", Seq(TransformationRule("column",
        "remove-column", columnName = "%")))
    }
  }

  test("caller-shaped document mapping: partial nesting, merge-append, loud empty locator (S4)") {
    import graft.cdc.Transformation
    import graft.cdc.Transformation.TransformationRule
    val df = spark.range(1).select(lit(1L).as("trans_id"),
      lit("c1").as("customer_id"), lit("d").as("device"))

    // partial nesting: matched columns re-nest under the caller-declared
    // key, non-matching columns stay top-level, the doc appends last;
    // a second rule sharing the `value` APPENDS into the existing doc
    val shaped = Transformation.shape(df, "testdb", "retail_trans", Seq(
      TransformationRule("record", "map-record-to-document", "testdb",
        "retail_trans", "customer_id", "data"),
      TransformationRule("record", "map-record-to-document", "testdb",
        "retail_trans", "device", "data")))
    assert(shaped.columns.toSeq === Seq("trans_id", "data"))
    assert(shaped.select(col("data.*")).columns.toSeq ===
      Seq("customer_id", "device"))
    assert(shaped.select(col("data.customer_id"))
      .collect().head.getString(0) === "c1")

    // two document keys build the envelope shape; the default-value form
    // keeps round-8 behavior (everything under `_doc`) — pinned above.
    // Note a '%' locator would re-nest PRIOR doc columns too (they are
    // ordinary columns once built), so caller-shaped lists select
    // explicitly, key by key.
    val env = Transformation.shape(df, "testdb", "retail_trans", Seq(
      TransformationRule("record", "map-record-to-document", "%", "%",
        "customer_id", "payload"),
      TransformationRule("record", "map-record-to-document", "%", "%",
        "device", "payload"),
      TransformationRule("record", "map-record-to-document", "%", "%",
        "trans_id", "key")))
    assert(env.columns.toSeq === Seq("payload", "key"))
    assert(env.select(col("payload.*")).columns.toSeq ===
      Seq("customer_id", "device"))

    // a locator that matches nothing is a misconfigured rule, not a no-op
    // (DMS validates object mappings at task creation, not silently)
    intercept[IllegalArgumentException] {
      Transformation.shape(df, "t", "t", Seq(TransformationRule("record",
        "map-record-to-document", "%", "%", "no_such_%", "data")))
    }
    // appending into a non-struct column is loud too
    intercept[IllegalArgumentException] {
      Transformation.shape(df, "t", "t", Seq(TransformationRule("record",
        "map-record-to-document", "%", "%", "customer_id", "device")))
    }
  }

  test("typed transformation rules: change-data-type and add-column honor list order (S4)") {
    import graft.cdc.Transformation
    import graft.cdc.Transformation.TransformationRule
    import org.apache.spark.sql.types.{LongType, StringType}
    val df = spark.range(1).select(lit(1L).as("trans_id"),
      lit(7).cast("int").as("amount"), lit("2023-01-16 12:00:00").as("dt"))

    // cast-then-add: the added expression sees the POST-cast column type
    val typed = Transformation.shape(df, "testdb", "retail_trans", Seq(
      TransformationRule("column", "change-data-type", "testdb",
        "retail_trans", "amount", dataType = "bigint"),
      TransformationRule("column", "add-column", "testdb", "retail_trans",
        value = "cents", expression = "amount * 100", dataType = "bigint"),
      // locator-missed typed rule is inert
      TransformationRule("column", "change-data-type", "otherdb", "%",
        "%", dataType = "string")))
    assert(typed.schema("amount").dataType === LongType)
    assert(typed.schema("cents").dataType === LongType)
    assert(typed.select("cents").head.getLong(0) === 700L)
    assert(typed.schema("dt").dataType === StringType) // miss left alone

    // add-then-rename: a later rule sees the ADDED column (list order)
    val addedThenRenamed = Transformation.shape(df, "testdb",
      "retail_trans", Seq(
        TransformationRule("column", "add-column", columnName = "%",
          value = "day", expression = "substr(dt, 1, 10)"),
        TransformationRule("column", "rename", columnName = "day",
          value = "event_day")))
    assert(addedThenRenamed.columns.toSeq ===
      Seq("trans_id", "amount", "dt", "event_day"))
    assert(addedThenRenamed.select("event_day").head.getString(0) ===
      "2023-01-16")

    // wildcard change-data-type casts EVERY matching column
    val widened = Transformation.shape(df, "t", "t", Seq(
      TransformationRule("column", "change-data-type",
        columnName = "%", dataType = "string")))
    assert(widened.schema.fields.forall(_.dataType === StringType))

    // misconfiguration is loud
    intercept[IllegalArgumentException] { // no dataType
      TransformationRule("column", "change-data-type", columnName = "amount")
    }
    intercept[IllegalArgumentException] { // no expression
      TransformationRule("column", "add-column", value = "x")
    }
    intercept[IllegalArgumentException] { // no name
      TransformationRule("column", "add-column", expression = "1")
    }
    intercept[IllegalArgumentException] { // add-column onto existing name
      Transformation.shape(df, "t", "t", Seq(TransformationRule("column",
        "add-column", value = "amount", expression = "1")))
    }
  }

  test("op stats cover both noise tables and all three operations") {
    val stats = Materialize.opStats(Envelope.parse(spark, Tables.cdcFixturePath))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(stats(("testdb", "retail_trans", "insert")) === 260)
    assert(stats(("testdb", "retail_trans", "update")) === 290)
    assert(stats(("testdb", "retail_trans", "delete")) === 50)
    assert(stats(("testdb", "other_table", "update")) === 5)
    assert(stats(("otherdb", "retail_trans", "update")) === 5)
  }
}
