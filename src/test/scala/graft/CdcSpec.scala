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
      env("otherdb", "retail_trans"),       // schema miss
      env("testdb", "retail_trans", rt = "control")) // never selected
      .toDF("value"))
    val rules = Seq(SelectionRule("testdb", "retail_trans%"),
      SelectionRule("%", "%backup", action = "exclude"))
    val kept = parsed.filter(Envelope.selection(rules))
      .select(col("metadata.`table-name`")).as[String].collect().sorted
    assert(kept.toSeq === Seq("retail_trans", "retail_trans_eu"))

    // `_` is the single-char wildcard (DMS LIKE grammar): retail_tran_
    // matches retail_trans but not the longer shard name
    val one = parsed.filter(Envelope.selection(
      Seq(SelectionRule("testdb", "retail!_tran!_")))) // no escape support claimed
    val underscore = parsed.filter(Envelope.selection(
      Seq(SelectionRule("testdb", "retail_tran_"))))
      .select(col("metadata.`table-name`")).as[String].collect().toSeq
    assert(underscore === Seq("retail_trans"))
    assert(one.count() === 0) // literal '!' never matches; no escape syntax

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
