package graft

import graft.streaming.StatefulMaterialize
import graft.streaming.StatefulMaterialize.{Change, SnapshotDelta}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** flatMapGroupsWithState materializer: per-key last-write-wins state with
  * delta emission — semantics must match the batch materializer (ordering,
  * tie-break, tombstones) and emit only changed keys per trigger. */
class StatefulMaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[Change]]): Seq[Seq[SnapshotDelta]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StatefulMaterialize.deltas(input.toDS())
      .writeStream.format("memory").queryName("sm_deltas")
      .outputMode("update").start()
    try batches.map { b =>
      val before = spark.table("sm_deltas").count()
      input.addData(b: _*)
      q.processAllAvailable()
      spark.table("sm_deltas").as[SnapshotDelta].collect().toSeq
        .drop(before.toInt)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sm_deltas")
    }
  }

  test("last-write-wins across triggers with tie-break and tombstones") {
    val out = runBatches(Seq(
      // batch 0: two keys inserted
      Seq(Change(1L, "t01", 100L, "insert", Some(10)),
        Change(2L, "t02", 101L, "insert", Some(20))),
      // batch 1: key 1 updated; key 2 receives a STALE (older ts) update
      // that must be ignored; key 3 appears
      Seq(Change(1L, "t05", 102L, "update", Some(11)),
        Change(2L, "t00", 103L, "update", Some(99)),
        Change(3L, "t06", 104L, "insert", Some(30))),
      // batch 2: same-timestamp tie on key 1 — larger txid wins; key 2
      // deleted (tombstone delta)
      Seq(Change(1L, "t05", 200L, "update", Some(12)),
        Change(2L, "t07", 105L, "delete", None)),
      // batch 3: exact redelivery of key 1's winner — NO delta emitted
      Seq(Change(1L, "t05", 200L, "update", Some(12)))))

    assert(out(0).map(d => d.pk -> d.amount).toMap === Map(1L -> Some(10), 2L -> Some(20)))
    // stale update to key 2 ignored: only keys 1 and 3 emit deltas
    assert(out(1).map(_.pk).toSet === Set(1L, 3L))
    assert(out(1).find(_.pk == 1L).get.amount === Some(11))
    // tie resolved by txid; key 2 tombstoned
    assert(out(2).find(_.pk == 1L).get.amount === Some(12))
    assert(out(2).find(_.pk == 2L).get.live === false)
    // idempotent redelivery: empty delta
    assert(out(3).isEmpty)
  }

  test("colliding pk values across tables keep independent state (multi-table S3)") {
    val out = runBatches(Seq(
      // same pk in two shards, then a delete in one only
      Seq(Change(1L, "t01", 100L, "insert", Some(10)),
        Change(1L, "t02", 101L, "insert", Some(20), tbl = "retail_trans_eu")),
      Seq(Change(1L, "t03", 102L, "delete", None))))
    assert(out(0).map(d => (d.tbl, d.pk) -> d.amount).toMap ===
      Map(("retail_trans", 1L) -> Some(10),
        ("retail_trans_eu", 1L) -> Some(20)))
    // only the main shard's key tombstones; the eu shard's row is untouched
    assert(out(1).map(d => (d.tbl, d.live)) ===
      Seq(("retail_trans", false)))
  }

  test("replaying the CDC fixture through the stateful operator matches the batch snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val changes = graft.cdc.Envelope.changelog(spark, Tables.cdcFixturePath)
      .select(col("data.trans_id").as("pk"),
        col("metadata.timestamp").as("ts"),
        col("metadata.`transaction-id`").as("txid"),
        col("metadata.operation").as("op"),
        col("data.amount").as("amount"),
        col("metadata.`schema-name`").as("sch"),
        col("metadata.`table-name`").as("tbl"))
      .as[Change].collect()

    val input = MemoryStream[Change]
    val q = StatefulMaterialize.deltas(input.toDS())
      .writeStream.format("memory").queryName("sm_replay")
      .outputMode("update").start()
    // two arbitrary batches
    val (a, b) = changes.splitAt(changes.length / 2)
    try {
      input.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    // final state per key = last delta per key; live ones must equal the
    // batch materializer's snapshot on (pk, amount)
    val deltas = spark.table("sm_replay").as[SnapshotDelta].collect()
    val lastPerKey = deltas.zipWithIndex.groupBy(_._1.pk)
      .map { case (_, ds) => ds.maxBy(_._2)._1 }
    val live = lastPerKey.filter(_.live).map(d => d.pk -> d.amount.get).toMap
    val batchSnap = graft.cdc.Materialize.snapshot(
        graft.cdc.Envelope.changelog(spark, Tables.cdcFixturePath))
      .select(col("trans_id"), col("amount"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(live === batchSnap)
    spark.sql("DROP VIEW IF EXISTS sm_replay")
  }
}
