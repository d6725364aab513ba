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

  test("mixed timestamp wire forms for one key are rejected loudly") {
    // winner ordering is lexicographic under the fixed-width stamp
    // contract; 'T' > ' ' would silently prefer a stale ISO-form change
    // over a newer space-form one, so the collision must throw instead
    val ds = Seq(
      Change(1L, "2023-01-01T09:00:00.000000Z", 1L, "delete", None),
      Change(1L, "2023-01-01 10:00:00.000000", 2L, "insert", Some(5))).toDS()
    val e = intercept[Exception](StatefulMaterialize.deltas(ds).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mixed timestamp wire forms")), e.toString)
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

  test("tombstones evict after the lateness horizon; late replay cannot resurrect the key") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = f"2023-01-01 10:$min%02d:00.000000"
    val input = MemoryStream[Change]
    val q = StatefulMaterialize
      .deltasEvicting(input.toDS(), java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("sm_evict")
      .outputMode("update").start()
    def stateRows: Long = q.lastProgress.stateOperators.head.numRowsTotal
    try {
      // two keys inserted, then key 1 deleted → state = tombstone + live
      input.addData(Change(1L, ts(0), 100L, "insert", Some(10)),
        Change(2L, ts(1), 101L, "insert", Some(20)),
        Change(1L, ts(2), 102L, "delete", None))
      q.processAllAvailable()
      assert(stateRows === 2L)
      assert(spark.table("sm_evict").as[SnapshotDelta].collect()
        .find(_.pk == 1L).get.live === false)

      // advance the watermark past tombstoneTs + lateness (delete at
      // minute 2, horizon 10 → evict once watermark > minute 12; key 3 at
      // minute 40 puts the watermark at minute 30)
      input.addData(Change(3L, ts(40), 103L, "insert", Some(30)))
      q.processAllAvailable()
      // tombstone for key 1 evicted; keys 2 and 3 (live) remain
      assert(stateRows === 2L)

      // a replayed change for the evicted key, older than the watermark,
      // is dropped as late data — NO delta, NO state resurrection
      val before = spark.table("sm_evict").count()
      input.addData(Change(1L, ts(5), 99L, "update", Some(77)))
      q.processAllAvailable()
      assert(spark.table("sm_evict").count() === before)
      assert(stateRows === 2L)

      // live keys never time out: key 2's state is intact and a genuine
      // new change for it still emits a delta
      input.addData(Change(2L, ts(41), 104L, "update", Some(21)))
      q.processAllAvailable()
      val last = spark.table("sm_evict").as[SnapshotDelta].collect().last
      assert((last.pk, last.amount) === (2L, Some(21)))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sm_evict")
    }
  }

  test("eviction clock follows the session timezone (zone-less timestamps, non-UTC session)") {
    // the watermark (try_to_timestamp) and the timeout deadline (tsMillis)
    // must read a zone-less stamp with the SAME zone — a UTC-pinned
    // deadline under a non-UTC session would evict offset from the horizon
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      implicit val sqlCtx = spark.sqlContext
      def ts(min: Int) = f"2023-01-01 10:$min%02d:00.000000"
      val input = MemoryStream[Change]
      val q = StatefulMaterialize
        .deltasEvicting(input.toDS(), java.time.Duration.ofMinutes(10))
        .writeStream.format("memory").queryName("sm_evict_tz")
        .outputMode("update").start()
      def stateRows: Long = q.lastProgress.stateOperators.head.numRowsTotal
      try {
        input.addData(Change(1L, ts(0), 100L, "insert", Some(10)),
          Change(1L, ts(2), 102L, "delete", None))
        q.processAllAvailable()
        assert(stateRows === 1L) // the tombstone
        // watermark to minute 30 → past tombstoneTs + 10 min → evicted
        input.addData(Change(3L, ts(40), 103L, "insert", Some(30)))
        q.processAllAvailable()
        assert(stateRows === 1L) // key 3 live; tombstone gone
        // late replay cannot resurrect, same as the UTC case
        val before = spark.table("sm_evict_tz").count()
        input.addData(Change(1L, ts(5), 99L, "update", Some(77)))
        q.processAllAvailable()
        assert(spark.table("sm_evict_tz").count() === before)
        assert(stateRows === 1L)
      } finally {
        q.stop()
        spark.sql("DROP VIEW IF EXISTS sm_evict_tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("evicting form matches the no-timeout form on the CDC fixture (parity)") {
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
    // horizon far wider than the fixture's time span → no eviction can
    // fire, so winners must be IDENTICAL to the NoTimeout form
    val q = StatefulMaterialize
      .deltasEvicting(input.toDS(), java.time.Duration.ofDays(3650))
      .writeStream.format("memory").queryName("sm_evict_parity")
      .outputMode("update").start()
    val (a, b) = changes.splitAt(changes.length / 2)
    try {
      input.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val deltas = spark.table("sm_evict_parity").as[SnapshotDelta].collect()
    val lastPerKey = deltas.zipWithIndex.groupBy(_._1.pk)
      .map { case (_, ds) => ds.maxBy(_._2)._1 }
    val live = lastPerKey.filter(_.live).map(d => d.pk -> d.amount.get).toMap
    val batchSnap = graft.cdc.Materialize.snapshot(
        graft.cdc.Envelope.changelog(spark, Tables.cdcFixturePath))
      .select(col("trans_id"), col("amount"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(live === batchSnap)
    spark.sql("DROP VIEW IF EXISTS sm_evict_parity")
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
