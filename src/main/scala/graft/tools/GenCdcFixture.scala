package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import scala.util.Random

/** Generates the deterministic CDC envelope fixture
  * `fixtures/cdc_retail_trans.jsonl` (FIXTURES.md §3). One single-line JSON
  * envelope per change, mirroring the DMS→Kinesis wire format
  * (reference cdk_stacks/dms_aurora_mysql_to_kinesis.py:84-92, sample at
  * reference README.md:460-479) and the seeded workload generator's value
  * distributions (reference utils/gen_fake_mysql_data.py:18,81-89 —
  * Faker.seed(47) honored as Random(47)).
  *
  * Contents (613 lines total):
  *   - 600 data records for testdb.retail_trans over 250 distinct trans_id:
  *     250 inserts, 270 updates, 20 planted same-timestamp update pairs
  *     (identical metadata.timestamp, differing transaction-id — pins the
  *     D-Q33 (timestamp, transaction-id) tie-break), 50 deletes (terminal
  *     for 40 keys), 10 re-inserts after delete (tombstone-then-revive).
  *   - 5 records with table-name=other_table and 5 with schema-name=otherdb,
  *     shaped as late high-amount updates to existing keys so selection-rule
  *     leakage (SURVEY.md S3) would provably corrupt the D-Q33 snapshot.
  *   - 3 record-type=control records every data query must ignore.
  *   - metadata.timestamp strictly increasing in µs steps except the planted
  *     pairs; fixed-width ISO8601 with 6-digit µs so lexicographic order ==
  *     chronological order on both engines.
  *   - transaction-id values are globally shuffled (NOT monotone with time)
  *     so an implementation ordering by transaction-id alone cannot pass.
  *   - File line order is a seeded shuffle — nothing may depend on it.
  */
object GenCdcFixture {

  private val events  = Vector("visit", "view", "cart", "list", "like", "purchase")
  private val devices = Vector("pc", "mobile", "tablet")

  private case class RowState(customerId: String, event: String, sku: String,
                              amount: Int, device: String, transDt: String)

  private case class Op(transId: Long, op: String, state: Option[RowState],
                        tiedToPrev: Boolean = false)

  def main(args: Array[String]): Unit = {
    val rnd = new Random(47)

    def digits(n: Int): String = (1 to n).map(_ => rnd.nextInt(10)).mkString
    def letters(n: Int): String = (1 to n).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    def sku(): String = letters(2) + digits(4) + letters(4)
    def amountFor(event: String): Int =
      if (event == "cart" || event == "purchase") rnd.nextInt(101) else 1
    def freshState(): RowState = {
      val ev = events(rnd.nextInt(events.size))
      // trans_datetime within 2022-03-14, second precision (README.md:468)
      val sec = rnd.nextInt(86400)
      val dt = f"2022-03-14T${sec / 3600}%02d:${(sec % 3600) / 60}%02d:${sec % 60}%02dZ"
      RowState("%012d".format(BigInt(digits(12))), ev, sku(), amountFor(ev),
        devices(rnd.nextInt(devices.size)), dt)
    }
    def mutate(s: RowState): RowState = {
      val ev = events(rnd.nextInt(events.size))
      s.copy(event = ev, amount = amountFor(ev),
        device = devices(rnd.nextInt(devices.size)))
    }

    // ---- per-key op scripts, then a seeded interleave that preserves ----
    // ---- per-key causal order (insert < updates < delete < re-insert) ----
    val keys = (1L to 250L).toVector
    val state = mutable.Map[Long, RowState]()
    val perKey = mutable.Map[Long, mutable.Queue[String]]()
    keys.foreach { k => perKey(k) = mutable.Queue("insert") }

    val updateKeys = Vector.fill(270)(keys(rnd.nextInt(keys.size)))
    updateKeys.foreach(k => perKey(k) += "update")
    val deleteKeys = rnd.shuffle(keys).take(50)
    deleteKeys.foreach(k => perKey(k) += "delete")
    val reinsertKeys = rnd.shuffle(deleteKeys).take(10)
    reinsertKeys.foreach(k => perKey(k) += "reinsert")

    val merged = mutable.ArrayBuffer[Op]()
    val live = mutable.ArrayBuffer[Long](keys: _*)
    while (live.nonEmpty) {
      val k = live(rnd.nextInt(live.size))
      val q = perKey(k)
      val op = q.dequeue()
      if (q.isEmpty) live -= k
      op match {
        case "insert" | "reinsert" =>
          val s = freshState(); state(k) = s
          merged += Op(k, "insert", Some(s))
        case "update" =>
          val s = mutate(state(k)); state(k) = s
          merged += Op(k, "update", Some(s))
        case "delete" =>
          merged += Op(k, "delete", Some(state(k)))
      }
    }

    // ---- plant 20 same-timestamp update pairs: extra update directly ----
    // ---- after an existing non-delete op of the same key ----
    val candidates = merged.zipWithIndex.collect {
      case (o, i) if o.op != "delete" && !deleteKeys.contains(o.transId) => i
    }
    val tieAt = rnd.shuffle(candidates).take(20).sorted.reverse
    tieAt.foreach { i =>
      val base = merged(i)
      val s = mutate(state(base.transId)); state(base.transId) = s
      merged.insert(i + 1, Op(base.transId, "update", Some(s), tiedToPrev = true))
    }
    require(merged.size == 600, s"expected 600 data records, got ${merged.size}")

    // ---- timestamps: strictly increasing µs steps except tie pairs ----
    val baseMicros = 0L // offset from 2022-03-14T14:00:00.000000Z
    var cur = baseMicros
    val stamps = merged.map { o =>
      if (!o.tiedToPrev) cur += 1000L + rnd.nextInt(500000)
      cur
    }
    def isoMicros(us: Long): String = {
      val total = us + (14L * 3600) * 1000000L
      val s = total / 1000000L; val frac = total % 1000000L
      f"2022-03-14T${s / 3600}%02d:${(s % 3600) / 60}%02d:${s % 60}%02d.$frac%06dZ"
    }

    // ---- transaction-ids: unique, shuffled against time; within a tie ----
    // ---- pair the later record carries the larger id (it must win) ----
    val txids = rnd.shuffle((0 until merged.size).map(i => 8590000000L + i * 7919L).toVector).toArray
    merged.indices.foreach { i =>
      if (merged(i).tiedToPrev && txids(i) < txids(i - 1)) {
        val t = txids(i); txids(i) = txids(i - 1); txids(i - 1) = t
      }
    }

    def dataJson(id: Long, s: RowState): String =
      s"""{"trans_id": $id, "customer_id": "${s.customerId}", "event": "${s.event}", "sku": "${s.sku}", "amount": ${s.amount}, "device": "${s.device}", "trans_datetime": "${s.transDt}"}"""

    def envelope(id: Long, s: RowState, ts: String, op: String, txid: Long,
                 schema: String = "testdb", table: String = "retail_trans"): String =
      s"""{"data": ${dataJson(id, s)}, "metadata": {"timestamp": "$ts", "record-type": "data", "operation": "$op", "partition-key-type": "primary-key", "schema-name": "$schema", "table-name": "$table", "transaction-id": $txid}}"""

    val lines = mutable.ArrayBuffer[String]()
    merged.indices.foreach { i =>
      val o = merged(i)
      lines += envelope(o.transId, o.state.get, isoMicros(stamps(i)), o.op, txids(i))
    }

    // ---- selection-rule noise: later timestamps + amount 99999 so any ----
    // ---- leak past the S3 filter visibly corrupts D-Q33 ----
    var noiseTs = cur
    var noiseTx = 9990000000L
    (1 to 5).foreach { j =>
      noiseTs += 100000; noiseTx += 13
      val s = freshState().copy(amount = 99999)
      lines += envelope(j.toLong, s, isoMicros(noiseTs), "update", noiseTx,
        table = "other_table")
    }
    (1 to 5).foreach { j =>
      noiseTs += 100000; noiseTx += 13
      val s = freshState().copy(amount = 99999)
      lines += envelope(j.toLong, s, isoMicros(noiseTs), "update", noiseTx,
        schema = "otherdb")
    }
    (1 to 3).foreach { j =>
      noiseTs += 100000; noiseTx += 13
      lines += s"""{"metadata": {"timestamp": "${isoMicros(noiseTs)}", "record-type": "control", "operation": "create-table", "partition-key-type": "task-id", "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": $noiseTx}}"""
    }

    val shuffled = rnd.shuffle(lines.toVector)
    val out = Paths.get(args.headOption.getOrElse("fixtures/cdc_retail_trans.jsonl"))
    Files.createDirectories(out.getParent)
    Files.write(out, shuffled.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    println(s"wrote ${shuffled.size} envelopes to $out")
  }
}
