package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import scala.util.Random

/** Generates the deterministic SECOND-table envelope fixture
  * `fixtures/cdc_retail_trans_eu.jsonl` (FIXTURES.md §3b) — the sharded
  * sibling of `retail_trans` that exercises DMS multi-table selection
  * rules (SURVEY.md S3, reference dms_aurora_mysql_to_kinesis.py:96-107):
  * a wildcard include like `testdb.retail_trans%` fans both shards into
  * one stream, and the per-(schema, table, pk) materializer must keep
  * them apart even though the shards REUSE the same trans_id values.
  *
  * Contents (121 lines total, Random(48)):
  *   - 117 data records for testdb.retail_trans_eu over 60 distinct
  *     trans_id (1..60 — deliberately colliding with the main fixture's
  *     key range): 60 inserts, 40 updates, 12 terminal deletes, 5
  *     re-inserts after delete → 53 live keys.
  *   - 4 records with table-name=retail_trans_eu_backup and amount 99999:
  *     they MATCH the wildcard include and must be removed by an exclude
  *     rule — include/exclude precedence is load-bearing, not decorative.
  *   - metadata.timestamp strictly increasing in µs steps from
  *     2022-03-14T15:00:00.000000Z (disjoint from the main fixture's
  *     hour); transaction-ids globally shuffled against time.
  *   - File line order is a seeded shuffle.
  */
object GenCdcShardFixture {

  private val events  = Vector("visit", "view", "cart", "list", "like", "purchase")
  private val devices = Vector("pc", "mobile", "tablet")

  private case class RowState(customerId: String, event: String, sku: String,
                              amount: Int, device: String, transDt: String)

  def main(args: Array[String]): Unit = {
    val rnd = new Random(48)

    def digits(n: Int): String = (1 to n).map(_ => rnd.nextInt(10)).mkString
    def letters(n: Int): String = (1 to n).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    def amountFor(event: String): Int =
      if (event == "cart" || event == "purchase") rnd.nextInt(101) else 1
    def freshState(): RowState = {
      val ev = events(rnd.nextInt(events.size))
      val sec = rnd.nextInt(86400)
      val dt = f"2022-03-14T${sec / 3600}%02d:${(sec % 3600) / 60}%02d:${sec % 60}%02dZ"
      RowState("%012d".format(BigInt(digits(12))), ev,
        letters(2) + digits(4) + letters(4), amountFor(ev),
        devices(rnd.nextInt(devices.size)), dt)
    }
    def mutate(s: RowState): RowState = {
      val ev = events(rnd.nextInt(events.size))
      s.copy(event = ev, amount = amountFor(ev),
        device = devices(rnd.nextInt(devices.size)))
    }

    // per-key op scripts, interleaved preserving per-key causal order
    val keys = (1L to 60L).toVector
    val state = mutable.Map[Long, RowState]()
    val perKey = mutable.Map[Long, mutable.Queue[String]]()
    keys.foreach(k => perKey(k) = mutable.Queue("insert"))
    Vector.fill(40)(keys(rnd.nextInt(keys.size))).foreach(k => perKey(k) += "update")
    val deleteKeys = rnd.shuffle(keys).take(12)
    deleteKeys.foreach(k => perKey(k) += "delete")
    rnd.shuffle(deleteKeys).take(5).foreach(k => perKey(k) += "reinsert")

    final case class Op(transId: Long, op: String, state: RowState)
    val merged = mutable.ArrayBuffer[Op]()
    val live = mutable.ArrayBuffer[Long](keys: _*)
    while (live.nonEmpty) {
      val k = live(rnd.nextInt(live.size))
      val q = perKey(k)
      val op = q.dequeue()
      if (q.isEmpty) live -= k
      op match {
        case "insert" | "reinsert" =>
          val s = freshState(); state(k) = s; merged += Op(k, "insert", s)
        case "update" =>
          val s = mutate(state(k)); state(k) = s; merged += Op(k, "update", s)
        case "delete" =>
          merged += Op(k, "delete", state(k))
      }
    }
    require(merged.size == 117, s"expected 117 data records, got ${merged.size}")

    // strictly increasing µs stamps from 15:00:00; shuffled txids
    var cur = 0L
    val stamps = merged.map { _ => cur += 1000L + rnd.nextInt(500000); cur }
    def isoMicros(us: Long): String = {
      val total = us + (15L * 3600) * 1000000L
      val s = total / 1000000L; val frac = total % 1000000L
      f"2022-03-14T${s / 3600}%02d:${(s % 3600) / 60}%02d:${s % 60}%02d.$frac%06dZ"
    }
    val txids = rnd.shuffle(merged.indices.map(i => 8800000000L + i * 7919L).toVector)

    def envelope(id: Long, s: RowState, ts: String, op: String, txid: Long,
                 table: String): String =
      s"""{"data": {"trans_id": $id, "customer_id": "${s.customerId}", "event": "${s.event}", "sku": "${s.sku}", "amount": ${s.amount}, "device": "${s.device}", "trans_datetime": "${s.transDt}"}, "metadata": {"timestamp": "$ts", "record-type": "data", "operation": "$op", "partition-key-type": "primary-key", "schema-name": "testdb", "table-name": "$table", "transaction-id": $txid}}"""

    val lines = mutable.ArrayBuffer[String]()
    merged.indices.foreach { i =>
      val o = merged(i)
      lines += envelope(o.transId, o.state, isoMicros(stamps(i)), o.op,
        txids(i), "retail_trans_eu")
    }
    // wildcard-trap noise: matches `testdb.retail_trans%`, must be excluded
    var noiseTs = cur; var noiseTx = 9980000000L
    (1 to 4).foreach { j =>
      noiseTs += 100000; noiseTx += 13
      lines += envelope(j.toLong, freshState().copy(amount = 99999),
        isoMicros(noiseTs), "update", noiseTx, "retail_trans_eu_backup")
    }

    val shuffled = rnd.shuffle(lines.toVector)
    val out = Paths.get(args.headOption.getOrElse("fixtures/cdc_retail_trans_eu.jsonl"))
    Files.createDirectories(out.getParent)
    Files.write(out, shuffled.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    println(s"wrote ${shuffled.size} envelopes to $out")
  }
}
