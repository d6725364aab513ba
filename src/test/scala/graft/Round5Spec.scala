package graft

import graft.cdc.{Envelope, Materialize, Reconcile}
import graft.functions.ZOrder
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Round-5 operators: reconciliation (fault injection — the gate only
  * proves the healthy path), Misra-Gries heavy hitters (superset
  * guarantee on random streams), and z-order keys (bit parity with a
  * per-bit reference + the locality property the layout exists for). */
class Round5Spec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(147L + i)))
  import spark.implicits._

  private def snap = Materialize.snapshot(
    Envelope.changelog(spark, Tables.cdcFixturePath)).localCheckpoint()

  private val rcols = Seq("trans_id", "customer_id", "event", "sku",
    "amount", "device", "trans_datetime")

  test("reconcile: healthy replica reports zero mismatch/missing/extra") {
    val r = Reconcile.reconcile(snap, snap, "trans_id", rcols)
      .agg(sum("n_mismatch"), sum("n_missing"), sum("n_extra"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("reconcile: fault injection localizes corruption to the right bucket") {
    val s = snap
    val pk = s.orderBy("trans_id").select("trans_id").limit(1)
      .collect()(0).getLong(0)
    // corrupt one row's amount, drop another row, add a phantom row
    val corrupted = s
      .withColumn("amount",
        when(col("trans_id") === pk, col("amount") + 1).otherwise(col("amount")))
    val dropped = s.orderBy(col("trans_id").desc).limit(1)
      .select("trans_id").collect()(0).getLong(0)
    val replica = corrupted.filter(col("trans_id") =!= dropped)
      .unionByName(s.limit(1).withColumn("trans_id", lit(999999L)))
    val rep = Reconcile.reconcile(replica, s, "trans_id", rcols)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val mism = rep.values.map(_._1).sum
    val miss = rep.values.map(_._2).sum
    val extra = rep.values.map(_._3).sum
    assert((mism, miss, extra) == ((1L, 1L, 1L)),
      s"expected exactly one of each fault, got $rep")
    // each fault sits in the bucket of its key
    assert(rep(pk % 4)._1 == 1L, "mismatch not in the corrupted key's bucket")
    assert(rep(dropped % 4)._2 == 1L, "missing not in the dropped key's bucket")
    assert(rep(999999L % 4)._3 == 1L, "extra not in the phantom key's bucket")
  }

  test("reconcile digest is injective over NULL swaps and delimiter-bearing values") {
    // ("a", NULL) vs (NULL, "a") rendered identically under the old
    // '|'-join (concat_ws skips NULLs) and certified a corrupted replica
    // healthy; same for values forging the delimiter ("a|b", NULL) vs
    // ("a", "b"). The per-column md5 rendering must flag BOTH as
    // mismatches.
    val truth = Seq((1L, Option("a"), Option.empty[String]),
        (2L, Option("a|b"), Option.empty[String]))
      .toDF("k", "c1", "c2")
    val replica = Seq((1L, Option.empty[String], Option("a")),
        (2L, Option("a"), Option("b")))
      .toDF("k", "c1", "c2")
    val rep = Reconcile.reconcile(replica, truth, "k", Seq("c1", "c2"),
        buckets = 1)
      .select("n_mismatch").collect()(0).getLong(0)
    assert(rep === 2L, "NULL-swap / delimiter forgery must not digest equal")
  }

  test("heavy hitters: MG candidates ⊇ exact heavy hitters, exact() == model, random streams") {
    val streams = Gen.listOfN(400,
      Gen.frequency((6, Gen.oneOf("a", "b")), (4, Gen.choose(0, 50).map("w" + _))))
    samples(streams, 8).foreach { xs =>
      val k = 10
      val items = spark.createDataset(xs).repartition(3)
      val model = xs.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > xs.size }.toMap
      val cand = HeavyHitters.candidates(items, 2 * k).collect().toSet
      val got = HeavyHitters.exact(items, k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(model.keySet.subsetOf(cand),
        s"MG candidates missed a true heavy hitter: ${model.keySet -- cand}")
      assert(got == model, s"exact() disagreed with model: $got vs $model")
    }
  }

  test("zorder: mask-shift cascade == per-bit reference; locality holds") {
    def refInterleave(x: Int, y: Int): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      }
    val pairs = Seq.tabulate(512)(i => (i * 131 % 65536, i * 739 % 65536))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave16(col("x").cast("long"), col("y").cast("long")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == refInterleave(x, y), s"mismatch at ($x, $y)")
    }
    // locality: points in the same 256×256 tile share their z-key's high
    // bits — the property that makes min/max pruning work on both dims
    val (x0, y0) = (12345, 54321)
    val inTile = ZOrderRef.tilePrefix(refInterleave(x0, y0))
    assert(ZOrderRef.tilePrefix(refInterleave(x0 + 3, y0 + 7)) == inTile)
  }
}

private object ZOrderRef {
  /** High 16 bits of a 32-bit z-key = the (x/256, y/256) tile id. */
  def tilePrefix(z: Long): Long = z >> 16
}
