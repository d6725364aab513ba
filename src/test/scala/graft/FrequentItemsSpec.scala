package graft

import graft.operators.MgSummary
import graft.streaming.FrequentItemsMaintenance
import org.apache.spark.sql.functions._

/** Mergeable Misra-Gries summary + streaming maintenance
  * (operators/MgSummary.scala, streaming/FrequentItemsMaintenance.scala):
  * the PODS'12 mergeability guarantee on random streams, bounded state,
  * exact totals, and the versioned-commit retry contract. */
class FrequentItemsSpec extends SparkTestBase {

  import spark.implicits._

  private val k = 8

  /** Zipf-ish random stream over two groups; returns (grp, item) rows. */
  private def stream(seed: Int, n: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val g = if (rnd.nextBoolean()) "g1" else "g2"
      // skewed: item id = floor of a power-law-ish draw -> few hot items
      val item = s"i${(math.pow(rnd.nextDouble(), 3) * 30).toInt}"
      (g, item)
    }
  }

  private def trueCounts(rows: Seq[(String, String)]): Map[(String, String), Long] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("mg: guarantee holds after a 5-way merge fold — no heavy item lost, undercount bounded") {
    val rows = stream(47, 4000)
    val batches = rows.grouped(800).toSeq
    var state = MgSummary.build(batches.head.toDF("grp", "item"), "grp", "item", k)
    batches.tail.foreach { b =>
      state = MgSummary.merge(state, MgSummary.build(b.toDF("grp", "item"), "grp", "item", k), k)
        .localCheckpoint()
    }
    val cand = MgSummary.candidates(state).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val truth = trueCounts(rows)
    val nPerGrp = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // totals exact despite compression (sentinels add outside MG)
    cand.values.map(_._2).toSet.foreach((n: Long) => assert(nPerGrp.values.toSet.contains(n)))
    truth.foreach { case ((g, i), c) =>
      val bound = nPerGrp(g) / (k + 1)
      if (c > bound)
        assert(cand.contains((g, i)), s"heavy item ($g,$i) c=$c > $bound lost")
      cand.get((g, i)).foreach { case (est, _) =>
        assert(est <= c && c - est <= bound, s"($g,$i): est=$est true=$c bound=$bound")
      }
    }
  }

  test("mg: state stays <= k+1 rows per group forever") {
    val batches = stream(11, 6000).grouped(600).toSeq
    var state = MgSummary.build(batches.head.toDF("grp", "item"), "grp", "item", k)
    batches.tail.foreach { b =>
      state = MgSummary.merge(state, MgSummary.build(b.toDF("grp", "item"), "grp", "item", k), k)
        .localCheckpoint()
      val perGrp = state.groupBy("grp").count().collect().map(_.getLong(1))
      assert(perGrp.forall(_ <= k + 1), s"state grew past k+1: ${perGrp.mkString(",")}")
    }
  }

  test("quantile maintenance: incremental folds == one-shot build over everything delivered") {
    import graft.streaming.QuantileMaintenance
    import graft.operators.QuantileSample
    val rnd = new scala.util.Random(3)
    val rows = (0 until 3000).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, rnd.nextDouble() * 100))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-test-qm-${System.nanoTime()}"
    rows.grouped(1000).zipWithIndex.foreach { case (b, id) =>
      QuantileMaintenance.update(dir, b.toDF("grp", "key", "v"), id.toLong,
        "grp", "key", "v", k = 64)
    }
    val qs = Seq(0.5, 0.95)
    val streamed = QuantileMaintenance.estimates(spark, dir, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val oneShot = QuantileSample.estimateQuantiles(
        QuantileSample.build(rows.toDF("grp", "key", "v"), "grp", "key", "v", 64), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(streamed === oneShot) // the semilattice makes this EXACT equality
    // retried final batch changes nothing
    QuantileMaintenance.update(dir, rows.grouped(1000).toSeq.last.toDF("grp", "key", "v"),
      2L, "grp", "key", "v", k = 64)
    val after = QuantileMaintenance.estimates(spark, dir, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(after === streamed)
  }

  test("maintenance: versioned fold through disk; retried batch is a no-op") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-test-mg-${System.nanoTime()}"
    val batches = stream(7, 3000).grouped(1000).toSeq
    batches.zipWithIndex.foreach { case (b, id) =>
      FrequentItemsMaintenance.update(dir, b.toDF("grp", "item"), id.toLong, "grp", "item", k)
    }
    val before = FrequentItemsMaintenance.candidates(spark, dir)
      .orderBy("grp", "item").collect().toSeq
    // redeliver the final batch (at-least-once execution) — must short-circuit
    FrequentItemsMaintenance.update(dir, batches.last.toDF("grp", "item"),
      (batches.size - 1).toLong, "grp", "item", k)
    val after = FrequentItemsMaintenance.candidates(spark, dir)
      .orderBy("grp", "item").collect().toSeq
    assert(after === before)
    // and the totals match the rows actually delivered
    val n = FrequentItemsMaintenance.snapshot(spark, dir)
      .filter(col("item").isNull).agg(sum("c")).first().getLong(0)
    assert(n === 3000L)
  }
}
