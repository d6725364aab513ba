package graft

import graft.operators.CompactionPlan
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Invariants of the small-file compaction planner (q213's operator):
  * offset-based bucketing must be a bijection on the inventory, produce
  * per-table key-contiguous buckets, and bound every bucket's overshoot
  * by a single file — the properties a rewrite job scheduler relies on. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(4747L + i)))

  /** (table, key, bytes) inventories: 3 tables × 40 files with sizes
    * spanning tiny-to-oversized (max 9000 > 2×target, so some single
    * files cross a whole bucket width and bucket ids legitimately skip —
    * the generator must actually cover the case the bound claims). */
  private val inventory: Seq[(String, Long, Long)] = {
    val sizes = samples(Gen.chooseNum(1L, 9000L), 120)
    for (t <- 0 until 3; k <- 0 until 40) yield
      (s"tab$t", k.toLong, sizes(t * 40 + k))
  }
  private val target = 4096L

  private def assigned =
    CompactionPlan.assign(
      inventory.toDF("table", "key", "bytes"), "table", "key", "bytes",
      target)

  test("compaction assign is a bijection on the inventory") {
    val a = assigned
    assert(a.count() === inventory.size)
    val back = a.select("table", "key", "bytes")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(back === inventory.sorted)
  }

  test("buckets are key-contiguous and ordered within each table") {
    // max_key of bucket k must precede min_key of the next bucket —
    // rewrites preserve zone-map pruning only if jobs cover disjoint key
    // ranges (strict < here: this inventory's keys are unique). Ids
    // start at 0 (first start_off is 0) and ascend; an oversized file
    // may skip ids (floor(start/target) jumps a whole bucket width), so
    // density is NOT asserted — only monotonicity.
    val ranges = assigned.groupBy("table", "bucket")
      .agg(min("key").as("lo"), max("key").as("hi"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).values
    ranges.foreach { tbl =>
      val byBucket = tbl.sortBy(_._2)
      assert(byBucket.head._2 === 0L, "first bucket id must be 0")
      byBucket.sliding(2).foreach {
        case Array((_, b1, _, hi), (_, b2, lo, _)) =>
          assert(b1 < b2 && hi < lo)
        case _ => ()
      }
    }
  }

  test("tied partition keys: fileId tiebreak makes assignment deterministic; ranges stay non-interleaved") {
    // many files per (table, key) — the streaming-ingest shape the class
    // doc motivates; fileId is the unique path stand-in
    val tied = for (k <- 0L until 6L; f <- 0L until 5L)
      yield ("t", k, k * 5 + f, 1500L + f * 700L)
    def run() = CompactionPlan.assign(
      tied.toDF("table", "key", "fileId", "bytes"),
      "table", "key", "bytes", target, fileIdCol = "fileId")
      .select("fileId", "bucket").as[(Long, Long)].collect().sorted.toSeq
    assert(run() === run(), "same inventory must assign identically")
    // a key's files may straddle a boundary, but ranges never interleave
    val ranges = CompactionPlan.plan(
      tied.toDF("table", "key", "fileId", "bytes"),
      "table", "key", "bytes", target, fileIdCol = "fileId")
      .select("bucket", "min_key", "max_key")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _ => ()
    }
  }

  test("bucket bytes overshoot the target by less than one file") {
    val bad = assigned.groupBy("table", "bucket")
      .agg(sum("bytes").as("total"), max("bytes").as("biggest"))
      .filter(col("total") >= lit(target) + col("biggest"))
    assert(bad.count() === 0)
  }

  test("plan() equals assign() aggregated") {
    val p = CompactionPlan.plan(
      inventory.toDF("table", "key", "bytes"), "table", "key", "bytes",
      target)
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val expect = assigned.groupBy("table", "bucket")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bucket_bytes"),
        min("key").as("min_key"), max("key").as("max_key"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(p === expect)
  }
}
