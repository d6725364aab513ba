package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Increment-vs-rebuild pricing for the q157 item-item cosine family —
  * the second quadratic-ANSWER composite the century smoke pays
  * wholesale (q212 measures its q127 pair-build leg at ~22 s per run at
  * 100×). The production story: the (pa, pb, cab) co-occurrence
  * relation and the (pk, c) item counts are both ADDITIVE over
  * append-only baskets (an order arrives whole, so a batch's pairs are
  * complete within the batch) — maintain them as a persisted index and
  * fold each ingest batch with one union + group-sum, cost
  * |state| + |batch pairs|, never a re-join of all baskets. The support
  * floor (cab ≥ 2) applies at SERVE time, not in state — filtering
  * state would lose pairs that cross the threshold in a later batch.
  *
  * On a GenScaledData-replicated dir the top id stripe plays the ingest
  * batch (~1/copies of the corpus). The tool asserts TOP-20 PARITY —
  * the cosine ranking served from the folded state must equal the
  * one-shot rebuild's — before either time is worth reporting.
  *
  * Usage: runMain graft.tools.IncrementalCosine [scaledDir] */
object IncrementalCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val OFF = 1000000000000L
    val basket = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().localCheckpoint()
    val topStripe = basket.agg(max(expr(s"ok div $OFF"))).first().getLong(0)
    val cut = topStripe * OFF
    val base = basket.filter(col("ok") < cut).localCheckpoint()
    val inc = basket.filter(col("ok") >= cut).localCheckpoint()
    println(s"[inccos] base=${base.count()} inc=${inc.count()} basket rows")

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def pairs(b: DataFrame): DataFrame = b
      .select(col("ok"), col("pk").as("pa"))
      .join(b.select(col("ok").as("ok2"), col("pk").as("pb")),
        col("ok") === col("ok2") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("cab"))
    def items(b: DataFrame): DataFrame =
      b.groupBy("pk").agg(count(lit(1)).as("c"))

    def top20(pair: DataFrame, item: DataFrame): Seq[(Long, Long, Long, Long)] =
      pair.filter(col("cab") >= 2)
        .join(item.select(col("pk").as("pa"), col("c").as("ca")), "pa")
        .join(item.select(col("pk").as("pb"), col("c").as("cb")), "pb")
        .select(col("pa"), col("pb"), col("cab"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * cab * cab) div (ca * cb)")
            .as("cos2_ppm"))
        .orderBy(col("cos2_ppm").desc, col("pa"), col("pb")).limit(20)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // one-shot rebuild over everything delivered
    val (full, tRebuild) = secs(top20(pairs(basket), items(basket)))
    println(f"[inccos] rebuild: $tRebuild%.1f s")

    // untimed index build over base — the state a production pipeline
    // already holds when the batch arrives. Deleted on exit: the pair
    // index is GBs at 100× and this box's disk headroom is what the
    // 100× smokes live on.
    val root = java.nio.file.Files
      .createTempDirectory("inccos_state").toString
    try {
    pairs(base).write.parquet(s"$root/pairs_v0")
    items(base).write.parquet(s"$root/items_v0")

    // First measured shape (kept for the record): fold + FULL state
    // rewrite + serve. Measured 97.2 s vs the 106.2 s rebuild at 100× —
    // barely 1.1×, because rewriting a monolithic aggregated state is
    // O(state) no matter how small the batch. The lesson is the same one
    // BucketedState encodes: the fold is cheap, the layout decides.
    //
    // Production shape (measured below): LSM-style DELTA APPEND. Ingest
    // writes only the batch's pair/item deltas (O(batch)); the serve-time
    // ranking group-sums base ∪ deltas (O(state) read, no basket
    // self-join, no state rewrite); periodic compaction folds deltas back
    // (amortized, = the v0 build). Per-batch cost is the ingest leg
    // alone; the serve leg prices a ranking REFRESH, which amortizes
    // across however many batches land between refreshes.
    val (_, tIngest) = secs {
      pairs(inc).write.parquet(s"$root/pairs_d1")
      items(inc).write.parquet(s"$root/items_d1")
    }
    println(f"[inccos] ingest (delta append): $tIngest%.1f s")

    val (incTop, tServe) = secs {
      val mp = spark.read.parquet(s"$root/pairs_v0")
        .unionByName(spark.read.parquet(s"$root/pairs_d1"))
        .groupBy("pa", "pb").agg(sum(col("cab")).as("cab"))
      val mi = spark.read.parquet(s"$root/items_v0")
        .unionByName(spark.read.parquet(s"$root/items_d1"))
        .groupBy("pk").agg(sum(col("c")).as("c"))
      top20(mp, mi)
    }
    println(f"[inccos] serve (ranking refresh from state+delta): $tServe%.1f s")
    require(incTop == full,
      "parity violated: incremental top-20 != rebuild top-20")
    println(f"[inccos] parity OK; rebuild/ingest = ${tRebuild / tIngest}%.1f x, " +
      f"rebuild/serve = ${tRebuild / tServe}%.1f x")
    } finally {
      // best-effort: close the walk stream (it holds directory handles)
      // and never let a cleanup failure mask the real error above or
      // prevent spark.stop()
      try scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(root))) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[inccos] cleanup of $root failed: $e")
      }
    }
    spark.stop()
  }
}
