package graft.tools

import graft.Tables
import graft.streaming.{BucketedState, JoinViewMaintenance}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-trigger pricing of the bucketed join-view state
  * (JoinViewMaintenance over BucketedState): seed a large L⋈R state from
  * orders⋈customer, then fold a SINGLE-FACT batch and report what the
  * trigger actually wrote — dirty bucket directories and bytes vs the
  * whole state — alongside wall time. The point being measured: the
  * merge's write amplification is O(dirty buckets), not O(state).
  *
  * Usage: runMain graft.tools.JoinViewScale [sfDir] */
object JoinViewScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_jv_scale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val l0 = Tables.orders(spark, sfDir).select(
      col("o_orderkey").cast("string").as("pk"),
      col("o_custkey").cast("string").as("fk"),
      col("o_totalprice").cast("string").as("payload"),
      lit("upsert").as("op"))
    val r0 = Tables.customer(spark, sfDir).select(
      col("c_custkey").cast("string").as("pk"),
      col("c_mktsegment").as("payload"), lit("upsert").as("op"))
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tSeed = secs(JoinViewMaintenance.update(dir, l0, r0, 0L))

    // steady-state trigger: one fact upsert. Deterministic pick — the
    // batch frame is re-evaluated by several independent jobs inside
    // update() (dirty-set collect, lww anti-join, commit write), and an
    // unordered limit(1) could resolve to a DIFFERENT row per job,
    // writing bucket(B) while marking bucket(A) dirty
    val minPk = l0.agg(min(col("pk")).as("m")).first().getString(0)
    val one = l0.filter(col("pk") === minPk)
      .withColumn("payload", lit("updated"))
    val tOne = secs(JoinViewMaintenance.update(dir, one,
      r0.limit(0), 1L))

    def du(p: String): Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(sz).sum)
        else f.length()
      sz(new java.io.File(p))
    }
    val seedBytes = du(s"$dir/v=0")
    val trigBytes = du(s"$dir/v=1")
    val dirty = BucketedState.bucketDirs(spark, dir, 1L)
    println(f"""{"seed_s":$tSeed%.1f,"trigger_s":$tOne%.1f,"seed_bytes":$seedBytes,"trigger_bytes":$trigBytes,"dirty_buckets":${dirty.size},"total_buckets":${JoinViewMaintenance.NumBuckets},"facts":${l0.count()},"dims":${r0.count()}}""")
    spark.stop()
  }
}
