package graft.tools

import graft.streaming.{BucketedState, DupClusterMaintenance, StatsMaintenance}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Per-trigger pricing of the PRUNED diff-tenant fold vs the full one
  * (the round-11 foldCommitPruned work): seed a value-count state of
  * growing size, then fold a FIXED single-key batch through both paths
  * and report wall time. What the numbers must show: the full fold's
  * per-trigger time grows with the state (it reads and re-folds every
  * bucket), while the pruned fold's stays at the fixed trigger floor +
  * ONE bucket's read (state/p rows) — at a production fan-out sized to
  * keep bucket size bounded, that is O(batch), flat in corpus size.
  *
  * Round 12 adds the DUP-CLUSTER leg: the one tenant whose fold is not
  * key-local keeps an O(state) term — phase 2's row-pruned scan of the
  * whole label relation's two projected columns
  * (DupClusterMaintenance.scala trade-off note). A fixed one-edge batch
  * against a growing singleton-cluster label state prices exactly that
  * term's slope, deciding whether a cluster-keyed secondary index (and
  * its double write amplification on every relabel) is worth building.
  *
  * Usage: runMain graft.tools.PrunedFoldScale [sizes-csv]
  * Prints one JSON line per state size. */
object PrunedFoldScale {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(250000L, 1000000L, 4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(
      StructField("v", LongType), StructField("cnt", LongType),
      StructField(BucketedState.BucketCol, IntegerType)))
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_pf_scale_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      // seed: n distinct value keys, one count each — the same state for
      // both paths (seeded once per size through the pruned tenant API)
      val seed = spark.range(n).select(col("id").as("v"))
      StatsMaintenance.update(s"$root/a", seed, 0L)
      StatsMaintenance.update(s"$root/b", seed, 0L)
      // steady-state trigger: ONE existing key bumps its count. min-of-2
      // per path — single runs on a shared box swing from scheduler noise
      val one = spark.range(1).select(lit(42L).as("v"))
      def prunedOnce(id: Long) = secs(StatsMaintenance.update(s"$root/a", one, id))
      def fullOnce(id: Long) = secs(
        BucketedState.foldCommit(spark, s"$root/b", id,
          StatsMaintenance.NumBuckets, schema, "v", "stats",
          growOnly = true) { prev =>
          prev.unionByName(one.groupBy("v").agg(count(lit(1)).as("cnt")))
            .groupBy("v").agg(sum(col("cnt")).as("cnt"))
        })
      val tPruned = math.min(prunedOnce(1L), prunedOnce(2L))
      val tFull = math.min(fullOnce(1L), fullOnce(2L))

      // dup-cluster leg: n singleton labels (id → itself, a legal state:
      // labels are edges to representatives), seeded directly through the
      // shared commit, then a one-edge trigger bridging two singletons —
      // anchors and the dirty write stay O(1) buckets; what grows with n
      // is ONLY phase 2's two-column row-pruned scan. Distinct edges per
      // trigger id (a repeated edge's second fold diffs to empty and
      // skips the write, which would flatter the number).
      val labelSeed = spark.range(n)
        .select(col("id"), col("id").as("cluster"))
        .withColumn(BucketedState.BucketCol,
          BucketedState.bucketOf(col("id"), DupClusterMaintenance.NumBuckets))
      BucketedState.commit(labelSeed, s"$root/dup", 0L,
        DupClusterMaintenance.NumBuckets,
        (0 until DupClusterMaintenance.NumBuckets).toSet, Map.empty)
      def dupOnce(id: Long) = {
        val edge = spark.range(1)
          .select(lit(2 * id).as("a"), lit(2 * id + 1).as("b"))
        secs(DupClusterMaintenance.update(s"$root/dup", edge, id): Unit)
      }
      val tDup = math.min(dupOnce(1L), dupOnce(2L))
      println(f"""{"n_state":$n,"pruned_trigger_s":$tPruned%.2f,"full_trigger_s":$tFull%.2f,"dup_trigger_s":$tDup%.2f,"buckets":${StatsMaintenance.NumBuckets}}""")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    spark.stop()
  }
}
