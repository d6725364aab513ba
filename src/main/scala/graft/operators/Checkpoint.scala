package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation strategy for the iterative operators (PageRank,
  * Reachability, ConnectedComponents). Every iterative Spark job must
  * cut its lineage per round — an unbroken k-round plan is a k-deep
  * self-join tree Catalyst re-analyzes and task retry re-executes from
  * the source — but WHERE the cut materializes is a deployment choice:
  *
  *   - [[Checkpoint.Local]] (default): `localCheckpoint` into executor
  *     block storage. Fast (no DFS round-trip) and right for local mode
  *     and short-lived jobs, but blocks die with their executor — a lost
  *     executor mid-loop fails the job instead of recomputing.
  *   - [[Checkpoint.Reliable]]: `checkpoint` into a cluster-visible
  *     directory (HDFS/S3). The 100 TB setting: thousand-executor runs
  *     lose executors as a matter of course, and an hours-long iterative
  *     job must survive them; the per-round DFS write is the insurance
  *     premium.
  *
  * Same call sites either way — operators take a strategy parameter and
  * route every per-round materialization through [[Checkpoint.apply]]. */
object Checkpoint {

  sealed trait Strategy

  /** Executor-local blocks — fast, non-fault-tolerant (local mode). */
  case object Local extends Strategy

  /** Reliable checkpoint under `dir` (must be cluster-visible storage on
    * a real deployment). The dir is registered once per (session, dir). */
  final case class Reliable(dir: String) extends Strategy

  private val configured =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Materialize `df` and truncate its lineage per `strategy`. */
  def apply(df: DataFrame, strategy: Strategy): DataFrame = strategy match {
    case Local => df.localCheckpoint()
    case Reliable(dir) =>
      val sc = df.sparkSession.sparkContext
      if (configured.add((sc.applicationId, dir))) sc.setCheckpointDir(dir)
      df.checkpoint()
  }
}
