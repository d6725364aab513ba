package graft.tools

import graft.Tables
import graft.operators.Hll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the worst per-language relative error of the q115 HLL
  * estimate (sharded build → merge → estimate, the gate's exact path)
  * against exact distinct counts — the measurement behind the gate's
  * pinned 0.10 bound. Usage: runMain graft.tools.HllErr <sfDir> */
object HllErr {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val shard = pmod(abs(hash(col("doc_id"))), lit(2))
    val est = Hll.estimateDistinct(Hll.merge(
      Hll.build(docs.filter(shard === 0), "lang", "doc_id"),
      Hll.build(docs.filter(shard === 1), "lang", "doc_id")))
    val rows = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("d_exact"))
      .join(est, col("lang") <=> col("grp"), "left")
      .select(col("lang"), col("d_exact"),
        coalesce(col("est"), lit(0.0)).as("est"))
      .collect()
    rows.sortBy(_.getString(0)).foreach { r =>
      val d = r.getLong(1).toDouble
      val e = r.getDouble(2)
      val rel = if (d == 0) math.abs(e) else math.abs(e - d) / d
      println(f"[hllerr] ${r.getString(0)}%-6s exact=${d}%.0f est=$e%.1f rel=${rel * 100}%.2f%%")
    }
    val worst = rows.map { r =>
      val d = r.getLong(1).toDouble; val e = r.getDouble(2)
      if (d == 0) math.abs(e) else math.abs(e - d) / d
    }.max
    println(f"[hllerr] WORST $sfDir: ${worst * 100}%.2f%%")
    spark.stop()
  }
}
