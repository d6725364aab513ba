package graft.tools

import graft.Tables
import graft.functions.{Ivf, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B diagnostics for the optimization round — NOT part of
  * the engine. Interleaves the old (crossJoin + argmax agg) and new
  * (map-only cellExpr) IVF assignment shapes in ONE session so shared-
  * box load lands on both symmetrically. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val corpus = Tables.embeddings(spark, d).localCheckpoint()
    val centroids = Ivf.train(corpus, "vec_id", "embedding", 16, iters = 2)

    def oldAssign(df: DataFrame, idCol: String, vuCol: String,
                  keep: Seq[String]): DataFrame = {
      val cdf = broadcast(centroids.zipWithIndex
        .map { case (c, i) => (i, c) }.toDF("__cell", "__cvec"))
      val aggKeep = keep.filterNot(k => k == idCol || k == vuCol)
      val aggs = max(struct(col("__dot"), (-col("__cell")).as("__neg"),
        col("__cell").as("__c"))).as("__m") +:
        aggKeep.map(k => first(col(k)).as(k))
      df.crossJoin(cdf)
        .withColumn("__dot", call_function("vec_dot", col(vuCol), col("__cvec")))
        .groupBy(col(idCol), col(vuCol))
        .agg(aggs.head, aggs.tail: _*)
        .select(col(idCol) +: col("__m.__c").as("cell") +: keep.map(col): _*)
    }

    def prep = corpus.select(col("vec_id").as("nn_id"),
      col("embedding").as("cv"),
      VectorOps.l2(col("embedding")).as("cn"),
      Ivf.unit(col("embedding")).as("vu"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both
    oldAssign(prep, "nn_id", "vu", Seq("cv", "cn"))
      .write.format("noop").mode("overwrite").save()
    Ivf.assignCells(prep, "nn_id", "vu", centroids, Seq("cv", "cn"))
      .write.format("noop").mode("overwrite").save()
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to iters).foreach { _ =>
      olds += time(oldAssign(prep, "nn_id", "vu", Seq("cv", "cn"))
        .write.format("noop").mode("overwrite").save())
      news += time(Ivf.assignCells(prep, "nn_id", "vu", centroids,
          Seq("cv", "cn"))
        .write.format("noop").mode("overwrite").save())
    }
    def f(x: Double) = "%.3f".format(x)
    println(s"[ab] old: min=${f(olds.min)} all=${olds.map(f).mkString(",")}")
    println(s"[ab] new: min=${f(news.min)} all=${news.map(f).mkString(",")}")
    spark.stop()
  }
}
