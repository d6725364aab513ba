package graft.tools

import graft.Tables
import graft.functions.{Ivf, Pq}
import graft.text.{NearDup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B diagnostics for the optimization rounds — NOT part of
  * the engine. r19 edition: interleaves the r18 HOF formulations and
  * the r19 native expressions in ONE session (shared-box load lands on
  * both symmetrically), min over `iters` alternating pairs:
  *   (a) MinHash signature build — k interpreted passes vs minhash_sig
  *   (b) PQ corpus encode — nested HOF codesExpr vs pq_encode
  *   (c) SimJoin set materialization — trigram strings + xxhash64 vs
  *       shingle_fps straight off the tokens
  * Usage: runMain graft.tools.Scratch [sfDir] [iters] */
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ab(tag: String, oldF: => Unit, newF: => Unit): Unit = {
      val pairs = (1 to iters).map(_ => (time(oldF), time(newF)))
      println(f"[scratch] $tag old_min=${pairs.map(_._1).min}%.3f " +
        f"new_min=${pairs.map(_._2).min}%.3f " +
        s"old=${pairs.map(p => f"${p._1}%.3f").mkString(",")} " +
        s"new=${pairs.map(p => f"${p._2}%.3f").mkString(",")}")
    }

    val docs = Tables.documents(spark, d)
      .withColumn("w", TextOps.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id").as("id"), col("w"))
      .localCheckpoint()

    // (a) signature build: shingle hashes + k-slot minhash + banding
    def sigRel(hof: Boolean): DataFrame = {
      val sh = NearDup.shingleHashes(col("w"))
      val sig = if (hof) NearDup.minhashSignatureHof(col("sh"), 16)
                else NearDup.minhashSignature(col("sh"), 16)
      docs.select(col("id"), sh.as("sh")).withColumn("sig", sig)
        .withColumn("band", explode(NearDup.bands(col("sig"), 16, 4)))
        .select(col("id"), col("band.band_hash"))
    }
    ab("minhash_sig", noop(sigRel(hof = true)), noop(sigRel(hof = false)))

    // (b) PQ corpus encode
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), Ivf.unit(col("embedding")).as("vu"))
      .localCheckpoint()
    val cb = Pq.train(emb, "vec_id", "vu", m = 8, ksub = 16, iters = 2,
      unit = false)
    ab("pq_encode",
      noop(emb.select(col("vec_id"), Pq.codesExprHof(col("vu"), cb).as("c"))),
      noop(emb.select(col("vec_id"), Pq.codesExpr(col("vu"), cb).as("c"))))

    // (d) PageRank iteration body: plan shape + cost of one iteration
    if (sys.env.get("SCRATCH_PR").contains("1")) {
      val pairs = Tables.lineitem(spark, d)
        .select(col("l_partkey").cast("long").as("pk"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct().localCheckpoint()
      val edges = pairs.select(explode(array(
          struct((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst")),
          struct((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
        .localCheckpoint()
      val e1 = edges.repartition(col("src")).join(deg, "src").persist()
      e1.count()
      val ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
        .localCheckpoint()
      def iter(e: DataFrame): DataFrame = e
        .join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(expr("(17 * sum(r div d)) div 20").as("damped"))
      println("[scratch] PR iteration plan:")
      println(iter(e1).queryExecution.executedPlan.toString.take(3000))
      ab("pr_iter", noop(iter(e1)), noop(iter(e1)))
      e1.unpersist()
    }

    // (c) SimJoin set materialization (the matOf stage)
    ab("simjoin_mat",
      noop(docs.select(col("id"),
        expr("sort_array(array_distinct(transform(" +
          "array_distinct(transform(sequence(1, size(w) - 2), i -> " +
          "concat_ws(' ', element_at(w, i), element_at(w, i + 1), " +
          "element_at(w, i + 2)))), x -> xxhash64(x))))").as("fps"))),
      noop(docs.select(col("id"), expr("shingle_fps(w)").as("fps"))))

    spark.stop()
  }
}
