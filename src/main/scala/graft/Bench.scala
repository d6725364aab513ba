package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Measurement discipline (round-1 findings): the action is a noop-format
  * write — a `.count()` action lets Catalyst delete final sorts and prune
  * projected columns, so TakeOrderedAndProject / decimal math went partly
  * unmeasured. One full warmup pass at sf0.001 first absorbs JVM/codegen
  * JIT so the first timed query isn't 5 s of warmup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq
    names.foreach(exec(_, "/root/testdata/sf0.001")) // warmup: JIT + codegen

    // min of two timed iterations — single-run numbers on a shared 32-way
    // box swing 2-4x per query from scheduler noise
    val r1 = names.map(n => n -> exec(n, sfDir)).toMap
    val r2 = names.map(n => n -> exec(n, sfDir)).toMap
    val results = names.map(n => n -> math.min(r1(n), r2(n)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
