package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Measurement discipline (round-1 findings): the action is a noop-format
  * write — a `.count()` action lets Catalyst delete final sorts and prune
  * projected columns, so TakeOrderedAndProject / decimal math went partly
  * unmeasured. One full warmup pass at sf0.001 first absorbs JVM/codegen
  * JIT so the first timed query isn't 5 s of warmup.
  *
  * Output-size discipline (round-2 finding): the driver keeps only the
  * last ~2000 chars of stdout; a per-query map over all 77 queries is
  * ~2.3 KB, so the JSON line's opening brace fell outside the window and
  * BENCH_r01/r02 recorded `parsed: null`. The line now carries the 40
  * slowest queries at 3-decimal precision (~1.2 KB) — the full set is
  * still timed and summed into `value`. Failures are excluded from the
  * total (a -1 sentinel must not *improve* the headline number) and
  * reported in an explicit `errors` list instead. */
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

    /** Seconds, or -1.0 on failure. */
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
    val results = names.map { n =>
      val (a, b) = (r1(n), r2(n))
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val (failed, ok) = results.partition(_._2 < 0)
    val total = ok.map(_._2).sum
    val headline = ok.sortBy(-_._2).take(40)
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = headline.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _._1 + "\"").mkString("[", ",", "]")

    // Streaming replay throughput (reference comparison point: offered
    // load 0.33 rec/s with 5-10 min visibility, reference README.md:451).
    // Full fixture through parse→dedup→dual-sink under AvailableNow; -1
    // on failure so a broken stream can't silently vanish from the line.
    val streamRecPerSec: Double = try {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val src = Files.createTempDirectory("bench_cdc_src").toString
      val out = Files.createTempDirectory("bench_cdc_out").toString
      Files.copy(Paths.get(Tables.cdcFixturePath),
        Paths.get(s"$src/cdc.jsonl"), StandardCopyOption.REPLACE_EXISTING)
      val sinks = graft.streaming.CdcStreamPipeline.Sinks(
        s"$out/serving", s"$out/archive", s"$out/error", s"$out/checkpoint")
      val nRec = 613.0
      val t0 = System.nanoTime()
      val (main, dlq) = graft.streaming.CdcStreamPipeline.start(
        spark.readStream.text(src), sinks,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      main.awaitTermination(300000); dlq.awaitTermination(300000)
      nRec / ((System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => -1.0 }

    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","n_queries":${ok.size},"streaming_rec_per_sec":${f(streamRecPerSec)},"errors":$errs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
