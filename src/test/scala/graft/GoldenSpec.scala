package graft

import graft.text.{NearDup, TextOps}
import org.apache.spark.sql.functions._

/** Golden layer (SURVEY §5): checked-in expected outputs for operators
  * whose raw values have no DuckDB oracle (xxhash/Murmur-based sketches,
  * the stub codec, HLL). The queries over these operators are gated via
  * exact-payload + verdict designs (q40/q40b/q47b/q48), which certify the
  * CONTRACT; the goldens here pin the raw VALUES, so a changed hash seed,
  * codec tweak, or estimator swap fails loudly instead of shipping
  * silently. Values generated once at sf0.001 and pinned. */
class GoldenSpec extends SparkTestBase {

  test("simhash16: first 8 sketches match the pinned golden values") {
    val got = Tables.documents(spark, sf)
      .select(col("doc_id"),
        call_function("simhash16", TextOps.tokens(col("text"))).as("sh"))
      .orderBy("doc_id")
      .limit(8).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Seq((0L, 5103L), (1L, 13740L), (2L, 12702L), (3L, 9774L),
      (4L, 13478L), (5L, 12606L), (6L, 13628L), (7L, 12602L))
    assert(got === want)
  }

  test("stub codec: first 5 feature rows match the pinned goldens") {
    val got = graft.multimodal.Multimodal
      .features(spark, Tables.documents(spark, sf)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .orderBy("media_id")
      .limit(5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5))).toSeq
    val want = Seq(
      (0L, "image", 128L, 16, 8, 0.1719),
      (1L, "audio", 441L, 55, 8, 0.1746),
      (2L, "video", 348L, 43, 8, 0.1839),
      (3L, "image", 280L, 35, 8, 0.1714),
      (4L, "audio", 177L, 22, 8, 0.1695))
    assert(got === want)
  }

  test("minhash-LSH pairs: candidate pair count over the raw corpus is stable") {
    val g = Tables.documents(spark, sf)
      .withColumn("w", TextOps.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"))
    assert(NearDup.lshPairs(g, "doc_id", "w",
      k = 16, nBands = 4, threshold = 0.3).count() === 28L)
  }

  test("q11b_approx_distinct: estimator output is stable (and here exact)") {
    assert(SparkEntry.queries("q11b_approx_distinct")(spark, sf)
      .head().getLong(0) === 150L)
  }
}
