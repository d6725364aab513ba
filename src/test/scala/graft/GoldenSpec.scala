package graft

/** Golden layer (SURVEY §5): checked-in expected outputs for the non-gated
  * queries (no DuckDB oracle exists for xxhash/Murmur-based sketches, the
  * stub codec, or HLL). Any semantic drift in these operators — a changed
  * hash seed, a codec tweak, a different estimator — fails here instead of
  * shipping silently. Values generated once at sf0.001 and pinned. */
class GoldenSpec extends SparkTestBase {

  test("q40b_simhash: first 8 sketches match the pinned golden values") {
    val got = SparkEntry.queries("q40b_simhash")(spark, sf)
      .limit(8).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Seq((0L, 5103L), (1L, 13740L), (2L, 12702L), (3L, 9774L),
      (4L, 13478L), (5L, 12606L), (6L, 13628L), (7L, 12602L))
    assert(got === want)
  }

  test("q47b_multimodal_decode: first 5 feature rows match the pinned goldens") {
    val got = SparkEntry.queries("q47b_multimodal_decode")(spark, sf)
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

  test("q40_minhash_lsh: candidate pair count is stable") {
    assert(SparkEntry.queries("q40_minhash_lsh")(spark, sf).count() === 28L)
  }

  test("q11b_approx_distinct: estimator output is stable (and here exact)") {
    assert(SparkEntry.queries("q11b_approx_distinct")(spark, sf)
      .head().getLong(0) === 150L)
  }
}
