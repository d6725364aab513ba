package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a RELATION — the mergeable frequency sketch that
  * completes the approximate family next to HLL (distinct counts, q11b)
  * and Misra-Gries (top-k items, q98). The sketch is a `(depth, bucket,
  * cnt)` table of depth × width cells; a point estimate for key x is
  * `min over d of cnt(d, h_d(x))` — an overestimate by construction
  * (collisions only ever ADD), within N/width per row in expectation.
  *
  * Why a relation and not a UDAF buffer: every sketch property becomes a
  * plan property.
  *   - BUILD is one aggregation whose map-side combine collapses each
  *     partition to ≤ depth × width rows before the single shuffle — the
  *     exchange carries sketch cells, not data rows, at any corpus size;
  *   - MERGE is `unionAll + sum` over cells (counts are additive), so
  *     per-day / per-shard / streaming-incremental sketches fold with a
  *     trivial aggregation — the same additivity the reference's rollup
  *     maintenance exploits;
  *   - ESTIMATE joins the probe keys' depth × 1 cells against the sketch
  *     (broadcast-sized: the sketch is ≤ depth × width rows regardless
  *     of data), so probing never rescans the corpus.
  *
  * Hashing is Spark-native xxhash64 seeded by the depth column — fixed
  * and session-independent, so estimates are deterministic for a given
  * dataset and (depth, width). */
object CountMin {

  /** Cell coordinate of a key at one depth. The key hashes as a STRING
    * (cast on both build and probe sides), so a probe with a differently
    * typed key column — xxhash64 is type-sensitive — still lands on the
    * build's cells. */
  def bucketOf(key: Column, depth: Column, width: Int): Column =
    pmod(xxhash64(key.cast("string"), depth), lit(width)).cast("int")

  /** Build the sketch table `(depth, bucket, cnt, width)` over a key
    * column. Rows fan out × depth map-side, but the partial aggregation
    * reduces every partition to at most depth × width cells before the
    * shuffle. The sketch carries its own `width` column (constant, ≤
    * depth × width rows total) so probes and merges can never silently
    * use mismatched parameters — the maskedCounts-window lesson. */
  def build(df: DataFrame, keyCol: String,
            depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(col(keyCol).as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("depth"))
      .groupBy(col("depth"), bucketOf(col("__k"), col("depth"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("width", lit(width))

  /** (depth, width) recovered from a sketch relation — O(cells) driver
    * work; rejects a relation mixing sketches of different widths. */
  private def params(sketch: DataFrame): (Int, Int) = {
    val r = sketch.agg(max(col("depth")).as("d"),
      max(col("width")).as("w"),
      countDistinct(col("width")).as("nw")).collect().head
    require(r.getLong(2) == 1L,
      s"sketch mixes ${r.getLong(2)} different widths — merge only " +
        "sketches built with the same (depth, width)")
    (r.getInt(0) + 1, r.getInt(1))
  }

  /** Fold sketches built with the SAME (depth, width) into one — counts
    * are additive, so merge is a cell-wise sum. Mismatched widths fail
    * loudly instead of folding into garbage cells; an all-empty union
    * (every shard had zero rows) merges to the empty sketch. The union
    * is checkpointed so the width check and the cell sum execute each
    * input's build aggregation ONCE (the Kmv.merge rule). */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionAll _).localCheckpoint()
    if (all.isEmpty) return all
    params(all) // loud width-mismatch check
    all.groupBy("depth", "bucket", "width").agg(sum("cnt").as("cnt"))
      .select("depth", "bucket", "cnt", "width")
  }

  /** Point estimates for the keys of `keys(keyCol)`: min over depths of
    * the key's cell count. Keys whose cells are all empty estimate 0
    * (possible only for keys absent from the sketched data). The probe
    * derives (depth, width) FROM the sketch — there is no parameter to
    * get wrong. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val (depth, width) = params(sketch)
    keys.select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("depth"))
      .withColumn("bucket", bucketOf(col(keyCol), col("depth"), width))
      .join(sketch.select("depth", "bucket", "cnt"),
        Seq("depth", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
