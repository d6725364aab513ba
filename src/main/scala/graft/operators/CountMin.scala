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

  /** Cell coordinate of a key at one depth. */
  def bucketOf(key: Column, depth: Column, width: Int): Column =
    pmod(xxhash64(key, depth), lit(width)).cast("int")

  /** Build the sketch table `(depth, bucket, cnt)` over a key column.
    * Rows fan out × depth map-side, but the partial aggregation reduces
    * every partition to at most depth × width cells before the shuffle. */
  def build(df: DataFrame, keyCol: String,
            depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(col(keyCol).as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("depth"))
      .groupBy(col("depth"), bucketOf(col("__k"), col("depth"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold sketches built with the SAME (depth, width) into one — counts
    * are additive, so merge is a cell-wise sum. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for the keys of `keys(keyCol)`: min over depths of
    * the key's cell count. Keys whose cells are all empty estimate 0
    * (possible only for keys absent from the sketched data). */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    keys.select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("depth"))
      .withColumn("bucket", bucketOf(col(keyCol), col("depth"), width))
      .join(sketch, Seq("depth", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
