package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández/Stolfo '95) — the THIRD
  * candidate-generation family in the dedup/ER toolbox beside hash
  * buckets (LSH, q40) and prefix tokens (SimJoin, q123): sort every
  * record by a blocking key, slide a window of w positions, and only
  * pairs inside a window become candidates. The family of choice when
  * near-duplicates agree on a sortable PREFIX (names, addresses, text
  * openings) rather than on set overlap.
  *
  * The global sequence is built the scale-honest way — an empty
  * `Window.partitionBy()` global row_number would drag the whole
  * relation through ONE task. Instead: range-partition by the key
  * (cluster-wide sort, Spark's own TakeOrdered/sort machinery),
  * row_number WITHIN each partition, then add per-partition offsets
  * computed from partition counts — the only driver data is one count
  * per partition. Range partition boundaries come from sampling and may
  * vary run to run; every row's GLOBAL rank is invariant to where the
  * boundaries fall, so results are deterministic.
  *
  * The w-band self-join is a bucket join, not a theta join: side A
  * duplicates into its own and the next rn-bucket (2 rows per record),
  * side B keys by its bucket, and the band filter runs inside the hash
  * join — no nested-loop anywhere. */
object SortedNeighborhood {

  /** `recs(id, key)` → (a_id, a_key, b_id, b_key, gap): all pairs within
    * `w` positions of each other in the global (key, id) order, a before
    * b (0 < gap ≤ w). Callers verify candidates with their own
    * similarity (edit distance, q129). */
  def candidates(recs: DataFrame, w: Int): DataFrame = {
    require(w >= 1, s"sorted-neighborhood: w must be >= 1, got $w")
    val spark = recs.sparkSession
    import spark.implicits._
    val parted = recs.select(col("id"), col("key"))
      .repartitionByRange(col("key"), col("id"))
      .withColumn("pid", spark_partition_id())
    // Pinned BEFORE the counts collect: repartitionByRange samples a
    // fresh seed per job, so without the pin the offsets (one job) would
    // join against a RE-EXECUTION of the range exchange (second job)
    // whose boundaries — and therefore pids — can differ once sampling
    // is partial at scale; global ranks would silently shift. Same
    // pattern as Skyline.pareto2. Also saves the rank window running
    // twice (once for counts, once for seq).
    val local = parted.withColumn("lrn",
      row_number().over(Window.partitionBy("pid").orderBy("key", "id")))
      .localCheckpoint()
    // one count per partition → prefix-sum offsets (O(partitions) driver)
    val counts = local.groupBy("pid").agg(max("lrn").as("cnt"))
      .orderBy("pid").collect().map(r => (r.getInt(0), r.getInt(1).toLong))
    if (counts.isEmpty)
      // schema-shaped empty relation — a zero-column emptyDataFrame would
      // throw AnalysisException in callers referencing a_id/gap (q129)
      return recs.select(col("id").as("a_id"), col("key").as("a_key"),
        col("id").as("b_id"), col("key").as("b_key"), lit(0L).as("gap"))
        .filter(lit(false))
    val offsets = counts.zip(
      counts.map(_._2).scanLeft(0L)(_ + _)
    ).map { case ((pid, _), off) => (pid, off) }.toSeq
    // local is pinned above, so the two band-join reads of seq only
    // replay a broadcast join over checkpointed blocks — cheap
    val seq = local.join(
        broadcast(offsets.toDF("pid", "off")), Seq("pid"))
      .select(col("id"), col("key"), (col("lrn") + col("off")).as("rn"))
    val bkt = expr(s"(rn - 1) div $w")
    val a = seq.select(col("id").as("a_id"), col("key").as("a_key"),
        col("rn").as("a_rn"), explode(array(bkt, bkt + 1)).as("bkt"))
    val b = seq.select(col("id").as("b_id"), col("key").as("b_key"),
      col("rn").as("b_rn"), bkt.as("bkt"))
    a.join(b, Seq("bkt"))
      .filter(col("b_rn") > col("a_rn") && col("b_rn") <= col("a_rn") + w)
      .select(col("a_id"), col("a_key"), col("b_id"), col("b_key"),
        (col("b_rn") - col("a_rn")).as("gap"))
  }
}
