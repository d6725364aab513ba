package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto front): the rows no other row beats on BOTH axes
  * — cost/quality frontiers (cheapest parts per size class, best
  * quality-per-token documents). The textbook definition is a
  * quadratic NOT EXISTS dominance join (which is exactly what the q138
  * oracle runs); this operator collapses it to sorting + prefix
  * maxima, the Kung et al. '75 2D result in relational form:
  *
  *   dominated(p)  ⟺  max{ y(q) : x(q) < x(p) } ≥ y(p)
  *                 ∨  max{ y(q) : x(q) = x(p) } > y(p)
  *
  * so one per-x aggregate plus a STRICT-prefix running max over the
  * distinct x values decides every row — O(n log n) work, no pair
  * blow-up, duplicates of the same point survive together (neither
  * strictly beats the other).
  *
  * The prefix max runs the scale-honest way (the SortedNeighborhood
  * two-level shape): range-partition the distinct-x relation, local
  * running max per partition, then fold per-partition maxima into
  * prefix offsets — one value per partition is the only driver data;
  * no empty-partitionBy window ever drags the relation through a
  * single task. */
object Skyline {

  /** Rows of `df` minimal on `minCol` and maximal on `maxCol` in the
    * Pareto sense. Both columns must be numeric and non-null; the max
    * axis folds through double (exact for integers below 2^53). */
  def pareto2(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pv = df.groupBy(col(minCol).as("x"))
      .agg(max(col(maxCol).cast("double")).as("grpmax"))
    val parted = pv.repartitionByRange(col("x"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pins partition ids for the offset join below
    val local = parted.withColumn("lmax",
      max(col("grpmax")).over(Window.partitionBy("pid").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)))
    val pmax = parted.groupBy("pid").agg(max(col("grpmax")).as("pm"))
      .orderBy("pid").collect().map(r => (r.getInt(0), r.getDouble(1)))
    // prefix fold: max over all EARLIER partitions (None for the first)
    val offsets = pmax.zip(
      pmax.map(_._2).scanLeft(Option.empty[Double]) {
        case (acc, m) => Some(acc.fold(m)(math.max(_, m)))
      }
    ).map { case ((pid, _), prev) => (pid, prev) }.toSeq
    val pref = local.join(
        broadcast(offsets.toDF("pid", "prevpm")), Seq("pid"))
      .select(col("x"), col("grpmax"),
        greatest(col("lmax"), col("prevpm")).as("prevmax"))
    df.join(pref, df(minCol) === pref("x"))
      .filter(
        (col("prevmax").isNull || col("prevmax") < col(maxCol)) &&
          !(col("grpmax") > col(maxCol)))
      .drop("x", "grpmax", "prevmax")
  }
}
