package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md scale notes): two-phase salted
  * aggregation. AQE's skew-join splitting covers joins automatically
  * (spark.sql.adaptive.skewJoin, on by default); this utility covers the
  * aggregation side, where one hot group would otherwise pin a single
  * reducer at 100 TB.
  *
  * Phase 1 spreads each key over `nSalts` sub-groups (salt = hash of a
  * high-cardinality sibling column — deterministic, no rand()), combining
  * map-side as usual; phase 2 re-aggregates the nSalts partials per key.
  * Both shuffles move only partial rows, never the hot group's raw rows
  * into one task.
  */
object Skew {

  /** Salted distributive aggregation: COUNT + SUM per key. `saltSrc` must
    * be any column that varies within a key (event id, payload hash...). */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     saltSrc: Column, nSalts: Int = 16): DataFrame =
    df.groupBy(key.as("k"), pmod(xxhash64(saltSrc), lit(nSalts)).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(value).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).cast("long").as("cnt"), sum(col("ps")).as("total"))
}
