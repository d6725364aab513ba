package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's gated-query registry. */
object SparkEntry {

  /** All registered queries, in SURVEY §2 order. */
  def registry: Seq[GatedQuery] =
    graft.queries.Relational.all ++
      graft.queries.Cdc.all ++
      graft.queries.Functions.all ++
      graft.queries.Extended.all ++
      graft.queries.Text.all ++
      graft.queries.Media.all ++
      graft.queries.Analytics.all ++
      graft.queries.Series.all ++
      graft.queries.Graph.all

  /** Flagship query on /root/testdata/sf0.001 (TPC-H Q1 shape, D-Q10);
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_hash_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(g => g.name -> g.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case GatedQuery(n, _, Some(sql)) => n -> sql }.toMap
}
