package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-gated query: a Spark DataFrame program plus (when the operator
  * is SQL-expressible) the exact DuckDB SQL the driver replays over the same
  * parquet/jsonl inputs (SURVEY.md §2.3). `oracle == None` → the driver
  * records a weaker rows-only check; such ops get Spark-side golden tests
  * instead. */
final case class GatedQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GatedQuery {
  def gated(name: String, sql: String)(
      build: (SparkSession, String) => DataFrame): GatedQuery =
    GatedQuery(name, build, Some(sql.stripMargin.trim.replaceAll("\\s+", " ")))

  def ungated(name: String)(
      build: (SparkSession, String) => DataFrame): GatedQuery =
    GatedQuery(name, build, None)
}
