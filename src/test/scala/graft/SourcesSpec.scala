package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** O1 source/sink matrix beyond the gated parquet/CSV/JSONL scans: every
  * format the engine writes must read back row-identical with a pinned
  * schema — the archival/interchange contract of a pipeline whose tables
  * outlive any single job. */
class SourcesSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/out"

  private lazy val docs = Tables.documents(spark, sf)

  test("ORC roundtrip: schema and rows survive write/read") {
    val path = tmp("orc")
    docs.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema === docs.schema)
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("ORC scan pushes predicates and prunes columns like parquet") {
    val path = tmp("orc_push")
    docs.write.orc(path)
    val plan = spark.read.orc(path)
      .filter(col("n_chars") > 100).select("doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"ORC predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"ORC column pruning lost:\n$plan")
  }

  test("JSON-lines roundtrip with a pinned schema (never inferred)") {
    val path = tmp("jsonl")
    docs.write.json(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).json(path)
      .select(docs.columns.map(col): _*)
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("CSV roundtrip with quoting: embedded delimiters and quotes survive") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "both, \"of\", them"),
      (5L, "")).toDF("id", "s")
    val path = tmp("csv")
    tricky.write.option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val back = spark.read.option("header", "true").schema(schema).csv(path)
    // CSV cannot distinguish empty string from null — normalize both sides
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("s", coalesce(col("s"), lit("")))
    assert(norm(back).exceptAll(norm(tricky)).count() === 0)
    assert(norm(tricky).exceptAll(norm(back)).count() === 0)
  }

  test("partitioned parquet write prunes partitions on read") {
    val path = tmp("part")
    docs.write.partitionBy("lang").parquet(path)
    val one = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter not pruning partitions:\n$plan")
    assert(one.count() === docs.filter(col("lang") === "en").count())
  }
}
