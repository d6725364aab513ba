package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DMS→Kinesis CDC record envelope (SURVEY.md §1.2, FIXTURES.md §2):
  * one single-line JSON per row change (reference
  * cdk_stacks/dms_aurora_mysql_to_kinesis.py:84-92), row image under `data`,
  * provenance under `metadata` (reference README.md:460-479).
  *
  * The schema is FIXED — parsed with `from_json` against this StructType,
  * never inferred (mirrors the reference's externally declared DDL,
  * reference README.md:198-208). Unparseable lines surface as a NULL struct
  * and are routed to the DLQ side-path (SURVEY.md S11), not dropped
  * silently.
  */
object Envelope {

  /** retail_trans row image (reference README.md:198-208). `trans_datetime`
    * stays a string at the envelope layer — second-precision ISO8601 on the
    * wire (README.md:468); parse to TimestampType only where an operator
    * needs time arithmetic. */
  val dataSchema: StructType = StructType(Seq(
    StructField("trans_id", LongType),
    StructField("customer_id", StringType),
    StructField("event", StringType),
    StructField("sku", StringType),
    StructField("amount", IntegerType),
    StructField("device", StringType),
    StructField("trans_datetime", StringType)))

  /** Provenance block; `timestamp` is fixed-width ISO8601 with 6-digit µs,
    * so lexicographic order == chronological order (exploited by the
    * materialize operator — no cross-engine timestamp-parse risk). */
  val metadataSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("record-type", StringType),
    StructField("operation", StringType),
    StructField("partition-key-type", StringType),
    StructField("schema-name", StringType),
    StructField("table-name", StringType),
    StructField("transaction-id", LongType)))

  val schema: StructType = StructType(Seq(
    StructField("data", dataSchema),
    StructField("metadata", metadataSchema)))

  /** O34/O1: envelope parse over any DataFrame of raw lines (batch file
    * read or a streaming source) — the single parse implementation both
    * paths share. `from_json` is per-row, no shuffle. */
  def parseLines(lines: DataFrame): DataFrame =
    lines
      .select(from_json(col("value"), schema).as("env"), col("value"))
      .select(col("env.data").as("data"), col("env.metadata").as("metadata"),
        col("value"))

  /** Batch entry: JSONL scan + parse (the file source splits by line
    * ranges — distributed). */
  def parse(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** A line is DLQ-bound when the fixed schema could not parse it at all,
    * when provenance essentials (record-type, timestamp) are missing, or
    * when a data record arrived without a row image, primary key, or
    * transaction id (PERMISSIVE from_json nulls out corrupt sub-trees —
    * those must not materialize as null-key rows in serving state, and a
    * data change without a transaction id cannot participate in the
    * last-write-wins order).
    *
    * Null-safety is load-bearing: this predicate must NEVER evaluate to
    * SQL NULL, because the pipeline routes on `corrupt` / `!corrupt` — a
    * NULL would drop the row from BOTH the main stream and the DLQ. The
    * null metadata fields are tested with isNull before any `===`
    * comparison can go three-valued. */
  def corrupt: Column =
    col("metadata").isNull ||
      col("metadata.`record-type`").isNull ||
      col("metadata.`timestamp`").isNull ||
      (col("metadata.`record-type`") === "data" &&
        (col("data").isNull || col("data.trans_id").isNull ||
          col("metadata.`transaction-id`").isNull))

  /** S3 selection rule (reference dms_aurora_mysql_to_kinesis.py:96-107):
    * only data records of one schema.table enter the pipeline. Control
    * records (record-type != data) are dropped here too. */
  def selection(schemaName: String = "testdb",
                tableName: String = "retail_trans"): Column =
    col("metadata.`record-type`") === "data" &&
      col("metadata.`schema-name`") === schemaName &&
      col("metadata.`table-name`") === tableName

  /** Parsed + selected changelog of retail_trans from the checked-in
    * fixture — the batch entry point for D-Q32/33/34. */
  def changelog(spark: SparkSession, path: String): DataFrame =
    parse(spark, path).filter(selection()).drop("value")

  /** Parsed + selected changelog over an existing line DataFrame — works
    * for batch AND streaming inputs (from_json/filter are per-row, so the
    * same plan runs under either execution mode). */
  def changelog(lines: DataFrame): DataFrame =
    parseLines(lines).filter(selection()).drop("value")
}
