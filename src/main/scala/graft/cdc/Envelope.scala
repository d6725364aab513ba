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
          col("metadata.`transaction-id`").isNull ||
          // a data record with no operation is undecidable downstream:
          // `op =!= 'delete'` goes three-valued and the row would vanish
          // from serving without reaching the DLQ (a delete-by-omission),
          // while the stateful materializer would treat it as live —
          // route it to the DLQ like the other broken data records
          col("metadata.`operation`").isNull))

  /** Schema-drift detector: the envelope fields of a raw line that the
    * FIXED schema does not cover — a renamed or newly added source column
    * shows up here (as `data.<new-name>`) instead of being silently
    * nulled out by `from_json` (the reference re-infers types on ingest,
    * reference README.md:480-487; a fixed-schema engine must at least
    * SURFACE the divergence). Per-row key scans over the line's three
    * object levels — no shuffle; empty array = no drift. Corrupt lines
    * (no JSON object at all) report no drift — they are the DLQ's
    * responsibility, not the drift detector's. */
  def driftFields: Column = {
    def unknown(keysOf: Column, known: Seq[String], prefix: String): Column =
      transform(
        array_except(coalesce(keysOf, array()),
          array(known.map(lit): _*)),
        f => concat(lit(prefix), f))
    concat(
      unknown(json_object_keys(col("value")),
        schema.fieldNames.toSeq, ""),
      unknown(json_object_keys(get_json_object(col("value"), "$.data")),
        dataSchema.fieldNames.toSeq, "data."),
      unknown(json_object_keys(get_json_object(col("value"), "$.metadata")),
        metadataSchema.fieldNames.toSeq, "metadata."))
  }

  /** [[driftFields]] as a side column over any DataFrame still carrying
    * the raw `value` line. */
  def withDrift(df: DataFrame): DataFrame =
    df.withColumn("drift", driftFields)

  /** Monitoring rollup: how often each unknown field occurs — the
    * fixed-schema analog of the reference's inferred-mapping diff. One
    * explode + one aggregation; run it over a micro-batch or the archive,
    * not the hot path. */
  def driftStats(df: DataFrame): DataFrame =
    withDrift(df)
      .select(explode(col("drift")).as("field"))
      .groupBy("field").agg(count(lit(1)).as("n"))

  /** One source-filter condition (the DMS `filter-conditions` grammar):
    * `eq | noteq | ste (≤) | gte (≥) | between | null | notnull`.
    * `value2` is the between end-value. */
  final case class FilterCondition(op: String, value: String = "",
                                   value2: String = "") {
    require(Set("eq", "noteq", "ste", "gte", "between", "null", "notnull")(op),
      s"filter-operator must be eq|noteq|ste|gte|between|null|notnull, got '$op'")
    require(op == "null" || op == "notnull" || value.nonEmpty,
      s"filter-operator '$op' needs a value")
    require(op != "between" || value2.nonEmpty,
      "between needs an end value (value2)")
  }

  /** A column filter on a selection rule (the reference task declares the
    * empty list, dms_aurora_mysql_to_kinesis.py:105; this generalizes it).
    * Conditions on ONE column OR together; several filters on a rule AND
    * together — the documented DMS combination semantics. */
  final case class SourceFilter(columnName: String,
                                conditions: Seq[FilterCondition]) {
    require(conditions.nonEmpty, "a source filter needs at least one condition")
    require(dataSchema.fieldNames.contains(columnName),
      s"filter column '$columnName' is not in the envelope row image " +
        s"(${dataSchema.fieldNames.mkString(", ")})")
  }

  /** One DMS table-mapping selection rule (reference
    * dms_aurora_mysql_to_kinesis.py:96-107): an object locator plus an
    * include/exclude action and optional source filters. `%` (any run,
    * including empty) is the ONLY wildcard — the documented DMS
    * object-locator grammar; underscores are literal, so a no-wildcard
    * locator matches exactly one name (the reference stack's own locators
    * are exact names over a table CALLED retail_trans — SQL-LIKE `_`
    * semantics would silently also match retailXtrans). */
  final case class SelectionRule(schemaName: String, tableName: String,
                                 action: String = "include",
                                 filters: Seq[SourceFilter] = Nil) {
    require(action == "include" || action == "exclude",
      s"rule-action must be include|exclude, got '$action'")
  }

  /** One source filter → a Column predicate over the row image. Values are
    * cast to the COLUMN's declared type (the envelope DDL), so `amount`
    * compares numerically and `trans_datetime` lexicographically — never
    * string-vs-number coercion surprises. SQL three-valued logic applies:
    * a NULL column fails every value comparison (`null`/`notnull` test
    * nullness explicitly), so a filtered selection drops such records —
    * the DMS behavior for rows a filter cannot accept. */
  private def filterPredicate(f: SourceFilter): Column = {
    val dt = dataSchema(f.columnName).dataType
    val c = col(s"data.`${f.columnName}`")
    // values validate DRIVER-side at Column-build time: a lazy
    // lit(s).cast(dt) passes start()'s eager selection(rules) check and
    // then throws CAST_INVALID_INPUT (ANSI) inside foreachBatch at batch
    // 0 — crash-looping the running query the eager check exists to
    // protect. The actual ANSI cast is evaluated here rather than
    // per-type checks, so every type dataSchema can ever hold stays
    // covered (a widened DecimalType column would silently dodge an
    // enumerated LongType/IntegerType match).
    def v(s: String): Column = {
      import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
      val ok = scala.util.Try(
        Cast(Literal(s), dt, Some("UTC"), EvalMode.ANSI).eval()).isSuccess
      require(ok, s"source filter on '${f.columnName}' (${dt.simpleString}): " +
        s"value '$s' is not castable — fix the rule, it would otherwise " +
        "fail the stream at batch 0")
      lit(s).cast(dt)
    }
    f.conditions.map { cond =>
      cond.op match {
        case "eq"      => c === v(cond.value)
        case "noteq"   => c =!= v(cond.value)
        case "ste"     => c <= v(cond.value)
        case "gte"     => c >= v(cond.value)
        case "between" => c >= v(cond.value) && c <= v(cond.value2)
        case "null"    => c.isNull
        case "notnull" => c.isNotNull
      }
    }.reduce(_ || _)
  }

  /** S3 selection over a DMS rule LIST: a data record enters the pipeline
    * iff it matches at least one include locator and no exclude locator —
    * exclusions take precedence, the documented DMS resolution. Control
    * records (record-type != data) are dropped here too. A no-wildcard
    * locator compiles to an equality; a `%` pattern compiles to Catalyst
    * `LIKE` with `_` escaped (literal) — per-row, codegen'd, no shuffle. */
  def selection(rules: Seq[SelectionRule]): Column = {
    require(rules.exists(_.action == "include"),
      "a DMS selection needs at least one include rule")
    def m(c: Column, pat: String): Column =
      if (pat.contains("%")) c.like(pat.replace("_", "\\_")) else c === pat
    // coalesce: a rule either selects a record or it does not — a NULL
    // filter comparison (null column value) means "not selected", and must
    // not go three-valued through the include/exclude algebra (an exclude
    // rule's NULL would otherwise null out `!excluded` and silently drop
    // an included record from BOTH outcomes)
    def locator(r: SelectionRule): Column = coalesce(
      r.filters.map(filterPredicate).foldLeft(
        m(col("metadata.`schema-name`"), r.schemaName) &&
          m(col("metadata.`table-name`"), r.tableName))(_ && _),
      lit(false))
    val included = rules.filter(_.action == "include").map(locator)
      .reduce(_ || _)
    val excluded = rules.filter(_.action == "exclude").map(locator)
      .reduceOption(_ || _).getOrElse(lit(false))
    col("metadata.`record-type`") === "data" && included && !excluded
  }

  /** The reference task's exact mapping (one include rule, no wildcards,
    * dms_aurora_mysql_to_kinesis.py:96-107) — the default rule set of
    * every pipeline entry point. */
  val defaultRules: Seq[SelectionRule] =
    Seq(SelectionRule("testdb", "retail_trans"))

  /** Single-table convenience form — the reference task's exact mapping
    * (one include rule, no wildcards). */
  def selection(schemaName: String = "testdb",
                tableName: String = "retail_trans"): Column =
    selection(Seq(SelectionRule(schemaName, tableName)))

  /** Parsed + selected changelog of retail_trans from the checked-in
    * fixture — the batch entry point for D-Q32/33/34. Corrupt records
    * (including data records with no operation) are EXCLUDED — the batch
    * counterpart of the stream's DLQ split, so Materialize can never see
    * the null-operation rows whose three-valued `op =!= 'delete'` would
    * silently drop them while the stateful materializer kept them live. */
  def changelog(spark: SparkSession, path: String): DataFrame =
    parse(spark, path).filter(!corrupt && selection()).drop("value")

  /** Parsed + selected changelog over an existing line DataFrame — works
    * for batch AND streaming inputs (from_json/filter are per-row, so the
    * same plan runs under either execution mode). Excludes corrupt
    * records like the path-based overload. */
  def changelog(lines: DataFrame): DataFrame =
    parseLines(lines).filter(!corrupt && selection()).drop("value")
}
