package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DMS table-mapping TRANSFORMATION rules (the S4 surface next to the
  * reference's object-mapping block,
  * reference cdk_stacks/dms_aurora_mysql_to_kinesis.py:108-117): a
  * rule-driven record reshaper, mirroring how [[Envelope.SelectionRule]]
  * models the selection surface. Each rule carries an object locator
  * (schema/table/column, `%` wildcard — the DMS object-locator grammar)
  * and an action; the list applies IN ORDER, each rule over the previous
  * rule's output (precedence spec-pinned in CdcSpec).
  *
  * Supported actions (the DMS column/record surface):
  *   - `rename`                → matching column gets the rule's `value`
  *   - `remove-column`         → matching columns are dropped
  *   - `add-prefix` / `remove-prefix` → prefix edits on matching names
  *   - `convert-lowercase` / `convert-uppercase` → case edits
  *   - `map-record-to-document` → re-nest matching columns into a
  *     document struct (the DMS document-mode record shape for
  *     document/stream targets). `value` names the document column
  *     (default `_doc`), the column locator selects which columns nest
  *     (default `%` = all); non-matching columns stay top-level. A rule
  *     whose `value` names an EXISTING document column appends into it,
  *     so a rule list builds a caller-shaped document key by key —
  *     `data := {row image}, meta := {provenance}` — the document-mode
  *     sibling of the reference's `map-record-to-record` envelope
  *     (reference cdk_stacks/dms_aurora_mysql_to_kinesis.py:108-117)
  *   - `change-data-type`       → matching columns cast to `dataType`
  *     (a Spark SQL type string — the DMS rule's `data-type` block)
  *   - `add-column`             → new column named `value`, computed by
  *     the SQL `expression` over the CURRENT (post-prior-rules) columns,
  *     cast to `dataType` when given (the DMS add-column rule action)
  *
  * Everything here compiles to a single projection — zero shuffles; the
  * rename/remove/prefix/case actions are pure metadata edits, and
  * `change-data-type`/`add-column` are codegen'd column expressions, so
  * the physical plan under a rule list is identical to the hand-written
  * projection it replaces. */
object Transformation {

  final case class TransformationRule(
      target: String,            // "column" | "record"
      action: String,
      schemaName: String = "%",
      tableName: String = "%",
      columnName: String = "%",
      value: String = "",
      expression: String = "",   // add-column only: SQL over current cols
      dataType: String = "") {   // change-data-type / add-column cast
    private val columnActions = Set("rename", "remove-column", "add-prefix",
      "remove-prefix", "convert-lowercase", "convert-uppercase",
      "change-data-type", "add-column")
    require(
      (target == "column" && columnActions(action)) ||
        (target == "record" && action == "map-record-to-document"),
      s"unsupported transformation rule: target='$target' action='$action'")
    require(action != "rename" || !columnName.contains("%"),
      "rename needs an exact column locator (a wildcard rename would " +
        "collapse several columns onto one name)")
    require(!Set("rename", "add-prefix", "remove-prefix", "add-column")(action) ||
      value.nonEmpty, s"action '$action' needs a non-empty value")
    require(action != "change-data-type" || dataType.nonEmpty,
      "change-data-type needs a target dataType")
    require(action != "add-column" || expression.nonEmpty,
      "add-column needs a SQL expression")
  }

  /** DMS object-locator match: `%` is the only wildcard (any run, including
    * empty); every other character — underscores included — is literal.
    * Driver-side (rules select column NAMES, not row data). */
  private[graft] def locatorMatches(pattern: String, name: String): Boolean =
    if (!pattern.contains("%")) pattern == name
    else java.util.regex.Pattern.compile(
      pattern.split("%", -1).map(java.util.regex.Pattern.quote).mkString(".*"))
      .matcher(name).matches()

  /** Apply a rule list to a flat per-table record DataFrame (a materialized
    * snapshot, a shaped envelope — anything with one column per source
    * attribute). `schemaName`/`tableName` identify the object the records
    * belong to; rules whose locator misses it are inert. Rules apply in
    * list order. */
  def shape(records: DataFrame, schemaName: String, tableName: String,
            rules: Seq[TransformationRule]): DataFrame =
    rules.filter(r => locatorMatches(r.schemaName, schemaName) &&
        locatorMatches(r.tableName, tableName))
      .foldLeft(records)(applyRule)

  private def applyRule(df: DataFrame,
                        rule: TransformationRule): DataFrame = rule.action match {
    case "map-record-to-document" =>
      val docName = if (rule.value.nonEmpty) rule.value else "_doc"
      val existing = df.schema.fields.find(_.name == docName) match {
        case Some(f) =>
          require(f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType],
            s"map-record-to-document: '$docName' exists but is not a document")
          f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.toSeq.map(n => col(docName)(n).as(n))
        case None => Seq.empty[org.apache.spark.sql.Column]
      }
      val candidates = df.columns.filterNot(_ == docName)
      val nested = candidates.filter(locatorMatches(rule.columnName, _))
      require(nested.nonEmpty,
        s"map-record-to-document: locator '${rule.columnName}' matches no column")
      val keep = candidates.filterNot(nested.contains).map(col)
      val doc = struct((existing ++ nested.map(col)).toIndexedSeq: _*).as(docName)
      df.select((keep :+ doc).toIndexedSeq: _*)
    case "remove-column" =>
      val keep = df.columns.filterNot(locatorMatches(rule.columnName, _))
      require(keep.nonEmpty, "remove-column would drop every column")
      df.select(keep.map(col).toIndexedSeq: _*)
    case "change-data-type" =>
      df.select(df.columns.map { c =>
        if (locatorMatches(rule.columnName, c)) col(c).cast(rule.dataType).as(c)
        else col(c)
      }.toIndexedSeq: _*)
    case "add-column" =>
      require(!df.columns.contains(rule.value),
        s"add-column '${rule.value}' collides with an existing column")
      val e = expr(rule.expression)
      df.withColumn(rule.value,
        if (rule.dataType.nonEmpty) e.cast(rule.dataType) else e)
    case colAction =>
      val renamed = df.columns.map { c =>
        if (!locatorMatches(rule.columnName, c)) c
        else colAction match {
          case "rename"        => rule.value
          case "add-prefix"    => rule.value + c
          case "remove-prefix" => c.stripPrefix(rule.value)
          // Locale.ROOT: a default-locale case edit renames differently
          // per deployment machine (tr-TR turns "device" into "DEVİCE")
          case "convert-lowercase" => c.toLowerCase(java.util.Locale.ROOT)
          case "convert-uppercase" => c.toUpperCase(java.util.Locale.ROOT)
        }
      }
      require(renamed.distinct.length == renamed.length,
        s"rule $rule collides column names: ${renamed.mkString(", ")}")
      df.toDF(renamed.toIndexedSeq: _*)
  }
}
