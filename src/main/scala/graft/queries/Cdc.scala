package graft.queries

import graft.{GatedQuery, Tables}
import graft.GatedQuery.gated
import graft.cdc.{Bootstrap, Envelope, Materialize, Reconcile}
import org.apache.spark.sql.functions._

/** CDC trio (SURVEY.md O34/O35/O36 = D-Q32/33/34) over the checked-in
  * envelope fixture — the reference's core semantics: DMS→Kinesis envelope
  * parse (reference README.md:460-479), OpenSearch last-write-wins snapshot
  * (reference cdk_stacks/firehose.py:114-116, README.md:455-457), and
  * pipeline op statistics (README.md:448-449).
  *
  * Both engines read the SAME jsonl file; the oracle pins DuckDB's
  * `read_json` to the fixed envelope schema (strings stay strings) exactly
  * as the Spark side pins `from_json` — no inference on either engine.
  */
object Cdc {

  private val fx = Tables.cdcFixturePath

  /** DuckDB-side equivalent of Envelope.schema — explicit columns so
    * `trans_datetime`/`timestamp` stay VARCHAR (lexicographic == temporal
    * for the fixed-width format) instead of being auto-parsed. */
  private val readJson =
    s"""read_json('$fx', format='newline_delimited',
       |columns={data: 'STRUCT(trans_id BIGINT, customer_id VARCHAR, event VARCHAR, sku VARCHAR, amount INTEGER, device VARCHAR, trans_datetime VARCHAR)',
       |metadata: 'STRUCT("timestamp" VARCHAR, "record-type" VARCHAR, operation VARCHAR, "partition-key-type" VARCHAR, "schema-name" VARCHAR, "table-name" VARCHAR, "transaction-id" BIGINT)'})""".stripMargin

  private val selectionSql =
    """metadata."record-type" = 'data' AND metadata."schema-name" = 'testdb'
      |AND metadata."table-name" = 'retail_trans'""".stripMargin

  /** Both shards' fixtures in one DuckDB scan (S3 multi-table stream). */
  private val fx2 = Tables.cdcShardFixturePath
  private val readJsonBoth =
    s"""read_json(['$fx', '$fx2'], format='newline_delimited',
       |columns={data: 'STRUCT(trans_id BIGINT, customer_id VARCHAR, event VARCHAR, sku VARCHAR, amount INTEGER, device VARCHAR, trans_datetime VARCHAR)',
       |metadata: 'STRUCT("timestamp" VARCHAR, "record-type" VARCHAR, operation VARCHAR, "partition-key-type" VARCHAR, "schema-name" VARCHAR, "table-name" VARCHAR, "transaction-id" BIGINT)'})""".stripMargin

  /** DuckDB mirror of the wildcard rule list used by q101/q102:
    * include testdb.retail_trans%, exclude %.%backup. `_` is escaped on
    * both engines — Envelope.selection treats it as a LITERAL ('%' is the
    * only DMS wildcard), so the oracle must too or a one-char table-name
    * variant would diverge. The no-wildcard schema locator is equality. */
  private val wildcardSelectionSql =
    """metadata."record-type" = 'data'
      |AND (metadata."schema-name" = 'testdb'
      |     AND metadata."table-name" LIKE 'retail\_trans%' ESCAPE '\')
      |AND NOT (metadata."schema-name" LIKE '%'
      |         AND metadata."table-name" LIKE '%backup')""".stripMargin

  private val wildcardRules = Seq(
    Envelope.SelectionRule("testdb", "retail_trans%"),
    Envelope.SelectionRule("%", "%backup", action = "exclude"))

  /** Point-in-time cut for the q150 time-travel gate: the fixture's
    * median envelope timestamp (fixed-width ISO-8601, so lexicographic
    * compare == temporal on both engines — same invariant the LWW
    * ordering already relies on). */
  private val timeTravelCut = "2022-03-14T14:01:14.260960Z"

  val all: Seq[GatedQuery] = Seq(

    // ---- O34/O25 (D-Q32): envelope parse + selection-rule filter ----
    gated("q32_cdc_parse",
      s"""SELECT metadata."transaction-id" AS txid, metadata.operation AS op,
         |       data.trans_id AS trans_id, data.customer_id AS customer_id,
         |       CAST(data.amount AS BIGINT) AS amount
         |FROM $readJson
         |WHERE $selectionSql
         |ORDER BY txid, op, trans_id""") { (s, _) =>
      Envelope.changelog(s, fx)
        .select(col("metadata.`transaction-id`").as("txid"),
          col("metadata.operation").as("op"),
          col("data.trans_id").as("trans_id"),
          col("data.customer_id").as("customer_id"),
          col("data.amount").cast("long").as("amount"))
        .orderBy("txid", "op", "trans_id")
    },

    // ---- S3, filter leg: DMS selection-rule SOURCE FILTERS (the
    //      reference task declares the empty `filters` list,
    //      dms_aurora_mysql_to_kinesis.py:105) — conditions on one column
    //      OR together (between ∪ null keeps delete images whose row
    //      image has no amount), separate filters AND together (noteq on
    //      a NULL device is not-accepted, SQL three-valued semantics on
    //      both engines). Values cast to the envelope DDL's column types;
    //      compiles to one codegen'd predicate, no shuffle. ----
    gated("q106_selection_filters",
      s"""SELECT metadata."transaction-id" AS txid, metadata.operation AS op,
         |       data.trans_id AS trans_id, CAST(data.amount AS BIGINT) AS amount,
         |       data.device AS device
         |FROM $readJson
         |WHERE $selectionSql
         |  AND ((data.amount BETWEEN 1 AND 3) OR data.amount IS NULL)
         |  AND data.device <> 'tablet'
         |ORDER BY txid, op, trans_id""") { (s, _) =>
      val rules = Seq(Envelope.SelectionRule("testdb", "retail_trans",
        filters = Seq(
          Envelope.SourceFilter("amount", Seq(
            Envelope.FilterCondition("between", "1", "3"),
            Envelope.FilterCondition("null"))),
          Envelope.SourceFilter("device", Seq(
            Envelope.FilterCondition("noteq", "tablet"))))))
      Envelope.parse(s, fx).filter(Envelope.selection(rules))
        .select(col("metadata.`transaction-id`").as("txid"),
          col("metadata.operation").as("op"),
          col("data.trans_id").as("trans_id"),
          col("data.amount").cast("long").as("amount"),
          col("data.device").as("device"))
        .orderBy("txid", "op", "trans_id")
    },

    // ---- O35 (D-Q33): changelog → snapshot, last write per key wins,
    //      (timestamp, transaction-id) tie-break, delete = tombstone ----
    gated("q33_cdc_materialize",
      s"""SELECT trans_id, customer_id, event, sku, amount, device, trans_datetime
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         CAST(data.amount AS BIGINT) AS amount,
         |         data.device AS device, data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      Materialize.snapshot(Envelope.changelog(s, fx))
        .withColumn("amount", col("amount").cast("long"))
        .orderBy("trans_id")
    },

    // ---- O35, TIME TRAVEL: the snapshot as of a point mid-stream —
    //      replay only envelopes with ts ≤ cut, then the same
    //      last-write-wins materialization. What the serving index
    //      looked like BEFORE later updates/deletes landed: rows later
    //      deleted are still live here, later amount updates not yet
    //      applied. Any historical state is reconstructible from the
    //      archived changelog (reference: the S3 archive retains every
    //      envelope, cdk_stacks/firehose.py:131-135); the cut is one
    //      pushed-down predicate, so at 100 TB the time-travel scan
    //      reads only pre-cut partitions of a ts-partitioned archive. ----
    gated("q150_cdc_time_travel",
      s"""SELECT trans_id, customer_id, event, sku, amount, device, trans_datetime
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         CAST(data.amount AS BIGINT) AS amount,
         |         data.device AS device, data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql
         |    AND metadata."timestamp" <= '$timeTravelCut')
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      Materialize.snapshot(Envelope.changelog(s, fx)
          .filter(col("metadata.timestamp") <= lit(timeTravelCut)))
        .withColumn("amount", col("amount").cast("long"))
        .orderBy("trans_id")
    },

    // ---- SNAPSHOT DELTA: what changed between two points in time —
    //      the q150 time-travel snapshot at the mid-stream cut FULL
    //      OUTER JOINed against the final snapshot, each key classified
    //      insert / delete / update (any column differing,
    //      null-safe). The "what changed this hour" report a downstream
    //      consumer diffs instead of re-reading the whole serving index;
    //      complements q93's reconcile (bucketed checksums say THAT a
    //      replica drifted, this says exactly WHICH keys and values).
    //      Scale: both snapshots are key-partitioned relations; the diff
    //      is one co-partitioned full outer join, no broadcast of
    //      either side. ----
    gated("q154_snapshot_delta",
      s"""WITH snapA AS (
         |  SELECT trans_id, customer_id, event, sku, amount, device, trans_datetime
         |  FROM (
         |    SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |           data.event AS event, data.sku AS sku,
         |           CAST(data.amount AS BIGINT) AS amount,
         |           data.device AS device, data.trans_datetime AS trans_datetime,
         |           metadata.operation AS op,
         |           ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |               ORDER BY metadata."timestamp" DESC,
         |                        metadata."transaction-id" DESC) AS rn
         |    FROM $readJson
         |    WHERE $selectionSql
         |      AND metadata."timestamp" <= '$timeTravelCut')
         |  WHERE rn = 1 AND op <> 'delete'),
         |snapB AS (
         |  SELECT trans_id, customer_id, event, sku, amount, device, trans_datetime
         |  FROM (
         |    SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |           data.event AS event, data.sku AS sku,
         |           CAST(data.amount AS BIGINT) AS amount,
         |           data.device AS device, data.trans_datetime AS trans_datetime,
         |           metadata.operation AS op,
         |           ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |               ORDER BY metadata."timestamp" DESC,
         |                        metadata."transaction-id" DESC) AS rn
         |    FROM $readJson
         |    WHERE $selectionSql)
         |  WHERE rn = 1 AND op <> 'delete')
         |SELECT COALESCE(a.trans_id, b.trans_id) AS trans_id,
         |       CASE WHEN a.trans_id IS NULL THEN 'insert'
         |            WHEN b.trans_id IS NULL THEN 'delete'
         |            ELSE 'update' END AS change,
         |       a.amount AS old_amount, b.amount AS new_amount
         |FROM snapA a FULL JOIN snapB b ON a.trans_id = b.trans_id
         |WHERE a.trans_id IS NULL OR b.trans_id IS NULL
         |   OR a.amount IS DISTINCT FROM b.amount
         |   OR a.customer_id IS DISTINCT FROM b.customer_id
         |   OR a.event IS DISTINCT FROM b.event
         |   OR a.sku IS DISTINCT FROM b.sku
         |   OR a.device IS DISTINCT FROM b.device
         |   OR a.trans_datetime IS DISTINCT FROM b.trans_datetime
         |ORDER BY trans_id""") { (s, _) =>
      val chg = Envelope.changelog(s, fx).localCheckpoint() // both snapshots
      def snap(df: org.apache.spark.sql.DataFrame) =
        Materialize.snapshot(df).withColumn("amount", col("amount").cast("long"))
      val a = snap(chg.filter(col("metadata.timestamp") <= lit(timeTravelCut)))
      val b = snap(chg)
      val dataCols = Seq("customer_id", "event", "sku", "amount",
        "device", "trans_datetime")
      val diff = dataCols.map(c =>
        !(a(c) <=> b(c))).reduce(_ || _)
      a.join(b, a("trans_id") === b("trans_id"), "full_outer")
        .filter(a("trans_id").isNull || b("trans_id").isNull || diff)
        .select(coalesce(a("trans_id"), b("trans_id")).as("trans_id"),
          when(a("trans_id").isNull, "insert")
            .when(b("trans_id").isNull, "delete")
            .otherwise("update").as("change"),
          a("amount").as("old_amount"), b("amount").as("new_amount"))
        .orderBy("trans_id")
    },

    // ---- O32's batch twin, oracle-gated: late-arrival classification.
    //      An envelope is LATE if its event time is below the running
    //      high-water mark of everything that arrived before it (arrival
    //      order = (transaction-id, ts, trans_id), the shard's delivery
    //      order proxy; delay-0 watermark). This gates the same
    //      event-time-vs-watermark comparison the streaming pipeline's
    //      withWatermark drop applies — there spec-tested
    //      (StreamingSpec), here cell-checked against DuckDB. Scale: the
    //      fixture is ONE shard, so the high-water-mark window is a
    //      single ordered pass; a multi-shard deployment partitions the
    //      window by shard (watermarks are per-shard in Kinesis,
    //      reference cdk_stacks/kds.py:23-27) and takes the min across
    //      shards exactly as Spark's watermark tracker does. ----
    gated("q151_late_classify",
      s"""WITH src AS (
         |  SELECT data.trans_id AS tid, metadata."timestamp" AS ts,
         |         metadata."transaction-id" AS txid,
         |         metadata.operation AS op
         |  FROM $readJson WHERE $selectionSql),
         |w AS (SELECT op, ts,
         |             MAX(ts) OVER (ORDER BY txid, ts, tid
         |                           ROWS BETWEEN UNBOUNDED PRECEDING
         |                           AND 1 PRECEDING) AS hwm
         |      FROM src)
         |SELECT op,
         |       CAST(SUM(CASE WHEN hwm IS NOT NULL AND ts < hwm
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS late,
         |       CAST(SUM(CASE WHEN hwm IS NULL OR ts >= hwm
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS on_time
         |FROM w GROUP BY op ORDER BY op""") { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("txid", "ts", "tid")
        .rowsBetween(Window.unboundedPreceding, -1)
      Envelope.changelog(s, fx)
        .select(col("data.trans_id").as("tid"),
          col("metadata.timestamp").as("ts"),
          col("metadata.`transaction-id`").as("txid"),
          col("metadata.operation").as("op"))
        .withColumn("hwm", max(col("ts")).over(w))
        .groupBy("op")
        .agg(
          sum(when(col("hwm").isNotNull && col("ts") < col("hwm"), 1)
            .otherwise(0)).as("late"),
          sum(when(col("hwm").isNull || col("ts") >= col("hwm"), 1)
            .otherwise(0)).as("on_time"))
        .orderBy("op")
    },

    // ---- O35, stateful-operator form: the SAME flatMapGroupsWithState
    //      code the stream runs (StatefulMaterialize.deltas), executed in
    //      BATCH mode over the fixture — each key's changes fold through
    //      updateKey once, the surviving live winners must equal the
    //      window-form snapshot (q33) with the winner's provenance
    //      attached. This puts the state machine itself under the DuckDB
    //      oracle; StatefulMaterializeSpec keeps the incremental/eviction
    //      behaviors only a stream can show. ----
    gated("q108_stateful_snapshot",
      s"""SELECT trans_id, CAST(amount AS BIGINT) AS amount, ts, txid
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.amount AS amount,
         |         metadata."timestamp" AS ts,
         |         metadata."transaction-id" AS txid,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      import graft.streaming.StatefulMaterialize
      import graft.streaming.StatefulMaterialize.Change
      val changes = Envelope.changelog(s, fx)
        .select(col("data.trans_id").as("pk"),
          col("metadata.timestamp").as("ts"),
          col("metadata.`transaction-id`").as("txid"),
          col("metadata.operation").as("op"),
          col("data.amount").as("amount"),
          col("metadata.`schema-name`").as("sch"),
          col("metadata.`table-name`").as("tbl"))
        .as[Change](org.apache.spark.sql.Encoders.product)
      StatefulMaterialize.deltas(changes)
        .filter(col("live"))
        .select(col("pk").as("trans_id"),
          col("amount").cast("long").as("amount"),
          col("ts"), col("txid"))
        .orderBy("trans_id")
    },

    // ---- S4 object-mapping, outbound leg: re-shape the materialized
    //      snapshot into the Kinesis record envelope (map-record-to-record,
    //      reference dms_aurora_mysql_to_kinesis.py:108-117). Both engines
    //      render the identical compact JSON, so the string is gated.
    //      ignoreNullFields=false: Spark's to_json default DROPS null
    //      struct fields while DuckDB emits "field":null — event/device/
    //      amount are nullable per the reference DDL (README.md:198-208)
    //      and the fixture plants null-field rows, so the outbound wire
    //      format must render them. ----
    gated("q49_record_shaping",
      s"""SELECT trans_id,
         |       to_json(struct_pack(
         |         data := struct_pack(trans_id := trans_id,
         |                             customer_id := customer_id,
         |                             event := event, sku := sku,
         |                             amount := amount, device := device,
         |                             trans_datetime := trans_datetime),
         |         metadata := struct_pack("schema-name" := 'testdb',
         |                                 "table-name" := 'retail_trans',
         |                                 "partition-key-type" := 'primary-key')))::VARCHAR AS doc
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         data.amount AS amount, data.device AS device,
         |         data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      Materialize.snapshot(Envelope.changelog(s, fx))
        .select(col("trans_id"),
          to_json(struct(
            struct(col("trans_id"), col("customer_id"), col("event"),
              col("sku"), col("amount"), col("device"),
              col("trans_datetime")).as("data"),
            struct(lit("testdb").as("schema-name"),
              lit("retail_trans").as("table-name"),
              lit("primary-key").as("partition-key-type")).as("metadata")),
            Map("ignoreNullFields" -> "false"))
            .as("doc"))
        .orderBy("trans_id")
    },

    // ---- S4, rule-driven leg: DMS TRANSFORMATION rules applied as a
    //      DataFrame reshaper (cdc/Transformation.scala) instead of a
    //      hand-authored projection — rename-column, remove-column,
    //      add-prefix, then map-record-to-document, in rule order, with a
    //      locator-miss rule proving inertness. The rules compile to pure
    //      renames/projections (zero shuffle, zero row compute); the
    //      outbound JSON is gated like q49. CdcSpec pins rule precedence
    //      and the '%'-only locator grammar. ----
    gated("q105_transform_rules",
      s"""SELECT trans_id,
         |       to_json(struct_pack(trans_id := trans_id,
         |                           c_customer_id := customer_id,
         |                           event := event, sku := sku,
         |                           amount := amount,
         |                           ts := trans_datetime))::VARCHAR AS doc
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         data.amount AS amount, data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      import graft.cdc.Transformation
      import graft.cdc.Transformation.TransformationRule
      val shaped = Transformation.shape(
        Materialize.snapshot(Envelope.changelog(s, fx)),
        "testdb", "retail_trans", Seq(
          TransformationRule("column", "rename", "testdb", "retail_trans",
            "trans_datetime", "ts"),
          TransformationRule("column", "remove-column", "testdb",
            "retail_trans", "device"),
          TransformationRule("column", "add-prefix", "testdb",
            "retail_trans", "customer%", "c_"),
          // locator miss: a rule for another schema must be inert
          TransformationRule("column", "remove-column", "otherdb", "%", "%"),
          TransformationRule("record", "map-record-to-document", "testdb",
            "retail_trans")))
      shaped.select(col("_doc.trans_id").as("trans_id"),
          to_json(col("_doc"), Map("ignoreNullFields" -> "false")).as("doc"))
        .orderBy("trans_id")
    },

    // ---- S4, typed-rule leg: the DMS `change-data-type` and `add-column`
    //      rule actions (the rest of the column-rule surface next to the
    //      reference's object-mapping block,
    //      reference cdk_stacks/dms_aurora_mysql_to_kinesis.py:108-117).
    //      Rules apply IN ORDER over the previous rule's output, so the
    //      added columns see the POST-cast `amount` — the oracle encodes
    //      exactly that ordering. A locator-miss typed rule proves
    //      inertness. Everything compiles to one codegen'd projection:
    //      zero shuffle, plan identical to the hand-written select. ----
    gated("q116_transform_typed",
      s"""SELECT trans_id,
         |       CAST(amount AS BIGINT) AS amount,
         |       CAST(CAST(amount AS BIGINT) * 100 AS BIGINT) AS amount_cents,
         |       CAST(substr(trans_datetime, 1, 10) AS DATE) AS day
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.amount AS amount,
         |         data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      import graft.cdc.Transformation
      import graft.cdc.Transformation.TransformationRule
      val shaped = Transformation.shape(
        Materialize.snapshot(Envelope.changelog(s, fx)),
        "testdb", "retail_trans", Seq(
          TransformationRule("column", "change-data-type", "testdb",
            "retail_trans", "amount", dataType = "bigint"),
          TransformationRule("column", "add-column", "testdb",
            "retail_trans", value = "amount_cents",
            expression = "amount * 100", dataType = "bigint"),
          TransformationRule("column", "add-column", "testdb",
            "retail_trans", value = "day",
            expression = "substr(trans_datetime, 1, 10)", dataType = "date"),
          // locator miss: a typed rule for another schema must be inert
          TransformationRule("column", "change-data-type", "otherdb", "%",
            "%", dataType = "string")))
      shaped.select(col("trans_id"), col("amount"), col("amount_cents"),
          col("day"))
        .orderBy("trans_id")
    },

    // ---- S4, document-mapping leg: DMS `map-record-to-document` — the
    //      sibling object-mapping action to the reference's
    //      `map-record-to-record` rule (reference
    //      cdk_stacks/dms_aurora_mysql_to_kinesis.py:108-117) — re-nests
    //      the flat row into a CALLER-SHAPED document: the row image under
    //      `data`, provenance under `meta`, the partition key kept
    //      top-level (the shape a document/stream target actually wants,
    //      reference envelope README.md:460-479). Each document key is
    //      built by appending rules that share a `value`; a locator-miss
    //      document rule proves inertness. Still one codegen'd projection:
    //      struct construction is a metadata re-shape, zero shuffle, zero
    //      row compute beyond the JSON render. ----
    gated("q188_document_mapping",
      s"""SELECT CAST(trans_id AS BIGINT) AS pk,
         |       to_json(struct_pack(
         |         data := struct_pack(trans_id := trans_id,
         |                             customer_id := customer_id,
         |                             event := event, sku := sku,
         |                             amount := amount, device := device,
         |                             trans_datetime := trans_datetime),
         |         meta := struct_pack(schema_name := 'testdb',
         |                             table_name := 'retail_trans')))::VARCHAR AS doc
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         data.amount AS amount, data.device AS device,
         |         data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY pk""") { (s, _) =>
      import graft.cdc.Transformation
      import graft.cdc.Transformation.TransformationRule
      val docRule = TransformationRule("record", "map-record-to-document",
        "testdb", "retail_trans", _: String, _: String)
      val shaped = Transformation.shape(
        Materialize.snapshot(Envelope.changelog(s, fx)),
        "testdb", "retail_trans", Seq(
          // keep the partition key visible next to the document
          TransformationRule("column", "add-column", "testdb", "retail_trans",
            value = "pk", expression = "trans_id", dataType = "bigint"),
          // provenance attributes, then nested under `meta` by one
          // wildcard locator ("%name" matches exactly the two of them)
          TransformationRule("column", "add-column", "testdb", "retail_trans",
            value = "schema_name", expression = "'testdb'"),
          TransformationRule("column", "add-column", "testdb", "retail_trans",
            value = "table_name", expression = "'retail_trans'"),
          // the row image, key by key, appended into the same `data` doc
          docRule("trans_id", "data"), docRule("customer_id", "data"),
          docRule("event", "data"), docRule("sku", "data"),
          docRule("amount", "data"), docRule("device", "data"),
          docRule("trans_datetime", "data"),
          docRule("%name", "meta"),
          // locator miss: a document rule for another schema must be inert
          TransformationRule("record", "map-record-to-document", "otherdb",
            "%", "%", "other")))
      shaped.select(col("pk"),
          to_json(struct(col("data"), col("meta")),
            Map("ignoreNullFields" -> "false")).as("doc"))
        .orderBy("pk")
    },

    // ---- O35 companion: SCD type-2 history — every row version with its
    //      validity interval (valid_from = the change's timestamp,
    //      valid_to = the next change's, open for the current version) and
    //      a current-row flag. The standard warehouse consumption of a CDC
    //      changelog; one window over the PK partition, same single
    //      exchange as the snapshot. ----
    gated("q53_scd2_history",
      s"""SELECT trans_id, txid, op, amount, valid_from,
         |       COALESCE(valid_to, '9999-12-31') AS valid_to,
         |       CAST(CASE WHEN valid_to IS NULL AND op <> 'delete'
         |                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM (
         |  SELECT data.trans_id AS trans_id,
         |         metadata."transaction-id" AS txid,
         |         metadata.operation AS op,
         |         CAST(data.amount AS BIGINT) AS amount,
         |         metadata."timestamp" AS valid_from,
         |         LEAD(metadata."timestamp") OVER (
         |           PARTITION BY data.trans_id
         |           ORDER BY metadata."timestamp", metadata."transaction-id")
         |           AS valid_to
         |  FROM $readJson
         |  WHERE $selectionSql)
         |ORDER BY trans_id, valid_from, txid""") { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("data.trans_id"))
        .orderBy(col("metadata.timestamp"), col("metadata.`transaction-id`"))
      Envelope.changelog(s, fx)
        .select(col("data.trans_id").as("trans_id"),
          col("metadata.`transaction-id`").as("txid"),
          col("metadata.operation").as("op"),
          col("data.amount").cast("long").as("amount"),
          col("metadata.timestamp").as("valid_from"),
          lead(col("metadata.timestamp"), 1).over(w).as("valid_to"))
        .select(col("trans_id"), col("txid"), col("op"), col("amount"),
          col("valid_from"),
          coalesce(col("valid_to"), lit("9999-12-31")).as("valid_to"),
          when(col("valid_to").isNull && col("op") =!= "delete", 1L)
            .otherwise(0L).as("is_current"))
        .orderBy("trans_id", "valid_from", "txid")
    },

    // ---- O36 (D-Q34): op statistics over ALL data records (both schemas/
    //      tables — the observability view sees the whole stream) ----
    gated("q34_cdc_op_stats",
      s"""SELECT metadata."schema-name" AS sch, metadata."table-name" AS tbl,
         |       metadata.operation AS op, CAST(COUNT(*) AS BIGINT) AS c
         |FROM $readJson
         |WHERE metadata."record-type" = 'data'
         |GROUP BY sch, tbl, op
         |ORDER BY sch, tbl, op""") { (s, _) =>
      Materialize.opStats(Envelope.parse(s, fx))
        .orderBy("sch", "tbl", "op")
    },

    // ---- O35/O36 companion: table validation / reconciliation — the
    //      DMS-table-validation role. Two INDEPENDENTLY computed
    //      snapshots (window-form row_number vs aggregate-form max_by —
    //      different physical plans, same declared semantics) are
    //      reduced to per-key digests and reconciled to per-bucket
    //      counts + content checksums; the oracle recomputes the bucket
    //      checksums from ITS OWN snapshot, so a drift in either
    //      materialization path (or in the digest) flips the gate.
    //      n_mismatch/n_missing/n_extra pinned 0. Digest = poly-31 mod
    //      1e9+7 fold (q44's cross-engine hash) over the concatenation
    //      of per-column md5 hex renderings (NULL → 32 zeros) — fixed
    //      width per column, so NULL-skips and delimiter forgery cannot
    //      make different rows digest equal. Checksum = DECIMAL(38,0)
    //      sum of the digests (a BIGINT sum overflows past ~1.8e10 rows
    //      per bucket — the 100 TB design point), rendered VARCHAR at
    //      the boundary so wide-decimal surface renderings can never
    //      diverge across engine versions. ----
    gated("q93_reconcile",
      s"""WITH snap AS (
         |  SELECT trans_id, customer_id, event, sku, amount, device, trans_datetime
         |  FROM (
         |    SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |           data.event AS event, data.sku AS sku, data.amount AS amount,
         |           data.device AS device, data.trans_datetime AS trans_datetime,
         |           metadata.operation AS op,
         |           ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |               ORDER BY metadata."timestamp" DESC,
         |                        metadata."transaction-id" DESC) AS rn
         |    FROM $readJson
         |    WHERE $selectionSql)
         |  WHERE rn = 1 AND op <> 'delete'),
         |d AS (SELECT trans_id % 4 AS bucket,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(list_filter(string_split(
         |            COALESCE(md5(CAST(trans_id AS VARCHAR)), repeat('0', 32))
         |              || COALESCE(md5(customer_id), repeat('0', 32))
         |              || COALESCE(md5(event), repeat('0', 32))
         |              || COALESCE(md5(sku), repeat('0', 32))
         |              || COALESCE(md5(CAST(amount AS VARCHAR)), repeat('0', 32))
         |              || COALESCE(md5(device), repeat('0', 32))
         |              || COALESCE(md5(trans_datetime), repeat('0', 32)), ''),
         |            x -> x <> ''), x -> CAST(ascii(x) AS BIGINT))),
         |          (acc, x) -> (acc * 31 + x) % 1000000007) AS dg
         |      FROM snap)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(CAST(SUM(dg) AS DECIMAL(38,0)) AS VARCHAR) AS checksum,
         |       CAST(0 AS BIGINT) AS n_mismatch,
         |       CAST(0 AS BIGINT) AS n_missing,
         |       CAST(0 AS BIGINT) AS n_extra
         |FROM d GROUP BY bucket ORDER BY bucket""") { (s, _) =>
      val log = Envelope.changelog(s, fx)
      val cols = Seq("trans_id", "customer_id", "event", "sku",
        "amount", "device", "trans_datetime")
      Reconcile.reconcile(Materialize.snapshot(log),
        Materialize.snapshotAgg(log), "trans_id", cols, buckets = 4)
    },

    // ---- S1 `full-load-and-cdc` (reference
    //      dms_aurora_mysql_to_kinesis.py:145), batch form: the Spark
    //      side materializes the snapshot AT a mid-fixture cut, envelope-
    //      wraps it as full-load records, and merges it with the FULL
    //      changelog — every record at or before the cut is a boundary
    //      overlap the handover must suppress, everything after must win.
    //      The oracle computes the plain one-shot materialization of the
    //      whole changelog, so the two must agree byte-for-byte: any
    //      double-apply (stale image beats seed), boundary loss (post-cut
    //      change lost to seed) or tombstone resurrection flips the hash.
    //      The cut is EXACTLY an existing record's timestamp, pinning the
    //      tie rule: a real change at the cut instant out-ranks the seed
    //      via transaction-id (-1 on the seed), and re-applies an image
    //      the snapshot already contains — idempotent by construction. ----
    gated("q100_bootstrap_handover",
      s"""SELECT trans_id, customer_id, event, sku, amount, device, trans_datetime
         |FROM (
         |  SELECT data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         CAST(data.amount AS BIGINT) AS amount,
         |         data.device AS device, data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (PARTITION BY data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJson
         |  WHERE $selectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY trans_id""") { (s, _) =>
      val loadTs = "2022-03-14T14:01:12.193068Z" // a real record's stamp
      val log = Envelope.changelog(s, fx)
      val snapshotAtCut =
        Materialize.snapshot(log.filter(col("metadata.timestamp") <= loadTs))
      Bootstrap.handover(snapshotAtCut, log, loadTs)
        .withColumn("amount", col("amount").cast("long"))
        .orderBy("trans_id")
    },

    // ---- S3 multi-table selection, observability leg: per-table op
    //      stats over BOTH shard fixtures under the wildcard rule list —
    //      include testdb.retail_trans% (catches both shards AND the
    //      planted retail_trans_eu_backup trap), exclude %backup (removes
    //      the trap; precedence is the thing under test). other_table /
    //      otherdb / control noise must all fall out of the include. ----
    gated("q101_multitable_op_stats",
      s"""SELECT metadata."schema-name" AS sch, metadata."table-name" AS tbl,
         |       metadata.operation AS op, CAST(COUNT(*) AS BIGINT) AS c
         |FROM $readJsonBoth
         |WHERE $wildcardSelectionSql
         |GROUP BY sch, tbl, op
         |ORDER BY sch, tbl, op""") { (s, _) =>
      Materialize.opStats(
        Envelope.parseLines(s.read.text(fx, fx2))
          .filter(Envelope.selection(wildcardRules)))
        .orderBy("sch", "tbl", "op")
    },

    // ---- q151's SHARDED form: per-shard watermarks. The q151 comment
    //      promises "a multi-shard deployment partitions the window by
    //      shard" — this gates that exact shape over BOTH shard
    //      fixtures: the high-water mark window partitions by
    //      table-name (the shard key), so each shard classifies its own
    //      arrival order in parallel — no single-task global window
    //      anywhere in the plan. ----
    gated("q151b_late_classify_sharded",
      s"""WITH src AS (
         |  SELECT metadata."table-name" AS shard, data.trans_id AS tid,
         |         metadata."timestamp" AS ts,
         |         metadata."transaction-id" AS txid,
         |         metadata.operation AS op
         |  FROM $readJsonBoth WHERE $wildcardSelectionSql),
         |w AS (SELECT shard, op, ts,
         |             MAX(ts) OVER (PARTITION BY shard ORDER BY txid, ts, tid
         |                           ROWS BETWEEN UNBOUNDED PRECEDING
         |                           AND 1 PRECEDING) AS hwm
         |      FROM src)
         |SELECT shard, op,
         |       CAST(SUM(CASE WHEN hwm IS NOT NULL AND ts < hwm
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS late,
         |       CAST(SUM(CASE WHEN hwm IS NULL OR ts >= hwm
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS on_time
         |FROM w GROUP BY shard, op ORDER BY shard, op""") { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("txid", "ts", "tid")
        .rowsBetween(Window.unboundedPreceding, -1)
      Envelope.parseLines(s.read.text(fx, fx2))
        .filter(Envelope.selection(wildcardRules))
        .select(col("metadata.`table-name`").as("shard"),
          col("data.trans_id").as("tid"),
          col("metadata.timestamp").as("ts"),
          col("metadata.`transaction-id`").as("txid"),
          col("metadata.operation").as("op"))
        .withColumn("hwm", max(col("ts")).over(w))
        .groupBy("shard", "op")
        .agg(
          sum(when(col("hwm").isNotNull && col("ts") < col("hwm"), 1)
            .otherwise(0)).as("late"),
          sum(when(col("hwm").isNull || col("ts") >= col("hwm"), 1)
            .otherwise(0)).as("on_time"))
        .orderBy("shard", "op")
    },

    // ---- S3 multi-table selection, materialization leg: one wildcard-
    //      selected stream fans out into per-(schema, table, pk) serving
    //      rows. The shards REUSE trans_id values 1..60, so a
    //      materializer keyed on the pk alone would collapse rows across
    //      tables — the composite window key is what's gated here. ----
    gated("q102_multitable_materialize",
      s"""SELECT sch, tbl, trans_id, customer_id, event, sku, amount, device, trans_datetime
         |FROM (
         |  SELECT metadata."schema-name" AS sch, metadata."table-name" AS tbl,
         |         data.trans_id AS trans_id, data.customer_id AS customer_id,
         |         data.event AS event, data.sku AS sku,
         |         CAST(data.amount AS BIGINT) AS amount,
         |         data.device AS device, data.trans_datetime AS trans_datetime,
         |         metadata.operation AS op,
         |         ROW_NUMBER() OVER (
         |             PARTITION BY metadata."schema-name",
         |                          metadata."table-name", data.trans_id
         |             ORDER BY metadata."timestamp" DESC,
         |                      metadata."transaction-id" DESC) AS rn
         |  FROM $readJsonBoth
         |  WHERE $wildcardSelectionSql)
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY sch, tbl, trans_id""") { (s, _) =>
      Materialize.snapshotByTable(
        Envelope.parseLines(s.read.text(fx, fx2))
          .filter(Envelope.selection(wildcardRules)).drop("value"))
        .withColumn("amount", col("amount").cast("long"))
        .orderBy("sch", "tbl", "trans_id")
    },

    // ---- Incremental JOIN-VIEW maintenance, oracle-gated
    //      (streaming/JoinViewMaintenance — the IVM kernel the
    //      versioned-state shelf serves enriched queries from): two
    //      deterministic delta batches fold through the ACTUAL kernel —
    //      batch 0 seeds facts (orders, keyed o_orderkey, fk o_custkey)
    //      and dims (customer, keyed c_custkey); batch 1 updates every
    //      %5 order (+1000.00), deletes every %7 order, re-payloads
    //      every %4==1 customer, deletes every %4==0 customer — and the
    //      served view aggregates per dim payload. The oracle computes
    //      the FINAL last-write-wins states directly in SQL and joins
    //      one-shot: incremental maintenance must be indistinguishable
    //      from recompute. JoinViewSpec pins the per-batch mechanics
    //      (fan-out, re-pointing, retries); this pins the end state
    //      cross-engine at data scale. Deletes-beat-updates on the
    //      %35 overlap keys is part of the contract. ----
    gated("q187_join_view_ivm",
      """WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck,
        |             CAST(trunc(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS cents
        |           FROM orders),
        |lf AS (SELECT ok, ck,
        |         CASE WHEN ok % 7 <> 0 AND ok % 5 = 0
        |              THEN cents + 100000 ELSE cents END AS cents
        |       FROM o
        |       WHERE ok % 7 <> 0 AND (ok % 5 = 0 OR ok % 3 <> 0)),
        |rf AS (SELECT c_custkey AS ck,
        |         CASE WHEN c_custkey % 4 = 1 THEN c_mktsegment || '_v2'
        |              ELSE c_mktsegment END AS seg
        |       FROM customer WHERE c_custkey % 4 <> 0)
        |SELECT rf.seg AS segment, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(lf.cents) AS BIGINT) AS sum_cents
        |FROM lf JOIN rf ON lf.ck = rf.ck
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      import graft.streaming.JoinViewMaintenance
      val o = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
        col("o_custkey").as("ck"),
        expr("CAST(CAST(o_totalprice AS DOUBLE) * 100 AS BIGINT)").as("cents"))
      val c = Tables.customer(s, d).select(col("c_custkey").as("ck"),
        col("c_mktsegment").as("seg"))
      val l1 = o.filter(col("ok") % 3 =!= 0).select(
        col("ok").cast("string").as("pk"), col("ck").cast("string").as("fk"),
        col("cents").cast("string").as("payload"), lit("upsert").as("op"))
      val r1 = c.select(col("ck").cast("string").as("pk"),
        col("seg").as("payload"), lit("upsert").as("op"))
      val l2 = o.filter(col("ok") % 7 === 0 || col("ok") % 5 === 0)
        .select(col("ok").cast("string").as("pk"),
          col("ck").cast("string").as("fk"),
          (col("cents") + 100000).cast("string").as("payload"),
          when(col("ok") % 7 === 0, "delete").otherwise("upsert").as("op"))
      val r2 = c.filter(col("ck") % 4 === 0 || col("ck") % 4 === 1)
        .select(col("ck").cast("string").as("pk"),
          concat(col("seg"), lit("_v2")).as("payload"),
          when(col("ck") % 4 === 0, "delete").otherwise("upsert").as("op"))
      val dir = GatedQuery.indexScratch(d, "join_view_q187")
      JoinViewMaintenance.update(dir, l1, r1, 0L)
      JoinViewMaintenance.update(dir, l2, r2, 1L)
      JoinViewMaintenance.view(s, dir)
        .groupBy(col("right_payload").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(col("left_payload").cast("long")).as("sum_cents"))
        .orderBy("segment")
    },

    // ---- S12, rotated-archive leg: the Firehose `index_rotation_period`
    //      options (reference cdk_stacks/firehose.py:149) as ARCHIVE
    //      LAYOUTS, gated through the disk round trip — each leg writes
    //      the fixture batch through sinkBatch under OneHour / OneDay
    //      rotation, then reads the archive BACK and aggregates on the
    //      `rotation` PARTITION COLUMN (partition-discovered from the
    //      directory names, so what is gated is the on-disk layout
    //      itself, not an in-plan projection). The oracle derives the
    //      same calendar keys from the envelope timestamp's fixed-width
    //      ISO-8601 prefix (UTC on both engines — the same invariant the
    //      LWW ordering rides). StreamingSpec pins the remaining periods
    //      (OneWeek/OneMonth) and pruning; this puts the two
    //      operationally-common rotations under the cross-engine gate. ----
    gated("q189_rotation_layout",
      s"""WITH sel AS (SELECT metadata."timestamp" AS ts
         |            FROM $readJson WHERE $selectionSql)
         |SELECT 'hour' AS period,
         |       substr(ts, 1, 10) || '-' || substr(ts, 12, 2) AS rotation,
         |       CAST(COUNT(*) AS BIGINT) AS c
         |FROM sel GROUP BY 2
         |UNION ALL
         |SELECT 'day' AS period, substr(ts, 1, 10) AS rotation,
         |       CAST(COUNT(*) AS BIGINT) AS c
         |FROM sel GROUP BY 2
         |ORDER BY period, rotation""") { (s, d) =>
      import graft.streaming.CdcStreamPipeline
      import graft.streaming.CdcStreamPipeline.{Rotation, Sinks}
      val batch = CdcStreamPipeline.parseLines(s.read.text(fx))
        .filter(!Envelope.corrupt && col("event_ts").isNotNull)
      def leg(rot: Rotation, label: String) = {
        val root = GatedQuery.indexScratch(d, s"rotation_$label")
        val sinks = Sinks(s"$root/serving", s"$root/archive",
          s"$root/error", s"$root/checkpoint")
        CdcStreamPipeline.sinkBatch(sinks, rotation = rot)(batch, 0L)
        s.read.parquet(sinks.archive)
          .select(lit(label).as("period"),
            col("rotation").cast("string").as("rotation"))
      }
      leg(Rotation.OneHour, "hour").unionByName(leg(Rotation.OneDay, "day"))
        .groupBy("period", "rotation").agg(count(lit(1)).as("c"))
        .orderBy("period", "rotation")
    }
  )
}
