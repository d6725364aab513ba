package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-provided parquet tables (TESTDATA.md, FIXTURES.md §4)
  * plus the checked-in CDC envelope fixture (FIXTURES.md §3).
  *
  * Parquet is self-describing, so schemas come from footers — never inferred
  * from data (mirrors the reference's fixed, externally-declared schema,
  * reference README.md:198-208). Column pruning / predicate pushdown happen
  * downstream via Catalyst; loaders stay plain `spark.read.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long via the
    * legacy conf, then floor-divide to µs — the data is µs-granular (ns
    * component is 0, verified against DuckDB), so no information is lost
    * and both engines see identical timestamps. Integer `div` (not `/`)
    * because epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Session-level conf, set once (idempotent guard keeps the loader from
    // re-mutating shared session state on every call).
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Name → loader dispatch, owned by the catalog: generic tooling
    * (bench warmup, smoke sweeps) iterating [[names]] must go through
    * here so a table with a non-generic loader (events' nanos-conf
    * read) is opened the way real queries open it — a bare [[load]]
    * would throw on such footers and silently skip the table. */
  def loader(name: String): (SparkSession, String) => DataFrame =
    if (name == "events") events else (s, d) => load(s, d, name)

  /** Path of the deterministic CDC envelope fixture (FIXTURES.md §3); both
    * this engine and the DuckDB oracle read the same file. */
  val cdcFixturePath = "/root/repo/fixtures/cdc_retail_trans.jsonl"

  /** Second-table shard fixture (FIXTURES.md §3b) — multi-table wildcard
    * selection (S3); key range deliberately collides with the main
    * fixture's so per-table materialization is forced to key on
    * (schema, table, pk). */
  val cdcShardFixturePath = "/root/repo/fixtures/cdc_retail_trans_eu.jsonl"
}
