package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained JOIN view — the sixth versioned-state tenant
  * (rollups, HLL sketches, Misra-Gries, quantile samples, dup-cluster
  * labels, now a two-relation join), and the capability the others
  * don't cover: every prior tenant maintains an AGGREGATE of one
  * stream; this maintains the enriched fact⋈dim relation itself under
  * upserts AND deletes on both sides (reference analog: the serving
  * store answers enriched queries — `README.md` S9's OpenSearch
  * documents carry joined attributes — without re-joining the lake per
  * query).
  *
  * Shape: the classic FK join. The left relation is keyed by `pk` and
  * carries a foreign key `fk`; the right relation is keyed by its own
  * `pk`, which IS the join key (unique dim key). The view V = L ⋈ R is
  * therefore keyed by the left `pk` alone — each fact row joins at most
  * one dim row — which is what makes keyed incremental maintenance
  * exact:
  *
  *   - ΔL (upsert or delete of a fact) touches exactly the view rows of
  *     its own pks.
  *   - ΔR (upsert or delete of a dim row) touches exactly the facts
  *     pointing at it: `L_state ⋈ keys(ΔR)` — the fk fan-out, found by
  *     one join against current left state, never a view rescan.
  *   - An fk UPDATE on a fact re-points it: its pk is in keys(ΔL), so
  *     its view row recomputes against the NEW dim, and the old
  *     pairing dies with the overwrite.
  *
  * Per batch: V' = (V ∖ touched) ∪ (L'|touched ⋈ R'), with L'/R' the
  * last-write-wins merges. Cost per trigger is |ΔL| + fanout(ΔR) for
  * the recompute plus one state-sized anti-join — the same O(state)
  * per-trigger bound as the serving merge (SCALE.md), with the same
  * 100 TB exit: key-partitioned state and a partition-pruned merge.
  * Never a full view recompute, and never the |L|·|R| re-join.
  *
  * Payloads travel as opaque strings (caller renders JSON or concat —
  * the kernel is schema-agnostic); batches must be pre-collapsed to one
  * row per key (`Materialize.latestPerKey` discipline, like the serving
  * merge). Exactly-once under batch retry via the shared versioned
  * staging+rename commit: the fold is NOT idempotent (an anti-join
  * against torn state would drop rows), so a retried batch whose
  * version landed is a no-op. JoinViewSpec pins incremental == one-shot
  * join parity across multi-batch histories, delete propagation on both
  * sides, fk re-pointing, and the retry guard. */
object JoinViewMaintenance {

  /** Unified single-relation state (one atomic commit per batch):
    * rel = 'L' (k1 = pk, k2 = fk, pay1 = left payload),
    * rel = 'R' (k1 = join key, pay1 = right payload),
    * rel = 'V' (k1 = pk, k2 = fk, pay1 = left, pay2 = right). */
  private val stateCols =
    Seq(col("rel"), col("k1"), col("k2"), col("pay1"), col("pay2"))

  private def asL(df: DataFrame): DataFrame =
    df.select(lit("L").as("rel"), col("pk").cast("string").as("k1"),
      col("fk").cast("string").as("k2"), col("payload").as("pay1"),
      lit(null).cast("string").as("pay2"))

  private def asR(df: DataFrame): DataFrame =
    df.select(lit("R").as("rel"), col("pk").cast("string").as("k1"),
      lit(null).cast("string").as("k2"), col("payload").as("pay1"),
      lit(null).cast("string").as("pay2"))

  /** Last-write-wins merge of one keyed side: batch rows overwrite state
    * rows with the same key; `op = 'delete'` rows tombstone out. */
  private def lww(state: DataFrame, batch: DataFrame,
                  toState: DataFrame => DataFrame): DataFrame = {
    val keys = batch.select(col("pk").cast("string").as("bk")).distinct()
    state.join(keys, state("k1") === keys("bk"), "left_anti")
      .unionByName(toState(batch.filter(col("op") =!= "delete")))
  }

  /** Fold one micro-batch into the join-view state at `dir`.
    *
    * `batchL(pk, fk, payload, op)`; `batchR(pk, payload, op)` where the
    * right `pk` is the join key; `op` ∈ {upsert, delete}; one row per
    * key per batch (pre-collapsed). Either side may be empty but must
    * carry its schema. */
  def update(dir: String, batchL: DataFrame, batchR: DataFrame,
             batchId: Long): Unit = {
    val spark = batchL.sparkSession
    if (VersionedState.committed(spark, dir, batchId)) return
    val emptyState = asL(batchL.limit(0))
    val (l0, r0, v0) = VersionedState.latestSnapshot(spark, dir) match {
      case Some(st) => (st.filter(col("rel") === "L"),
        st.filter(col("rel") === "R"), st.filter(col("rel") === "V"))
      case None => (emptyState, emptyState, emptyState)
    }
    val newL = lww(l0, batchL, asL)
    val newR = lww(r0, batchR, asR)
    // touched view keys: every fact key in ΔL, plus every CURRENT fact
    // pointing at a dim key in ΔR (fan-out via one join on fk)
    val rKeys = batchR.select(col("pk").cast("string").as("rk")).distinct()
    val viaR = l0.join(rKeys, l0("k2") === rKeys("rk"))
      .select(col("k1").as("tk"))
    val touched = batchL.select(col("pk").cast("string").as("tk"))
      .unionByName(viaR).distinct()
    val vKeep = v0.join(touched, v0("k1") === touched("tk"), "left_anti")
    val vNew = newL.join(touched, newL("k1") === touched("tk"))
      .select(col("k1"), col("k2"), col("pay1").as("lp"))
      .join(newR.select(col("k1").as("rk"), col("pay1").as("rp")),
        col("k2") === col("rk"))
      .select(lit("V").as("rel"), col("k1"), col("k2"),
        col("lp").as("pay1"), col("rp").as("pay2"))
    VersionedState.commit(
      newL.select(stateCols: _*)
        .unionByName(newR.select(stateCols: _*))
        .unionByName(vKeep.select(stateCols: _*))
        .unionByName(vNew.select(stateCols: _*)),
      dir, batchId)
  }

  /** Newest committed view `(pk, fk, left_payload, right_payload)`. */
  def view(spark: SparkSession, dir: String): DataFrame =
    VersionedState.latestSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no join-view state under $dir"))
      .filter(col("rel") === "V")
      .select(col("k1").as("pk"), col("k2").as("fk"),
        col("pay1").as("left_payload"), col("pay2").as("right_payload"))

  /** Current left/right side snapshots (for parity checks and reseeds). */
  def sides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val st = VersionedState.latestSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no join-view state under $dir"))
    (st.filter(col("rel") === "L")
      .select(col("k1").as("pk"), col("k2").as("fk"),
        col("pay1").as("payload")),
      st.filter(col("rel") === "R")
        .select(col("k1").as("fk"), col("pay1").as("payload")))
  }
}
