package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance surface for the persisted BM25 index family
  * (q197/q218's layout): `dir/post` — positional postings through
  * [[Phrase]] — plus two stat sidecars, `dir/docs` (doc_id, dl) and
  * the one-row `dir/corpus` (n, sumdl). Engine-side counterpart of the
  * reference serving store's native delete-by-`_id` (README.md's
  * OpenSearch DELETE walkthrough): deleting a document must remove its
  * postings AND shift every score, because N, Σdl and the per-term df
  * all change. */
object Bm25Index {

  /** Right-to-be-forgotten across the whole BM25 layout:
    *   1. victim postings rewrite out of `dir/post` ([[Phrase.forget]]
    *      — victim buckets only, marker-fenced);
    *   2. the KB-scale dl sidecar filter-rewrites in place (pinned via
    *      localCheckpoint first — overwrite must not read its own
    *      target lazily);
    *   3. `dir/corpus` recomputes from the cleaned sidecar — the same
    *      derivation ingest uses, so scores afterward are exactly an
    *      index built without the victims.
    * Sidecars are derivable state: dl = per-doc posting count, so a
    * crash between 1 and 3 is recoverable by re-running forget (the
    * postings side is idempotent; the sidecar filter re-runs) or, in
    * the worst case, rebuilding both sidecars from `dir/post`. */
  def forget(spark: SparkSession, dir: String, ids: Seq[Long]): Seq[String] = {
    // COMPOSITION fence at the family root: the postings step clears
    // its own marker (under dir/post) when it commits, so a crash
    // during or between the sidecar overwrites would otherwise leave a
    // clean-looking index whose scores use stale N/Σdl — the probe
    // checks THIS root before reading any of the three pieces
    graft.operators.IndexForget.fence(spark, dir)
    val rewritten = Phrase.forget(spark, s"$dir/post", ids)
    // dl sidecar through the flat SWAP (tmp commits before the live dir
    // retires): an in-place overwrite could crash half-written, and the
    // healing re-run would then filter the PARTIAL relation — silently
    // losing survivors' dl rows and shifting every score
    graft.operators.IndexForget.forgetFlat(spark, s"$dir/docs",
      col("doc_id").isin(ids: _*))
    // corpus stats are derived from the (now committed) sidecar — an
    // in-place overwrite is safe here: a crash mid-write re-derives
    // from docs on the healing re-run
    spark.read.parquet(s"$dir/docs")
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .write.mode("overwrite").parquet(s"$dir/corpus")
    graft.operators.IndexForget.unfence(spark, dir)
    rewritten
  }
}
