package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-level) deduplication, SemDeDup-style: cluster the
  * corpus with the IVF coarse quantizer, then deduplicate WITHIN each
  * cell — a document is dropped when a lower-id document in the same cell
  * sits above the cosine threshold. Near-identical embeddings land in the
  * same cell (the same property that makes IVF search work), so the
  * quadratic pair work is bounded by cell size, never corpus size:
  * |corpus|²/nlist pairs in expectation instead of |corpus|².
  *
  * The survivor rule is deterministic and non-iterative — x survives iff
  * NO smaller-id same-cell neighbor reaches `tau` — so the result is a
  * pure function of (corpus, centroids, tau), reproducible across runs
  * and engines (q107 gates the rule brute-force on a planted block).
  * Cross-cell near-duplicates are the method's documented approximation;
  * raise nlist for tighter cells, or run the MinHash/sign-LSH paths
  * ([[graft.text.NearDup]], [[Ann]]) when exact recall matters.
  */
object SemDedup {

  /** Survivors of cell-local semantic dedup over (idCol, vecCol), as
    * (sd_id, cell). One broadcast-assign pass + one self-join that
    * shuffles on the cell key only. */
  def survivors(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: Seq[Seq[Double]], tau: Double): DataFrame = {
    val cells = Ivf.assignCells(
      corpus.select(col(idCol).as("sd_id"), col(vecCol).as("sv"),
        VectorOps.l2(col(vecCol)).as("sn"), Ivf.unit(col(vecCol)).as("vu")),
      "sd_id", "vu", centroids, keep = Seq("sv", "sn"))
      // both sides of the self-join read this relation — materialize once
      .localCheckpoint()
    val dominators = cells.select(col("sd_id").as("y_id"),
      col("cell").as("y_cell"), col("sv").as("yv"), col("sn").as("yn"))
    cells.join(dominators,
        col("cell") === col("y_cell") && col("y_id") < col("sd_id") &&
          VectorOps.dot(col("sv"), col("yv")) / (col("sn") * col("yn")) >= tau,
        "left_anti")
      .select(col("sd_id"), col("cell"))
  }
}
