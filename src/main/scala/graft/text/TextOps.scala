package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O38 + north-star text analysis over the `documents` table: tokenization,
  * quality metrics, language-ID scoring, token counting, and document
  * fingerprinting — all pure Catalyst expressions (HOFs over the token
  * array), no UDFs, so everything stays inside whole-stage codegen and
  * scales as a stateless per-row map (zero shuffles until the caller
  * aggregates).
  */
object TextOps {

  /** Whitespace tokenizer: lowercase, split on single spaces, drop empties
    * (documents.text is space-separated lowercase words, FIXTURES.md §4). */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct word trigrams ("shingles") — the unit for n-gram Jaccard and
    * MinHash. Caller must guard size >= 3. */
  def trigrams(toks: Column): Column = array_distinct(trigramsAll(toks))

  /** ALL word trigrams in order, duplicates kept — the unit for intra-doc
    * repetition measurement (a repeated phrase must count every
    * occurrence). Caller must guard size >= 3. */
  def trigramsAll(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))

  /** Exact Jaccard similarity of two pre-distinct shingle arrays, in
    * DOUBLE (|A∩B| / |A∪B| — integer sizes, so cross-engine exact). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Sum of token lengths (left fold, INT arithmetic). */
  def totalLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Count of tokens contained in a fixed marker set — the building block
    * of the language-ID heuristic (stopword hit counting). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*))).cast("long")

  /** Polynomial rolling hash over the document's characters, mod 1e9+7 —
    * a deterministic 31-ary fingerprint both engines can fold identically
    * (left fold from 0; each step stays far below 2^63, so no overflow on
    * either engine). */
  def fingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch).cast("long")) % 1000000007L)

  /** Winnowing fingerprint RELATION (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03) — `(id, fp)` distinct selections per document: slide a
    * window of `w` positions over the per-document gram-hash sequence,
    * keep each window's minimum. Guarantees: any shared gram run
    * spanning a full window yields ≥ 1 shared fingerprint; expected
    * density 2/(w+1). A sequence shorter than one window winnows to its
    * global minimum — one fingerprint, never zero.
    *
    * Formulated as posexplode + rows-frame window min, NOT a nested
    * array HOF: CollapseProject inlines a gram-hash column into every
    * lambda reference, so the HOF form re-evaluates the whole per-gram
    * hash pipeline once PER WINDOW START — O(grams² · chars) per
    * document (measured: 90 s for 300 fifty-token docs). The Generate
    * boundary pins ONE evaluation per document; the frame min streams.
    * Scale: one shuffle on the doc id (the exchange any per-doc
    * aggregation pays), frame width w per row after it. */
  def winnowRel(docs: org.apache.spark.sql.DataFrame, idCol: String,
                gramHashes: Column, w: Int): org.apache.spark.sql.DataFrame =
    winnowRelPos(docs, idCol, gramHashes, w)
      .select(col("id"), col("fp"))
      .distinct()

  /** Position-carrying winnow selections `(id, pos, fp)` — one row per
    * WINDOW START (`pos` = 1-based gram index of the window's first
    * gram), `fp` = that window's min gram hash. NOT deduplicated: a
    * fingerprint selected by several windows appears at each start —
    * the shape copy LOCALIZATION needs (a matched run's extent is the
    * min/max over the shared selections' positions), where the deduped
    * [[winnowRel]] only answers set membership. Same plan discipline:
    * posexplode + ONE doc-id window exchange, never a nested HOF. */
  def winnowRelPos(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   gramHashes: Column, w: Int)
      : org.apache.spark.sql.DataFrame = {
    require(w >= 1, s"winnow: window must be >= 1, got $w")
    import org.apache.spark.sql.expressions.Window
    val pe = docs.select(col(idCol).as("id"),
      posexplode(gramHashes).as(Seq("pos", "h")))
    val frame = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val whole = Window.partitionBy("id")
    pe.withColumn("n", count(lit(1)).over(whole))
      .withColumn("m", min(col("h")).over(frame))
      // window starts only (pos ≤ n−w); a doc shorter than one window
      // keeps exactly its pos-0 row, whose clipped frame is the whole doc
      .filter(col("pos") <= col("n") - w ||
        (col("n") < w && col("pos") === 0))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        col("m").as("fp"))
  }
}
