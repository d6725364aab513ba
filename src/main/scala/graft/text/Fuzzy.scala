package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy term matching by delete-neighborhood blocking (the SymSpell
  * construction) — the engine-side counterpart of the reference serving
  * store's fuzzy query surface (OpenSearch `fuzziness` matching over the
  * indexed documents, cdk_stacks/ops.py). Two terms within edit
  * distance 1 ALWAYS share a key in each other's delete neighborhood
  * `D(s) = {s} ∪ {s minus one char}`:
  *   - equal terms share `s` itself;
  *   - a substitution at position i makes both i-deletes equal;
  *   - an insertion/deletion makes one side's i-delete equal the other
  *     side's identity key.
  * So candidates come from an EQUI-join on delete keys — |term|+1 short
  * keys per distinct term, uniform shuffle — and the exact
  * `levenshtein ≤ 1` filter runs on candidates only, never |A|×|B|.
  *
  * Plan shape at 100 TB: both sides reduce to their DISTINCT vocabularies
  * first (fuzzy matching is a property of terms, not occurrences), keys
  * explode map-side, one equi-join, exact rerank on the collision set.
  * The one skew to know about: single-char terms contribute the empty
  * delete key, colliding all of them — bounded by alphabet size, and the
  * exact filter discards false pairs.
  */
object Fuzzy {

  /** The distance-1 delete neighborhood of a term, as an array column:
    * the term itself plus every one-char deletion (deduplicated — "aa"
    * deletes to "a" twice). */
  def deleteKeys(term: Column): Column =
    array_distinct(concat(array(term),
      transform(sequence(lit(1), length(term)), i =>
        concat(term.substr(lit(1), i - 1),
          term.substr(i + 1, length(term))))))

  /** Term pairs of `a` × `b` within edit distance 1, as
    * `(aCol, bCol)` — distinct pairs, exact-filtered. Each side is
    * deduplicated to its vocabulary before keys explode, so the join
    * cost tracks |vocab|, not corpus size. When both sides name the
    * same column (vocabulary vs vocabulary), the right column comes
    * back as `<bCol>_b` so the result stays addressable by name. */
  def fuzzyPairs(a: DataFrame, aCol: String,
                 b: DataFrame, bCol: String): DataFrame = {
    // internal names keep the join unambiguous when aCol == bCol (e.g.
    // a vocabulary matched against another vocabulary's 'term' column)
    val outB = if (aCol == bCol) s"${bCol}_b" else bCol
    val ak = a.select(col(aCol).as("__a")).distinct()
      .select(col("__a"), explode(deleteKeys(col("__a"))).as("__k"))
    val bk = b.select(col(bCol).as("__b")).distinct()
      .select(col("__b"), explode(deleteKeys(col("__b"))).as("__k"))
    ak.join(bk, "__k")
      .select(col("__a"), col("__b")).distinct()
      // thresholded levenshtein short-circuits past the bound (O(len·k)
      // DP band instead of O(len²); -1 = "larger than 1") — same kept
      // set as `levenshtein(a,b) <= 1`
      .filter(levenshtein(col("__a"), col("__b"), 1) >= 0)
      .select(col("__a").as(aCol), col("__b").as(outB))
  }
}
