package graft.functions

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity-aware tail of a retrieval pipeline: from a
  * relevance-ranked candidate set, greedily pick the item maximizing
  * λ·relevance − (1−λ)·max-similarity-to-already-picked, so near-
  * duplicate hits don't crowd the result page (reference analog: the
  * serve-side search surface `README.md:344-367`, upgraded with the
  * dedup north star's "don't show the same document twice" semantics).
  *
  * Arithmetic is all-integer (λ as a rational lamNum/lamDen, scores in
  * scaled basis points) with ties broken by ascending id, so the greedy
  * trajectory is bit-deterministic and replayable cross-engine as an
  * unrolled argmax CTE chain (q201's oracle).
  *
  * Scale shape: MMR is inherently sequential in k, so it belongs on the
  * driver — but only AFTER the distributed part has reduced the corpus
  * to a parameter-sized candidate set (top-C by relevance via
  * TakeOrdered; C², not corpus², pairwise similarities). The inputs
  * here are O(C) and O(C²) — the same bounded-collect class as the
  * k-means/PQ codebook gates. */
object Mmr {

  /** Greedy-select `k` of the candidates. `rel` = (id, relevance) for
    * each candidate; `sim((a, b))` = pairwise similarity, present for
    * every ordered candidate pair; score of a pick =
    * `lamNum·rel − (lamDen−lamNum)·maxSimToSelected` (first pick has no
    * penalty). Returns (rank, id, rel, score) in pick order. */
  def select(rel: Seq[(Long, Long)], sim: Map[(Long, Long), Long], k: Int,
             lamNum: Long = 7, lamDen: Long = 10): Seq[(Int, Long, Long, Long)] = {
    require(k >= 1 && lamDen > 0 && lamNum >= 0 && lamNum <= lamDen,
      s"mmr: need 1<=k, 0<=lamNum<=lamDen, got k=$k λ=$lamNum/$lamDen")
    val relMap = rel.toMap
    // a repeated id would silently last-write-win through toMap and
    // shrink the result — reject the malformed candidate set loudly
    require(relMap.size == rel.size,
      s"mmr: duplicate candidate ids (${rel.size} rows, ${relMap.size} distinct)")
    var selected = Vector.empty[(Int, Long, Long, Long)]
    var remaining = relMap.keySet
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.toSeq.map { id =>
        val r = relMap(id)
        val pen =
          if (selected.isEmpty) 0L
          else selected.map { s =>
            // loud validation, same style as the duplicate-id check: an
            // incomplete sim map is the likelier caller mistake and must
            // name the missing pair, not throw a bare NoSuchElement
            sim.getOrElse((id, s._2), {
              throw new IllegalArgumentException(
                s"mmr: sim map missing pair ($id, ${s._2}) — sim must " +
                  "cover every ordered candidate pair")
            })
          }.max
        (id, r, lamNum * r - (lamDen - lamNum) * pen)
      }
      val (id, r, sc) = scored.minBy { case (id, _, sc) => (-sc, id) }
      selected :+= ((selected.size + 1, id, r, sc))
      remaining -= id
    }
    selected
  }
}
