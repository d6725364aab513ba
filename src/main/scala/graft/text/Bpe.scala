package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair encoding (Sennrich et al., ACL'16) — the real subword
  * tokenizer behind the `token counting` surface (TextOps's regex
  * proxy): train merges from corpus statistics, segment words with
  * them. Both halves are built for the 100 TB shape:
  *
  *   - TRAINING consumes the WORD-FREQUENCY relation, not the corpus:
  *     one distributed count produces (word, cnt), which is
  *     vocabulary-bounded, and the merge loop runs driver-side over
  *     that map — the same O(parameters) collect discipline as the
  *     k-means/PQ codebooks (a 100 TB corpus has a ~10⁷-word
  *     vocabulary; its text is ~10¹³ words).
  *   - ENCODING segments each DISTINCT word once — the merge list
  *     applies on the distinct-word relation (vocabulary-sized), and
  *     occurrences get their token counts by a hash join back on the
  *     word. Per-occurrence segmentation (the naive UDF-per-row shape)
  *     would redo identical work corpus-many times.
  *
  * Merges are deterministic: ties on pair frequency break
  * lexicographically, so the same corpus always trains the same
  * tokenizer — required for reproducible token-count contracts. */
object Bpe {

  type Merge = (String, String)

  /** End-of-word marker (Sennrich's `</w>`): lets a merge distinguish
    * word-final from word-internal contexts. */
  val Eow = "</w>"

  /** Train `numMerges` merges from (word → count). Pure driver-side
    * function over the vocabulary-bounded map. */
  def train(words: Map[String, Long], numMerges: Int): Seq[Merge] =
    trainFull(words, numMerges)._1

  /** Train and ALSO return the final per-word segmentation state — for a
    * training-vocabulary word, its token sequence is already decided by
    * training, so encoding it again with `segment` is redundant work (and
    * the state is what a replayed oracle computes step for step). */
  def trainFull(words: Map[String, Long], numMerges: Int)
      : (Seq[Merge], Map[String, Vector[String]]) = {
    var state: Map[String, Vector[String]] = words.map { case (w, _) =>
      w -> (w.map(_.toString).toVector :+ Eow)
    }
    val merges = Seq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[Merge, Long]
      state.foreach { case (w, syms) =>
        val c = words(w)
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        state = state.map { case (w, syms) => w -> applyMerge(syms, best) }
        i += 1
      }
    }
    (merges.result(), state)
  }

  /** Distributed word-frequency top-K: the training collect is bounded by
    * POLICY (k), not by corpus luck — a 100 TB corpus with a 10^9-word
    * long-tail vocabulary still hands the driver at most k entries.
    * Deterministic order (cnt DESC, word ASC) so the trained tokenizer is
    * reproducible whatever k cuts off. */
  def topWords(df: DataFrame, textCol: String, k: Int): Map[String, Long] = {
    require(k >= 1, s"bpe vocab cap must be >= 1, got $k")
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def applyMerge(syms: Vector[String], m: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Segment one word with a trained merge list: repeatedly merge the
    * LOWEST-RANK adjacent pair (training order = priority), the
    * standard greedy BPE application. */
  def segment(word: String, merges: Seq[Merge]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = true
    while (continue && syms.length > 1) {
      val best = syms.iterator.zip(syms.iterator.drop(1))
        .flatMap(p => rank.get(p).map(r => (r, p))).minOption
      best match {
        case Some((_, p)) => syms = applyMerge(syms, p)
        case None => continue = false
      }
    }
    syms
  }

  /** Distributed token counts: (id, n_tokens) for `df(id, text)` under
    * `merges`. Segmentation runs once per distinct word (vocab-bounded
    * mapPartitions over broadcast merges — SURVEY ladder tier (d),
    * justified: BPE application is inherently iterative per word), then
    * joins back to occurrences. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge],
                  state: Map[String, Vector[String]] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val occ = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("word"))
    val bc = spark.sparkContext.broadcast(merges)
    val bs = spark.sparkContext.broadcast(state)
    val perWord = occ.select("word").distinct().as[String]
      .mapPartitions { it =>
        val m = bc.value
        val st = bs.value
        // training-vocab words read their length straight off the trained
        // state; only out-of-vocabulary words pay the greedy merge loop
        it.map(w => (w,
          st.get(w).fold(segment(w, m).length.toLong)(_.length.toLong)))
      }.toDF("word", "n")
    // left-join back to the full id set: a document whose text tokenizes
    // to zero words must still report n_tokens = 0, not vanish
    val perDoc = occ.join(perWord, "word")
      .groupBy("id").agg(sum(col("n")).as("n"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n"), lit(0L)).as("n_tokens"))
  }
}
