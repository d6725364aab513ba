package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Heavy hitters (frequent items) via per-partition Misra-Gries summaries
  * — the bounded-memory, one-pass sketch for "which items exceed n/k of
  * the stream" at any scale.
  *
  * Guarantee used here: if an item's GLOBAL count exceeds n/k, then in at
  * least one partition its local count exceeds n_p/k (pigeonhole over
  * partitions), and Misra-Gries with k counters surfaces every such item
  * in that partition's summary. The union of per-partition candidates is
  * therefore a SUPERSET of the true heavy hitters; an exact recount of
  * the (≤ k × partitions) candidates then filters to the exact answer —
  * the same candidates-then-verify shape as the LSH/IVF paths.
  *
  * Scale: one streaming pass per partition with k counters (no map of
  * the full vocabulary anywhere), a candidate set that is tiny by
  * construction and broadcasts into the recount join, and a recount
  * aggregation whose shuffle carries only candidate keys. */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate items (k counters per
    * partition). Output: distinct candidate strings. */
  def candidates(items: Dataset[String], k: Int): Dataset[String] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all step; evict counters that reach zero
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.distinct()
  }

  /** Exact heavy hitters: items whose count × k exceeds the total item
    * count (integer arithmetic — no float threshold). Two passes: the
    * MG candidate sweep, then an exact recount restricted to
    * candidates. */
  def exact(items: Dataset[String], k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val cand = broadcast(candidates(items, math.max(2 * k, 16)).toDF("w"))
    val counted = items.toDF("w")
      .join(cand, "w")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = items.toDF("w").agg(count(lit(1)).as("n"))
    counted.crossJoin(broadcast(n))
      .filter(col("c") * k > col("n"))
      .select(col("w"), col("c"))
  }
}
