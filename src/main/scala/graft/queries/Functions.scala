package graft.queries

import graft.{GatedQuery, Norm, Tables}
import graft.GatedQuery.gated
import graft.Norm._
import graft.functions.{VectorOps, WeightedAvg}
import org.apache.spark.sql.functions._

/** JSON/array/map functions and the LLM-pipeline batch four
  * (SURVEY.md O25–O28, O37–O39, O41 = D-Q27/28/35/36/37/38).
  *
  * The reference's wire format is single-line JSON (reference
  * cdk_stacks/dms_aurora_mysql_to_kinesis.py:84-92) — O25 is table stakes;
  * the array/map/vector/text ops are the north-star LLM-data-pipeline
  * extensions over the `documents`/`embeddings` tables.
  */
object Functions {

  val all: Seq[GatedQuery] = Seq(

    // ---- O25 (D-Q27): JSON path extraction over the events props blob ----
    gated("q27_json_funcs",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_type = 'error'
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "error")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // ---- O26 (D-Q28): array functions over the embedding column.
    //      DuckDB lists are 1-based — matched with element_at(_, 1). ----
    gated("q28_array_funcs",
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n,
        |       CAST(CAST(ROUND(CAST(embedding[1] AS DOUBLE), 4) AS DECIMAL(9,4)) AS VARCHAR) AS e0,
        |       CAST(label AS BIGINT) AS lbl
        |FROM embeddings WHERE label = 5
        |ORDER BY vec_id""") { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("label") === 5)
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("n"),
          dec4Str(round(element_at(col("embedding"), 1).cast("double"), 4)).as("e0"),
          col("label").cast("long").as("lbl"))
        .orderBy("vec_id")
    },

    // ---- O27 (D-Q28 companion): map construction + lookup. The Spark
    //      program round-trips through MapType (map/element_at/map_keys);
    //      the oracle states the equivalent scalar result — hash equality
    //      certifies the map semantics. ----
    gated("q28b_map_funcs",
      """SELECT event_id, 'error' AS et,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       CAST(2 AS BIGINT) AS nk, 'et,k' AS ks
        |FROM events WHERE event_type = 'error'
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "error")
        .select(col("event_id"),
          map(lit("et"), col("event_type"),
            lit("k"), get_json_object(col("props"), "$.k")).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "et").as("et"),
          element_at(col("m"), "k").cast("long").as("k"),
          size(col("m")).cast("long").as("nk"),
          array_join(map_keys(col("m")), ",").as("ks"))
        .orderBy("event_id")
    },

    // ---- O25: JSON round-trip — to_json(struct) + json_tuple extraction
    //      (Spark's compact struct→JSON rendering matches DuckDB's) ----
    gated("q27b_json_roundtrip",
      """SELECT event_id,
        |       to_json(struct_pack(event_id := event_id,
        |                           k := CAST(json_extract_string(props, '$.k') AS BIGINT)))::VARCHAR AS js,
        |       json_extract_string(props, '$.k') AS ks
        |FROM events WHERE event_type = 'error'
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "error")
        .select(col("event_id"),
          to_json(struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))).as("js"),
          json_tuple(col("props"), "k").as("ks"))
        .orderBy("event_id")
    },

    // ---- O26: array slice + sort + contains over the embedding column ----
    gated("q28c_array_ops",
      """SELECT vec_id,
        |       CAST(CAST(ROUND(list_sort(list_transform(embedding[1:4],
        |              x -> CAST(x AS DOUBLE)))[1], 4) AS DECIMAL(9,4)) AS VARCHAR) AS smin,
        |       CAST(len(embedding[1:4]) AS BIGINT) AS n4,
        |       CAST(list_contains(list_transform(embedding, x -> x > 0), true) AS BIGINT) AS has_pos
        |FROM embeddings WHERE vec_id < 100
        |ORDER BY vec_id""") { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 100)
        .select(col("vec_id"),
          dec4Str(round(element_at(sort_array(
            transform(slice(col("embedding"), 1, 4), x => x.cast("double"))), 1), 4))
            .as("smin"),
          size(slice(col("embedding"), 1, 4)).cast("long").as("n4"),
          array_contains(transform(col("embedding"), x => x > 0), true)
            .cast("long").as("has_pos"))
        .orderBy("vec_id")
    },

    // ---- O37/O11 (D-Q35): exact dedup at scale. The input is doubled via
    //      self-union so the distinct provably removes rows (500 exact
    //      duplicates at sf0.01). Spark plans dropDuplicates as a two-phase
    //      hash agg on all columns — partial dedup map-side, one shuffle on
    //      the row hash; at 100 TB pre-hashing with xxhash64 and
    //      deduplicating on (hash, row) keeps the shuffle payload narrow
    //      (the hash column prunes comparisons), which is the documented
    //      scale path (SURVEY.md O37). ----
    gated("q35_exact_dedup",
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |  SELECT DISTINCT * FROM (
        |    SELECT * FROM documents UNION ALL SELECT * FROM documents))
        |GROUP BY lang, source
        |ORDER BY lang, source""") { (s, d) =>
      val docs = Tables.documents(s, d)
      docs.unionByName(docs)
        .dropDuplicates()
        .groupBy("lang", "source").agg(cntLong.as("c"))
        .orderBy("lang", "source")
    },

    // ---- O38/O28 (D-Q36): tokenize + term stats (explode/lateral) ----
    gated("q36_tokenize_termstats",
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY c DESC, word LIMIT 20""") { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(cntLong.as("c"))
        .orderBy(col("c").desc, col("word"))
        .limit(20)
    },

    // ---- O39/O26 (D-Q37): brute-force cosine top-k against one query
    //      vector — the embarrassingly-parallel baseline: the 1-row query
    //      side is broadcast, the corpus scan is partition-parallel with no
    //      shuffle before the final top-k (TakeOrderedAndProject). The
    //      all-pairs scale path is LSH bucketing (graft.text.NearDup). ----
    gated("q37_cosine_topk",
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT b.vec_id,
        |        list_sum(list_transform(list_zip(b.embedding, q.qe),
        |                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
        |        sqrt(list_sum(list_transform(b.embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb,
        |        sqrt(list_sum(list_transform(q.qe,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
        |      FROM embeddings b, q WHERE b.vec_id <> 0)
        |SELECT vec_id, CAST(CAST(ROUND(dot/(nb*nq), 4) AS DECIMAL(9,4)) AS VARCHAR) AS sim
        |FROM s
        |ORDER BY CAST(ROUND(dot/(nb*nq), 4) AS DECIMAL(9,4)) DESC, vec_id
        |LIMIT 20""") { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(q)
        .select(col("vec_id"),
          round(VectorOps.cosine(col("embedding"), col("qe")), 4)
            .cast(Dec94).as("simd"))
        .orderBy(col("simd").desc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), col("simd").cast("string").as("sim"))
    },

    // ---- O41 (D-Q38): Aggregator-based weighted average. Exact decimal
    //      partial sums (order-independent two-phase agg), double division,
    //      half-up 2 dp — arithmetic identical to the oracle's. ----
    gated("q38_udaf_weighted_avg",
      """SELECT l_returnflag,
        |       CAST(CAST(ROUND(
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) /
        |         CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2)
        |       AS DECIMAL(18,2)) AS VARCHAR) AS wavg
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, d) =>
      val wavg = udaf(WeightedAvg)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_discount")).as("wavg"))
        .orderBy("l_returnflag")
    }
  )
}
