package graft.queries

import graft.{GatedQuery, Tables}
import graft.GatedQuery.{gated, ungated}
import graft.functions.Ann
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing + the ANN scale path (north star).
  * The binary metadata query is oracle-gated (byte lengths and head bytes
  * are engine-agnostic); the stub decode and LSH ANN register ungated with
  * spec-pinned semantics (MultimodalSpec / AnnSpec). */
object Media {

  val all: Seq[GatedQuery] = Seq(

    // ---- binary payload metadata: real binary-column plumbing both
    //      engines can verify (payload = UTF-8 bytes of text) ----
    gated("q47_multimodal_meta",
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte
        |FROM documents ORDER BY media_id""") { (s, d) =>
      // one scan: head_byte comes from the payload bytes themselves
      // (decode back to string), not a second join against documents
      Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("kind"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          ascii(substring(decode(col("payload"), "UTF-8"), 1, 1))
            .cast("long").as("head_byte"))
        .orderBy("media_id")
    },

    // ---- stub decode → feature extraction through the mapPartitions
    //      (Arrow-batch analog) boundary; ungated, pinned by MultimodalSpec ----
    ungated("q47b_multimodal_decode") { (s, d) =>
      Multimodal.features(s, Tables.documents(s, d))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
        .orderBy("media_id")
    },

    // ---- ANN top-10 for vec_id = 0 via random-hyperplane LSH with
    //      multi-probe; ungated (recall pinned vs brute force in AnnSpec) ----
    ungated("q48_ann_topk") { (s, d) =>
      val e = Tables.embeddings(s, d)
      Ann.annTopK(e.filter(col("vec_id") =!= 0),
        e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
    }
  )
}
