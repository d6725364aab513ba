package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north star): media as opaque `binary` payloads
  * with typed metadata, processed by per-partition batch codecs.
  *
  * Spark-side plumbing is real — schema, partitioning, batch iteration,
  * feature shapes; the codec itself is a clearly-marked DETERMINISTIC STUB
  * (no image/audio libraries exist in this environment). Swapping
  * `FakeCodec` for a JNI/JavaCV decoder changes no plan shape: the
  * `mapPartitions` boundary is exactly where a Pandas-UDF/Arrow batch hop
  * would sit in PySpark, and the iterator contract (stream batches, never
  * materialize a partition) is what keeps executor memory flat at 100 TB.
  */
object Multimodal {

  /** One media row: payload carries the raw bytes, meta is parsed upfront. */
  final case class Media(media_id: Long, kind: String, payload: Array[Byte])

  /** Fixed-width feature row produced by the decode stage. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int,
                                 features: Array[Float])

  /** DETERMINISTIC STUB codec: stands in for image/audio decoding. "Decodes"
    * a payload into a pseudo pixel grid whose dimensions derive from the
    * payload length and whose features are byte-histogram moments —
    * deterministic, so tests can pin exact outputs. */
  private[multimodal] object FakeCodec {
    def decode(m: Media): MediaFeatures = {
      val n = m.payload.length
      val width = math.max(1, math.min(64, n / 8))
      val height = math.max(1, n / math.max(width, 1))
      val hist = new Array[Long](4)
      var i = 0
      while (i < n) { hist((m.payload(i) & 0xff) >> 6) += 1; i += 1 }
      val feats = hist.map(h => if (n == 0) 0f else h.toFloat / n)
      MediaFeatures(m.media_id, m.kind, n.toLong, width, height, feats)
    }

    /** "Resize": renormalizes the fake grid — placeholder for a real
      * interpolating resize; keeps the fixed feature width. */
    def resize(f: MediaFeatures, w: Int, h: Int): MediaFeatures =
      f.copy(width = w, height = h)

    /** "Frame sample": every k-th byte window as a frame id — placeholder
      * for video frame extraction. */
    def frameIds(m: Media, k: Int): Seq[Long] =
      (0 until m.payload.length by math.max(k, 1)).map(_.toLong)
  }

  /** Derive a deterministic media table from the driver's documents table:
    * payload = UTF-8 bytes of the text (a stand-in blob; at scale this
    * column is parquet BINARY holding real media). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode stage: the Arrow-batch analog. Partition-parallel, streaming
    * iterator in/out — one codec instance per partition (the expensive
    * init a real decoder would amortize), no per-partition materialization. */
  def decodeFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (model load, JNI handle...)
      rows.map(FakeCodec.decode)
    }
  }

  /** One sampled frame reference. A real pipeline would carry the decoded
    * frame bytes; the id is what survives the stub. */
  final case class Frame(media_id: Long, frame_id: Long)

  /** Frame-sampling stage for video payloads: every k-th frame, one output
    * row per sampled frame. flatMap through the same typed boundary as the
    * decode stage — output cardinality is ceil(n_bytes/k) per video, so
    * the stage fans out by a bounded factor; non-video rows are filtered
    * before the codec ever runs. */
  def sampleFrames(media: Dataset[Media], k: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap(m => FakeCodec.frameIds(m, k).map(Frame(m.media_id, _)))
  }

  /** Resize stage: per-row map over decoded features (the stub restamps the
    * grid dimensions; a real codec interpolates pixels). Kept as its own
    * stage so decode→resize composes as two streaming iterators — no
    * partition is ever materialized between codec stages. */
  def resizeAll(feats: Dataset[MediaFeatures], w: Int, h: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map(FakeCodec.resize(_, w, h))
  }

  /** End-to-end: documents → media → repartitioned decode → features.
    * Repartitioning by media_id models the shuffle you would pay to
    * co-locate payloads with GPU/codec-capable executors. */
  def features(spark: SparkSession, docs: DataFrame,
               partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = mediaFromDocuments(docs).as[Media]
    val part = if (partitions > 0) media.repartition(partitions, col("media_id"))
    else media
    decodeFeatures(part)
  }
}
