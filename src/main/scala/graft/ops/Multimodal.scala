package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` media payloads with typed
  * metadata, and distributed feature extraction over them.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs); everything around it — schema, typed
  * Dataset encoding, per-partition batch iteration, output shape — is the
  * real Spark plumbing a production decoder would drop into. Swap
  * [[FakeDecoder]] for a JNI/FFmpeg/ImageIO-backed implementation and the
  * pipeline is unchanged.
  */
object Multimodal {

  /** One media row: payload + metadata, as a star-schema fact would carry
    * it (payload column prunable — metadata-only queries never read the
    * bytes thanks to parquet column pruning). */
  final case class MediaRow(
      doc_id: Long, media: Array[Byte],
      mime: String, width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, byte_hist: Array[Long], frame_bytes: Array[Int])

  /** Decoder contract: bytes → fixed-shape features. Implementations must
    * be thread-safe (instantiated once per partition, used serially). */
  trait MediaDecoder extends Serializable {
    def decode(media: Array[Byte], nFrames: Int): MediaFeatures0
  }
  final case class MediaFeatures0(byteHist: Array[Long], frameBytes: Array[Int])

  /** STUB decoder: a real implementation would parse the container format
    * here. This fake is deterministic — a 16-bucket byte histogram
    * (`byte >>> 4`) plus the first byte of each equal-width "frame"
    * slice — so tests and the SQL oracle can pin its output exactly. */
  object FakeDecoder extends MediaDecoder {
    def decode(media: Array[Byte], nFrames: Int): MediaFeatures0 = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < media.length) { hist((media(i) & 0xFF) >>> 4) += 1; i += 1 }
      val frames =
        if (media.isEmpty) Array.empty[Int]
        else (0 until nFrames).map { f =>
          media((f.toLong * media.length / nFrames).toInt) & 0xFF
        }.toArray
      MediaFeatures0(hist, frames)
    }
  }

  /** documents → media fact table. The payload is the UTF-8 text bytes
    * standing in for an image/audio blob; metadata is derived
    * deterministically from doc_id so the oracle can recompute it. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-graft-fake").as("mime"),
      (lit(32) + pmod(col("doc_id"), lit(97))).cast("int").as("width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(53))).cast("int").as("height"),
      (lit(1) + pmod(col("doc_id"), lit(8))).cast("int").as("n_frames"))

  /** Distributed feature extraction: typed `mapPartitions` so the decoder
    * is constructed once per partition (the production pattern for
    * codec/model handles), rows stream through without materializing the
    * partition. */
  def extractFeatures(
      spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height", "n_frames")
      .as[MediaRow]
      .mapPartitions { rows =>
        val d = decoder // one instance per partition
        rows.map { r =>
          val f = d.decode(r.media, r.n_frames)
          MediaFeatures(r.doc_id, r.media.length.toLong, f.byteHist, f.frameBytes)
        }
      }
  }
}
