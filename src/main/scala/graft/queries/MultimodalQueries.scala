package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Multimodal

/** Multimodal-column queries: binary payload + typed metadata, and
  * distributed (stub-decoded) feature extraction via typed
  * `mapPartitions`. The oracle recomputes the stub decoder's output
  * byte-for-byte from the source text (payload = UTF-8 bytes, text is
  * pure ASCII), so even the "decoded" features are hash-checked.
  */
object MultimodalQueries {

  // ------------------------------------------------------- metadata-only
  /** Metadata projection — never touches the payload bytes; under parquet
    * column pruning the binary column is not even read. */
  private val meta = GraftQuery(
    "x_multimodal_meta",
    (s, d) => Multimodal.mediaTable(Tables.documents(s, d))
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("n_frames"), octet_length(col("media")).cast("long").as("n_bytes")),
    Some("""SELECT doc_id,
            'application/x-graft-fake' AS mime,
            CAST(32 + doc_id % 97 AS INTEGER) AS width,
            CAST(32 + (doc_id * 7) % 53 AS INTEGER) AS height,
            CAST(1 + doc_id % 8 AS INTEGER) AS n_frames,
            CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents"""))

  // -------------------------------------------------- decoded histogram
  /** Byte-histogram features from the mapPartitions decoder, exploded to
    * (doc_id, bucket, n) rows so the oracle can compare scalars. */
  private val features = GraftQuery(
    "x_multimodal_features",
    (s, d) => Multimodal
      .extractFeatures(s, Multimodal.mediaTable(Tables.documents(s, d)))
      .select(col("doc_id"),
        posexplode(col("byte_hist")).as(Seq("bucket", "n")))
      .select(col("doc_id"), col("bucket"), col("n")),
    Some("""SELECT doc_id, CAST(b AS INTEGER) AS bucket,
            CAST(len(list_filter(
              list_transform(generate_series(1, length(text)),
                             i -> ascii(text[i]) // 16),
              x -> x = b)) AS BIGINT) AS n
            FROM documents, (SELECT unnest(generate_series(0, 15)) AS b)"""))

  // ------------------------------------------------------- frame samples
  /** First byte of each equal-width frame slice — the frame-sampling
    * plumbing (shape: one row per sampled frame). */
  private val frames = GraftQuery(
    "x_multimodal_framesample",
    (s, d) => Multimodal
      .extractFeatures(s, Multimodal.mediaTable(Tables.documents(s, d)))
      .select(col("doc_id"),
        posexplode(col("frame_bytes")).as(Seq("frame_idx", "byte_val")))
      .select(col("doc_id"), col("frame_idx"), col("byte_val")),
    Some("""SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
            CAST(ascii(text[CAST((f * length(text)) // nf AS INTEGER) + 1])
                 AS INTEGER) AS byte_val
            FROM (SELECT doc_id, text, 1 + doc_id % 8 AS nf FROM documents),
                 (SELECT unnest(generate_series(0, 7)) AS f)
            WHERE f < nf AND length(text) > 0"""))

  val queries: Seq[GraftQuery] = Seq(meta, features, frames)
}
