package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Multimodal

/** Multimodal-column queries: binary payload + typed metadata, and
  * distributed feature extraction over them.
  *
  * The decode path is REAL: each document's text bytes are encoded into
  * a valid image container ([[Multimodal.bmpEncode]] — 24-bit BMP with
  * bottom-up BGR rows; [[Multimodal.pngEncode]] — DEFLATE-compressed
  * PNG via `javax.imageio`), then [[Multimodal.ImageIoDecoder]] parses
  * the container back and features are computed over the DECODED
  * PIXELS. Because the pixel content is a deterministic function of the
  * text, the DuckDB oracle re-derives the decoded-pixel features from
  * `documents.text` directly — a decoder that misread the header, row
  * order, or channel order would fail the hash compare.
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

  /** The decoded-pixel feature oracle, shared by the BMP and PNG decode
    * queries — the canonical pixel stream is the text bytes zero-padded
    * to a whole 4-pixel-wide RGB grid, so bucket counts are the text's
    * high-nibble counts plus the padding's zeros. */
  private val pixelHistOracle =
    """WITH m AS (SELECT doc_id, text, length(text) AS len,
            12 * GREATEST(CAST(1 AS BIGINT),
                          CAST(CEIL(length(text) / 12.0) AS BIGINT)) AS total
          FROM documents)
       SELECT doc_id, CAST(b AS INTEGER) AS bucket,
              CAST(len(list_filter(
                     list_transform(generate_series(1, len),
                                    i -> ascii(text[i]) // 16),
                     x -> x = b))
                   + CASE WHEN b = 0 THEN total - len ELSE 0 END
                   AS BIGINT) AS n
       FROM m, (SELECT unnest(generate_series(0, 15)) AS b)"""

  // ------------------------------------- decoded-pixel histogram (BMP)
  /** REAL image decode: text → 24-bit BMP container → `javax.imageio`
    * parse → 16-bucket high-nibble histogram of the decoded pixel
    * stream, exploded to (doc_id, bucket, n) rows. The BMP stores rows
    * bottom-up in BGR order, so the decoder's canonical normalization
    * (row flip + channel swap via `BufferedImage.getRGB`) is exercised
    * on every row — the histogram only matches the oracle if the
    * container was genuinely parsed. */
  private val features = GraftQuery(
    "x_multimodal_features",
    (s, d) => Multimodal
      .extractFeatures(s, Multimodal.bmpMediaTable(Tables.documents(s, d)),
        Multimodal.ImageIoDecoder)
      .select(col("doc_id"),
        posexplode(col("byte_hist")).as(Seq("bucket", "n")))
      .select(col("doc_id"), col("bucket"), col("n")),
    Some(pixelHistOracle))

  // ------------------------------------- decoded-pixel histogram (PNG)
  /** The same decoded-pixel features through the PNG path: encode is a
    * real `javax.imageio` PNG write (DEFLATE, filters, CRCs), decode a
    * real PNG inflate. Hash-equality with the SAME oracle as the BMP
    * twin is the lossless round-trip proof — identical pixels through
    * two different container formats. */
  private val pngDecode = GraftQuery(
    "x_multimodal_png_decode",
    (s, d) => Multimodal
      .extractFeatures(s, Multimodal.pngMediaTable(Tables.documents(s, d)),
        Multimodal.ImageIoDecoder)
      .select(col("doc_id"),
        posexplode(col("byte_hist")).as(Seq("bucket", "n")))
      .select(col("doc_id"), col("bucket"), col("n")),
    Some(pixelHistOracle))

  // ------------------------------------------------------- frame samples
  /** Frame sampling over the DECODED pixel stream: the first byte of
    * each equal-width frame slice, one row per sampled frame. Unlike
    * the histogram this is position-sensitive — it pins the decoder's
    * canonical ORDER (top-down, RGB), not just the byte population. */
  private val frames = GraftQuery(
    "x_multimodal_framesample",
    (s, d) => Multimodal
      .extractFeatures(s, Multimodal.bmpMediaTable(Tables.documents(s, d)),
        Multimodal.ImageIoDecoder)
      .select(col("doc_id"),
        posexplode(col("frame_bytes")).as(Seq("frame_idx", "byte_val")))
      .select(col("doc_id"), col("frame_idx"), col("byte_val")),
    Some("""WITH m AS (SELECT doc_id, text, length(text) AS len,
                 12 * GREATEST(CAST(1 AS BIGINT),
                               CAST(CEIL(length(text) / 12.0) AS BIGINT)) AS total,
                 1 + doc_id % 8 AS nf
               FROM documents)
            SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
                   CAST(CASE WHEN (f * total) // nf < len
                             THEN ascii(text[CAST((f * total) // nf AS INTEGER) + 1])
                             ELSE 0 END AS INTEGER) AS byte_val
            FROM m, (SELECT unnest(generate_series(0, 7)) AS f)
            WHERE f < nf"""))

  // --------------------------------------------- real multi-frame decode
  /** REAL frame extraction: each document is an animated GIF of
    * `1 + doc_id % 8` grayscale frames ([[Multimodal.gifEncode]] — an
    * explicit 256-gray palette makes the LZW round trip byte-exact);
    * [[Multimodal.decodeFrames]] walks the container's image sequence
    * with an `ImageReader`, one output row per decoded frame. This is
    * the video-keyframe shape the byte-slice sampler above
    * approximates — the row count itself is container-derived (a
    * misread frame count breaks the row compare before any value
    * does). The oracle re-derives per-frame sums and first bytes from
    * the text slices each frame carries. */
  private val gifFrames = GraftQuery(
    "x_multimodal_gif_frames",
    (s, d) => Multimodal
      .extractFrameStats(s, Multimodal.gifMediaTable(Tables.documents(s, d)))
      .select(col("doc_id"), col("frame_idx"), col("frame_px"),
        col("frame_sum"), col("first_byte")),
    Some("""WITH m AS (SELECT doc_id, text, length(text) AS len,
                 1 + doc_id % 8 AS nf,
                 4 * GREATEST(CAST(1 AS BIGINT),
                       CAST(CEIL(length(text) / (4.0 * (1 + doc_id % 8)))
                            AS BIGINT)) AS cap
               FROM documents)
            SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
                   cap AS frame_px,
                   CAST(COALESCE(list_sum(list_transform(
                          generate_series(CAST(f * cap + 1 AS BIGINT),
                                          LEAST((f + 1) * cap, len)),
                          i -> ascii(text[CAST(i AS INTEGER)]))), 0)
                        AS BIGINT) AS frame_sum,
                   CAST(CASE WHEN f * cap < len
                             THEN ascii(text[CAST(f * cap + 1 AS INTEGER)])
                             ELSE 0 END AS INTEGER) AS first_byte
            FROM m, (SELECT unnest(generate_series(0, 7)) AS f)
            WHERE f < nf"""))

  // ------------------------------------------------ real audio decode
  /** REAL audio path: text bytes as an 8-bit PCM mono WAV
    * ([[Multimodal.wavEncode]] — hand-written RIFF container), decoded
    * through `javax.sound.sampled.AudioSystem` (the JDK's actual audio
    * stack), then windowed amplitude stats per 256-sample window — the
    * audio-preprocessing shape (VAD windows, loudness normalization).
    * sample == byte under 8-bit PCM, so the oracle re-derives each
    * window's sum/peak from the text slice; the last window is
    * truncated, not padded (WAV carries an exact sample count), which
    * the oracle's LEAST bound mirrors. */
  private val wavWindows = GraftQuery(
    "x_multimodal_wav_windows",
    (s, d) => Multimodal
      .extractAudioWindows(s, Multimodal.wavMediaTable(Tables.documents(s, d)))
      .select(col("doc_id"), col("window_idx"), col("n_samples"),
        col("sum_amp"), col("peak_amp")),
    Some("""WITH m AS (SELECT doc_id, text, length(text) AS len,
                 CAST(CEIL(length(text) / 256.0) AS BIGINT) AS nw
               FROM documents)
            SELECT doc_id, CAST(w AS INTEGER) AS window_idx,
                   CAST(LEAST(256, len - w * 256) AS INTEGER) AS n_samples,
                   CAST(COALESCE(list_sum(list_transform(
                          generate_series(CAST(w * 256 + 1 AS BIGINT),
                                          LEAST((w + 1) * 256, len)),
                          i -> ascii(text[CAST(i AS INTEGER)]))), 0)
                        AS BIGINT) AS sum_amp,
                   CAST(COALESCE(list_max(list_transform(
                          generate_series(CAST(w * 256 + 1 AS BIGINT),
                                          LEAST((w + 1) * 256, len)),
                          i -> ascii(text[CAST(i AS INTEGER)]))), 0)
                        AS INTEGER) AS peak_amp
            FROM m, (SELECT unnest(generate_series(0,
                       (SELECT CAST(MAX(nw) AS INTEGER) - 1 FROM m))) AS w)
            WHERE w < nw"""))

  // ------------------------------------------- decode -> resize chain
  /** Decode → RESIZE → feature: the BMP container decodes to its pixel
    * grid, a nearest-neighbor kernel shrinks it to a 2×2 thumbnail
    * ([[Multimodal.resizeNearest]] — `src(x·W/W', y·H/H')`, chosen over
    * Java2D's implementation-defined resamplers precisely so the
    * thumbnail bytes are oracle-checkable), one row per thumbnail
    * pixel. The oracle replays the index arithmetic over the padded
    * text grid: thumbnail pixel (x,y) reads source pixel (2x,
    * floor(y·h/2)), whose RGB bytes are text[idx..idx+2] or pad
    * zeros. */
  private val thumbnail = GraftQuery(
    "x_multimodal_thumbnail",
    (s, d) => Multimodal
      .extractThumbnails(s, Multimodal.bmpMediaTable(Tables.documents(s, d)))
      .select(col("doc_id"), col("px_idx"), col("r"), col("g"), col("b")),
    Some("""WITH m AS (SELECT doc_id, text, length(text) AS len,
                 GREATEST(CAST(1 AS BIGINT),
                          CAST(CEIL(length(text) / 12.0) AS BIGINT)) AS h
               FROM documents),
            px AS (SELECT doc_id, text, len,
                     p, (p % 2) * 2 AS sx, ((p // 2) * h) // 2 AS sy
                   FROM m, (SELECT unnest(generate_series(0, 3)) AS p)),
            base AS (SELECT doc_id, text, len, p,
                       (sy * 4 + sx) * 3 AS i0
                     FROM px)
            SELECT doc_id, CAST(p AS INTEGER) AS px_idx,
                   CAST(CASE WHEN i0 < len
                             THEN ascii(text[CAST(i0 + 1 AS INTEGER)])
                             ELSE 0 END AS INTEGER) AS r,
                   CAST(CASE WHEN i0 + 1 < len
                             THEN ascii(text[CAST(i0 + 2 AS INTEGER)])
                             ELSE 0 END AS INTEGER) AS g,
                   CAST(CASE WHEN i0 + 2 < len
                             THEN ascii(text[CAST(i0 + 3 AS INTEGER)])
                             ELSE 0 END AS INTEGER) AS b
            FROM base"""))

  val queries: Seq[GraftQuery] =
    Seq(meta, features, pngDecode, frames, gifFrames, wavWindows, thumbnail)
}
