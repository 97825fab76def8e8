package graft.ops

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` media payloads with typed
  * metadata, and distributed feature extraction over them.
  *
  * The default decoder is REAL: [[ImageIoDecoder]] parses the payload
  * with `javax.imageio` (PNG, BMP, GIF — the JDK's standard readers, no
  * external codec jars) and derives features from the DECODED PIXELS.
  * The engine also carries real encoders ([[bmpMediaTable]] /
  * [[pngMediaTable]] build valid 24-bit BMP / PNG containers whose
  * pixel content is a deterministic function of the document text), so
  * the whole encode → container → ImageIO-decode → feature path is
  * oracle-checkable end to end: a misparsed header, wrong row order, or
  * swapped channel would change the feature hashes. [[FakeDecoder]]
  * remains as the no-deps fallback for payloads that are not images
  * (its features are over the raw container bytes).
  */
object Multimodal {

  /** ImageIO's static read/write/createImage*Stream helpers default to
    * a DISK-backed cache: every call creates (and deletes) a temp file,
    * so a 32-thread decode stage turns into temp-dir churn — measured
    * 2.3× slower single-threaded and far worse under concurrency (the
    * createTempFile name-probe serializes on the directory). All
    * payloads here are in-memory byte arrays; a heap-backed stream is
    * strictly correct and removes the filesystem from the hot path.
    * JVM-global, set once at class load (thread-safe: plain volatile
    * boolean in ImageIO). */
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Shared feature kernel: a 16-bucket high-nibble histogram over a
    * byte stream plus the byte at the start of each equal-width "frame"
    * slice — applied to RAW CONTAINER bytes by [[FakeDecoder]] and to
    * DECODED PIXEL bytes by [[ImageIoDecoder]]. */
  private def features(bytes: Array[Byte], nFrames: Int): MediaFeatures0 = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >>> 4) += 1; i += 1 }
    val frames =
      if (bytes.isEmpty) Array.empty[Int]
      else (0 until nFrames).map { f =>
        bytes((f.toLong * bytes.length / nFrames).toInt) & 0xFF
      }.toArray
    MediaFeatures0(hist, frames)
  }

  /** Container-byte decoder (no image parse): deterministic features
    * over the raw payload — the fallback for media whose codec is not
    * on the classpath, and the historical stub the real decoder
    * replaced. Kept because a 100 TB pipeline always has a tail of
    * undecodable blobs and "features of the raw bytes" is the graceful
    * degradation mode. */
  object FakeDecoder extends MediaDecoder {
    def decode(media: Array[Byte], nFrames: Int): MediaFeatures0 =
      features(media, nFrames)
  }

  /** REAL image decoder: `javax.imageio` parses the container (PNG,
    * BMP, GIF — whatever `ImageIO.getImageReaders` resolves), and
    * features are computed over the CANONICAL PIXEL STREAM — row-major,
    * top-down, one (R, G, B) byte triple per pixel, whatever the
    * container's internal row order (BMP stores bottom-up), channel
    * order (BMP stores BGR), bit layout, or compression. Normalizing
    * through `BufferedImage.getRGB` is what makes features
    * container-independent: the same pixels yield the same features
    * from a BMP and a PNG. Thread-safe: `ImageIO.read` allocates per
    * call; the shared reader registry is read-only here. */
  object ImageIoDecoder extends MediaDecoder {

    /** The canonical pixel byte stream of an encoded image: row-major
      * top-down (R, G, B) triples. Fails loudly on undecodable bytes —
      * a silent empty answer would hash like a real all-zero image. */
    def canonicalBytes(media: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(media))
      require(img != null,
        "payload is not a decodable image (no registered ImageIO reader)")
      val w = img.getWidth
      val h = img.getHeight
      // one bulk getRGB: ImageIO converts any internal raster layout
      // (palette, bottom-up BMP rows, BGR order) to packed ARGB ints
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Byte](w * h * 3)
      var p = 0
      while (p < argb.length) {
        val v = argb(p)
        out(p * 3) = ((v >>> 16) & 0xFF).toByte
        out(p * 3 + 1) = ((v >>> 8) & 0xFF).toByte
        out(p * 3 + 2) = (v & 0xFF).toByte
        p += 1
      }
      out
    }

    def decode(media: Array[Byte], nFrames: Int): MediaFeatures0 =
      features(canonicalBytes(media), nFrames)
  }

  // ------------------------------------------------------------ encoders
  /** Images are built `PixelWidth` pixels wide; 3 bytes/pixel makes the
    * 12-byte row exactly 4-byte aligned, so BMP rows need no padding
    * and the canonical stream is byte-identical to the payload. */
  val PixelWidth = 4

  private def gridHeight(len: Int): Int =
    math.max(1, (len + PixelWidth * 3 - 1) / (PixelWidth * 3))

  /** `data` zero-padded to a whole `PixelWidth`-wide pixel grid — the
    * canonical pixel stream both encoders carry and the oracle
    * re-derives from the document text. */
  private def padded(data: Array[Byte]): Array[Byte] = {
    val px = new Array[Byte](gridHeight(data.length) * PixelWidth * 3)
    System.arraycopy(data, 0, px, 0, data.length)
    px
  }

  /** A VALID 24-bit uncompressed BMP whose canonical decoded stream is
    * exactly `padded(data)`: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, rows stored bottom-up in B, G, R channel order
    * per the format — i.e. the bytes on disk are deliberately NOT in
    * canonical order, so a decoder that skipped the real container
    * semantics (row flip + channel swap) would produce wrong features
    * and fail the oracle hash. */
  def bmpEncode(data: Array[Byte]): Array[Byte] = {
    val w = PixelWidth
    val rowBytes = w * 3
    val px = padded(data)
    val h = px.length / rowBytes
    val headerSize = 14 + 40
    val buf = ByteBuffer.allocate(headerSize + px.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(headerSize + px.length) // file size
      .putShort(0).putShort(0)        // reserved
      .putInt(headerSize)             // pixel data offset
    buf.putInt(40)                    // BITMAPINFOHEADER size
      .putInt(w).putInt(h)            // positive height = bottom-up rows
      .putShort(1)                    // planes
      .putShort(24)                   // bits per pixel
      .putInt(0)                      // BI_RGB (uncompressed)
      .putInt(px.length)              // image size
      .putInt(2835).putInt(2835)      // 72 DPI
      .putInt(0).putInt(0)            // palette sizes (none)
    var r = h - 1
    while (r >= 0) {                  // bottom row first
      var x = 0
      while (x < w) {
        val i = r * rowBytes + x * 3
        buf.put(px(i + 2)).put(px(i + 1)).put(px(i)) // B, G, R
        x += 1
      }
      r -= 1
    }
    buf.array()
  }

  /** The same canonical pixels as [[bmpEncode]], PNG-encoded through
    * `javax.imageio` — DEFLATE-compressed, filtered, CRC-checked: the
    * decode side must run a real PNG inflate to recover them. Encoded
    * bytes are not asserted anywhere (PNG encoders may differ in
    * filter choice); only the decoded pixels are, which is exactly the
    * lossless-round-trip contract PNG makes. */
  def pngEncode(data: Array[Byte]): Array[Byte] = {
    val w = PixelWidth
    val px = padded(data)
    val h = px.length / (w * 3)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val argb = new Array[Int](w * h)
    var p = 0
    while (p < argb.length) {
      argb(p) = ((px(p * 3) & 0xFF) << 16) |
        ((px(p * 3 + 1) & 0xFF) << 8) | (px(p * 3 + 2) & 0xFF)
      p += 1
    }
    img.setRGB(0, 0, w, h, argb, 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode ALL images of a multi-image container (an animated GIF's
    * frames) to their canonical GRAYSCALE byte streams — one
    * `Array[Byte]` per frame, row-major top-down, one byte per pixel
    * (the blue channel of `getRGB`; for the gray palettes
    * [[gifEncode]] writes, R = G = B = the sample). This is the real
    * frame-extraction primitive the byte-slice sampler approximates:
    * the reader walks the container's image sequence, not offsets into
    * the payload. */
  def decodeFrames(media: Array[Byte]): Seq[Array[Byte]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(media))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext,
      "payload is not a decodable image (no registered ImageIO reader)")
    val reader = readers.next()
    reader.setInput(iis)
    try {
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h)
        var p = 0
        while (p < argb.length) {
          out(p) = (argb(p) & 0xFF).toByte
          p += 1
        }
        out
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** A REAL multi-frame animated GIF, written byte-by-byte like
    * [[bmpEncode]]: `data` split across `nFrames` equal-capacity
    * grayscale frames ([[PixelWidth]] wide, one byte per pixel through
    * a 256-gray GLOBAL palette, so index == gray value), each frame's
    * index stream LZW-coded per the GIF89a spec. The encoder is ours
    * because the JDK's `GIFImageWriter` re-quantizes and dithers pixel
    * data through its own palette (and its interlace default does not
    * even round-trip for short frames) — index-exact writes are not in
    * its contract. The DECODE side stays `javax.imageio`: the reader
    * walks the image sequence and runs its real LZW inflate per frame,
    * which is the codec path the queries exercise.
    *
    * The LZW stream uses literal 9-bit codes with a CLEAR reset every
    * 254 symbols — valid LZW any decoder accepts (the encoder never
    * grows the code table, the spec-sanctioned low-compression mode).
    * Short tails zero-pad, so every frame has identical dimensions as
    * the format requires. */
  def gifEncode(data: Array[Byte], nFrames: Int): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val w = PixelWidth
    // per-frame pixel capacity: the smallest W-multiple grid that lets
    // nFrames frames of identical size hold all of data
    val rowsPerFrame =
      math.max(1, (data.length + nFrames * w - 1) / (nFrames * w))
    // GIF stores dimensions as u16: a payload too large for the frame
    // grid must fail loudly here, not wrap into a silently-corrupt
    // container the decode side would misread
    require(rowsPerFrame <= 0xFFFF,
      s"payload of ${data.length} bytes across $nFrames frame(s) needs " +
        s"$rowsPerFrame rows/frame — over GIF's 65535 row limit; " +
        "raise nFrames or chunk the payload")
    val cap = rowsPerFrame * w
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(rowsPerFrame)
    out.write(0xF7) // global color table, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    (0 until nFrames).foreach { f =>
      out.write(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(rowsPerFrame)
      out.write(0)    // no local table, not interlaced
      out.write(8)    // LZW minimum code size
      // 9-bit literal LZW, LSB-first bit packing, CLEAR every 254
      // symbols so the decoder's table never outgrows 9-bit codes
      val codes = new java.io.ByteArrayOutputStream()
      var bitBuf = 0
      var bitCnt = 0
      def emit(code: Int): Unit = {
        bitBuf |= code << bitCnt
        bitCnt += 9
        while (bitCnt >= 8) {
          codes.write(bitBuf & 0xFF)
          bitBuf >>>= 8
          bitCnt -= 8
        }
      }
      val Clear = 256
      val Eoi = 257
      emit(Clear)
      val from = f * cap
      var i = 0
      var sinceClear = 0
      while (i < cap) {
        val b = if (from + i < data.length) data(from + i) & 0xFF else 0
        emit(b)
        sinceClear += 1
        if (sinceClear == 254) { emit(Clear); sinceClear = 0 }
        i += 1
      }
      emit(Eoi)
      if (bitCnt > 0) codes.write(bitBuf & 0xFF)
      // sub-block the code stream in <=255-byte chunks
      val cs = codes.toByteArray
      var off = 0
      while (off < cs.length) {
        val n = math.min(255, cs.length - off)
        out.write(n)
        out.write(cs, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** A REAL audio container: 8-bit unsigned PCM mono WAV (RIFF), the
    * sample stream being `data` verbatim — hand-written header like
    * [[bmpEncode]], decoded through `javax.sound.sampled` (the JDK's
    * actual audio stack: format negotiation, chunk walking), so the
    * audio path exercises a real codec API end to end. 8-bit PCM keeps
    * sample == byte, which is what lets the SQL oracle re-derive
    * windowed amplitude features from the text. */
  def wavEncode(data: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val buf = ByteBuffer.allocate(44 + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(36 + data.length)
      .put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(16)                  // fmt chunk size
      .putShort(1)                 // PCM
      .putShort(1)                 // mono
      .putInt(sampleRate)
      .putInt(sampleRate)          // byte rate (1 byte/sample)
      .putShort(1)                 // block align
      .putShort(8)                 // bits per sample
      .put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(data.length)
      .put(data)
    buf.array()
  }

  /** Decode a WAV payload to its raw sample bytes through
    * `javax.sound.sampled.AudioSystem` — fails loudly on non-audio
    * payloads, asserts the 8-bit mono PCM shape the encoder writes
    * (a silent format coercion would corrupt the sample == byte
    * contract the features rest on). */
  def decodeWavSamples(media: Array[Byte]): Array[Byte] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(media))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            "payload is not a decodable audio stream", e)
      }
    try {
      val f = in.getFormat
      require(f.getSampleSizeInBits == 8 && f.getChannels == 1,
        s"expected 8-bit mono PCM, got $f")
      in.readAllBytes()
    } finally in.close()
  }

  /** documents → media fact table (raw-bytes payload): the UTF-8 text
    * bytes standing in for an arbitrary blob; metadata derived
    * deterministically from doc_id so the oracle can recompute it.
    * Pairs with [[FakeDecoder]] — the not-an-image degradation path. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-graft-fake").as("mime"),
      (lit(32) + pmod(col("doc_id"), lit(97))).cast("int").as("width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(53))).cast("int").as("height"),
      (lit(1) + pmod(col("doc_id"), lit(8))).cast("int").as("n_frames"))

  /** Encoder input for the image tables (public: Catalyst's generated
    * deserializer cannot construct a private class). */
  final case class DocRow(doc_id: Long, text: String)

  /** documents → media fact table of REAL images: each document's text
    * bytes become the pixel content of a valid container (`image/bmp`
    * via [[bmpEncode]], `image/png` via [[pngEncode]]), so
    * [[ImageIoDecoder]] genuinely parses a container per row and the
    * decoded features are still a pure function of the text — the
    * property the DuckDB oracle checks. Encoding runs as a typed
    * `mapPartitions` (the per-partition-codec pattern, same shape as
    * the decode side); width is fixed at [[PixelWidth]], height is the
    * text's pixel-grid height, `n_frames` keeps the doc_id derivation
    * so frame sampling stays deterministic. */
  private def imageTable(
      docs: DataFrame, mime: String,
      enc: Array[Byte] => Array[Byte]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[DocRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val data = Option(r.text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaRow(r.doc_id, enc(data), mime,
            PixelWidth, gridHeight(data.length),
            (1L + java.lang.Math.floorMod(r.doc_id, 8L)).toInt)
        }
      }.toDF()
  }

  def bmpMediaTable(docs: DataFrame): DataFrame =
    imageTable(docs, "image/bmp", bmpEncode)

  def pngMediaTable(docs: DataFrame): DataFrame =
    imageTable(docs, "image/png", pngEncode)

  /** documents → MULTI-FRAME media fact table: each document's text
    * bytes split across `1 + doc_id % 8` real animated-GIF frames
    * ([[gifEncode]]). `height` here is rows PER FRAME. The
    * video-stand-in table: one payload holding an ordered frame
    * sequence a reader must walk. */
  def gifMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[DocRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val data = Option(r.text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val nf = (1L + java.lang.Math.floorMod(r.doc_id, 8L)).toInt
          val rowsPerFrame = math.max(1,
            (data.length + nf * PixelWidth - 1) / (nf * PixelWidth))
          MediaRow(r.doc_id, gifEncode(data, nf), "image/gif",
            PixelWidth, rowsPerFrame, nf)
        }
      }.toDF()
  }

  /** One row per decoded FRAME: the real frame-sampling shape (video
    * keyframe extraction, audio windowing) — the decoder walks the
    * container's image sequence, emits per-frame stats, and the row
    * count is data-dependent (frames per payload), which is why this
    * is a `flatMap` through `mapPartitions` and not a fixed-shape
    * projection. */
  final case class FrameStats(
      doc_id: Long, frame_idx: Int, frame_px: Long,
      frame_sum: Long, first_byte: Int)

  def extractFrameStats(
      spark: SparkSession, media: DataFrame): Dataset[FrameStats] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height", "n_frames")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeFrames(r.media).zipWithIndex.map { case (px, i) =>
            var sum = 0L
            var j = 0
            while (j < px.length) { sum += px(j) & 0xFF; j += 1 }
            FrameStats(r.doc_id, i, px.length.toLong, sum,
              if (px.isEmpty) 0 else px(0) & 0xFF)
          }
        }
      }
  }

  /** Samples per analysis window for [[extractAudioWindows]]. */
  val WavWindow = 256

  /** documents → audio fact table: the text bytes as an 8-bit PCM WAV
    * sample stream ([[wavEncode]]). `width` = window size, `height` =
    * `n_frames` = window count (the frame notion maps onto windows for
    * audio). */
  def wavMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[DocRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val data = Option(r.text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val nw = (data.length + WavWindow - 1) / WavWindow
          MediaRow(r.doc_id, wavEncode(data), "audio/wav",
            WavWindow, nw, nw)
        }
      }.toDF()
  }

  /** One row per audio analysis window — the audio twin of
    * [[extractFrameStats]]: the decoder hands back the PCM sample
    * stream, windows slice it, and per-window amplitude stats come out
    * (sum + peak of the unsigned samples). The last window is
    * TRUNCATED, not padded — WAV carries an exact sample count, unlike
    * the fixed-dimension image grids. */
  final case class AudioWindowStats(
      doc_id: Long, window_idx: Int, n_samples: Int,
      sum_amp: Long, peak_amp: Int)

  def extractAudioWindows(
      spark: SparkSession, media: DataFrame,
      window: Int = WavWindow): Dataset[AudioWindowStats] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height", "n_frames")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val samples = decodeWavSamples(r.media)
          val nw = (samples.length + window - 1) / window
          (0 until nw).map { wi =>
            val from = wi * window
            val until = math.min(from + window, samples.length)
            var sum = 0L
            var peak = 0
            var j = from
            while (j < until) {
              val v = samples(j) & 0xFF
              sum += v
              if (v > peak) peak = v
              j += 1
            }
            AudioWindowStats(r.doc_id, wi, until - from, sum, peak)
          }
        }
      }
  }

  /** Nearest-neighbor resize of a canonical RGB stream — the classic
    * deterministic thumbnail kernel (`src(x·W/W', y·H/H')`), chosen
    * over Java2D's scaling because interpolating resamplers are
    * implementation-defined and the resize output here is
    * oracle-checked byte-for-byte. */
  def resizeNearest(canon: Array[Byte], w: Int, h: Int,
      w2: Int, h2: Int): Array[Byte] = {
    require(canon.length == w * h * 3,
      s"canonical stream length ${canon.length} != $w x $h x 3")
    val out = new Array[Byte](w2 * h2 * 3)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * h / h2
      var x2 = 0
      while (x2 < w2) {
        val sx = x2 * w / w2
        val s = (sy * w + sx) * 3
        val d = (y2 * w2 + x2) * 3
        out(d) = canon(s); out(d + 1) = canon(s + 1); out(d + 2) = canon(s + 2)
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** One row per THUMBNAIL pixel: decode the image container, resize
    * the decoded pixels nearest-neighbor to `w2` × `h2`, emit each
    * thumbnail pixel's RGB — the decode → transform → feature chain a
    * vision-pipeline preprocessor runs, with the resize arithmetic
    * deterministic enough to hash-check. */
  final case class ThumbPixel(
      doc_id: Long, px_idx: Int, r: Int, g: Int, b: Int)

  def extractThumbnails(
      spark: SparkSession, media: DataFrame,
      w2: Int = 2, h2: Int = 2): Dataset[ThumbPixel] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height", "n_frames")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val canon = ImageIoDecoder.canonicalBytes(row.media)
          val t = resizeNearest(canon, row.width, row.height, w2, h2)
          (0 until w2 * h2).map { p =>
            ThumbPixel(row.doc_id, p,
              t(p * 3) & 0xFF, t(p * 3 + 1) & 0xFF, t(p * 3 + 2) & 0xFF)
          }
        }
      }
  }

  /** Distributed feature extraction: typed `mapPartitions` so the decoder
    * is constructed once per partition (the production pattern for
    * codec/model handles), rows stream through without materializing the
    * partition. */
  def extractFeatures(
      spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = ImageIoDecoder): Dataset[MediaFeatures] = {
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
