package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    assert(in != null, s"fixture $name missing from test resources")
    try in.readAllBytes() finally in.close()
  }

  // 2x2 top-down row-major RGB: red, green / blue, white
  private val rgb2x2 = Array[Byte](
    255.toByte, 0, 0,  0, 255.toByte, 0,
    0, 0, 255.toByte,  255.toByte, 255.toByte, 255.toByte)

  test("ImageIoDecoder decodes a checked-in BMP fixture to exact pixels") {
    // the fixture stores rows BOTTOM-UP in BGR with row padding — the
    // canonical stream only comes out right if the container semantics
    // were genuinely applied
    val canon = Multimodal.ImageIoDecoder.canonicalBytes(fixture("rgb2x2.bmp"))
    assert(canon === rgb2x2)
  }

  test("ImageIoDecoder decodes a checked-in PNG fixture to exact pixels") {
    // DEFLATE-compressed scanlines + CRCs: a real PNG inflate happens
    val canon = Multimodal.ImageIoDecoder.canonicalBytes(fixture("rgb2x2.png"))
    assert(canon === rgb2x2)
  }

  test("ImageIoDecoder features on the fixture: nibble histogram + frames") {
    val f = Multimodal.ImageIoDecoder.decode(fixture("rgb2x2.bmp"), nFrames = 4)
    assert(f.byteHist.sum === 12)       // 4 px × 3 channels
    assert(f.byteHist(15) === 6)        // six 0xFF bytes
    assert(f.byteHist(0) === 6)         // six 0x00 bytes
    // frame f samples byte (f * 12 / 4): positions 0, 3, 6, 9
    assert(f.frameBytes === Array(255, 0, 0, 255))
  }

  test("undecodable payloads fail loudly, not as all-zero features") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("not an image".getBytes, 2)
    }
    assert(e.getMessage.contains("decodable"))
  }

  test("bmpEncode round-trips text bytes through a real ImageIO parse") {
    val text = "The quick brown fox jumps over the lazy dog"
    val data = text.getBytes("UTF-8")
    val canon = Multimodal.ImageIoDecoder.canonicalBytes(Multimodal.bmpEncode(data))
    // canonical stream = text bytes zero-padded to a whole pixel grid
    assert(canon.length === 12 * ((data.length + 11) / 12))
    assert(canon.take(data.length) === data)
    assert(canon.drop(data.length).forall(_ === 0))
  }

  test("pngEncode round-trips text bytes through a real PNG inflate") {
    val data = "pack my box with five dozen liquor jugs".getBytes("UTF-8")
    val canon = Multimodal.ImageIoDecoder.canonicalBytes(Multimodal.pngEncode(data))
    assert(canon.take(data.length) === data)
    assert(canon.drop(data.length).forall(_ === 0))
  }

  test("empty text still encodes a valid one-row image") {
    val canon = Multimodal.ImageIoDecoder.canonicalBytes(Multimodal.bmpEncode(Array.empty))
    assert(canon === new Array[Byte](12))
  }

  test("FakeDecoder (raw-container fallback): counts every byte exactly once") {
    val bytes = "hello world".getBytes("UTF-8")
    val f = Multimodal.FakeDecoder.decode(bytes, nFrames = 3)
    assert(f.byteHist.sum === bytes.length)
    // 'h' = 0x68 → bucket 6; ' ' = 0x20 → bucket 2
    assert(f.byteHist(6) > 0 && f.byteHist(2) === 1)
    assert(f.frameBytes.length === 3)
    assert(f.frameBytes(0) === ('h'.toInt))
  }

  test("FakeDecoder: empty payload") {
    val f = Multimodal.FakeDecoder.decode(Array.empty, nFrames = 4)
    assert(f.byteHist.sum === 0)
    assert(f.frameBytes.isEmpty)
  }

  test("gifEncode round-trips text across REAL animated-GIF frames") {
    val data = ("the five boxing wizards jump quickly " * 4).getBytes("UTF-8")
    val frames = Multimodal.decodeFrames(Multimodal.gifEncode(data, nFrames = 5))
    assert(frames.length === 5, "reader must walk all container frames")
    // identical dimensions per frame; concatenation = data + zero pad
    assert(frames.map(_.length).distinct.size === 1)
    val concat = frames.flatten.toArray
    assert(concat.length >= data.length)
    assert(concat.take(data.length) === data,
      "LZW + palette round trip must be byte-exact")
    assert(concat.drop(data.length).forall(_ === 0))
  }

  test("gifEncode refuses payloads over GIF's u16 row limit, loudly") {
    // 4 px/row x 65535 rows x 1 frame = 262,140-byte ceiling: one byte
    // over must throw, not wrap the u16 height into a corrupt container
    val e = intercept[IllegalArgumentException] {
      Multimodal.gifEncode(new Array[Byte](4 * 65535 + 1), nFrames = 1)
    }
    assert(e.getMessage.contains("65535"))
    // the same payload across more frames fits fine
    val frames = Multimodal.decodeFrames(
      Multimodal.gifEncode(new Array[Byte](4 * 65535 + 1), nFrames = 2))
    assert(frames.length === 2)
  }

  test("gifEncode: single frame, empty payload still valid") {
    val frames = Multimodal.decodeFrames(Multimodal.gifEncode(Array.empty, 1))
    assert(frames.length === 1)
    assert(frames.head.forall(_ === 0))
    assert(frames.head.length === 4) // one minimal 4-px row
  }

  test("decodeFrames on a single-image container yields one frame") {
    // PNG fixture: one image; gray byte = blue channel of each pixel
    val fs = Multimodal.decodeFrames(fixture("rgb2x2.png"))
    assert(fs.length === 1)
    assert(fs.head === Array[Byte](0, 0, 255.toByte, 255.toByte))
  }

  test("extractFrameStats emits one row per real frame on sf0.001") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val stats = Multimodal.extractFrameStats(
      spark, Multimodal.gifMediaTable(docs))
    val expected = docs.selectExpr("sum(1 + doc_id % 8)")
      .head().getLong(0)
    assert(stats.count() === expected,
      "row count must equal the total declared frame count")
  }

  test("wavEncode round-trips samples through javax.sound.sampled") {
    val data = "sphinx of black quartz judge my vow".getBytes("UTF-8")
    val samples = Multimodal.decodeWavSamples(Multimodal.wavEncode(data))
    assert(samples === data, "8-bit PCM samples must round-trip verbatim")
    // zero-length audio is a valid (empty) stream
    assert(Multimodal.decodeWavSamples(Multimodal.wavEncode(Array.empty)).isEmpty)
    // non-audio payloads fail loudly
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeWavSamples("not audio".getBytes)
    }
    assert(e.getMessage.contains("audio"))
  }

  test("extractAudioWindows: truncated last window, exact amplitude stats") {
    import spark.implicits._
    val text = ("x" * 256) + "abc" // window 0 full, window 1 = 3 samples
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val got = Multimodal
      .extractAudioWindows(spark, Multimodal.wavMediaTable(docs))
      .collect().sortBy(_.window_idx)
    assert(got.length === 2)
    assert(got(0).n_samples === 256 && got(0).sum_amp === 256L * 'x'.toInt
      && got(0).peak_amp === 'x'.toInt)
    assert(got(1).n_samples === 3
      && got(1).sum_amp === ('a' + 'b' + 'c').toLong
      && got(1).peak_amp === 'c'.toInt)
  }

  test("resizeNearest: index arithmetic pinned on the fixture") {
    // 2x2 -> 1x1: nearest picks src(0,0) = red
    val canon = Multimodal.ImageIoDecoder.canonicalBytes(fixture("rgb2x2.bmp"))
    assert(Multimodal.resizeNearest(canon, 2, 2, 1, 1) ===
      Array[Byte](255.toByte, 0, 0))
    // identity resize is a no-op
    assert(Multimodal.resizeNearest(canon, 2, 2, 2, 2) === canon)
    // upscale 2x2 -> 4x4 repeats each pixel in 2x2 blocks: corners hold
    val up = Multimodal.resizeNearest(canon, 2, 2, 4, 4)
    assert(up.length === 48)
    assert((up(0) & 0xFF, up(1) & 0xFF, up(2) & 0xFF) === ((255, 0, 0)))
    val last = 15 * 3
    assert((up(last) & 0xFF, up(last + 1) & 0xFF, up(last + 2) & 0xFF) ===
      ((255, 255, 255)))
  }

  test("extractThumbnails: decode -> resize chain on sf0.001") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val thumbs = Multimodal.extractThumbnails(
      spark, Multimodal.bmpMediaTable(docs))
    assert(thumbs.count() === docs.count() * 4) // 2x2 per doc
    // thumbnail pixel 0 = source pixel (0,0) = first three text bytes
    import spark.implicits._
    val first = docs.selectExpr("doc_id",
      "ascii(substring(text, 1, 1)) AS r").as[(Long, Int)]
      .collect().toMap
    val got = thumbs.filter(_.px_idx == 0).collect()
    got.foreach { t =>
      assert(t.r === first.getOrElse(t.doc_id, 0),
        s"thumb(0) of doc ${t.doc_id} should be the first text byte")
    }
  }

  test("extractFeatures decodes real BMP media distributed on sf0.001") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.bmpMediaTable(docs)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() === docs.count())
    val r = feats.head()
    assert(r.byte_hist.length === 16)
    // decoded-pixel count = the padded grid, a multiple of 12 — NOT the
    // container byte count (n_bytes includes the 54-byte BMP header)
    assert(r.byte_hist.sum % 12 === 0)
    assert(r.n_bytes === r.byte_hist.sum + 54)
    assert(r.frame_bytes.nonEmpty)
  }

  test("BMP and PNG media decode to identical features (container-independence)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(50)
    val viaBmp = Multimodal
      .extractFeatures(spark, Multimodal.bmpMediaTable(docs))
      .select("doc_id", "byte_hist", "frame_bytes")
    val viaPng = Multimodal
      .extractFeatures(spark, Multimodal.pngMediaTable(docs))
      .select("doc_id", "byte_hist", "frame_bytes")
    assert(viaBmp.exceptAll(viaPng).count() === 0)
    assert(viaPng.exceptAll(viaBmp).count() === 0)
  }
}
