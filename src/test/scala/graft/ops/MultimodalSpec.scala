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
