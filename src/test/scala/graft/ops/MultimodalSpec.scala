package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("FakeDecoder: byte histogram counts every byte exactly once") {
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

  test("extractFeatures: schema and row-per-doc shape on sf0.001") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() === docs.count())
    val r = feats.head()
    assert(r.byte_hist.length === 16)
    assert(r.n_bytes === r.byte_hist.sum)
    assert(r.frame_bytes.nonEmpty)
  }
}
