package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class StreamingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val docs = Seq(
    // quality reject: under MinTokens
    (1L, "too short", "en", "web", ts("2024-01-01 10:00:00")),
    // first arrival of a duplicated body
    (2L, "the quick brown fox jumps over the dog", "en", "web",
      ts("2024-01-01 10:01:00")),
    // re-crawl of doc 2's body (different id/source) within the horizon
    (3L, "the quick brown fox jumps over the dog", "en", "mirror",
      ts("2024-01-01 10:05:00")),
    // same body modulo whitespace/case -> same canonical fingerprint
    (4L, "  The  quick brown fox jumps over the dog ", "en", "web",
      ts("2024-01-01 10:06:00")),
    (5L, "an entirely different document body here today", "de", "web",
      ts("2024-01-01 10:07:00")))

  test("stream drops low-quality docs and in-horizon duplicate content") {
    val in = MemoryStream[(Long, String, String, String, Timestamp)](spark)
    val stream = StreamingIngest.curated(
      in.toDF().toDF("doc_id", "text", "lang", "source", "ingest_ts"))
    val q = stream.writeStream.format("memory").queryName("ingest")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(docs)
      q.processAllAvailable()
      val kept = spark.table("ingest")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 5L))
    } finally q.stop()
  }

  test("the same transform in batch keeps one doc per fingerprint") {
    val batch = StreamingIngest.curated(
      docs.toDF("doc_id", "text", "lang", "source", "ingest_ts"))
    // batch lacks arrival order: assert one survivor per body, not which
    val bodies = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bodies.size === 2)
    assert(bodies.contains(5L))
    assert((bodies - 5L).subsetOf(Set(2L, 3L, 4L)))
  }
}
