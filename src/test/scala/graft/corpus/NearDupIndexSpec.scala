package graft.corpus

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental near-dup ingest ([[StreamingIngest.nearDupIndexSink]]):
  * within-batch near-dups drop (lower id canonical), later batches drop
  * near-dups of anything ALREADY ACCEPTED via the persisted signature
  * index, novel docs pass — and both the accepted-documents table and
  * the index are TxTables whose `(txnAppId, batchId)` markers make
  * replays no-ops (the engine's idempotence, not directory juggling),
  * including the crash window where only the out table committed. */
class NearDupIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  // near-dup of base: one token changed out of 20 (shingle Jaccard ~0.85)
  private val nearBase = base.replace("omicron", "OTHER")
  private val novel =
    "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
  private val novel2 =
    "red orange yellow green blue indigo violet crimson amber teal " +
      "maroon olive navy silver gold bronze copper pearl jade ruby"

  private def doc(id: Long, text: String) =
    (id, text, "en", "web", ts("2024-01-01 10:00:00"))

  private def run(dirs: (String, String, String),
      batches: Seq[(Long, String)]*): Unit = {
    val (idx, out, ckp) = dirs
    val in = MemoryStream[(Long, String, String, String, Timestamp)](spark)
    val q = StreamingIngest.nearDupIndexSink(
      in.toDF().toDF("doc_id", "text", "lang", "source", "ingest_ts"),
      idx, out, ckp, trigger = None)
    try {
      batches.foreach { b =>
        in.addData(b.map { case (id, t) => doc(id, t) })
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  private def keptIds(out: String): Set[Long] =
    graft.ops.TxTable(spark, out).read().select("doc_id")
      .collect().map(_.getLong(0)).toSet

  private def outRows(out: String): Long =
    graft.ops.TxTable(spark, out).read().count()

  test("in-batch near-dups drop; later batches dedup against the index") {
    val dirs = (Files.createTempDirectory("ndx-i").toString,
      Files.createTempDirectory("ndx-o").toString,
      Files.createTempDirectory("ndx-c").toString)
    run(dirs,
      // batch 0: base + its near-dup (10 drops, 0 is canonical) + novel
      Seq(0L -> base, 10L -> nearBase, 1L -> novel),
      // batch 1: near-dup of batch-0's base (index hit) + novel doc
      Seq(20L -> nearBase, 21L -> novel2))
    assert(keptIds(dirs._2) === Set(0L, 1L, 21L))
    // index carries exactly the accepted docs' bands
    val idxIds = graft.ops.TxTable(spark, dirs._1).read().select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(idxIds === Set(0L, 1L, 21L))
  }

  test("a replayed batch is a no-op (the engine's txn markers, not ours)") {
    val idx = Files.createTempDirectory("ndx-ri").toString
    val out = Files.createTempDirectory("ndx-ro").toString
    val b0 = Seq(doc(0L, base), doc(1L, novel))
      .toDF("doc_id", "text", "lang", "source", "ingest_ts")
    StreamingIngest.nearDupBatch(b0, 0L, idx, out, minSim = 0.75)
    val outV = graft.ops.TxTable(spark, out).snapshot().version
    val idxV = graft.ops.TxTable(spark, idx).snapshot().version
    StreamingIngest.nearDupBatch(b0, 0L, idx, out, minSim = 0.75) // replay
    assert(keptIds(out) === Set(0L, 1L))
    assert(outRows(out) == 2) // no duplicated rows
    // the fast path committed NOTHING on replay — version unchanged
    assert(graft.ops.TxTable(spark, out).snapshot().version === outV)
    assert(graft.ops.TxTable(spark, idx).snapshot().version === idxV)
    // a later batch still dedups against the replayed index
    val b1 = Seq(doc(5L, nearBase), doc(6L, novel2))
      .toDF("doc_id", "text", "lang", "source", "ingest_ts")
    StreamingIngest.nearDupBatch(b1, 1L, idx, out, minSim = 0.75)
    assert(keptIds(out) === Set(0L, 1L, 6L))
  }

  test("crash between the two appends: replay completes the index, docs land once") {
    val idx = Files.createTempDirectory("ndx-ci").toString
    val out = Files.createTempDirectory("ndx-co").toString
    val b0 = Seq(doc(0L, base), doc(1L, novel))
      .toDF("doc_id", "text", "lang", "source", "ingest_ts")
    StreamingIngest.nearDupBatch(b0, 0L, idx, out, minSim = 0.75)
    // batch 1 crashes in the one window where the tables disagree:
    // out committed, index not
    val b1 = Seq(doc(10L, novel2)).toDF(
      "doc_id", "text", "lang", "source", "ingest_ts")
    StreamingIngest.afterOutAppendHook =
      () => sys.error("injected crash between appends")
    try intercept[RuntimeException](
      StreamingIngest.nearDupBatch(b1, 1L, idx, out, minSim = 0.75))
    finally StreamingIngest.afterOutAppendHook = () => ()
    assert(keptIds(out) === Set(0L, 1L, 10L), "out committed pre-crash")
    val idxT = graft.ops.TxTable(spark, idx)
    assert(idxT.read().where(col("doc_id") === 10L).count() === 0,
      "index must not hold the crashed batch yet")
    // replay: the out append raises already-applied (rows land ONCE),
    // the index append completes
    StreamingIngest.nearDupBatch(b1, 1L, idx, out, minSim = 0.75)
    assert(outRows(out) === 3)
    assert(idxT.read().where(col("doc_id") === 10L).count() > 0)
    // and a near-dup of the crashed-then-replayed doc now drops
    val b2 = Seq(doc(20L, novel2.replace("ruby", "RUBY")))
      .toDF("doc_id", "text", "lang", "source", "ingest_ts")
    StreamingIngest.nearDupBatch(b2, 2L, idx, out, minSim = 0.75)
    assert(keptIds(out) === Set(0L, 1L, 10L))
    // dogfooding dividend: the index is time-travelable — version 0
    // is exactly batch 0's bands
    assert(idxT.readAt(0L).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(0L, 1L))
    assert(idxT.history().count() >= 2)
  }

  test("a restarted sink resumes from the checkpoint and keeps deduping") {
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("ndx-src").toString
    val idx = Files.createTempDirectory("ndx-si").toString
    val out = Files.createTempDirectory("ndx-so").toString
    val ckp = Files.createTempDirectory("ndx-sc").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("ingest_ts", TimestampType)))
    def write(batch: Seq[(Long, String, String, String, Timestamp)]): Unit =
      batch.toDF("doc_id", "text", "lang", "source", "ingest_ts")
        .coalesce(1).write.mode("append").parquet(src)
    def drain(): Unit = {
      val q = StreamingIngest.nearDupIndexSink(
        spark.readStream.schema(schema).parquet(src), idx, out, ckp)
      q.awaitTermination()
    }
    write(Seq(doc(0L, base), doc(1L, novel)))
    drain() // run 1: AvailableNow drains file 1 then stops
    write(Seq(doc(20L, nearBase), doc(21L, novel2)))
    drain() // run 2: same checkpoint — must process ONLY file 2
    assert(keptIds(out) === Set(0L, 1L, 21L))
    // file 1 was not reprocessed: doc 0 appears exactly once
    assert(graft.ops.TxTable(spark, out).read()
      .where(col("doc_id") === 0L).count() == 1)
  }

  test("signature similarity separates near-dups from novel text") {
    graft.functions.VectorExpressions.register(spark)
    val sigs = graft.ops.Dedup.shingleTable(
      Seq((0L, base), (1L, nearBase), (2L, novel))
        .toDF("doc_id", "text"))
      .select(col("doc_id"),
        graft.ops.Dedup.minhashSignature(col("sh")).as("sig"))
    val pairs = graft.ops.Dedup.signatureNearDups(sigs, minSim = 0.75)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }
}
