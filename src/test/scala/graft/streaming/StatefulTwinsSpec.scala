package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Scd2, TimeSeries, TxTable}

/** Streaming twins of the round's batch operators:
  * [[EventStreams.ewmaUpdates]] ≡ [[TimeSeries.ewma]] on in-order
  * input (and drops order-breaking late events), and
  * [[EventStreams.scd2Sink]] maintaining SCD2 version chains in a
  * TxTable across micro-batches and restarts. */
class StatefulTwinsSpec extends SparkTestBase {

  test("ewmaUpdates: stream equals the batch fold; late events dropped") {
    import spark.implicits._
    val input = MemoryStream[TimeSeries.Point](spark)
    val q = EventStreams.ewmaUpdates(spark, input.toDS(), alpha = 0.3)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      val b1 = Seq(
        TimeSeries.Point(1L, 10L, 1000L, 2.0),
        TimeSeries.Point(1L, 11L, 2000L, 4.0),
        TimeSeries.Point(2L, 20L, 1500L, 10.0))
      input.addData(b1: _*)
      q.processAllAvailable()
      // second batch: one in-order event, one LATE (ts before folded)
      input.addData(
        TimeSeries.Point(1L, 12L, 3000L, 8.0),
        TimeSeries.Point(1L, 9L, 500L, 99.0)) // late -> dropped
      q.processAllAvailable()
      val out = spark.table("ewma_out")
        .as[TimeSeries.EwmaPoint].collect()
        .map(p => p.event_id -> p.ewma).toMap
      // batch twin over the SAME in-order events
      val batch = TimeSeries.ewma(
        (b1 :+ TimeSeries.Point(1L, 12L, 3000L, 8.0)).toDS(), 0.3)
        .collect().map(p => p.event_id -> p.ewma).toMap
      assert(out === batch)
      assert(!out.contains(9L)) // the late event emitted nothing
      assert(math.abs(out(11L) - (0.3 * 4.0 + 0.7 * 2.0)) < 1e-12)
    } finally q.stop()
  }

  test("scd2Sink: version chains across micro-batches; restart is idempotent") {
    import spark.implicits._
    val dim = Files.createTempDirectory("graft-scd2sink-").toString
    val ckpt = Files.createTempDirectory("graft-scd2sink-ck-").toString

    def drain(rows: (Long, String, Double, Long)*): Unit = {
      val in = MemoryStream[(Long, String, Double, Long)](spark)
      in.addData(rows: _*)
      val q = EventStreams.scd2Sink(
        in.toDF().toDF("id", "seg", "bal", "seq"),
        keys = Seq("id"), trackCols = Seq("seg", "bal"), seqCol = "seq",
        dimDir = s"$dim/t", checkpointDir = s"$ckpt/${rows.hashCode}")
      q.awaitTermination()
    }

    // batch 1: two chains open; in-batch double change collapses to seq 2
    drain((1L, "A", 10.0, 1L), (1L, "A", 11.0, 2L), (2L, "B", 20.0, 1L))
    val t = TxTable(spark, s"$dim/t")
    assert(t.read().where(col("_current")).count() === 2)
    assert(t.read().where(col("id") === 1L).head().getDouble(2) === 11.0)

    // batch 2: key 1 changes (close + open), key 2 unchanged, key 3 new
    drain((1L, "A", 15.0, 3L), (2L, "B", 20.0, 3L), (3L, "C", 30.0, 1L))
    val rows = t.read()
      .select("id", "bal", "_valid_from", "_valid_to", "_current")
      .as[(Long, Double, Long, Option[Long], Boolean)].collect().toSet
    assert(rows === Set(
      (1L, 11.0, 1L, Some(2L), false),
      (1L, 15.0, 2L, None, true),
      (2L, 20.0, 1L, None, true),
      (3L, 30.0, 2L, None, true)))

    // replayed batch (same content): UNCHANGED everywhere -> no new
    // versions, content-identical head
    val before = t.read().collect().toSet
    drain((1L, "A", 15.0, 3L), (2L, "B", 20.0, 3L), (3L, "C", 30.0, 1L))
    assert(t.read().collect().toSet === before)
    // the dimension is time-travelable per micro-batch
    assert(t.readAt(0).where(col("_current")).count() === 2)
  }

  test("heavyHittersSink: no-eviction stream equals batch; eviction keeps certificate") {
    import spark.implicits._
    val snap = Files.createTempDirectory("graft-hh-snap-").toString
    val ckpt = Files.createTempDirectory("graft-hh-ck-").toString

    def drain(dir: String, ck: String, m: Int,
        rows: (String, String)*): Unit = {
      val in = MemoryStream[(String, String)](spark)
      in.addData(rows: _*)
      val q = EventStreams.heavyHittersSink(
        in.toDF().toDF("source", "term"), "source", "term", m,
        dir, s"$ck/${rows.hashCode}")
      q.awaitTermination()
    }

    // --- no-eviction regime (m exceeds vocabulary): the stream's
    // merged summary must equal EXACT counting over the union of all
    // batches — the deterministic stream ≡ batch fact
    val b1 = Seq("a" -> "x", "a" -> "x", "a" -> "y", "b" -> "p")
    val b2 = Seq("a" -> "x", "a" -> "z", "b" -> "p", "b" -> "q")
    drain(snap, ckpt, 16, b1: _*)
    drain(snap, ckpt, 16, b2: _*)
    val streamed = spark.read.parquet(snap)
      .where("term IS NOT NULL") // drop per-app replay markers
      .select("source", "term", "est", "err")
      .as[(String, String, Long, Long)].collect().toSet
    val exact = (b1 ++ b2).groupBy(identity).map { case ((s, t), g) =>
      (s, t, g.size.toLong, 0L)
    }.toSet
    assert(streamed === exact)
    // query face ranks deterministically
    val top = EventStreams.heavyHittersSnapshot(spark, snap, "source", 1)
      .as[(String, String, Long, Long, Int)].collect().toSet
    assert(top === Set(("a", "x", 3L, 0L, 1), ("b", "p", 2L, 0L, 1)))

    // --- eviction regime (m = 2 < vocabulary): contents are
    // order-dependent but the certificate est − err ≤ true ≤ est must
    // hold for every surviving item, state stays at m rows per group,
    // and the dominant term is guaranteed present
    val snap2 = Files.createTempDirectory("graft-hh-snap2-").toString
    val heavy = Seq.fill(8)("a" -> "hot")
    val noise = Seq("a" -> "c1", "a" -> "c2", "a" -> "c3", "a" -> "c1")
    drain(snap2, ckpt, 2, (heavy.take(4) ++ noise.take(2)): _*)
    drain(snap2, ckpt, 2, (heavy.drop(4) ++ noise.drop(2)): _*)
    val ev = spark.read.parquet(snap2)
      .where("term IS NOT NULL")
      .select("source", "term", "est", "err")
      .as[(String, String, Long, Long)].collect()
    assert(ev.length <= 2)
    val trueCounts = (heavy ++ noise).groupBy(identity)
      .map { case ((_, t), g) => t -> g.size.toLong }
    ev.foreach { case (_, t, est, err) =>
      val real = trueCounts.getOrElse(t, 0L)
      assert(est - err <= real && real <= est,
        s"certificate violated for $t: est=$est err=$err true=$real")
    }
    assert(ev.exists(_._2 == "hot"), "dominant term evicted")

    // --- replay guard (Delta's txnAppId/txnVersion device): the SAME
    // app re-applying an already-incorporated batch id is skipped —
    // SpaceSaving merge is not idempotent, so a crash-replay would
    // double-count without it — while a NEW app (fresh checkpoint)
    // merging into the same snapshot applies normally.
    val snap3 = Files.createTempDirectory("graft-hh-snap3-").toString
    val batch0 = Seq("a" -> "x", "a" -> "x").toDF("source", "term")
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap3, appId = "app-1", batchId = 0L)
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap3, appId = "app-1", batchId = 0L) // replay: skipped
    val afterReplay = spark.read.parquet(snap3)
      .where("term IS NOT NULL")
      .select("term", "est").as[(String, Long)].collect().toSet
    assert(afterReplay === Set(("x", 2L)))
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap3, appId = "app-2", batchId = 0L) // new app: merges
    val afterNewApp = spark.read.parquet(snap3)
      .where("term IS NOT NULL")
      .select("term", "est").as[(String, Long)].collect().toSet
    assert(afterNewApp === Set(("x", 4L)))

    // --- INTERLEAVED writers: each app's high-water marker survives
    // other apps' overwrites, so app-1's crash-replay of batch 1 is
    // still skipped AFTER app-2 merged in between (a last-writer-only
    // stamp forgets app-1 here and double-counts)
    val snap4 = Files.createTempDirectory("graft-hh-snap4-").toString
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap4, appId = "app-1", batchId = 0L)
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap4, appId = "app-1", batchId = 1L)
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap4, appId = "app-2", batchId = 0L)
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap4, appId = "app-1", batchId = 1L) // replay across writers: skipped
    val interleaved = spark.read.parquet(snap4)
      .where("term IS NOT NULL")
      .select("term", "est").as[(String, Long)].collect().toSet
    assert(interleaved === Set(("x", 6L)))
    // and app-1's NEXT real batch still applies
    EventStreams.applyHeavyHittersBatch(batch0, "source", "term", 16,
      snap4, appId = "app-1", batchId = 2L)
    val advanced = spark.read.parquet(snap4)
      .where("term IS NOT NULL")
      .select("term", "est").as[(String, Long)].collect().toSet
    assert(advanced === Set(("x", 8L)))
    // exactly one marker row per app, carrying its own high-water mark
    val marks = spark.read.parquet(snap4).where("term IS NULL")
      .select("app_id", "batch_id").as[(String, Long)].collect().toSet
    assert(marks === Set(("app-1", 2L), ("app-2", 0L)))
  }
}
