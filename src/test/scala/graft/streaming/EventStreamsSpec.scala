package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyCounts: streaming result equals the batch twin on same data") {
    val rows = Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:55:00"), "click", 2.0),
      (ts("2024-01-01 00:30:00"), "error", 5.0),
      (ts("2024-01-01 01:10:00"), "click", 3.0))

    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val streamDf = input.toDF.toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyCounts(streamDf)
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStreams.hourlyCounts(rows.toDF("ts", "event_type", "value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (ts("2024-01-01 00:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 00:00:00"), "error", 1L, 5.0),
        (ts("2024-01-01 01:00:00"), "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("slidingCounts: stream equals batch; events land in length/slide windows") {
    val rows = Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 01:10:00"), "click", 3.0))
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val q = EventStreams.slidingCounts(input.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sliding")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStreams
        .slidingCounts(rows.toDF("ts", "event_type", "value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
      // 1h/15min: each event appears in exactly 4 windows
      assert(streamed.toSeq.map(_._3).sum === rows.size * 4)
      // the 00:00 window holds only the first event
      assert(streamed.contains((ts("2024-01-01 00:00:00"), "click", 1L, 1.0)))
      // 01:00 window holds only the second
      assert(streamed.contains((ts("2024-01-01 01:00:00"), "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionCounts: native session_window stream equals batch") {
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 7L, 1.0),
      (ts("2024-01-01 10:10:00"), 7L, 2.0), // same session (10 min gap)
      (ts("2024-01-01 10:40:00"), 7L, 4.0), // exactly 30 min: still MERGES
      (ts("2024-01-01 11:20:00"), 7L, 8.0), // 40 min silence -> new session
      (ts("2024-01-01 10:00:00"), 8L, 0.5))
    val input = MemoryStream[(Timestamp, Long, Double)](spark)
    val q = EventStreams
      .sessionCounts(input.toDF.toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess_win")
        .as[(Timestamp, Long, Long, Double)].collect().toSet
      val batch = EventStreams
        .sessionCounts(rows.toDF("ts", "user_id", "value"))
        .as[(Timestamp, Long, Long, Double)].collect().toSet
      assert(streamed === batch)
      // the exact-gap event MERGES (inclusive window end) — the boundary
      // fact x_events_session_window's oracle encodes as strict >
      assert(streamed === Set(
        (ts("2024-01-01 10:00:00"), 7L, 3L, 7.0),
        (ts("2024-01-01 11:20:00"), 7L, 1L, 8.0),
        (ts("2024-01-01 10:00:00"), 8L, 1L, 0.5)))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions; closed sessions emit") {
    import EventStreams.{Event, Session}
    val input = MemoryStream[Event](spark)
    val sessions = EventStreams.sessionize(spark, input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
        Event(4, ts("2024-01-01 10:00:00"), 8, "view", 0.5))
      q.processAllAvailable()
      // nothing closed yet: watermark is still behind both sessions
      assert(spark.table("sessions").count() === 0)

      // 12:00 event: closes user 7's session by gap, and advances the
      // watermark to 11:30 so user 8's idle session times out
      input.addData(Event(3, ts("2024-01-01 12:00:00"), 7, "buy", 10.0))
      q.processAllAvailable()
      q.processAllAvailable() // one extra no-data batch to fire timeouts
      val got = spark.table("sessions").as[Session].collect().toSet
      assert(got === Set(
        Session(7, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2, 3.0),
        Session(8, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1, 0.5)))
    } finally q.stop()
  }

  test("sketchRollupSink: incremental HLL union equals a global distinct") {
    import java.nio.file.Files
    val snap = Files.createTempDirectory("graft-hll-snap-").toString
    val ckp = Files.createTempDirectory("graft-hll-ckp-").toString
    def drainBatch(rows: Seq[(Timestamp, Long, String)]): Unit = {
      val in = MemoryStream[(Timestamp, Long, String)](spark)
      in.addData(rows: _*)
      val q = EventStreams.sketchRollupSink(
        in.toDF.toDF("ts", "user_id", "event_type"),
        snap, ckp + Files.createTempDirectory("c").getFileName)
      q.awaitTermination()
    }
    // batch 1: users 1,2 click on day 1
    drainBatch(Seq(
      (ts("2024-01-01 10:00:00"), 1L, "click"),
      (ts("2024-01-01 11:00:00"), 2L, "click")))
    // batch 2: user 2 AGAIN (must not double count) + user 3; one view
    drainBatch(Seq(
      (ts("2024-01-01 12:00:00"), 2L, "click"),
      (ts("2024-01-01 13:00:00"), 3L, "click"),
      (ts("2024-01-01 13:30:00"), 3L, "view")))
    val est = EventStreams.sketchEstimates(spark, snap)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    // HLL at lgK=14 is exact at these cardinalities
    assert(est === Map("click" -> 3L, "view" -> 1L))
    // the snapshot holds sketches, not events: one row per group
    assert(spark.read.parquet(snap).count() == 2)
  }

  test("dedupedEvents: duplicate event ids within the watermark are dropped") {
    val input = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.dedupedEvents(
        input.toDS().toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      import EventStreams.Event
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0), // dup same batch
        Event(2, ts("2024-01-01 10:05:00"), 8, "view", 2.0))
      q.processAllAvailable()
      input.addData(
        Event(1, ts("2024-01-01 10:10:00"), 7, "click", 1.0)) // dup next batch
      q.processAllAvailable()
      assert(spark.table("deduped").count() === 2)
    } finally q.stop()
  }

  test("cdcApplySink maintains a latest-wins snapshot across batches") {
    val input = MemoryStream[(Long, String, Long)](spark)
    val changes = input.toDS().toDF("k", "v", "seq")
    val snap = java.nio.file.Files.createTempDirectory("graft-cdc-s-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-c-").toString

    def readSnap(): Map[Long, (String, Long)] =
      spark.read.parquet(snap).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    // batch 1: two keys, plus an in-batch double update for k=1 (seq wins)
    input.addData((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b0", 1L))
    var q = EventStreams.cdcApplySink(changes, "k", "seq", snap, ckpt)
    q.awaitTermination() // AvailableNow drains and stops
    assert(readSnap() === Map(1L -> ("a1", 2L), 2L -> ("b0", 1L)))

    // batch 2 (restart, same checkpoint): update k=2, insert k=3
    input.addData((2L, "b1", 2L), (3L, "c0", 1L))
    q = EventStreams.cdcApplySink(changes, "k", "seq", snap, ckpt)
    q.awaitTermination()
    assert(readSnap() ===
      Map(1L -> ("a1", 2L), 2L -> ("b1", 2L), 3L -> ("c0", 1L)))
  }

  test("txCdcApplySink: versioned CDC snapshot with time travel across restarts") {
    val input = MemoryStream[(Long, String, Long)](spark)
    val changes = input.toDS().toDF("k", "v", "seq")
    val tdir = java.nio.file.Files.createTempDirectory("graft-txcdc-t-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-txcdc-c-").toString
    val table = graft.ops.TxTable(spark, tdir)

    def readSnap(): Map[Long, (String, Long)] =
      table.read().collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    // batch 1: two keys, plus an in-batch double update for k=1 (seq wins)
    input.addData((1L, "a0", 1L), (1L, "a1", 2L), (2L, "b0", 1L))
    var q = EventStreams.txCdcApplySink(changes, "k", "seq", tdir, ckpt)
    q.awaitTermination()
    assert(readSnap() === Map(1L -> ("a1", 2L), 2L -> ("b0", 1L)))
    val v1 = table.snapshot().version

    // batch 2 (restart, same checkpoint): update k=2, insert k=3
    input.addData((2L, "b1", 2L), (3L, "c0", 1L))
    q = EventStreams.txCdcApplySink(changes, "k", "seq", tdir, ckpt)
    q.awaitTermination()
    assert(readSnap() ===
      Map(1L -> ("a1", 2L), 2L -> ("b1", 2L), 3L -> ("c0", 1L)))
    // the commit log kept batch 1's state: time travel reconstructs it
    assert(table.readAt(v1).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap ===
      Map(1L -> ("a1", 2L), 2L -> ("b0", 1L)))
    assert(table.snapshot().version > v1)
  }

  test("cdcApplySink fails the batch on an unreadable snapshot instead of truncating") {
    val input = MemoryStream[(Long, String, Long)](spark)
    val changes = input.toDS().toDF("k", "v", "seq")
    val snap = java.nio.file.Files.createTempDirectory("graft-cdc-bad-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-badc-").toString
    // an EXISTING snapshot dir with a corrupt footer — must NOT be
    // treated as "first batch" (that would replace history with just
    // this micro-batch)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(snap, "part-00000.parquet"),
      "not parquet".getBytes)

    input.addData((1L, "a0", 1L))
    val q = EventStreams.cdcApplySink(changes, "k", "seq", snap, ckpt)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    // snapshot untouched — the corrupt file is still there for repair
    assert(new java.io.File(snap, "part-00000.parquet").exists())
  }

  test("enrichedEvents: stream-static broadcast join adds dim columns") {
    import EventStreams.Event
    val dim = Seq((7L, "gold"), (9L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.enrichedEvents(input.toDS().toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 8, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user_id", "tier").as[(Long, Option[String])]
        .collect().toSet
      assert(rows === Set((7L, Some("gold")), (8L, None))) // left join
    } finally q.stop()
  }

  test("purchaseAttribution: stream-stream interval join equals the batch twin") {
    import EventStreams.Event
    val views = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
      Event(2, ts("2024-01-01 12:00:00"), 7, "view", 0.0),
      Event(3, ts("2024-01-01 10:00:00"), 8, "view", 0.0))
    val purchases = Seq(
      Event(10, ts("2024-01-01 10:30:00"), 7, "purchase", 5.0), // within 1h of view 1
      Event(11, ts("2024-01-01 11:30:00"), 7, "purchase", 9.0), // within none (1.5h after view 1, before view 2)
      Event(12, ts("2024-01-01 12:00:00"), 7, "purchase", 2.0), // same instant as view 2 (inclusive)
      Event(13, ts("2024-01-01 10:30:00"), 9, "purchase", 1.0)) // other user

    val vIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val q = EventStreams.purchaseAttribution(vIn.toDS().toDF(), pIn.toDS().toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      vIn.addData(views: _*)
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib")
        .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
      val batch = EventStreams.purchaseAttribution(
          views.toDF(), purchases.toDF())
        .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, 10L), (2L, 12L)))
    } finally q.stop()
  }

  test("purchaseAttributionOuter: unconverted views emit nulls after the watermark") {
    import EventStreams.Event
    val vIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val q = EventStreams.purchaseAttributionOuter(vIn.toDS().toDF(), pIn.toDS().toDF())
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      // user 7 converts inside the hour; user 8 never does
      vIn.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
        Event(3, ts("2024-01-01 10:00:00"), 8, "view", 0.0))
      pIn.addData(Event(10, ts("2024-01-01 10:30:00"), 7, "purchase", 5.0))
      q.processAllAvailable()
      // push BOTH watermarks far past view + horizon so the join state
      // for the unmatched view evicts and its null row emits
      vIn.addData(Event(99, ts("2024-01-02 10:00:00"), 1, "view", 0.0))
      pIn.addData(Event(98, ts("2024-01-02 10:00:00"), 1, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select("view_id", "purchase_id").as[(Long, Option[Long])]
        .collect().toSet
      assert(rows.contains((1L, Some(10L))), "converted view pairs")
      assert(rows.contains((3L, None)),
        "unconverted view must emit with null purchase after eviction")
      // batch twin: same code, watermarks no-op, plain left range join
      val batch = EventStreams.purchaseAttributionOuter(
          Seq(Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
            Event(3, ts("2024-01-01 10:00:00"), 8, "view", 0.0)).toDF(),
          Seq(Event(10, ts("2024-01-01 10:30:00"), 7, "purchase", 5.0)).toDF())
        .select("view_id", "purchase_id").as[(Long, Option[Long])]
        .collect().toSet
      assert(batch === Set((1L, Some(10L)), (3L, None)))
    } finally q.stop()
  }

  test("readEventStream: file source over an events landing directory") {
    // the file source needs a directory (a stream landing zone); stage the
    // testdata events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-events-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001"), "events.parquet"),
      java.nio.file.Paths.get(dir, "part-000.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    assert(stream.isStreaming)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("filehourly")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      assert(spark.table("filehourly").count() > 0)
    } finally q.stop()
  }

  test("writeEventSink: exactly-once file sink, restart emits nothing new") {
    val land = java.nio.file.Files.createTempDirectory("graft-land-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001"), "events.parquet"),
      java.nio.file.Paths.get(land, "part-000.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft-sink-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ck-").toString

    def drain(): Unit = {
      val stream = EventStreams.readEventStream(spark, land)
        .where(col("value") > 0)
        .select("event_id", "user_id", "event_type", "value", "ts")
      val q = EventStreams.writeEventSink(stream, out, ckpt)
      q.awaitTermination() // AvailableNow stops itself when drained
    }

    drain()
    val expected = graft.core.Tables.normalizeEventTs(spark.read
      .parquet(java.nio.file.Paths.get(land, "part-000.parquet").toString))
      .where(col("value") > 0).count()
    val got1 = spark.read.parquet(out).count()
    assert(got1 === expected)
    // partitioned layout: event_type became directories
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("event_type=")))

    // restart over the SAME checkpoint: all input already committed, the
    // sink log must not re-emit a single row
    drain()
    assert(spark.read.parquet(out).count() === got1)
  }
}
