package graft.sources.tx

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.ops.TxTable

/** The TxTable streaming source: incremental append consumption,
  * exactly-once across restarts, compaction silence, rewrite refusal
  * (and its skipChangeCommits escape hatch). */
class TxStreamSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(): (TxTable, String) = {
    val dir = Files.createTempDirectory("graft-txsrc-").toString
    (TxTable(spark, dir), dir)
  }

  private def rows(r: Range) = r.map(i => (i.toLong, s"row-$i")).toDF("id", "payload")

  private def stream(dir: String, extra: (String, String)*) = {
    val base = spark.readStream.format("graft.sources.tx").option("path", dir)
    extra.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("incremental appends arrive once; compaction emits nothing") {
    val (t, dir) = mk()
    t.append(rows(0 until 10))
    val q = stream(dir)
      .writeStream.format("memory").queryName("txsrc1").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txsrc1").count() === 10)
      t.append(rows(10 until 25))
      q.processAllAvailable()
      assert(spark.table("txsrc1").count() === 25)
      t.compact(targetFiles = 1)
      t.append(rows(25 until 30))
      q.processAllAvailable()
      // compaction contributed zero rows; the post-compaction append did
      assert(spark.table("txsrc1").count() === 30)
      assert(spark.table("txsrc1").select("id").distinct().count() === 30)
    } finally q.stop()
  }

  test("identity-table appends stream their rows; token swaps are silent") {
    val (t, dir) = mk()
    t.addIdentityColumn("uid")
    t.append(rows(0 until 5))
    val q = stream(dir)
      .writeStream.format("memory").queryName("txsrcid").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txsrcid").count() === 5)
      // an identity append's commit carries the high-water token swap
      // in its add/remove lists — the stream must read the DATA files
      // only, neither dying on a token "file" nor treating the token
      // remove as a rewrite
      t.append(rows(5 until 12))
      q.processAllAvailable()
      assert(spark.table("txsrcid").count() === 12)
      assert(spark.table("txsrcid").select("uid").distinct().count() === 12)
    } finally q.stop()
  }

  test("exactly-once across restart: a drained checkpoint re-emits nothing") {
    val (t, dir) = mk()
    val out = Files.createTempDirectory("graft-txsrc-out-").toString
    val ckpt = Files.createTempDirectory("graft-txsrc-ck-").toString
    t.append(rows(0 until 10))

    def drain(): Unit = {
      val q = stream(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain()
    assert(spark.read.parquet(out).count() === 10)
    drain() // nothing new committed → nothing re-emitted
    assert(spark.read.parquet(out).count() === 10)
    t.append(rows(10 until 18))
    drain() // only the new commit's rows land
    assert(spark.read.parquet(out).count() === 18)
    assert(spark.read.parquet(out).select("id").distinct().count() === 18)
  }

  test("an order-permuted append streams with values under the right columns") {
    val (t, dir) = mk()
    t.append(rows(0 until 3))
    val q = stream(dir).writeStream.format("memory")
      .queryName("permuted").start()
    try {
      q.processAllAvailable()
      // column order is free for appends (the guard's contract is
      // name -> type) — but the V1 engine rebinds source attributes
      // POSITIONALLY to the batch plan's output, so an unaligned
      // window frame would swap values between same-typed columns
      t.append(rows(3 until 6).select(col("payload"), col("id")))
      q.processAllAvailable()
      val got = spark.table("permuted").orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(got === (0 until 6).map(i => (i.toLong, s"row-$i")))
    } finally q.stop()
  }

  test("gencol and protocol commits mid-stream are silent like constraints") {
    val (t, dir) = mk()
    t.append(Seq((1L, "2024-03-01", "2024")).toDF("id", "d", "y"))
    val q = stream(dir).writeStream.format("memory")
      .queryName("gencolstream").start()
    try {
      q.processAllAvailable()
      // token-only commits: a generated-column declaration and a
      // protocol upgrade change no content and no read schema — they
      // must not poison-pill the running stream
      t.addGeneratedColumn("y", "substring(d, 1, 4)")
      t.upgradeProtocol(1, 3)
      t.append(Seq((2L, "2024-04-01")).toDF("id", "d"))
      q.processAllAvailable()
      val got = spark.table("gencolstream").orderBy("id")
        .select("id", "y").as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "2024"), (2L, "2024")))
    } finally q.stop()
  }

  test("a constraint commit mid-stream is silent in both modes") {
    val (t, dir) = mk()
    t.append(rows(0 until 5))
    val q = stream(dir)
      .writeStream.format("memory").queryName("txsrcct").start()
    val qc = stream(dir, "readChangeFeed" -> "true")
      .writeStream.format("memory").queryName("txsrcctc").start()
    try {
      q.processAllAvailable(); qc.processAllAvailable()
      // a metadata-only constraint commit must neither fail the
      // append-only stream nor surface rows in the CDF stream
      t.addConstraint("id_nonneg", "id >= 0")
      t.append(rows(5 until 8))
      q.processAllAvailable(); qc.processAllAvailable()
      assert(spark.table("txsrcct").count() === 8)
      assert(spark.table("txsrcctc").count() === 8)
    } finally { q.stop(); qc.stop() }
  }

  test("a rewrite commit fails the stream unless skipChangeCommits") {
    val (t, dir) = mk()
    t.append(rows(0 until 10))
    val q = stream(dir)
      .writeStream.format("memory").queryName("txsrc3").start()
    try {
      q.processAllAvailable()
      t.overwrite(rows(100 until 103))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(2000)
      }
      assert(e.getMessage.contains("append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("append-only")))
    } finally q.stop()

    // a NEW stream over the rewritten table starts from the current
    // snapshot (Delta's initial-batch contract) — the pre-stream
    // overwrite is history, not a change commit
    val q2 = stream(dir)
      .writeStream.format("memory").queryName("txsrc3b").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("txsrc3b").count() === 3) // snapshot after overwrite
      t.append(rows(200 until 205))
      q2.processAllAvailable()
      assert(spark.table("txsrc3b").count() === 8)
    } finally q2.stop()

    // skipChangeCommits: a POST-START rewrite is ignored, appends flow
    val q3 = stream(dir, "skipChangeCommits" -> "true")
      .writeStream.format("memory").queryName("txsrc3c").start()
    try {
      q3.processAllAvailable()
      assert(spark.table("txsrc3c").count() === 8) // current snapshot
      t.overwrite(rows(300 until 302))
      t.append(rows(310 until 314))
      q3.processAllAvailable()
      // the overwrite is skipped (its rows never arrive); the append does
      assert(spark.table("txsrc3c").count() === 12)
    } finally q3.stop()
  }

  test("closed loop: tail table A, aggregate, upsert into table B via CDC sink") {
    import graft.streaming.EventStreams
    val (a, aDir) = mk()
    val bDir = Files.createTempDirectory("graft-txsrc-b-").toString
    val ckpt = Files.createTempDirectory("graft-txsrc-loop-ck-").toString
    a.append(rows(0 until 10)) // ids 0..9 → parity counts 5/5

    def pump(): Unit = {
      // per-key running aggregate of the new rows, committed into B with
      // latest-wins CDC semantics (seq = the count high-water mark)
      val agg = stream(aDir)
        .groupBy((col("id") % 2).as("parity"))
        .agg(org.apache.spark.sql.functions.count(col("id")).as("n"))
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          TxTable(spark, bDir).upsert(batch, Seq("parity"))
          ()
        }.start()
      q.awaitTermination()
    }

    pump()
    val b = TxTable(spark, bDir)
    assert(b.read().as[(Long, Long)].collect().toMap === Map(0L -> 5L, 1L -> 5L))
    a.append(rows(10 until 16)) // 3 even + 3 odd more
    pump()
    // the streaming agg's state carried across restarts via the checkpoint,
    // and B's upsert is latest-wins per key
    assert(b.read().as[(Long, Long)].collect().toMap === Map(0L -> 8L, 1L -> 8L))
    // B's own history shows the increments (time travel over the loop)
    assert(b.readAt(0).as[(Long, Long)].collect().toMap === Map(0L -> 5L, 1L -> 5L))
  }

  test("maxCommitsPerTrigger bounds each micro-batch's commit window") {
    val (t, dir) = mk()
    t.append(rows(0 until 4))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    // hold the initial batch until the whole backlog is committed, so
    // the engine then faces six pending commits at once — without the
    // latch the live stream keeps up commit-by-commit and every window
    // is trivially under the cap
    val backlog = new java.util.concurrent.CountDownLatch(1)
    val q = stream(dir, "maxCommitsPerTrigger" -> "2")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes.synchronized { sizes += batch.count() }
        if (id == 0) backlog.await()
        ()
      }.start()
    try {
      // six commits of 2 rows each while batch 0 is held
      (1 to 6).foreach(i => t.append(rows(i * 10 until i * 10 + 2)))
      backlog.countDown()
      q.processAllAvailable()
      val got = sizes.synchronized(sizes.toSeq)
      assert(got.head === 4L) // initial snapshot batch
      assert(got.drop(1).sum === 12L, s"lost or duplicated rows: $got")
      // the cap must split the backlog into three 2-commit windows,
      // never one catch-up batch
      assert(got.drop(1) === Seq(4L, 4L, 4L),
        s"rate limit did not bound the windows: $got")
    } finally q.stop()
  }

  test("maxBytesPerTrigger splits a fat-commit backlog at the byte cap") {
    val (t, dir) = mk()
    // Pre-measure the commit sizes on a scratch table: same data, same
    // single-file writes → same logged byte totals, letting the cap be
    // derived instead of guessed from parquet encoding details.
    val scratchDir = Files.createTempDirectory("graft-txsrc-scratch-").toString
    val scratch = TxTable(spark, scratchDir)
    def fat() = (0 until 3000)
      .map(i => (i.toLong + 100000L, s"fat-payload-$i-${i * 2654435761L}"))
      .toDF("id", "payload").coalesce(1)
    def small(n: Int) = rows(n * 10 until n * 10 + 2).coalesce(1)
    scratch.append(fat())
    (1 to 5).foreach(n => scratch.append(small(n)))
    val sizes0 = scratch.commitsBetween(-1).map(_.bytes)
    assert(sizes0.forall(_ > 0), s"commit entries must carry bytes: $sizes0")
    val fatBytes = sizes0.head
    val smallSum = sizes0.tail.sum
    // cap: all five smalls fit one window; the fat commit alone exceeds it
    val cap = smallSum + 16
    assert(fatBytes > cap, s"fat commit ($fatBytes B) must exceed cap ($cap B)")

    t.append(rows(0 until 4))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val backlog = new java.util.concurrent.CountDownLatch(1)
    val q = stream(dir, "maxBytesPerTrigger" -> cap.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes.synchronized { sizes += batch.count() }
        if (id == 0) backlog.await()
        ()
      }.start()
    try {
      // backlog while batch 0 is held: one fat commit, then five smalls
      t.append(fat())
      (1 to 5).foreach(n => t.append(small(n)))
      backlog.countDown()
      q.processAllAvailable()
      val got = sizes.synchronized(sizes.toSeq)
      assert(got.head === 4L) // initial snapshot batch (uncapped)
      // the over-cap commit is admitted ALONE (never stalls, never
      // drags the smalls in with it); the five under-cap commits then
      // share one window because their logged sizes sum under the cap
      assert(got.drop(1) === Seq(3000L, 10L),
        s"byte cap did not split the backlog as sized: $got")
    } finally q.stop()
  }

  test("compaction commits ride free through the byte cap") {
    val (t, dir) = mk()
    // scratch replay to derive the small-commit size (same data, same
    // single-file write → same logged bytes)
    val scratchDir = Files.createTempDirectory("graft-txsrc-scratch2-").toString
    val scratch = TxTable(spark, scratchDir)
    def small(n: Int) = rows(n * 10 until n * 10 + 2).coalesce(1)
    scratch.append(small(1)); scratch.append(small(2))
    val smallSum = scratch.commitsBetween(-1).map(_.bytes).sum
    assert(smallSum > 0)

    // a FAT initial table makes the compaction rewrite unambiguously
    // over-cap if it were charged: the cap fits exactly the two small
    // appends, nothing more
    def fat() = (0 until 3000)
      .map(i => (i.toLong + 100000L, s"fat-payload-$i-${i * 2654435761L}"))
      .toDF("id", "payload").coalesce(1)
    t.append(fat())
    val cap = smallSum + 16
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val backlog = new java.util.concurrent.CountDownLatch(1)
    val q = stream(dir, "maxBytesPerTrigger" -> cap.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes.synchronized { sizes += batch.count() }
        if (id == 0) backlog.await()
        ()
      }.start()
    try {
      // backlog while batch 0 is held: small, COMPACT (rewrites the fat
      // table — huge added bytes), small. Every getBatch path skips
      // compaction without reading a byte, so the walk must not charge
      // it either: all three ride in ONE window. Charging the compact
      // would split the backlog and throttle the stream around every
      // compaction for batches that read nothing from it.
      t.append(small(1))
      t.compact(targetFiles = 1)
      t.append(small(2))
      backlog.countDown()
      q.processAllAvailable()
      val got = sizes.synchronized(sizes.toSeq)
      assert(got.head === 3000L) // initial snapshot batch
      assert(got.drop(1) === Seq(4L),
        s"compact commit was byte-charged — backlog split: $got")
    } finally q.stop()
  }

  test("readChangeFeed byte cap charges a rewrite's removed bytes too") {
    import org.apache.spark.sql.functions.col
    def fat() = (0 until 3000)
      .map(i => (i.toLong, s"fat-payload-$i-${i * 2654435761L}"))
      .toDF("id", "payload").coalesce(1)
    def small() = rows(9000 until 9002).coalesce(1)
    // scratch replay: same commits → same logged add/remove byte totals
    val scratchDir = Files.createTempDirectory("graft-txsrc-scratch3-").toString
    val scratch = TxTable(spark, scratchDir)
    scratch.append(fat())
    scratch.deleteBetween("id", 0L, 9L)
    scratch.append(small())
    val Seq(_, sDel, sSmall) = scratch.commitsBetween(-1)
    assert(sDel.bytes > 0 && sDel.rmBytes > 0)
    // cap admits the rewrite's ADDED bytes plus the small append with
    // room to spare, but NOT added + removed: only the add+remove
    // charge forces the rewrite into its own window. (A CDC batch
    // diffs the rewrite against its removed files, so its real read
    // cost is add + remove — charging adds alone under-bounds it.)
    val cap = sDel.bytes + sDel.rmBytes / 2
    assert(cap > sDel.bytes + sSmall.bytes,
      "precondition: an adds-only charge would admit rewrite + append together")
    assert(sDel.bytes + sDel.rmBytes > cap,
      "precondition: the add+remove charge must exceed the cap")

    val (t, dir) = mk()
    t.append(fat()) // v0
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val backlog = new java.util.concurrent.CountDownLatch(1)
    val q = stream(dir, "readChangeFeed" -> "true",
      "maxBytesPerTrigger" -> cap.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sizes.synchronized { sizes += batch.count() }
        if (id == 0) backlog.await()
        ()
      }.start()
    try {
      t.deleteBetween("id", 0L, 9L) // v1: rewrite (10 row-level deletes)
      t.append(small())             // v2: 2 inserts
      backlog.countDown()
      q.processAllAvailable()
      val got = sizes.synchronized(sizes.toSeq)
      assert(got.head === 3000L) // initial snapshot (uncapped)
      assert(got.drop(1) === Seq(10L, 2L),
        s"rewrite's removed bytes were not charged — windows: $got")
    } finally q.stop()
  }

  test("startingVersion mid-log: no snapshot batch, CDF byte cap splits at add+remove") {
    import org.apache.spark.sql.functions.col
    def fat() = (0 until 3000)
      .map(i => (i.toLong, s"fat-payload-$i-${i * 2654435761L}"))
      .toDF("id", "payload").coalesce(1)
    def small() = rows(9000 until 9002).coalesce(1)
    val (t, dir) = mk()
    t.append(fat())               // v0: pre-history (must NOT stream)
    t.deleteBetween("id", 0L, 9L) // v1: rewrite (10 row-level deletes)
    t.append(small())             // v2: 2 inserts
    val Seq(_, cDel, cSmall) = t.commitsBetween(-1)
    // cap admits the rewrite's ADDED bytes plus the small append, but
    // NOT added + removed: only the rm charge splits the backlog
    val cap = cDel.bytes + cDel.rmBytes / 2
    assert(cap > cDel.bytes + cSmall.bytes && cDel.bytes + cDel.rmBytes > cap)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = stream(dir, "readChangeFeed" -> "true",
      "startingVersion" -> "1", "maxBytesPerTrigger" -> cap.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = batch.select("_commit_version")
          .collect().map(_.getLong(0)).toSeq.sorted
        sizes.synchronized { sizes += vs }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val got = sizes.synchronized(sizes.toSeq)
      // NO 3000-row initial snapshot: the stream starts at v1's
      // changes (Delta's streaming startingVersion), and the rm
      // charge forces v1 into its own window
      assert(got.map(_.size) === Seq(10, 2),
        s"expected v1's diff alone then v2 — windows: $got")
      assert(got.head.forall(_ == 1L) && got(1).forall(_ == 2L))
      // later commits keep flowing
      t.append(rows(9100 until 9103).coalesce(1))
      q.processAllAvailable()
      assert(sizes.synchronized(sizes.last) === Seq(3L, 3L, 3L))
    } finally q.stop()
  }

  test("startingVersion over a vacuumed window fails LOUDLY, not silently") {
    val (t, dir) = mk()
    t.append(rows(0 until 50))          // v0
    t.overwrite(rows(100 until 103))    // v1: retires v0's files
    // reclaim v0's files (age guard dropped): versions below 1 are
    // now unreadable as changes
    val reclaimed = t.vacuum(1L, minAgeMs = 0L)
    assert(reclaimed.nonEmpty)
    // a CDF stream asked to start BELOW the vacuumed horizon must
    // fail with the vacuum message — silently skipping the missing
    // window would un-count rows in every downstream replica
    val q = stream(dir, "readChangeFeed" -> "true",
      "startingVersion" -> "0")
      .writeStream.format("memory").queryName("txsrc_vac").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("vacuumed")),
      s"expected a loud vacuum failure, got: ${messages(e)}")
    // append-only mode from the vacuumed version fails the same way
    val q2 = stream(dir, "startingVersion" -> "0",
      "skipChangeCommits" -> "true")
      .writeStream.format("memory").queryName("txsrc_vac2").start()
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(messages(e2).exists(_.contains("vacuumed")))
    // a window whose files all SURVIVE the vacuum streams fine: v2's
    // append from startingVersion=2 reads only v2's own files (v1's
    // rewrite diff would need the reclaimed pre-image, so it is
    // below the CDF horizon now — Delta's retention trade)
    t.append(rows(200 until 204)) // v2
    val q3 = stream(dir, "readChangeFeed" -> "true",
      "startingVersion" -> "2")
      .writeStream.format("memory").queryName("txsrc_vac3").start()
    try {
      q3.processAllAvailable()
      assert(spark.table("txsrc_vac3").count() === 4)
      assert(spark.table("txsrc_vac3").select("_change_type")
        .distinct().collect().map(_.getString(0)).toSeq === Seq("insert"))
    } finally q3.stop()
  }

  test("startingVersion below a cleanupLog cut fails loudly, capped or not") {
    val (t, dir) = mk()
    (0 until 25).foreach(i => t.append(rows(i * 2 until i * 2 + 2)))
    assert(t.cleanupLog(retainVersions = 5L, minAgeMs = 0L).nonEmpty)
    def messages(x: Throwable): Seq[String] =
      if (x == null) Nil
      else Option(x.getMessage).toSeq ++ messages(x.getCause)
    def loud(extra: (String, String)*): Unit = {
      val q = stream(dir, (Seq("startingVersion" -> "1") ++ extra): _*)
        .writeStream.format("memory")
        .queryName(s"txsrc_cut${extra.size}").start()
      val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      q.stop()
      assert(messages(e).exists(_.contains("missing")),
        s"expected a loud cleaned-log failure, got: ${messages(e)}")
    }
    // uncapped: the getBatch window guard fires
    loud()
    // byte-capped: pre-fix the offset walk stalled SILENTLY at the
    // gap (no batch ever formed, stream looked idle forever)
    loud("maxBytesPerTrigger" -> "1")
    // CDF mode: the readChanges window guard fires
    loud("readChangeFeed" -> "true")
    // and from the cut itself the stream serves fine
    val ok = stream(dir, "startingVersion" -> "21")
      .writeStream.format("memory").queryName("txsrc_cut_ok").start()
    try {
      ok.processAllAvailable()
      assert(spark.table("txsrc_cut_ok").count() === 8) // v21..24
    } finally ok.stop()
  }

  test("readChangeFeed: snapshot as inserts; DV delete exactly once across restart") {
    val (t, dir) = mk()
    val out = Files.createTempDirectory("graft-txcdc-out-").toString
    val ckpt = Files.createTempDirectory("graft-txcdc-ck-").toString
    t.append(rows(0 until 10)) // v0

    def drain(): Unit = {
      val q = stream(dir, "readChangeFeed" -> "true")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain()
    val r1 = spark.read.parquet(out)
    assert(r1.count() === 10)
    // initial snapshot arrives as insert-tagged rows at the start version
    assert(r1.where(col("_change_type") === "insert").count() === 10)
    assert(r1.select("_commit_version").distinct()
      .as[Long].collect().toSet === Set(0L))

    t.append(rows(10 until 15))  // v1: five inserts
    t.deleteVectorWhere("id", 3L) // v2: merge-on-read delete of one row
    drain()
    val r2 = spark.read.parquet(out)
    assert(r2.count() === 16)
    val dels = r2.where(col("_change_type") === "delete")
      .select("id", "_commit_version").as[(Long, Long)].collect()
    // the DV commit surfaces as exactly ONE row-level delete
    assert(dels.toSeq === Seq((3L, 2L)))
    assert(r2.where(col("_change_type") === "insert" &&
      col("_commit_version") === 1L).count() === 5)

    // restart over the drained checkpoint: nothing re-emitted — the
    // delete arrived exactly once across the restart
    drain()
    assert(spark.read.parquet(out).count() === 16)
  }

  test("readChangeFeed + skipChangeCommits is refused") {
    val (t, dir) = mk()
    t.append(rows(0 until 3))
    val q = stream(dir, "readChangeFeed" -> "true",
      "skipChangeCommits" -> "true")
      .writeStream.format("memory").queryName("txcdc_conflict").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(2000)
      }
      def hasMsg(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("pick one")) ||
          hasMsg(t.getCause))
      assert(hasMsg(e))
    } finally q.stop()
  }

  test("CDC stream survives a window of column-omitting evolve commits") {
    val (t, dir) = mk()
    val out = Files.createTempDirectory("graft-txcdc-ev-out-").toString
    val ckpt = Files.createTempDirectory("graft-txcdc-ev-ck-").toString
    t.append(rows(0 until 5)) // schema: (id, payload)

    def drain(): Unit = {
      val q = stream(dir, "readChangeFeed" -> "true")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain()
    // an evolve append OMITTING the payload column: the next window's
    // change frame lacks a stream-schema column — it must null-fill,
    // not crash the stream with AnalysisException
    t.appendEvolve(Seq(100L, 101L).toDF("id"))
    drain()
    val r = spark.read.parquet(out)
    assert(r.count() === 7)
    val evolved = r.where(col("id") >= 100L)
    assert(evolved.count() === 2)
    assert(evolved.where(col("payload").isNull).count() === 2)
    assert(evolved.where(col("_change_type") === "insert").count() === 2)
  }

  test("streaming source tails a table committed through the conditional-PUT store") {
    // the object-store commit path end to end: every commit below goes
    // through LogStore.ConditionalWrite (service-arbitrated CAS), and
    // the streaming reader — which only ever reads the log — must be
    // oblivious to which store landed the entries
    import graft.ops.LogStore
    val dir = Files.createTempDirectory("graft-txsrc-cond-").toString
    val t = TxTable(spark, dir,
      new LogStore.ConditionalWrite(LogStore.MockConditionalPut))
    t.append(rows(0 until 6))
    val q = stream(dir)
      .writeStream.format("memory").queryName("txsrc_cond").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txsrc_cond").count() === 6)
      t.append(rows(6 until 10))
      q.processAllAvailable()
      assert(spark.table("txsrc_cond").count() === 10)
      assert(spark.table("txsrc_cond").select("id").distinct().count() === 10)
    } finally q.stop()
  }

  test("empty table refuses schema inference with a clear message") {
    val (_, dir) = mk()
    val e = intercept[IllegalArgumentException] {
      stream(dir)
    }
    assert(e.getMessage.contains("empty table"))
  }
}
