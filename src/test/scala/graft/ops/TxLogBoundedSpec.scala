package graft.ops

import java.io.File
import java.nio.file.Files
import java.nio.charset.StandardCharsets

import graft.SparkTestBase

/** Bounded log resolution: the `_last_checkpoint` pointer, the
  * name-probed (listing-free) head resolve, and the parquet checkpoint
  * sidecar — the three devices that keep snapshot resolution
  * O(CheckpointInterval) in ENTRY READS *and* LIST CALLS no matter how
  * many commits the table has accumulated. At object-store scale a
  * LIST is an O(total commits) round trip per operation; these specs
  * pin that the hot paths never issue one. */
class TxLogBoundedSpec extends SparkTestBase {

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, i.toLong * 10)).toDF("k", "v")
  }

  private def mk(): (TxTable, String) = {
    val dir = Files.createTempDirectory("graft-logbound-").toString
    (TxTable(spark, s"$dir/t"), s"$dir/t")
  }

  test("_last_checkpoint pointer lands with each checkpoint and stays monotone") {
    val (t, p) = mk()
    val ptr = new File(s"$p/_log/_last_checkpoint")
    (0 until 9).foreach(i => t.append(df(i to i)))
    assert(!ptr.isFile, "no checkpoint yet -> no pointer")
    t.append(df(9 to 9)) // v9 is the 10th commit... intervals are % 10
    // versions are 0-based: v10 (the 11th commit) is the first multiple
    t.append(df(10 to 10))
    assert(ptr.isFile, "checkpoint at v10 must write the pointer")
    val content = new String(Files.readAllBytes(ptr.toPath),
      StandardCharsets.UTF_8)
    assert(content.contains("\"version\":10"), content)
    (11 to 20).foreach(i => t.append(df(i to i)))
    val content2 = new String(Files.readAllBytes(ptr.toPath),
      StandardCharsets.UTF_8)
    assert(content2.contains("\"version\":20"), content2)
  }

  test("head resolve through the pointer: ZERO listings, O(interval) entry reads") {
    val (t, p) = mk()
    (0 to 24).foreach(i => t.append(df(i to i))) // head v24, ckpt at v20
    // a FRESH instance (no memos) resolving the head
    val t2 = TxTable(spark, p)
    val l0 = t2.logListings.get(); val e0 = t2.entryReads.get()
    val head = t2.snapshot()
    assert(head.version === 24L)
    assert(t2.logListings.get() - l0 === 0L,
      "a pointered head resolve must not LIST the log directory")
    val reads = t2.entryReads.get() - e0
    assert(reads <= TxTable.CheckpointInterval + 1,
      s"expected <= interval+1 entry reads (ckpt + probed tail), got $reads")
    // and the result is exactly what the full-listing path resolves:
    // drop the pointer -> same snapshot, now via listing
    val ptr = new File(s"$p/_log/_last_checkpoint")
    assert(ptr.delete())
    val t3 = TxTable(spark, p)
    val full = t3.snapshot()
    assert(full.version === head.version)
    assert(full.files.toSet === head.files.toSet)
    assert(t3.logListings.get() > 0L, "pointerless resolve lists (fallback)")
  }

  test("incremental log walks probe by name: zero listings") {
    val (t, _) = mk()
    (0 to 14).foreach(i => t.append(df(i to i)))
    val l0 = t.logListings.get()
    val cs = t.commitsBetween(4L, 9L)
    assert(cs.map(_.version) === (5L to 9L))
    val it = t.commitsIterator(11L).toSeq
    assert(it.map(_.version) === (12L to 14L))
    assert(t.logListings.get() - l0 === 0L,
      "commitsBetween/commitsIterator must never LIST the directory")
  }

  test("torn or stale pointer falls back to the listing path, correctly") {
    val (t, p) = mk()
    (0 to 12).foreach(i => t.append(df(i to i))) // ckpt at v10
    val ptr = new File(s"$p/_log/_last_checkpoint")
    // torn content
    Files.write(ptr.toPath, "garbage{{{".getBytes(StandardCharsets.UTF_8))
    assert(TxTable(spark, p).snapshot().version === 12L)
    // stale: names a checkpoint that does not exist
    Files.write(ptr.toPath,
      """{"version":9999999}""".getBytes(StandardCharsets.UTF_8))
    assert(TxTable(spark, p).snapshot().version === 12L)
    // pointing at a DELETED checkpoint is the same stale shape
    Files.write(ptr.toPath,
      """{"version":10}""".getBytes(StandardCharsets.UTF_8))
    assert(new File(f"$p/_log/${10L}%020d.ckpt.json").delete())
    assert(TxTable(spark, p).snapshot().version === 12L)
  }

  test("time travel below the pointer takes the listing path and stays exact") {
    val (t, p) = mk()
    (0 to 21).foreach(i => t.append(df(i to i))) // ckpts at 10, 20
    val t2 = TxTable(spark, p)
    assert(t2.readAt(7L).count() === 8)   // below both checkpoints
    assert(t2.readAt(15L).count() === 16) // between checkpoints
    assert(t2.readAt(20L).count() === 21) // exactly on the newer one
    assert(t2.read().count() === 22)
  }

  test("parquet checkpoint sidecar above the threshold; JSON below it") {
    val saved = TxTable.CheckpointParquetThreshold
    TxTable.CheckpointParquetThreshold = 5
    try {
      val (t, p) = mk()
      // 11 commits -> ckpt at v10 inventories 11 files > 5 -> parquet
      (0 to 10).foreach(i => t.append(df(i to i)))
      val header = new File(f"$p/_log/${10L}%020d.ckpt.json")
      val sidecar = new File(f"$p/_log/${10L}%020d.ckpt.parquet")
      assert(header.isFile && sidecar.isDirectory,
        "big inventory must move to a parquet sidecar")
      val hdr = new String(Files.readAllBytes(header.toPath),
        StandardCharsets.UTF_8)
      assert(hdr.contains("pqref:"), hdr)
      assert(hdr.length < 600, s"header must stay O(1) bytes: $hdr")
      // a FRESH instance resolves through the sidecar bit-exactly
      val t2 = TxTable(spark, p)
      assert(t2.snapshot().version === 10L)
      assert(t2.read().count() === 11)
      assert(t2.readAt(10L).count() === 11)
      assert(t2.snapshot().files.toSet === t.snapshot().files.toSet)
      // rewrites over a sidecar-checkpointed base replay correctly
      t2.deleteExpr("k < 3")
      assert(TxTable(spark, p).read().count() === 8)
    } finally TxTable.CheckpointParquetThreshold = saved
  }

  test("inventory order survives the parquet round-trip (remove-by-name replay)") {
    val saved = TxTable.CheckpointParquetThreshold
    TxTable.CheckpointParquetThreshold = 2
    try {
      val (t, p) = mk()
      (0 to 10).foreach(i => t.append(df(i to i)))
      // hydrated checkpoint inventory == the JSON path's inventory:
      // compare against a freshly replayed snapshot at the same version
      val viaSidecar = TxTable(spark, p).readAt(10L)
        .orderBy("k").collect().map(_.getLong(0)).toSeq
      assert(viaSidecar === (0L to 10L))
    } finally TxTable.CheckpointParquetThreshold = saved
  }

  test("cleanupLog reclaims dead sidecars and keeps the pointer at the cut") {
    val saved = TxTable.CheckpointParquetThreshold
    TxTable.CheckpointParquetThreshold = 2
    try {
      val (t, p) = mk()
      (0 to 31).foreach(i => t.append(df(i to i))) // ckpts 10,20,30
      assert(new File(f"$p/_log/${10L}%020d.ckpt.parquet").isDirectory)
      val deleted = t.cleanupLog(retainVersions = 5L, minAgeMs = 0L)
      // head 31, retain 5 -> target 27 -> cut at ckpt 20: ckpt 10 and
      // its sidecar die, ckpt 20's survives
      assert(deleted.exists(_.endsWith(f"${10L}%020d.ckpt.parquet")))
      assert(!new File(f"$p/_log/${10L}%020d.ckpt.parquet").exists())
      assert(new File(f"$p/_log/${20L}%020d.ckpt.parquet").isDirectory)
      // the pointer stays monotone at the newest checkpoint (30 > cut)
      val ptr = new String(Files.readAllBytes(
        new File(s"$p/_log/_last_checkpoint").toPath),
        StandardCharsets.UTF_8)
      assert(ptr.contains("\"version\":30"), ptr)
      // head still resolves, bounded
      val t2 = TxTable(spark, p)
      val l0 = t2.logListings.get()
      assert(t2.snapshot().version === 31L)
      assert(t2.logListings.get() - l0 === 0L)
      // and pre-cut time travel fails LOUDLY, not empty (below cut=20,
      // whose pre-checkpoint entries are gone)
      val e = intercept[Exception](TxTable(spark, p).readAt(5L).count())
      assert(e.getMessage.contains("cleaned"))
    } finally TxTable.CheckpointParquetThreshold = saved
  }

  test("a cleanup racing the bounded resolve can never serve a stale head") {
    val (t, p) = mk()
    (0 to 30).foreach(i => t.append(df(i to i))) // ckpts 10, 20, 30
    val t2 = TxTable(spark, p)
    // force the race deterministically: t2 reads the pointer (10,
    // planted stale), then a "concurrent cleanup" deletes entries
    // 11..15 and advances the pointer to 20 — exactly cleanupLog's
    // order (pointer BEFORE deletions). The probe hits the deletion
    // gap; the anti-stale guard must re-read the pointer and fall
    // back to the listing path instead of serving v10 as the head.
    java.nio.file.Files.write(
      new File(s"$p/_log/_last_checkpoint").toPath,
      """{"version":10}""".getBytes(StandardCharsets.UTF_8))
    var fired = false
    t2.afterPointerReadHook = () => {
      if (!fired) {
        fired = true
        java.nio.file.Files.write(
          new File(s"$p/_log/_last_checkpoint").toPath,
          """{"version":20}""".getBytes(StandardCharsets.UTF_8))
        (11 to 15).foreach(v =>
          assert(new File(f"$p/_log/$v%020d.json").delete()))
      }
    }
    try {
      val snap = t2.snapshot()
      assert(fired)
      assert(snap.version === 30L,
        "the raced resolve must fall back to the listing, not serve v10")
      assert(TxTable(spark, p).read().count() === 31)
    } finally t2.afterPointerReadHook = () => ()
  }

  test("readChanges refuses a cleaned window loudly instead of truncating") {
    val (t, p) = mk()
    (0 to 25).foreach(i => t.append(df(i to i)))
    val cut = t.cleanupLog(retainVersions = 5L, minAgeMs = 0L)
    assert(cut.nonEmpty)
    // the full-feed window now has a hole below the cut: loud, never
    // a silently truncated feed
    val e = intercept[Exception](t.readChanges(0L).count())
    assert(e.getMessage.contains("missing"), e.getMessage)
    // windows wholly above the cut still serve
    assert(t.readChanges(24L).count() === 1)
  }

  test("stats loading is bounded: consolidated at checkpoints, zero listings") {
    val (t, p) = mk()
    // 25 appends with disjoint k-ranges, crossing checkpoints 10 & 20
    (0 to 24).foreach(i =>
      t.append(df(i * 100 until i * 100 + 10).coalesce(1)))
    val ck20 = new File(f"$p/_log/${20L}%020d.stats.tsv")
    assert(ck20.isFile)
    val head20 = scala.io.Source.fromFile(ck20).getLines().next()
    assert(head20.startsWith("#consolidated"),
      "the checkpoint must consolidate the active stats into its sidecar")
    // a FRESH instance's pruned resolve: stats load through the
    // pointer's consolidated sidecar + probed tail — zero listings —
    // and pruning still narrows to the one matching file
    val t2 = TxTable(spark, p)
    val l0 = t2.logListings.get()
    val hit = t2.prunedSnapshot("k", Some(505L), Some(507L))
    assert(t2.logListings.get() - l0 === 0L,
      "a pruned read must not LIST the log directory")
    assert(hit.files.size === 1, s"expected 1 candidate, got ${hit.files}")
    // pre-checkpoint stats survived consolidation: a range from v3
    // (k 300..309, committed before ckpt 10) still prunes exactly
    val old = t2.prunedSnapshot("k", Some(305L), Some(306L))
    assert(old.files.size === 1)
    // the bounded map equals the full-listing map: drop the pointer
    // and compare the same prune
    assert(new File(s"$p/_log/_last_checkpoint").delete())
    val t3 = TxTable(spark, p)
    assert(t3.prunedSnapshot("k", Some(505L), Some(507L))
      .files.toSet === hit.files.toSet)
    assert(t3.logListings.get() > 0L)
  }

  test("cleanupLog keeps the consolidation marker; pruning stays bounded after") {
    val (t, p) = mk()
    (0 to 24).foreach(i =>
      t.append(df(i * 100 until i * 100 + 10).coalesce(1)))
    // a rewrite above the cut contributes keepLines at cleanup time
    t.deleteExpr("k >= 2400 AND k < 2405")
    assert(t.cleanupLog(retainVersions = 5L, minAgeMs = 0L).nonEmpty)
    val cutStats = new File(f"$p/_log/${20L}%020d.stats.tsv")
    assert(cutStats.isFile)
    assert(scala.io.Source.fromFile(cutStats).getLines().next()
      .startsWith("#consolidated"),
      "cleanup must keep the marker on top, not bury it mid-file")
    val t2 = TxTable(spark, p)
    val l0 = t2.logListings.get()
    assert(t2.prunedSnapshot("k", Some(505L), Some(507L)).files.size === 1)
    assert(t2.logListings.get() - l0 === 0L)
    assert(t2.read().count() === 245) // delete removed 5 rows
  }

  test("entry reads stay flat as history grows (the O(interval) contract)") {
    val (t, p) = mk()
    (0 to 30).foreach(i => t.append(df(i to i)))
    def readsForHeadResolve(): Long = {
      val inst = TxTable(spark, p)
      val e0 = inst.entryReads.get()
      inst.snapshot()
      inst.entryReads.get() - e0
    }
    val at30 = readsForHeadResolve()
    (31 to 80).foreach(i => t.append(df(i to i)))
    val at80 = readsForHeadResolve()
    assert(at80 <= at30 + 1,
      s"head-resolve entry reads grew with history: $at30 -> $at80")
  }
}
