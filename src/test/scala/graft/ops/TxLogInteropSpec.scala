package graft.ops

import java.nio.file.Files

import scala.sys.process._

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** SECOND-IMPLEMENTATION cross-check of the commit-log format: an
  * independent Python replayer (`tools/check_txlog.py`, no engine code
  * shared) resolves the same table from the documented semantics alone
  * and must agree with the Scala engine on the active-file set, the
  * deletion vectors, the metadata tokens, and the version — at the
  * head, under time travel, and through a parquet-sidecar checkpoint.
  * A shared misreading of the format between writer and reader would
  * surface here as the two implementations disagreeing. Skipped
  * (cancelled) when python3 is absent. */
class TxLogInteropSpec extends SparkTestBase {

  private def python3: Boolean =
    try Process(Seq("python3", "--version")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, i.toLong * 10, s"row-$i"))
      .toDF("k", "v", "tag")
  }

  /** Run the replayer; returns (version, files, dvs, tokens). */
  private def replay(dir: String, at: Option[Long] = None)
      : (Long, Set[String], Set[String], Set[String]) = {
    val cmd = Seq("python3", "tools/check_txlog.py", dir) ++
      at.map(_.toString)
    val out = new StringBuilder
    val code = Process(cmd, new java.io.File("."))
      .!(ProcessLogger(l => { out.append(l); () }, System.err.println))
    assert(code === 0, s"replayer failed: $out")
    val s = out.toString
    def arr(key: String): Set[String] =
      ("\"" + key + "\":\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(s)
        .map(m => "\"((?:[^\"\\\\]|\\\\.)*)\"".r
          .findAllMatchIn(m.group(1)).map(_.group(1)).toSet)
        .getOrElse(sys.error(s"no $key in: $s"))
    val version = "\"version\":\\s*(-?\\d+)".r.findFirstMatchIn(s)
      .map(_.group(1).toLong).getOrElse(sys.error(s"no version in: $s"))
    (version, arr("files"), arr("dvs"), arr("tokens"))
  }

  private def engineView(t: TxTable, dir: String, at: Long = Long.MaxValue)
      : (Long, Set[String], Set[String], Set[String]) = {
    val s = t.snapshotAt(at)
    (s.version,
      s.files.map(_.stripPrefix(s"$dir/")).toSet,
      s.dvs.map(_.stripPrefix(s"$dir/")).toSet,
      (s.cts ++ s.cms).toSet)
  }

  test("python replayer agrees with the engine on a mixed-history table") {
    assume(python3, "python3 not available")
    val dir = Files.createTempDirectory("graft-interop-").toString + "/t"
    val t = TxTable(spark, dir)
    // a mixed history crossing a checkpoint: appends, a rewrite
    // DELETE, a table property, a constraint — every list shape
    (0 until 11).foreach(i => t.append(df(i * 10 until i * 10 + 10)))
    t.deleteBetween("k", 5L, 24L)
    t.setProperties(Map("owner" -> "interop"))
    t.addConstraint("pos", "v >= 0")
    assert(t.snapshot().version === 13L)
    assert(replay(dir) === engineView(t, dir))
    // time travel below the checkpoint and between commits
    assert(replay(dir, Some(3L)) === engineView(t, dir, 3L))
    assert(replay(dir, Some(11L)) === engineView(t, dir, 11L))
  }

  test("python replayer hydrates a parquet-sidecar checkpoint") {
    assume(python3, "python3 not available")
    val saved = TxTable.CheckpointParquetThreshold
    TxTable.CheckpointParquetThreshold = 2
    try {
      val dir = Files.createTempDirectory("graft-interop-pq-")
        .toString + "/t"
      val t = TxTable(spark, dir)
      (0 until 12).foreach(i => t.append(df(i * 10 until i * 10 + 10)))
      assert(new java.io.File(f"$dir/_log/${10L}%020d.ckpt.parquet")
        .isDirectory, "precondition: sidecar checkpoint present")
      assert(replay(dir) === engineView(t, dir))
      // resolving exactly AT the sidecar checkpoint exercises the
      // hydration path with zero tail commits
      assert(replay(dir, Some(10L)) === engineView(t, dir, 10L))
    } finally TxTable.CheckpointParquetThreshold = saved
  }

  test("python replayer prunes via the consolidated stats sidecar like the engine") {
    assume(python3, "python3 not available")
    val dir = Files.createTempDirectory("graft-interop-st-")
      .toString + "/t"
    val t = TxTable(spark, dir)
    // disjoint k ranges per commit, crossing a checkpoint so the
    // pointer names a `#consolidated` sidecar, plus post-checkpoint
    // tail commits whose per-commit sidecars the bounded load folds
    (0 until 13).foreach(i => t.append(df(i * 100 until i * 100 + 10)))
    val ptr = new java.io.File(s"$dir/_log/_last_checkpoint")
    assert(ptr.isFile, "precondition: pointer present")
    val consolidated = new java.io.File(f"$dir/_log/${10L}%020d.stats.tsv")
    assert(scala.io.Source.fromFile(consolidated).getLines().next()
      .startsWith("#consolidated"),
      "precondition: the checkpoint consolidated its stats sidecar")
    def pythonPruned(lo: Long, hi: Long): Set[String] = {
      val out = new StringBuilder
      val code = Process(Seq("python3", "tools/check_txlog.py", dir,
        "--prune", "k", lo.toString, hi.toString),
        new java.io.File("."))
        .!(ProcessLogger(l => { out.append(l); () }, System.err.println))
      assert(code === 0, s"replayer failed: $out")
      "\"pruned\":\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(out.toString)
        .map(m => "\"((?:[^\"\\\\]|\\\\.)*)\"".r
          .findAllMatchIn(m.group(1)).map(_.group(1)).toSet)
        .getOrElse(sys.error(s"no pruned in: $out"))
    }
    def enginePruned(lo: Long, hi: Long): Set[String] =
      t.prunedSnapshot("k", Some(lo), Some(hi)).files
        .map(_.stripPrefix(s"$dir/")).toSet
    // point, straddle, tail-commit window, miss, and everything —
    // the two implementations must agree on the kept set exactly
    Seq((0L, 5L), (305L, 410L), (1205L, 1206L), (5000L, 6000L),
      (0L, 1000000L)).foreach { case (lo, hi) =>
      val py = pythonPruned(lo, hi)
      assert(py === enginePruned(lo, hi), s"window [$lo,$hi]")
      assert((lo, hi) == (5000L, 6000L) || py.nonEmpty)
    }
    assert(pythonPruned(5000L, 6000L).isEmpty,
      "a miss window must prune everything on both sides")
  }

  test("python replayer decodes the metadata tokens and the translated read") {
    assume(python3, "python3 not available")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-interop-meta-")
      .toString + "/t"
    val t = TxTable(spark, dir)
    // declare-ahead generated column (k26), then content
    t.addGeneratedColumn("k2", "k * 2")
    t.append((0L until 40L).map(i => (i, i * 10, s"row-$i", if (i % 2 == 0) "a" else "b"))
      .toDF("k", "v", "tag", "bucket"))
    // k24: RENAME — pure-metadata column mapping (logical val -> physical v)
    t.renameColumn("v", "val")
    // k43: ADD COLUMN … DEFAULT — exists + current default declarations
    val sql = TxSql(spark)
    sql.run(s"ALTER TABLE txtable.`$dir` ADD COLUMN src STRING DEFAULT 'legacy'")
    // a later batch omitting src AND k2: current default + generation fill
    t.append((40L until 50L).map(i => (i, i * 10, s"row-$i", "c"))
      .toDF("k", "val", "tag", "bucket"))
    // constraint token + a DROP (cmx tombstone) + deletion vectors
    t.addConstraint("kpos", "k >= 0")
    t.dropColumn("bucket")
    t.deleteVectorBetween("k", 5L, 9L)
    // ---- run the replayer with --schema --dump
    val dump = Files.createTempDirectory("graft-interop-dump-")
      .toString + "/read.parquet"
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/check_txlog.py", dir,
      "--schema", "--dump", dump), new java.io.File("."))
      .!(ProcessLogger(l => { out.append(l); () }, System.err.println))
    assert(code === 0, s"replayer failed: $out")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(out.toString)
    val sch = root.get("schema")
    def strMap(field: String): Map[String, String] = {
      val n = sch.get(field)
      import scala.jdk.CollectionConverters._
      n.fieldNames().asScala.map(k => k -> n.get(k).asText()).toMap
    }
    def strList(field: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      sch.get(field).elements().asScala.map(_.asText()).toSeq
    }
    // token families, decoded from documented semantics alone, must
    // equal the engine's own accessors
    assert(strMap("mapping") === Map("val" -> "v"))
    assert(strList("dropped_physical").contains("bucket"))
    assert(strMap("generated") === t.generatedColumns)
    assert(strMap("constraints") === t.constraints)
    assert(strMap("defaults") ===
      Map("src" -> t.property("txtable.default.src").get))
    assert(strMap("exists_defaults") ===
      Map("src" -> t.property("txtable.existsDefault.src").get))
    // the derived LOGICAL schema equals the engine's read schema
    assert(strList("logical_columns").sorted ===
      t.read().columns.toSeq.sorted)
    // the TRANSLATED READ (renames + drop + DVs + exists defaults)
    // matches the engine row-for-row
    assert(root.get("rows").asLong() === t.read().count())
    val cols = t.read().columns.toSeq.sorted
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(spark.read.parquet(dump)) === rows(t.read()))
    // --prune by the LOGICAL name of the RENAMED column: the stats
    // sidecars key PHYSICAL names, so both implementations must
    // translate through the mapping (engine: physName; python: the
    // decoded cm- map) — and agree on the kept set
    val pOut = new StringBuilder
    val pCode = Process(Seq("python3", "tools/check_txlog.py", dir,
      "--prune", "val", "400", "500"), new java.io.File("."))
      .!(ProcessLogger(l => { pOut.append(l); () }, System.err.println))
    assert(pCode === 0, s"replayer failed: $pOut")
    val pruned = "\"pruned\":\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(pOut.toString)
      .map(m => "\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(m.group(1)).map(_.group(1)).toSet)
      .getOrElse(sys.error(s"no pruned in: $pOut"))
    assert(pruned === t.prunedSnapshot("val", Some(400L), Some(500L))
      .files.map(_.stripPrefix(s"$dir/")).toSet)
    assert(pruned.size < t.snapshot().files.size,
      "the window must actually prune (else the probe proves nothing)")
  }

  test("python replayer: timestamp travel and hive-partitioned layouts") {
    assume(python3, "python3 not available")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-interop-pt-")
      .toString + "/t"
    val t = TxTable(spark, dir)
    def rows(r: Range, lang: String) =
      r.map(i => (i.toLong, lang, i.toLong * 2)).toDF("id", "lang", "v")
    t.appendPartitioned(rows(0 until 20, "en"), "lang")
    t.appendPartitioned(rows(20 until 30, "fr"), "lang")
    t.deleteVectorBetween("id", 0L, 4L)
    // --schema --dump over the hive layout: the partition column comes
    // from the manifest's col=value path segments, the translated read
    // surfaces it via hive partitioning, DVs still anti-join
    val dump = Files.createTempDirectory("graft-interop-ptd-")
      .toString + "/read.parquet"
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/check_txlog.py", dir,
      "--schema", "--dump", dump), new java.io.File("."))
      .!(ProcessLogger(l => { out.append(l); () }, System.err.println))
    assert(code === 0, s"replayer failed: $out")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(out.toString)
    import scala.jdk.CollectionConverters._
    assert(root.get("schema").get("logical_columns").elements().asScala
      .map(_.asText()).toSeq.sorted === t.read().columns.toSeq.sorted)
    assert(root.get("rows").asLong() === t.read().count())
    val cols = t.read().columns.toSeq.sorted
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(st(spark.read.parquet(dump)) === st(t.read()))
    // --at-ts resolves by in-commit timestamp exactly like versionAsOf
    val ts0 = t.commitsBetween(-1L, 0L).head.ts
    assert(t.versionAsOf(ts0) === 0L)
    val out2 = new StringBuilder
    val code2 = Process(Seq("python3", "tools/check_txlog.py", dir,
      "--at-ts", ts0.toString), new java.io.File("."))
      .!(ProcessLogger(l => { out2.append(l); () }, System.err.println))
    assert(code2 === 0, s"replayer failed: $out2")
    val v = "\"version\":\\s*(-?\\d+)".r.findFirstMatchIn(out2.toString)
      .map(_.group(1).toLong).get
    assert(v === 0L, s"at-ts resolution: $out2")
    // a pre-table timestamp refuses on both sides
    intercept[Exception](t.versionAsOf(ts0 - 100000L))
    val code3 = Process(Seq("python3", "tools/check_txlog.py", dir,
      "--at-ts", (ts0 - 100000L).toString), new java.io.File("."))
      .!(ProcessLogger(_ => (), _ => ()))
    assert(code3 !== 0, "pre-table --at-ts must fail loudly")
  }

  /** Stage `frame` as ONE local parquet file, returning its path. */
  private def stageParquet(frame: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-interop-src-").toString
    frame.coalesce(1).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get.getAbsolutePath
  }

  private def pyAppend(dir: String, src: String,
      extra: Seq[String] = Nil): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/check_txlog.py", dir,
      "--append", src) ++ extra, new java.io.File("."))
      .!(ProcessLogger(l => { out.append(l); () },
        l => { out.append(l); () }))
    (code, out.toString)
  }

  test("python-AUTHORED commit reads through the engine: rows, stats pruning, CDF") {
    assume(python3, "python3 not available")
    // the WRITE half of the cross-implementation guarantee: the table
    // runs the conditional-PUT store, so both implementations
    // arbitrate commits through the same documented claim protocol
    val dir = Files.createTempDirectory("graft-interop-w-")
      .toString + "/t"
    val t = TxTable(spark, dir,
      new LogStore.ConditionalWrite(new LogStore.FileConditionalPut()))
    t.append(df(0 until 20))
    // a FOREIGN key range so the stats-pruning assertion is sharp
    val src = stageParquet(df(1000 until 1020))
    val (code, out) = pyAppend(dir, src)
    assert(code === 0, s"python append failed: $out")
    assert(out.contains("\"version\": 1"), out)
    // rows: the engine serves the union, and the python-written
    // commit's rows are content-correct
    assert(t.read().count() === 40L)
    assert(t.read().where(col("k") >= 1000L).count() === 20L)
    // the python replayer and the engine agree on the post-foreign log
    assert(replay(dir) === engineView(t, dir))
    // in-commit timestamps stay monotone across the foreign commit
    val ts = t.commitsBetween(-1L, Long.MaxValue).map(_.ts)
    assert(ts === ts.sorted && ts.distinct === ts,
      s"non-monotone in-commit timestamps: $ts")
    // STATS PRUNING off the python-mined footer stats: a probe inside
    // the foreign file's k-range scopes the scan to THAT file alone
    val pruned = t.readPruned(Long.MaxValue,
      Seq(("k", Some(1005L), Some(1010L))))
    assert(pruned.inputFiles.length === 1, pruned.inputFiles.toSeq)
    assert(pruned.inputFiles.head.contains("part-py-"))
    assert(t.readPruned(Long.MaxValue, Seq(("k", Some(5L), Some(9L))))
      .inputFiles.forall(!_.contains("part-py-")))
    // CDF across the foreign commit: its rows arrive as inserts at
    // the python-stamped version
    val cdf = t.readChanges(0L, 1L)
    assert(cdf.where(col("_change_type") === "insert").count() === 20L)
    assert(cdf.agg(org.apache.spark.sql.functions.max(
      col("_commit_version"))).head().getLong(0) === 1L)
    // the engine keeps writing ON TOP of the foreign commit
    t.append(df(50 until 60))
    assert(t.snapshot().version === 2L)
    assert(t.read().count() === 50L)
    assert(replay(dir) === engineView(t, dir))
  }

  test("racing python writer LOSES cleanly: stolen claim, retry at the next version") {
    assume(python3, "python3 not available")
    // the engine side runs a SHORT stale horizon, so the python
    // writer's held claim (its --hold-ms stall models a long PUT
    // without a heartbeat) goes stale and is stolen — python's token
    // re-check must then lose v1 cleanly and land at v2
    val dir = Files.createTempDirectory("graft-interop-race-")
      .toString + "/t"
    val t = TxTable(spark, dir,
      new LogStore.ConditionalWrite(new LogStore.FileConditionalPut(500L)))
    t.append(df(0 until 10))
    val src = stageParquet(df(2000 until 2010))
    val fut = scala.concurrent.Future {
      pyAppend(dir, src, Seq("--hold-ms", "6000"))
    }(scala.concurrent.ExecutionContext.global)
    // wait until python actually holds the v1 claim, then age past
    // the ENGINE's 500 ms horizon
    val claim = new java.io.File(
      s"$dir/_log/00000000000000000001.json.claim")
    val deadline = System.currentTimeMillis() + 15000L
    while (!claim.exists() && System.currentTimeMillis() < deadline)
      Thread.sleep(50L)
    assert(claim.exists(), "python never claimed v1")
    Thread.sleep(800L) // > the engine's 500 ms stale horizon
    t.append(df(10 until 20)) // steals the stale claim, wins v1
    assert(t.snapshot().version === 1L)
    val (code, out) = scala.concurrent.Await.result(
      fut, scala.concurrent.duration.Duration(60, "s"))
    assert(code === 0, s"python append failed: $out")
    assert(out.contains("\"version\": 2"), out)
    // both histories intact and contiguous; content correct
    assert(t.snapshot().version === 2L)
    assert(t.read().count() === 30L)
    assert(t.read().where(col("k") >= 2000L).count() === 10L)
    assert(replay(dir) === engineView(t, dir))
  }

  test("python writer's capability gate refuses features it cannot honor") {
    assume(python3, "python3 not available")
    val dir = Files.createTempDirectory("graft-interop-gate-")
      .toString + "/t"
    val t = TxTable(spark, dir)
    t.append(df(0 until 5))
    t.addConstraint("pos", "v >= 0")
    val src = stageParquet(df(100 until 105))
    val (code, out) = pyAppend(dir, src)
    assert(code !== 0, "append to a constrained table must refuse")
    assert(out.toLowerCase.contains("cannot honor"), out)
    // nothing landed: version and content unchanged
    assert(t.snapshot().version === 1L)
    assert(t.read().count() === 5L)
  }

  test("python replayer honors the pointer and survives a torn one") {
    assume(python3, "python3 not available")
    val dir = Files.createTempDirectory("graft-interop-ptr-")
      .toString + "/t"
    val t = TxTable(spark, dir)
    (0 until 15).foreach(i => t.append(df(i to i)))
    val expected = engineView(t, dir)
    assert(replay(dir) === expected)
    // torn pointer: both implementations must fall back identically
    java.nio.file.Files.write(
      new java.io.File(s"$dir/_log/_last_checkpoint").toPath,
      "garbage".getBytes("UTF-8"))
    assert(replay(dir) === expected)
    assert(engineView(t, dir) === expected)
  }
}
