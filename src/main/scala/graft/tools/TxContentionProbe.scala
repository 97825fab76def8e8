package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TxTable

/** Scaling probe for the round-12 transactional paths, the numbers
  * SCALE.md's ×64 table quotes:
  *
  *  1. REBASE UNDER SUSTAINED CONTENTION — a DELETE that loses R
  *     consecutive commit races to stats-disjoint appends must pay
  *     O(R × race-window log entries) driver work ON TOP of the
  *     uncontended delete, INDEPENDENT of table size: the staged
  *     rewrite is reused (lastRewriteStagings == 1), never re-run.
  *     Measured at 1× and K× data: the contention overhead
  *     (contended − uncontended) should be roughly flat while the
  *     uncontended delete itself grows with data.
  *
  *  2. SINK AUTO-COMPACT THRESHOLD WALK — with the size memo, a
  *     steady-state trigger stats only its OWN files: per-trigger
  *     sink cost over a table with K× more active files must not
  *     grow with the file count (the pre-r13 walk was O(active
  *     files) stat calls per trigger).
  *
  * Run: `sbt "runMain graft.tools.TxContentionProbe [K]"` (default 64).
  */
object TxContentionProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 64
    // optional 2nd arg: run only the section whose tag contains it
    // (rebase | sink | log | psink) — iterating on one probe must not
    // pay the whole matrix
    val only = args.drop(1).headOption
    def want(tag: String): Boolean = only.forall(tag.contains)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-tx-contention-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = Tables.customer(spark, "/root/testdata/sf0.1")
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_mktsegment"))

    /** Seed a table with `mult` disjoint-key copies of customer. */
    def seed(mult: Int): TxTable = {
      val dir = Files.createTempDirectory(s"graft-probe-reb$mult-")
        .toString
      val t = TxTable(spark, s"$dir/t")
      val big = (0 until mult).map(i =>
        base.withColumn("c_custkey",
          col("c_custkey") + lit(i.toLong * 100_000_000L)))
        .reduce(_ union _)
      t.append(big.repartition(32))
      t
    }

    /** One DELETE losing `races` consecutive commit CAS races to
      * stats-disjoint appends; returns (seconds, stagings). */
    def contendedDelete(t: TxTable, races: Int, shift: Long): Double = {
      val w = TxTable(spark, t.location)
      var fired = 0
      t.beforeDmlCommitHook = () => {
        if (fired < races) {
          fired += 1
          w.append((0 until 50).map(i =>
            (shift + fired * 1000L + i, "LATE"))
            .toDF("c_custkey", "c_mktsegment"))
        }
      }
      val (_, sec) =
        try time(t.deleteBetween("c_custkey", shift - 99_000L,
          shift - 98_901L))
        finally t.beforeDmlCommitHook = () => ()
      require(fired == races, s"seam fired $fired of $races")
      require(races == 0 || t.lastRewriteStagings == 1,
        s"expected rebase, got ${t.lastRewriteStagings} stagings")
      sec
    }

    if (want("rebase")) {
    println(s"== rebase under sustained contention (R=8), 1x vs ${k}x ==")
    for (mult <- Seq(1, k)) {
      val t = seed(mult)
      // two disjoint delete ranges so both runs rewrite real files;
      // shift picks ranges inside copy 0's key space
      val un = contendedDelete(t, 0, 100_000L)
      val con = contendedDelete(t, 8, 200_000L)
      println(f"mult=$mult%3d uncontended=$un%7.2fs contended(R=8)=" +
        f"$con%7.2fs overhead=${con - un}%6.2fs")
    }
    }

    if (want("sink")) {
    println(s"== sink auto-compact walk: per-trigger cost, few vs many files ==")
    import org.apache.spark.sql.streaming.OutputMode
    for (files <- Seq(40, 40 * k / 2)) {
      val dir = Files.createTempDirectory(s"graft-probe-sink$files-")
        .toString
      val t = TxTable(spark, s"$dir/t")
      // `files` tiny active files via 32-way appends
      val batches = math.max(1, files / 32)
      (0 until batches).foreach { b =>
        t.append((0 until 32).map(i => (b * 100L + i, s"s$b-$i"))
          .toDF("id", "payload").repartition(32))
      }
      val active = t.snapshot().files.size
      t.setProperties(Map(
        "txtable.autoCompact" -> "true",
        "txtable.autoCompact.minFiles" -> "1000000"))
      val sink = new graft.sources.tx.DefaultSource()
        .createSink(spark.sqlContext,
          Map("path" -> s"$dir/t", "txnAppId" -> s"probe-$files"),
          Nil, OutputMode.Append())
      def trigger(b: Long): Double = {
        val df = (0 until 8).map(i => (900_000L + b * 10 + i, "w"))
          .toDF("id", "payload").coalesce(1)
        val s0 = graft.sources.tx.TxTableSink.statCalls.get()
        val (_, sec) = time(sink.addBatch(b, df))
        val stats = graft.sources.tx.TxTableSink.statCalls.get() - s0
        System.err.println(f"  [files=$active] batch $b: $sec%5.2fs " +
          f"($stats stat calls)")
        sec
      }
      trigger(0) // memo fill (first trigger stats the whole table once)
      val steady = (1L to 4L).map(trigger)
      println(f"active=$active%5d steady-state per-trigger: " +
        f"min=${steady.min}%5.2fs median=${steady.sorted.apply(2)}%5.2fs")
    }
    }

    if (want("log")) {
    println(s"== snapshot resolve + append vs commit count (bounded log) ==")
    // The r13 gap: listLog() listed the whole _log directory per
    // operation — O(total commits) even though replay was checkpoint-
    // bounded. The fix (_last_checkpoint pointer + name-probed runs)
    // must make head resolution and appends FLAT in history length.
    // The log is synthesized the way the real writer lays it out
    // (entries, a ckpt every interval, the pointer at the last ckpt):
    // building 50k commits through real Spark appends would probe the
    // write path, not the resolve bound under test.
    for (n <- Seq(1000, 10000, 50000)) {
      val dir = Files.createTempDirectory(s"graft-probe-log$n-").toString
      val t = TxTable(spark, s"$dir/t")
      t.append((0 until 64).map(i => (i.toLong, s"r$i"))
        .toDF("id", "payload").coalesce(1)) // v0: one real file
      val s0 = t.snapshot()
      val inv = ((s0.files ++ s0.dvs).map(_.stripPrefix(s"$dir/t/")) ++
        s0.cts ++ s0.cms).map("\"" + _ + "\"").mkString("[", ",", "]")
      val ts = System.currentTimeMillis()
      val logDir = new java.io.File(s"$dir/t/_log")
      var lastCk = 0L
      (1 to n).foreach { v =>
        Files.write(new java.io.File(logDir, f"$v%020d.json").toPath,
          (s"""{"version":$v,"action":"append","add":[],""" +
            s""""remove":[],"ts":$ts,"bytes":0,"rmBytes":0}""")
            .getBytes("UTF-8"))
        // a per-commit stats sidecar, like a real writer's — what the
        // pre-r14 loadStats() parsed IN FULL per pruned read
        Files.write(
          new java.io.File(logDir, f"$v%020d.stats.tsv").toPath,
          s"data-synth-$v.parquet\tid\tlong\t$v\t$v\n".getBytes("UTF-8"))
        if (v % TxTable.CheckpointInterval == 0) {
          Files.write(
            new java.io.File(logDir, f"$v%020d.ckpt.json").toPath,
            (s"""{"version":$v,"action":"ckpt","add":$inv,""" +
              s""""remove":[],"ts":$ts,"bytes":-1,"rmBytes":-1}""")
              .getBytes("UTF-8"))
          lastCk = v
        }
      }
      // the last checkpoint carries a CONSOLIDATED stats sidecar, the
      // writer's shape after the r14 stats bound
      Files.write(
        new java.io.File(logDir, f"$lastCk%020d.stats.tsv").toPath,
        ("#consolidated\n" +
          s"data-synth-$lastCk.parquet\tid\tlong\t0\t$lastCk\n")
          .getBytes("UTF-8"))
      val ptr = new java.io.File(logDir, "_last_checkpoint")
      Files.write(ptr.toPath,
        s"""{"version":$lastCk}""".getBytes("UTF-8"))
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      // fresh instance per resolve: no memo, the cross-operation cost
      val resolve = med((1 to 9).map { _ =>
        val (_, s) = time(TxTable(spark, s"$dir/t").snapshot())
        s
      })
      // PRUNED resolve: stats load through the consolidated sidecar +
      // probed tail (the pre-r14 path parsed every sidecar above)
      val prunedT = med((1 to 9).map { _ =>
        val (_, s) = time(TxTable(spark, s"$dir/t")
          .prunedSnapshot("id", Some(3L), Some(4L)))
        s
      })
      val (_, appendSec) = time(TxTable(spark, s"$dir/t")
        .append((0 until 8).map(i => (1000L + i, "a"))
          .toDF("id", "payload").coalesce(1)))
      // the PRE-FIX shape for contrast: no pointer -> full listing
      require(ptr.delete())
      val listed = med((1 to 5).map { _ =>
        val (_, s) = time(TxTable(spark, s"$dir/t").snapshot())
        s
      })
      val prunedListed = med((1 to 5).map { _ =>
        val (_, s) = time(TxTable(spark, s"$dir/t")
          .prunedSnapshot("id", Some(3L), Some(4L)))
        s
      })
      println(f"commits=$n%6d resolve(pointer)=${resolve * 1000}%8.2fms " +
        f"resolve(listing)=${listed * 1000}%8.2fms " +
        f"pruned(bounded)=${prunedT * 1000}%8.2fms " +
        f"pruned(listing)=${prunedListed * 1000}%8.2fms " +
        f"append=${appendSec}%5.2fs")
    }
    }

    if (want("vacuum")) {
    println(s"== vacuum wall time vs dead-file count (distributed walk) ==")
    // dead files synthesized directly (vacuum reclaims any aged
    // unreferenced layout file — building them through real rewrites
    // would probe the write path, not the reclaim bound under test)
    for (mult <- Seq(1, k)) {
      val dir = Files.createTempDirectory(s"graft-probe-vac$mult-")
        .toString
      val t = TxTable(spark, s"$dir/t")
      t.append((0 until 64).map(i => (i.toLong, s"l${i % 16}", s"r$i"))
        .toDF("id", "lang", "payload").coalesce(1))
      val deadPerLeaf = 8 * mult // 16 leaves x this: 128 vs 8192 dead
      (0 until 16).foreach { j =>
        val leaf = new java.io.File(s"$dir/t/lang=l$j/shard=s$j")
        leaf.mkdirs()
        (0 until deadPerLeaf).foreach { i =>
          Files.write(new java.io.File(leaf,
            s"data-dead-$j-$i.parquet").toPath, Array[Byte](1, 2, 3))
        }
      }
      val (d, dt) = time(t.vacuum(0L, minAgeMs = 0L, dryRun = true))
      val (r, rt) = time(t.vacuum(0L, minAgeMs = 0L))
      require(d.toSet == r.toSet, "dry-run/real set mismatch")
      require(r.size == 16 * deadPerLeaf,
        s"expected ${16 * deadPerLeaf} reclaimed, got ${r.size}")
      println(f"dead=${16 * deadPerLeaf}%6d dry-walk=${dt}%6.2fs " +
        f"reclaim=${rt}%6.2fs")
    }
    }

    if (want("psink")) {
    import org.apache.spark.sql.streaming.OutputMode
    println(s"== PARTITIONED sink trigger: schema memo must keep it flat ==")
    // partitioned tables cannot use the single-footer schema fast path
    // (partition-column types are inferred from the whole leaf set) —
    // the action-allowlist memo is what keeps their appends O(window)
    for (batches <- Seq(2, k)) {
      val dir = Files.createTempDirectory(s"graft-probe-psink$batches-")
        .toString
      val t = TxTable(spark, s"$dir/t")
      (0 until batches).foreach { b =>
        t.appendPartitioned(
          (0 until 32).map(i => (b * 100L + i, s"p${i % 8}"))
            .toDF("id", "par").repartition(8), Seq("par"))
      }
      val active = t.snapshot().files.size
      val sink = new graft.sources.tx.DefaultSource()
        .createSink(spark.sqlContext,
          Map("path" -> s"$dir/t", "txnAppId" -> s"pprobe-$batches"),
          Seq("par"), OutputMode.Append())
      def trigger(b: Long): Double = {
        val df = (0 until 8).map(i => (800_000L + b * 10 + i, s"p$i"))
          .toDF("id", "par").coalesce(1)
        val t0 = System.nanoTime()
        sink.addBatch(b, df)
        (System.nanoTime() - t0) / 1e9
      }
      trigger(0) // first trigger computes + memoizes the schema
      val steady = (1L to 4L).map(trigger)
      println(f"active=$active%5d partitioned steady-state: " +
        f"min=${steady.min}%5.2fs median=${steady.sorted.apply(2)}%5.2fs")
    }
    }
    spark.stop()
  }
}
