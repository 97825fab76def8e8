package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[MaterializedView]]: incremental GROUP-BY maintenance over a
  * TxTable's change feed. The invariant under test everywhere: after a
  * refresh, the view EQUALS the full recompute over the base head — for
  * every base write shape — while only the changed window was read; and
  * the watermark-in-commit-tag design makes replays no-ops. */
class MaterializedViewSpec extends SparkTestBase {

  private def rows(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, (i % 7).toLong, (i % 10).toDouble))
      .toDF("id", "grp", "v")
  }

  private def mk(): (TxTable, MaterializedView) = {
    val dir = Files.createTempDirectory("graft-mv-").toString
    val base = TxTable(spark, s"$dir/base")
    (base, MaterializedView(spark, base, s"$dir/mv", Seq("grp"), Seq("v")))
  }

  private def recompute(base: TxTable) =
    base.read().groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("v_sum"))

  private def state(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("grp"), col("n_rows"), col("v_sum"))
      .collect().map(_.toString).sorted.toSeq

  test("refresh folds appends, DV deletes, whole-group deletes, upserts") {
    val (base, mv) = mk()
    base.append(rows(0 until 100))
    assert(mv.refresh().isDefined)
    assert(mv.appliedVersion === 0L)
    assert(state(mv.read()) === state(recompute(base)))

    // append + needle DV delete in one window
    base.append(rows(100 until 200))
    base.deleteVectorBetween("id", 0L, 49L)
    assert(mv.refresh().isDefined)
    assert(state(mv.read()) === state(recompute(base)))

    // a WHOLE group emptied by deletes must drop out of the view
    base.deleteVectorWhere("grp", 3L)
    assert(mv.refresh().isDefined)
    assert(mv.read().where(col("grp") === 3L).count() === 0)
    assert(state(mv.read()) === state(recompute(base)))

    // an upsert (CDF delete+insert pair) that MOVES rows across groups
    import spark.implicits._
    val moved = (60L until 70L).map(i => (i, 6L, 99.0)).toDF("id", "grp", "v")
    base.upsert(moved, Seq("id"))
    assert(mv.refresh().isDefined)
    assert(state(mv.read()) === state(recompute(base)))
  }

  test("appliedVersion backward-probes: many refreshes, foreign commits, cleanup") {
    val (base, mv) = mk()
    // 15 refresh rounds: the tag walk must always find the NEWEST tag
    // (a forward contiguous replay and a backward probe agree; the
    // probe is O(1) entry reads per call instead of O(refreshes))
    (0 until 15).foreach { i =>
      base.append(rows(i * 10 until i * 10 + 10))
      assert(mv.refresh().isDefined)
      assert(mv.appliedVersion === i.toLong)
    }
    assert(state(mv.read()) === state(recompute(base)))
    // a FOREIGN (untagged) commit on the MV table — e.g. a manual
    // OPTIMIZE — must not hide the tag underneath it
    val mvTable = TxTable(spark,
      mv.read().inputFiles.head.replaceAll("/[^/]+$", "")
        .stripPrefix("file:"))
    mvTable.compact(targetFiles = 1)
    assert(mv.appliedVersion === 14L)
    // still refreshable after the interloper
    base.append(rows(900 until 910))
    assert(mv.refresh().isDefined)
    assert(mv.appliedVersion === 15L)
    assert(state(mv.read()) === state(recompute(base)))
  }

  test("refresh is exactly-once: already-current and replayed folds no-op") {
    val (base, mv) = mk()
    base.append(rows(0 until 50))
    assert(mv.refresh().isDefined)
    assert(mv.refresh().isEmpty, "second refresh must see nothing new")
    val w = mv.appliedVersion
    // crash-replay shape: the SAME change window folded again is a no-op
    base.append(rows(50 until 80))
    val head = base.snapshot().version
    val window = base.readChanges(w, head)
    assert(mv.foldBatch(window, head).isDefined)
    assert(mv.foldBatch(window, head).isEmpty, "replayed fold must no-op")
    assert(state(mv.read()) === state(recompute(base)))
  }

  test("streaming maintenance equals recompute and survives restart") {
    val (base, mv) = mk()
    val ckpt = Files.createTempDirectory("graft-mv-ckpt-").toString
    base.append(rows(0 until 60))
    val q1 = mv.maintainStream(ckpt)
    try {
      q1.processAllAvailable()
      assert(state(mv.read()) === state(recompute(base)))
      base.append(rows(60 until 120))
      base.deleteVectorBetween("id", 10L, 19L)
      q1.processAllAvailable()
      assert(state(mv.read()) === state(recompute(base)))
    } finally q1.stop()
    // restart from the checkpoint: nothing re-applied, new commits flow
    base.append(rows(120 until 150))
    val q2 = mv.maintainStream(ckpt)
    try {
      q2.processAllAvailable()
      assert(state(mv.read()) === state(recompute(base)))
      // total row count proves the initial snapshot was not double-folded
      assert(mv.read().agg(sum(col("n_rows"))).head.getLong(0) === 140L)
    } finally q2.stop()
  }

  test("NULL group keys fold as ONE group (null-safe combine join)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-null-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("tag"), Seq("v"))
    def batch(r: Range, tagOf: Int => Option[String]) =
      r.map(i => (i.toLong, tagOf(i).orNull, i.toLong)).toDF("id", "tag", "v")
    base.append(batch(0 until 10, i => if (i % 2 == 0) Some("a") else None))
    assert(mv.refresh().isDefined)
    base.append(batch(10 until 20, i => if (i % 2 == 0) Some("a") else None))
    assert(mv.refresh().isDefined)
    // pre-fix, the equality join kept current/delta NULL rows apart:
    // two NULL-group rows, neither carrying the true count
    val nullRows = mv.read().where(col("tag").isNull).collect()
    assert(nullRows.length === 1, s"NULL group rows: ${nullRows.length}")
    assert(nullRows.head.getAs[Long]("n_rows") === 10L)
    assert(nullRows.head.getAs[Long]("v_sum") ===
      (0 until 20).filter(_ % 2 == 1).map(_.toLong).sum)
    // deletes drain the NULL group through the same null-safe path
    base.deleteVectorBetween("id", 1L, 19L)
    assert(mv.refresh().isDefined)
    assert(mv.read().where(col("tag").isNull).count() === 0)
    assert(mv.read().where(col("tag") === "a").head()
      .getAs[Long]("n_rows") === 1L)
  }

  test("MIN/MAX maintain: insert windows fold, delete windows recompute bounded") {
    import spark.implicits._
    def mrows(r: Range) =
      r.map(i => (i.toLong, (i % 7).toLong, i.toDouble)).toDF("id", "grp", "v")
    val dir = Files.createTempDirectory("graft-mv-mm-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Seq("v"), Seq("v"), Seq("v"))
    def full() = base.read().groupBy("grp").agg(
      count(lit(1)).as("n_rows"), sum(col("v")).as("v_sum"),
      min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("grp"), col("n_rows"), col("v_sum"),
        col("v_min"), col("v_max")).collect().map(_.toString).sorted.toSeq
    base.append(mrows(0 until 100))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // pure-insert window: homomorphic least/greatest fold
    base.append(mrows(100 until 200))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // deleting the CURRENT MAX rows of every group: a fold would keep
    // the stale extremum — the bounded recompute must retire it
    base.deleteVectorBetween("id", 150L, 199L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    assert(mv.read().agg(max(col("v_max"))).head.getDouble(0) === 149.0)
    // deleting the MIN side the same way
    base.deleteVectorBetween("id", 0L, 9L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // an upsert MOVING the extremes across groups (CDF delete+insert)
    val moved = (140L until 150L).map(i => (i, 6L, 999.0 + i))
      .toDF("id", "grp", "v")
    base.upsert(moved, Seq("id"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // a WHOLE group drained by deletes drops out
    base.deleteVectorWhere("grp", 3L)
    assert(mv.refresh().isDefined)
    assert(mv.read().where(col("grp") === 3L).count() === 0)
    assert(st(mv.read()) === st(full()))
    // replay no-ops hold for the extrema path too
    assert(mv.refresh().isEmpty)
  }

  test("AVG maintains via backing sum + NON-NULL count (SQL null semantics)") {
    import spark.implicits._
    def arows(r: Range) = r.map(i => (i.toLong, (i % 5).toLong,
      if (i % 7 == 0) None else Some(i.toDouble))).toDF("id", "grp", "v")
    val dir = Files.createTempDirectory("graft-mv-avg-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Nil, Nil, Nil, Seq("v"))
    def full() = base.read().groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), avg(col("v")).as("v_avg"))
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("grp"), col("n_rows"), col("v_avg"))
        .collect().map(_.toString).sorted.toSeq
    base.append(arows(0 until 100))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // the backing state stays internal: the served view is exactly
    // groupCols + n_rows + v_avg
    assert(mv.read().columns.sorted.toSeq === Seq("grp", "n_rows", "v_avg"))
    // inserts, a delete window, and a null-flipping upsert all fold
    // (AVG is SUM-class: signed sum + signed non-null count, no
    // recompute even under deletes)
    base.append(arows(100 until 160))
    base.deleteVectorBetween("id", 10L, 39L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    val flip = (40L until 50L).map(i =>
      (i, (i % 5).toLong, None: Option[Double])).toDF("id", "grp", "v")
    base.upsert(flip, Seq("id"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // a group whose every v is NULL serves a NULL average, not 0/0
    val allNull = (900L until 905L).map(i =>
      (i, 9L, None: Option[Double])).toDF("id", "grp", "v")
    base.append(allNull)
    assert(mv.refresh().isDefined)
    val g9 = mv.read().where(col("grp") === 9L).head()
    assert(g9.getAs[Long]("n_rows") === 5L && g9.isNullAt(
      mv.read().columns.indexOf("v_avg")))
    assert(st(mv.read()) === st(full()))
  }

  test("STDDEV/VARIANCE maintain via backing sum/sumsq/count (sample semantics)") {
    import spark.implicits._
    def arows(r: Range) = r.map(i => (i.toLong, (i % 5).toLong,
      if (i % 7 == 0) None else Some((i % 13).toDouble))).toDF("id", "grp", "v")
    val dir = Files.createTempDirectory("graft-mv-std-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Nil, Nil, Nil, Nil, Seq("v"), Seq("v"))
    def full() = base.read().groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        stddev_samp(col("v")).as("v_stddev"),
        var_samp(col("v")).as("v_var"))
    // rounded compare: the MV derives its moments from Σx/Σx²/n, the
    // recompute uses Spark's streaming moments — same value, different
    // floating-point path
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("grp"), col("n_rows"),
        round(col("v_stddev"), 6).as("s"), round(col("v_var"), 6).as("x"))
        .collect().map(_.toString).sorted.toSeq
    base.append(arows(0 until 100))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // backing state stays internal: served view is exactly the asked-for
    assert(mv.read().columns.sorted.toSeq ===
      Seq("grp", "n_rows", "v_stddev", "v_var"))
    // inserts, a delete window, and a null-flipping upsert all fold —
    // moments are SUM-class: signed sum, sumsq and non-null count,
    // NO recompute even under deletes
    base.append(arows(100 until 160))
    base.deleteVectorBetween("id", 10L, 39L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    val flip = (40L until 50L).map(i =>
      (i, (i % 5).toLong, None: Option[Double])).toDF("id", "grp", "v")
    base.upsert(flip, Seq("id"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // sample semantics: one non-null row → NULL, not 0 (and an all-null
    // group too)
    base.append(Seq((900L, 9L, Some(42.0))).toDF("id", "grp", "v"))
    base.append((910L until 915L).map(i =>
      (i, 8L, None: Option[Double])).toDF("id", "grp", "v"))
    assert(mv.refresh().isDefined)
    val out = mv.read()
    val g9 = out.where(col("grp") === 9L).head()
    assert(g9.isNullAt(out.columns.indexOf("v_stddev")))
    assert(g9.isNullAt(out.columns.indexOf("v_var")))
    val g8 = out.where(col("grp") === 8L).head()
    assert(g8.getAs[Long]("n_rows") === 5L)
    assert(g8.isNullAt(out.columns.indexOf("v_var")))
    assert(st(out) === st(full()))
    // a CONSTANT group's variance is exactly 0 (cancellation clamped),
    // never negative
    base.append((920L until 930L).map(i =>
      (i, 7L, Some(5.5))).toDF("id", "grp", "v"))
    assert(mv.refresh().isDefined)
    val g7 = mv.read().where(col("grp") === 7L)
      .select("v_stddev", "v_var").head()
    assert(g7.getDouble(0) === 0.0 && g7.getDouble(1) === 0.0)
  }

  test("COUNT(DISTINCT) maintains EXACTLY via the signed pair-count aux table") {
    import spark.implicits._
    // values recycle mod 12 so duplicates, retirements, and
    // reappearances all occur; every 7th value is NULL (never counts)
    def arows(r: Range) = r.map(i => (i.toLong, (i % 5).toLong,
      if (i % 7 == 0) None else Some((i % 12).toLong))).toDF("id", "grp", "v")
    val dir = Files.createTempDirectory("graft-mv-dc-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Nil, Nil, Nil, Nil, Nil, Nil, Nil, Seq("v"))
    def full() = base.read().groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("v")).as("v_dcnt"))
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("grp"), col("n_rows"), col("v_dcnt"))
        .collect().map(_.toString).sorted.toSeq
    base.append(arows(0 until 120))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // a delete that removes SOME occurrences of a value must not
    // retire it; deleting the LAST occurrence must (signed pair fold)
    base.deleteVectorBetween("id", 0L, 59L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // insert + delete in one window; upsert flips values across groups
    base.append(arows(120 until 200))
    base.deleteVectorBetween("id", 100L, 139L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    val moved = (150L until 160L).map(i => (i, 1L, Some(99L): Option[Long]))
      .toDF("id", "grp", "v")
    base.upsert(moved, Seq("id"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(full()))
    // a group whose every value is NULL serves 0 (SQL COUNT DISTINCT)
    base.append((900L until 903L).map(i => (i, 9L, None: Option[Long]))
      .toDF("id", "grp", "v"))
    assert(mv.refresh().isDefined)
    val g9 = mv.read().where(col("grp") === 9L).head()
    assert(g9.getAs[Long]("n_rows") === 3L)
    assert(g9.getAs[Long]("v_dcnt") === 0L)
    assert(st(mv.read()) === st(full()))
    // the aux state is bounded by LIVE pairs, and its txn marker (the
    // aux watermark, swapped atomically with every fold) sits at the
    // view's watermark (the crash-replay invariant: aux lands first)
    val aux = TxTable(spark, s"$dir/mv/_dcnt_v")
    val livePairs = base.read().where(col("v").isNotNull)
      .select("grp", "v").distinct().count()
    assert(aux.read().count() === livePairs)
    assert(aux.txnVersion(MaterializedView.AuxTxnApp)
      .contains(mv.appliedVersion))
    // replayed refresh no-ops on BOTH tables
    val auxV = aux.snapshot().version
    assert(mv.refresh().isEmpty)
    assert(aux.snapshot().version === auxV)
  }

  test("COUNT(DISTINCT) maintained by the STREAM (pair fold per micro-batch)") {
    import spark.implicits._
    def arows(r: Range) = r.map(i => (i.toLong, (i % 4).toLong,
      (i % 9).toLong)).toDF("id", "grp", "v")
    val dir = Files.createTempDirectory("graft-mv-dcs-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Nil, Nil, Nil, Nil, Nil, Nil, Nil, Seq("v"))
    def full() = base.read().groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("v")).as("v_dcnt"))
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("grp"), col("n_rows"), col("v_dcnt"))
        .collect().map(_.toString).sorted.toSeq
    val ckpt = Files.createTempDirectory("graft-mv-dcs-ckpt-").toString
    base.append(arows(0 until 80))
    val q = mv.maintainStream(ckpt)
    try {
      q.processAllAvailable()
      assert(st(mv.read()) === st(full()))
      // a delete window retiring whole values streams through the
      // signed pair fold (no recompute path exists for dcnt)
      base.append(arows(80 until 120))
      base.deleteVectorBetween("id", 0L, 49L)
      q.processAllAvailable()
      assert(st(mv.read()) === st(full()))
    } finally q.stop()
    // the aux landed with the view's watermark through every batch
    assert(TxTable(spark, s"$dir/mv/_dcnt_v")
      .txnVersion(MaterializedView.AuxTxnApp)
      .contains(mv.appliedVersion))
  }

  test("aux fold is a BOUNDED merge: a needle window leaves distant aux files alone") {
    import spark.implicits._
    // 16 groups x 200 values: the range-clustered initial population
    // spreads (grp, v) pairs across many files, each holding a
    // contiguous key range
    val dir = Files.createTempDirectory("graft-mv-dcb-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Nil, Nil, Nil, Nil, Nil, Nil, Nil, Seq("v"))
    base.append((0 until 3200).map(i =>
      (i.toLong, (i % 16).toLong, (i % 200).toLong)).toDF("id", "grp", "v"))
    // at this row count AQE would coalesce the range partitions into
    // one file (at scale it keeps advisory-SIZED ranges — contiguous
    // either way); disable coalescing so the file-level locality the
    // pruning relies on is visible in a 3,200-pair fixture
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try assert(mv.refresh().isDefined)
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    val aux = TxTable(spark, s"$dir/mv/_dcnt_v")
    val before = aux.read().inputFiles.toSet
    assert(before.size >= 4,
      s"range clustering should spread pairs over files: ${before.size}")
    // needle window: one group's rows change — the fold must MERGE,
    // rewriting only the files whose key range covers grp=3, and the
    // distant files must survive by identity (content-unique names)
    base.deleteVectorWhere("grp", 3L)
    assert(mv.refresh().isDefined)
    val after = aux.read().inputFiles.toSet
    val survived = (before intersect after).size
    assert(survived > 0 && survived >= before.size / 2,
      s"needle fold should leave distant aux files untouched: " +
        s"${before.size} before, $survived survived")
    // and the answer stays exact
    val expect = base.read().groupBy("grp")
      .agg(countDistinct(col("v")).as("v_dcnt"))
      .collect().map(_.toString).sorted.toSeq
    assert(mv.read().select(col("grp"), col("v_dcnt"))
      .collect().map(_.toString).sorted.toSeq === expect)
  }

  test("COUNT(DISTINCT) over a grouping column refuses at construction") {
    val dir = Files.createTempDirectory("graft-mv-dcg-").toString
    val base = TxTable(spark, s"$dir/base")
    intercept[IllegalArgumentException] {
      MaterializedView(spark, base, s"$dir/mv",
        Seq("grp"), Nil, Nil, Nil, Nil, Nil, Nil, Nil, Seq("grp"))
    }
  }

  test("MIN/MAX MV maintained by its own stream across a delete window") {
    import spark.implicits._
    def mrows(r: Range) =
      r.map(i => (i.toLong, (i % 7).toLong, i.toDouble)).toDF("id", "grp", "v")
    val dir = Files.createTempDirectory("graft-mv-mm-st-").toString
    val base = TxTable(spark, s"$dir/base")
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Seq("v"), Seq("v"), Seq("v"))
    def full() = base.read().groupBy("grp").agg(
      count(lit(1)).as("n_rows"), sum(col("v")).as("v_sum"),
      min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("grp"), col("n_rows"), col("v_sum"),
        col("v_min"), col("v_max")).collect().map(_.toString).sorted.toSeq
    base.append(mrows(0 until 100))
    val q = mv.maintainStream(s"$dir/ck")
    try {
      q.processAllAvailable()
      assert(st(mv.read()) === st(full()))
      // a micro-batch whose window both appends AND retires every
      // group's maximum: the streaming fold must route through the
      // bounded recompute exactly like a batch refresh
      base.append(mrows(100 until 160))
      base.deleteVectorBetween("id", 120L, 159L)
      q.processAllAvailable()
      assert(st(mv.read()) === st(full()))
      assert(mv.read().agg(max(col("v_max"))).head.getDouble(0) === 119.0)
    } finally q.stop()
  }

  test("SQL-created MV maintained under a streaming txtable ingest sink") {
    // the end-to-end composition: writeStream txtable sink feeds the
    // base (ingest), CREATE MATERIALIZED VIEW via SQL text defines the
    // view, and the MV's OWN maintenance stream folds the base's CDF
    // per micro-batch — including a delete-bearing window
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mv-sqlstream-").toString
    val in = MemoryStream[(Long, Long, Long)](spark)
    val ingest = in.toDF().toDF("id", "grp", "v")
      .writeStream.format("txtable")
      .option("path", s"$dir/base")
      .option("checkpointLocation", s"$dir/ingest-ck")
      .start()
    val sql = TxSql(spark)
    try {
      in.addData((0L until 40L).map(i => (i, i % 5, i * 10)): _*)
      ingest.processAllAvailable()
      sql.run(s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
        "SELECT grp, COUNT(*) AS n_rows, SUM(v) AS v_sum " +
        s"FROM txtable.`$dir/base` GROUP BY grp")
      // this test's full() recompute is the MV's CONTROL: the
      // transparent rewrite (armed by the SQL CREATE) would route it
      // onto the very view under test and make every equality below
      // vacuous — disarm it for this table
      graft.plans.MvRegistry.unregister(spark, s"$dir/mv")
      val base = TxTable(spark, s"$dir/base")
      val mv = MaterializedView(spark, base, s"$dir/mv",
        Seq("grp"), Seq("v"))
      def full() = base.read().groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("v_sum"))
      def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.select(col("grp"), col("n_rows"), col("v_sum"))
          .collect().map(_.toString).sorted.toSeq
      assert(st(mv.read()) === st(full()), "CREATE populates")
      val maint = mv.maintainStream(s"$dir/mv-ck")
      try {
        // streamed appends flow ingest -> base CDF -> MV fold
        in.addData((40L until 80L).map(i => (i, i % 5, i * 10)): _*)
        ingest.processAllAvailable()
        maint.processAllAvailable()
        assert(st(mv.read()) === st(full()))
        // a delete on the base rides the same CDF into the fold
        base.deleteVectorBetween("id", 0L, 19L)
        maint.processAllAvailable()
        assert(st(mv.read()) === st(full()))
        assert(mv.read().agg(sum(col("n_rows"))).head.getLong(0) === 60L)
      } finally maint.stop()
    } finally ingest.stop()
  }
}
