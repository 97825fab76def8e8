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
}
