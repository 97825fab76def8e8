package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[MaterializedJoinView]]: incremental maintenance of a grouped
  * aggregate over an INNER equi-join of two TxTables, via the
  * delta-join identity ΔA⋈B₀ + A₁⋈ΔB. The invariant everywhere: after
  * a refresh the view EQUALS the from-scratch join aggregate over both
  * base heads — for every combination of write shapes on either side —
  * and replays no-op. */
class MaterializedJoinViewSpec extends SparkTestBase {

  // fact(id, k, qty) ⋈ dim(k, cat) GROUP BY cat
  private def facts(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, (i % 40).toLong, (i % 9).toLong))
      .toDF("id", "k", "qty")
  }
  private def dims(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"cat${i % 5}")).toDF("k", "cat")
  }

  private def mk(): (TxTable, TxTable, MaterializedJoinView, String) = {
    val dir = Files.createTempDirectory("graft-mjv-").toString
    val a = TxTable(spark, s"$dir/fact")
    val b = TxTable(spark, s"$dir/dim")
    val mv = MaterializedJoinView(spark, a, b, s"$dir/mv",
      Seq("cat"), Seq("qty"), Seq("k"), Seq("k"))
    (a, b, mv, dir)
  }

  private def recompute(a: TxTable, b: TxTable) =
    a.read().join(b.read(), Seq("k"), "inner")
      .groupBy("cat")
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("qty_sum"))

  private def st(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("cat"), col("n_rows"), col("qty_sum"))
      .collect().map(_.toString).sorted.toSeq

  test("folds appends and deletes on EITHER side, and on both at once") {
    val (a, b, mv, _) = mk()
    a.append(facts(0 until 300))
    b.append(dims(0 until 30)) // keys 30-39 dangle: inner join drops
    assert(mv.refresh().isDefined)
    assert(mv.appliedVersions === ((0L, 0L)))
    assert(st(mv.read()) === st(recompute(a, b)))

    // LEFT-only window: appends + a needle delete
    a.append(facts(300 until 400))
    a.deleteVectorBetween("id", 0L, 49L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(recompute(a, b)))

    // RIGHT-only window: a dim arrives (dangling facts join in), a
    // dim retires (its facts' contribution must subtract)
    b.append(dims(30 until 35))
    b.deleteVectorWhere("k", 7L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(recompute(a, b)))

    // BOTH sides change in one window — the cross term ΔA⋈ΔB flows
    // through A₁⋈ΔB (A₁ already contains ΔA)
    a.append(facts(400 until 450))
    a.deleteVectorBetween("id", 100L, 129L)
    b.append(dims(35 until 40))
    b.deleteVectorWhere("k", 11L)
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(recompute(a, b)))

    // an UPSERT that moves a dim across categories (delete+insert)
    import spark.implicits._
    b.upsert(Seq((3L, "catMOVED")).toDF("k", "cat"), Seq("k"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(recompute(a, b)))

    // already current: replay no-ops
    assert(mv.refresh().isEmpty)
  }

  test("a category emptied on either side drops out of the view") {
    val (a, b, mv, _) = mk()
    a.append(facts(0 until 200))
    b.append(dims(0 until 40))
    assert(mv.refresh().isDefined)
    // retire EVERY dim of cat0 (k % 5 == 0): the group must vanish
    (0L until 40L by 5L).foreach(k => b.deleteVectorWhere("k", k))
    assert(mv.refresh().isDefined)
    assert(mv.read().where(col("cat") === "cat0").count() === 0)
    assert(st(mv.read()) === st(recompute(a, b)))
  }

  test("NULL join keys drop consistently on full and delta paths") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mjv-nk-").toString
    val a = TxTable(spark, s"$dir/fact")
    val b = TxTable(spark, s"$dir/dim")
    val mv = MaterializedJoinView(spark, a, b, s"$dir/mv",
      Seq("cat"), Seq("qty"), Seq("k"), Seq("k"))
    a.append(Seq((1L, Some(1L), 10L), (2L, None, 20L), (3L, Some(2L), 30L))
      .toDF("id", "k", "qty"))
    b.append(Seq((Some(1L), "x"), (None, "nullcat"), (Some(2L), "y"))
      .toDF("k", "cat"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(recompute(a, b)))
    assert(mv.read().where(col("cat") === "nullcat").count() === 0)
    // a delta window carrying null keys folds identically
    a.append(Seq((4L, None, 40L), (5L, Some(1L), 50L))
      .toDF("id", "k", "qty"))
    assert(mv.refresh().isDefined)
    assert(st(mv.read()) === st(recompute(a, b)))
  }

  test("ambiguous or missing referenced columns refuse at first use") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mjv-amb-").toString
    val a = TxTable(spark, s"$dir/fact")
    val b = TxTable(spark, s"$dir/dim")
    a.append(Seq((1L, 1L, 2L)).toDF("id", "k", "qty"))
    b.append(Seq((1L, 2L, "x")).toDF("k", "qty", "cat")) // qty on BOTH
    val mv = MaterializedJoinView(spark, a, b, s"$dir/mv",
      Seq("cat"), Seq("qty"), Seq("k"), Seq("k"))
    val e = intercept[Exception](mv.refresh())
    assert(e.getMessage.contains("ambiguous"))
    val mv2 = MaterializedJoinView(spark, a, b, s"$dir/mv2",
      Seq("no_such"), Nil, Seq("k"), Seq("k"))
    val e2 = intercept[Exception](mv2.refresh())
    assert(e2.getMessage.contains("neither side"))
  }

  test("SQL lifecycle: CREATE JOIN view, REFRESH folds, DROP removes; non-foldables refuse") {
    val dir = Files.createTempDirectory("graft-mjv-sql-").toString
    val a = TxTable(spark, s"$dir/fact")
    val b = TxTable(spark, s"$dir/dim")
    a.append(facts(0 until 100))
    b.append(dims(0 until 40))
    val sqlf = TxSql(spark)
    val create = sqlf.run(
      s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
        "SELECT cat, COUNT(*) AS n_rows, SUM(qty) AS qty_sum " +
        s"FROM txtable.`$dir/fact` f JOIN txtable.`$dir/dim` d " +
        "ON f.k = d.k GROUP BY cat")
    assert(create.head().getString(1).startsWith("mv-refresh-"))
    val mvT = TxTable(spark, s"$dir/mv")
    assert(st(mvT.read()) === st(recompute(a, b)))
    // DML on both sides, then REFRESH through a FRESH TxSql: the join
    // definition must round-trip through the persisted properties
    a.deleteVectorBetween("id", 0L, 19L)
    b.deleteVectorWhere("k", 3L)
    a.append(facts(100 until 130))
    assert(TxSql(spark)
      .run(s"REFRESH MATERIALIZED VIEW txtable.`$dir/mv`").count() === 1)
    assert(st(mvT.read()) === st(recompute(a, b)))
    // what a join cannot fold refuses loudly at CREATE
    def refuse(select: String, needle: String): Unit = {
      val e = intercept[Exception](sqlf.run(
        s"CREATE MATERIALIZED VIEW txtable.`$dir/mvX` AS $select"))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"got: ${e.getMessage}")
    }
    val from = s"FROM txtable.`$dir/fact` f JOIN txtable.`$dir/dim` d " +
      "ON f.k = d.k GROUP BY cat"
    refuse(s"SELECT cat, COUNT(*) AS n_rows, MIN(qty) AS qty_min $from",
      "not maintained")
    refuse(s"SELECT cat, COUNT(*) AS n_rows, AVG(qty) AS qty_avg $from",
      "not maintained")
    refuse(s"SELECT cat, COUNT(*) AS n_rows, " +
      s"COUNT(DISTINCT qty) AS qty_dcnt $from", "not maintained")
    refuse("SELECT cat, COUNT(*) AS n_rows FROM " +
      s"txtable.`$dir/fact` f LEFT JOIN txtable.`$dir/dim` d " +
      "ON f.k = d.k GROUP BY cat", "INNER JOIN only")
    refuse("SELECT cat, COUNT(*) AS n_rows FROM " +
      s"txtable.`$dir/fact` f JOIN txtable.`$dir/dim` d " +
      "ON f.k < d.k GROUP BY cat", "equalities")
    // DROP removes the derived object (the join marker qualifies)
    sqlf.run(s"DROP MATERIALIZED VIEW txtable.`$dir/mv`")
    assert(!new java.io.File(s"$dir/mv").exists)
  }
}
