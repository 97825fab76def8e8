package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{TxSql, TxTable}

/** Transparent MV rewrite ([[MvRewriteRule]]): a grouped aggregate over
  * a base table routes onto its registered, FRESH materialized view —
  * and keeps its base plan on ANY doubt. The invariant everywhere:
  * results are identical whether or not the rewrite fires, and the
  * rewrite NEVER fires over state the MV does not exactly cover. */
class MvRewriteSpec extends SparkTestBase {

  private lazy val sql = TxSql(spark)

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, (i % 7).toLong, (i % 10).toDouble))
      .toDF("id", "grp", "v")
  }

  /** Fresh base + SQL-created MV (CREATE auto-registers the rewrite). */
  private def mk(): (TxTable, String) = {
    graft.functions.VectorExpressions.register(spark)
    val dir = Files.createTempDirectory("graft-mvrw-").toString
    val base = TxTable(spark, s"$dir/base")
    base.append(df(0 until 200))
    sql.run(s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
      "SELECT grp, COUNT(*) AS n_rows, SUM(v) AS v_sum, " +
      "MIN(v) AS v_min, MAX(v) AS v_max, AVG(v) AS v_avg " +
      s"FROM txtable.`$dir/base` GROUP BY grp")
    (base, dir)
  }

  private def agg(base: TxTable) =
    base.read().groupBy("grp")
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"),
        avg(col("v")).as("m"))

  private def fired(q: org.apache.spark.sql.DataFrame, dir: String): Boolean =
    q.inputFiles.exists(_.contains(s"$dir/mv"))

  private def rows(q: org.apache.spark.sql.DataFrame): Seq[String] =
    q.collect().map(_.toString).sorted.toSeq

  test("fresh MV answers the exact-match aggregate; results identical") {
    val (base, dir) = mk()
    val q = agg(base)
    assert(fired(q, dir), "rewrite must fire on the fresh exact match")
    // identical to the direct plan (kill switch off for the control)
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try rows(agg(base))
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    assert(rows(q) === direct)
    assert(q.count() === 7L)
  }

  test("STALE MV never fires; REFRESH re-arms; deletes covered") {
    val (base, dir) = mk()
    base.append(df(200 until 260))
    val stale = agg(base)
    assert(!fired(stale, dir), "stale MV must keep the base plan")
    assert(stale.agg(sum(col("c"))).head().getLong(0) === 260L)
    sql.run(s"DELETE FROM txtable.`$dir/base` WHERE id < 50")
    sql.run(s"REFRESH MATERIALIZED VIEW txtable.`$dir/mv`")
    val freshQ = agg(base)
    assert(fired(freshQ, dir), "refresh must re-arm the rewrite")
    assert(freshQ.agg(sum(col("c"))).head().getLong(0) === 210L)
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try rows(agg(base))
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    assert(rows(freshQ) === direct)
  }

  test("conservatism: filters, DISTINCT, other groupings, COUNT(col) all refuse") {
    val (base, dir) = mk()
    // a WHERE on a NON-GROUP column drops rows from inside groups —
    // the view cannot compensate it: no rewrite
    val filtered = base.read().where(col("id") > 10)
      .groupBy("grp").agg(count(lit(1)).as("c"))
    assert(!fired(filtered, dir))
    assert(filtered.agg(sum(col("c"))).head().getLong(0) === 189L)
    // a NON-DETERMINISTIC predicate refuses even over a group column
    assert(!fired(base.read().where(col("grp") > rand() * 0)
      .groupBy("grp").agg(count(lit(1)).as("c")), dir))
    // DISTINCT aggregates are not maintained: no rewrite
    assert(!fired(base.read().groupBy("grp")
      .agg(countDistinct(col("v")).as("c")), dir))
    // a different grouping is not this MV: no rewrite
    assert(!fired(base.read().groupBy("id")
      .agg(count(lit(1)).as("c")), dir))
    assert(!fired(base.read().groupBy("grp", "id")
      .agg(count(lit(1)).as("c")), dir))
    // COUNT(col) has null semantics the view does not store: no rewrite
    assert(!fired(base.read().groupBy("grp")
      .agg(count(col("v")).as("c")), dir))
    // an unmaintained aggregate refuses even alongside maintained ones
    assert(!fired(base.read().groupBy("grp")
      .agg(count(lit(1)).as("c"), stddev_samp(col("id")).as("sd")), dir))
  }

  test("kill switch and unregistration keep the base plan") {
    val (base, dir) = mk()
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(!fired(agg(base), dir))
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    assert(fired(agg(base), dir))
    MvRegistry.unregister(spark, s"$dir/mv")
    assert(!fired(agg(base), dir))
    // re-register from the persisted definition properties alone
    MvRegistry.register(spark, s"$dir/mv")
    assert(fired(agg(base), dir))
  }

  test("a deleted MV directory refuses the rewrite, not the query") {
    val (base, dir) = mk()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$dir/mv"))
    val q = agg(base)
    assert(!fired(q, dir))
    assert(q.count() === 7L) // the base plan still answers
    MvRegistry.unregister(spark, s"$dir/mv")
  }

  test("ROLLUP: a coarser grouping re-aggregates the view, not the base") {
    graft.functions.VectorExpressions.register(spark)
    val dir = Files.createTempDirectory("graft-mvrw-ru-").toString
    val base = TxTable(spark, s"$dir/base")
    import spark.implicits._
    // two group columns, a null-bearing value column
    base.append((0 until 300).map(i => (i.toLong, (i % 5).toLong,
      (i % 3).toLong, if (i % 11 == 0) None else Some((i % 17).toDouble)))
      .toDF("id", "g1", "g2", "v"))
    sql.run(s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
      "SELECT g1, g2, COUNT(*) AS n_rows, SUM(v) AS v_sum, " +
      "MIN(v) AS v_min, MAX(v) AS v_max, AVG(v) AS v_avg, " +
      "STDDEV(v) AS v_stddev, VARIANCE(v) AS v_var " +
      s"FROM txtable.`$dir/base` GROUP BY g1, g2")
    def q() = base.read().groupBy("g1")
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"),
        avg(col("v")).as("m"), stddev_samp(col("v")).as("sd"),
        var_samp(col("v")).as("vr"))
    val rolled = q()
    assert(fired(rolled, dir), "subset grouping must roll up the view")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try q().collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4),
      BigDecimal(r.getDouble(5)).setScale(9, BigDecimal.RoundingMode.HALF_UP),
      BigDecimal(r.getDouble(6)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1).toSeq
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    val got = rolled.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4),
      BigDecimal(r.getDouble(5)).setScale(9, BigDecimal.RoundingMode.HALF_UP),
      BigDecimal(r.getDouble(6)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1).toSeq
    // moments rounded at 1e-9: the rollup combines partial sums in a
    // different order than the direct plan (same caveat as Spark's own
    // partial aggregation across partitionings)
    assert(got === direct)
    // the GLOBAL aggregate rolls up too
    def global() = base.read()
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
    assert(fired(global(), dir))
    assert(global().head().getLong(0) === 300L)
    // group-only outputs (the DISTINCT shape) roll up without a base scan
    val distinctQ = base.read().groupBy("g2").agg(max(col("v")).as("hi"))
      .select("g2")
    assert(distinctQ.count() === 3L)
    // and the other subset column works symmetrically
    val byG2 = base.read().groupBy("g2").agg(avg(col("v")).as("m"))
    assert(fired(byG2, dir))
    assert(byG2.count() === 3L)
  }

  test("ROLLUP refuses what the backing state cannot answer") {
    graft.functions.VectorExpressions.register(spark)
    val dir = Files.createTempDirectory("graft-mvrw-rr-").toString
    val base = TxTable(spark, s"$dir/base")
    import spark.implicits._
    base.append((0 until 100).map(i =>
      (i.toLong, (i % 5).toLong, (i % 3).toLong, (i % 7).toDouble))
      .toDF("id", "g1", "g2", "v"))
    // MIN-only view: a coarser SUM has no backing sum to roll up
    sql.run(s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
      "SELECT g1, g2, COUNT(*) AS n_rows, MIN(v) AS v_min " +
      s"FROM txtable.`$dir/base` GROUP BY g1, g2")
    assert(!fired(base.read().groupBy("g1")
      .agg(sum(col("v")).as("s")), dir))
    // grouping by a NON-view column refuses (not a subset)
    assert(!fired(base.read().groupBy("id")
      .agg(count(lit(1)).as("c")), dir))
    // mixed view/non-view grouping refuses
    assert(!fired(base.read().groupBy("g1", "id")
      .agg(count(lit(1)).as("c")), dir))
    // but COUNT + MIN at the coarser grain does roll up
    val ok = base.read().groupBy("g2")
      .agg(count(lit(1)).as("c"), min(col("v")).as("lo"))
    assert(fired(ok, dir))
    assert(ok.agg(sum(col("c"))).head().getLong(0) === 100L)
  }

  test("WHERE over group columns COMPENSATES: filter re-applies on the view") {
    val (base, dir) = mk()
    // exact grain + group-column filter: whole groups selected, routes
    def q() = base.read().where(col("grp") >= 2 && col("grp") =!= 5)
      .groupBy("grp")
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
    val routed = q()
    assert(fired(routed, dir), "group-column WHERE must route onto the MV")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try rows(q())
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    assert(rows(routed) === direct)
    assert(routed.count() === 4L) // grps 2,3,4,6
    // a filter mixing group and non-group columns refuses whole
    assert(!fired(base.read().where(col("grp") >= 2 && col("id") > 0)
      .groupBy("grp").agg(count(lit(1)).as("c")), dir))
  }

  test("WHERE compensation composes with ROLLUP to a coarser grain") {
    graft.functions.VectorExpressions.register(spark)
    val dir = Files.createTempDirectory("graft-mvrw-fr-").toString
    val base = TxTable(spark, s"$dir/base")
    import spark.implicits._
    base.append((0 until 300).map(i => (i.toLong, (i % 5).toLong,
      (i % 3).toLong, (i % 17).toDouble)).toDF("id", "g1", "g2", "v"))
    sql.run(s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
      "SELECT g1, g2, COUNT(*) AS n_rows, SUM(v) AS v_sum " +
      s"FROM txtable.`$dir/base` GROUP BY g1, g2")
    // filter on g2 (a view group column NOT in the query grouping),
    // roll up to g1: the filter drops whole (g1,g2) view rows, then
    // the coarser re-aggregation runs over the survivors
    def q() = base.read().where(col("g2") === 1)
      .groupBy("g1").agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
    val routed = q()
    assert(fired(routed, dir), "group-col filter + rollup must route")
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val direct = try rows(q())
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    assert(rows(routed) === direct)
    // the filtered GLOBAL aggregate routes too
    val g = base.read().where(col("g1") < 3)
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
    assert(fired(g, dir))
    assert(g.head().getLong(0) === 180L)
  }

  test("COUNT(DISTINCT) routes: exact grain from the stored column, ROLLUP re-counts the pair table") {
    graft.functions.VectorExpressions.register(spark)
    val dir = Files.createTempDirectory("graft-mvrw-dc-").toString
    val base = TxTable(spark, s"$dir/base")
    import spark.implicits._
    // values recycle mod 12 across g2 ∈ {0,1,2}: the per-(g1,g2)
    // distinct sets OVERLAP, so Σ of fine-grain dcnts ≠ the coarser
    // dcnt — a rollup that summed stored counts instead of re-counting
    // the pair table would be wrong here
    base.append((0 until 300).map(i => (i.toLong, (i % 5).toLong,
      (i % 3).toLong, (i % 12).toLong)).toDF("id", "g1", "g2", "v"))
    sql.run(s"CREATE MATERIALIZED VIEW txtable.`$dir/mv` AS " +
      "SELECT g1, g2, COUNT(*) AS n_rows, COUNT(DISTINCT v) AS v_dcnt " +
      s"FROM txtable.`$dir/base` GROUP BY g1, g2")
    def check(q: () => org.apache.spark.sql.DataFrame,
        expectFire: Boolean): Unit = {
      val routed = q()
      assert(fired(routed, dir) === expectFire)
      spark.conf.set("spark.graft.mv.rewrite", "false")
      val direct = try rows(q())
      finally spark.conf.set("spark.graft.mv.rewrite", "true")
      assert(rows(routed) === direct)
    }
    // exact grain: served from the stored v_dcnt column
    check(() => base.read().groupBy("g1", "g2")
      .agg(count(lit(1)).as("c"), countDistinct(col("v")).as("dc")), true)
    // coarser grain: re-counted from the hidden pair table
    check(() => base.read().groupBy("g1")
      .agg(count(lit(1)).as("c"), countDistinct(col("v")).as("dc")), true)
    // dcnt-only rollup (no SUM-class aggregate alongside)
    check(() => base.read().groupBy("g2")
      .agg(countDistinct(col("v")).as("dc")), true)
    // GLOBAL distinct count
    check(() => base.read()
      .agg(countDistinct(col("v")).as("dc")), true)
    // group-column WHERE compensates on both the view and the pairs
    check(() => base.read().where(col("g2") === 1)
      .groupBy("g1").agg(countDistinct(col("v")).as("dc")), true)
    // a DIFFERENT column's distinct count refuses (no pair table)
    check(() => base.read().groupBy("g1")
      .agg(countDistinct(col("id")).as("dc")), false)
    // COUNT(DISTINCT g2) over a GROUP column needs no aux at all: the
    // view holds exactly the live (g1, g2) combos, so the coarser
    // grain counts them off the view's rows
    check(() => base.read().groupBy("g1")
      .agg(count(lit(1)).as("c"), countDistinct(col("g2")).as("gc")), true)
    check(() => base.read()
      .agg(countDistinct(col("g1")).as("gc")), true)
    // …but at EXACT grain (counting a column inside its own grouping)
    // the degenerate 0/1 shape keeps the base plan
    check(() => base.read().groupBy("g1", "g2")
      .agg(countDistinct(col("g2")).as("gc")), false)
    // deletes maintain the pair table; the re-armed rewrite stays exact
    sql.run(s"DELETE FROM txtable.`$dir/base` WHERE id % 4 = 0")
    check(() => base.read().groupBy("g1")
      .agg(countDistinct(col("v")).as("dc")), false) // stale: no fire
    sql.run(s"REFRESH MATERIALIZED VIEW txtable.`$dir/mv`")
    check(() => base.read().groupBy("g1")
      .agg(count(lit(1)).as("c"), countDistinct(col("v")).as("dc")), true)
  }

  test("time-travel reads keep their base plan (file-set freshness)") {
    val (base, dir) = mk()
    base.append(df(200 until 230))
    sql.run(s"REFRESH MATERIALIZED VIEW txtable.`$dir/mv`")
    // head read: fresh, fires
    assert(fired(agg(base), dir))
    // a version-0 read has a different file set: must not fire
    val old = base.readAt(0L).groupBy("grp")
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"),
        avg(col("v")).as("m"))
    assert(!fired(old, dir))
    assert(old.agg(sum(col("c"))).head().getLong(0) === 200L)
  }
}
