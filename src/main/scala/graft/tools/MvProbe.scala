package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{MaterializedView, TxTable}

/** MIN/MAX materialized-view refresh probe: evidence that a
  * delete-bearing refresh costs O(touched groups' rows), not O(base).
  *
  * Shape: a base of N rows over G groups, clustered so each group's
  * rows co-locate in files (the layout a real fact table has after
  * OPTIMIZE/cluster-by); one refresh folds a window that deletes rows
  * from exactly K groups. The bounded recompute re-aggregates only
  * those K groups — through the stats-pruned read, so untouched FILES
  * are not even opened — while a naive MV would rescan all N rows.
  * The probe times the incremental refresh against the from-scratch
  * aggregate and checks equality.
  *
  * Run: `sbt "runMain graft.tools.MvProbe [N] [G] [K]"`
  * (default 2000000 rows, 1000 groups, 5 touched).
  */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val g = if (args.length > 1) args(1).toInt else 1000
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-mv-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft-mvprobe-").toString
    val base = TxTable(spark, s"$dir/base")
    // group-clustered layout: RANGE-partition by grp so each file
    // carries a tight [min,max] grp span — what the stats-pruned
    // recompute leans on (hash partitioning would smear every group
    // range across every file and prune nothing; a real deployment
    // gets this layout from cluster-by/OPTIMIZE)
    val rows = spark.range(n.toLong)
      .select(col("id"), (col("id") % g).as("grp"),
        (col("id") * 7 % 100000).cast("double").as("v"))
      .repartitionByRange(256, col("grp"))
    base.append(rows.toDF())
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Seq("v"), Seq("v"), Seq("v"))
    mv.refresh()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // the delete window: rows of exactly K groups (retires their
    // maxima), everything else untouched
    base.deleteVectorWhere("grp", 0L) // warm the DV path
    mv.refresh()
    // ONE delete commit touching K groups (the realistic DELETE
    // statement shape — per-group commits would multiply the CDF
    // window's touched-file reads by the commit count)
    base.deleteVectorBetween("grp", 1L, k.toLong)
    val (_, incS) = time(mv.refresh())
    // pure-insert window: the homomorphic fold, no base scan at all —
    // this is the refresh machinery's fixed cost at this MV size
    base.append(spark.range(100000)
      .select((col("id") + n).as("id"), (col("id") % g).as("grp"),
        lit(1.0).as("v")).repartitionByRange(8, col("grp")).toDF())
    val (_, insS) = time(mv.refresh())
    val (fullRows, fullS) = time {
      base.read().groupBy("grp").agg(count(lit(1)).as("n_rows"),
        sum(col("v")).as("v_sum"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max")).localCheckpoint(true).count()
    }
    // correctness: the maintained view equals the from-scratch state
    val mvRows = mv.read()
    val bad = mvRows.join(
      base.read().groupBy("grp").agg(count(lit(1)).as("n_rows"),
        sum(col("v")).as("v_sum"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max")),
      Seq("grp", "n_rows"), "left_anti").count()
    println(f"[mv-probe] n=$n%d groups=$g%d touched=$k%d " +
      f"delete_refresh_s=$incS%.2f insert_refresh_s=$insS%.2f " +
      f"full_recompute_s=$fullS%.2f " +
      f"mv_groups=${mvRows.count()}%d full_groups=$fullRows%d bad=$bad%d")
    assert(bad == 0, "incremental view diverged from recompute")
    spark.stop()
  }
}
