package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{MaterializedView, TxTable}

/** COUNT(DISTINCT) materialized-view fold probe: evidence that a
  * refresh costs O(window + touched aux files), not O(live pairs).
  *
  * Shape: the stress case where the pair table is BASE-cardinality —
  * N rows over G groups with ~N distinct (group, value) pairs, the
  * profile of COUNT(DISTINCT user_id)-style views where a naive
  * overwrite-per-refresh would pay as much as recomputing. The
  * range-clustered initial population puts each (group…, value) range
  * in its own files; one refresh then folds a window deleting K
  * groups' rows, and the probe measures (a) the fold time against the
  * from-scratch pair aggregation, and (b) how many aux files the
  * stats-pruned merge left ALIVE by identity — the direct physical
  * witness of the bounded rewrite.
  *
  * Run: `sbt "runMain graft.tools.DcntProbe [N] [G] [K]"`
  * (default 8000000 rows, 2000 groups, 5 touched).
  */
object DcntProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 8000000
    val g = if (args.length > 1) args(1).toInt else 2000
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-dcnt-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-dcntprobe-").toString
    val base = TxTable(spark, s"$dir/base")
    // N/G distinct values per group: ~N live pairs at every N — the
    // pair table tracks the base (the COUNT(DISTINCT user_id) profile)
    base.append(spark.range(n.toLong)
      .select(col("id"), (col("id") % g).as("grp"),
        ((col("id") / g) % math.max(n / g, 1)).as("v"))
      .repartitionByRange(256, col("grp")).toDF())
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Nil, Nil, Nil, Nil, Nil, Nil, Nil, Seq("v"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, initS) = time(mv.refresh())
    val aux = TxTable(spark, s"$dir/mv/_dcnt_v")
    val before = aux.read().inputFiles.toSet
    val livePairs = aux.read().count()

    // needle window: K groups' rows delete — their pairs retire, the
    // rest of the pair table must not be rewritten
    base.deleteVectorBetween("grp", 1L, k.toLong)
    val (_, incS) = time(mv.refresh())
    val after = aux.read().inputFiles.toSet
    val survived = (before intersect after).size

    // the from-scratch pair aggregation (what a recompute — or an
    // overwrite-per-refresh fold — pays at minimum every window)
    val (fullPairs, fullS) = time {
      base.read().where(col("v").isNotNull)
        .groupBy(col("grp"), col("v")).agg(count(lit(1)))
        .localCheckpoint(true).count()
    }
    // correctness: the served dcnt equals the direct distinct count
    val bad = mv.read().select(col("grp"), col("v_dcnt"))
      .join(base.read().groupBy("grp")
          .agg(countDistinct(col("v")).as("v_dcnt")),
        Seq("grp", "v_dcnt"), "left_anti").count()
    println(f"[dcnt-probe] n=$n%d groups=$g%d touched=$k%d " +
      f"live_pairs=$livePairs%d init_s=$initS%.2f " +
      f"needle_fold_s=$incS%.2f full_pair_agg_s=$fullS%.2f " +
      f"aux_files=${before.size}%d survived=$survived%d " +
      f"full_pairs=$fullPairs%d bad=$bad%d")
    assert(bad == 0, "maintained dcnt diverged from recompute")
    spark.stop()
  }
}
