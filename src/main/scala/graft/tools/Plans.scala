package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Dumps formatted physical plans for the named queries (or a default
  * audit set) — the dev loop for checking pushdown, broadcast, and
  * whole-stage-codegen shapes. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("p4_p5_filter_pushdown", "s2_scan_project",
        "j1_star_join_broadcast", "a1_groupby_sum", "a7_topk_order_limit",
        "j3_topk_rejoin", "x_embed_cosine_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).build(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
