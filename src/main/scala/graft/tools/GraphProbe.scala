package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev probe: stage-by-stage wall-time attribution for the graph
  * kernels (pagerank / label_prop) at the bench SF. */
object GraphProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    graft.queries.Registry.byName("x_graph_pagerank")
      .build(spark, "/root/testdata/sf0.001").count()

    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val base = t("base distinct+checkpoint") {
        graft.core.Tables.lineitem(spark, dir)
          .select(concat(lit("s"), col("l_suppkey")).as("src"),
            concat(lit("p"), col("l_partkey")).as("dst"))
          .distinct().localCheckpoint()
      }
      println(s"  base rows: ${base.count()}")
      val edges = base.union(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val e = edges.select(col("src"), col("dst"))
      val deg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
      val weighted = t("weighted checkpoint") {
        e.join(deg, "src")
          .select(col("src"), col("dst"), (lit(1.0) / col("__outdeg")).as("__w"))
          .localCheckpoint()
      }
      val nodes = t("nodes checkpoint") {
        e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node")))
          .distinct().localCheckpoint()
      }
      val n = t("nodes count")(nodes.count()).toDouble
      val dangling = t("dangling checkpoint") {
        nodes.join(deg, col("node") === col("src"), "left_anti").localCheckpoint()
      }
      var ranks = nodes.withColumn("pr", lit(1.0 / n))
      (1 to 3).foreach { round =>
        ranks = t(s"round $round") {
          val contribs = weighted
            .join(broadcast(ranks), col("src") === col("node"))
            .groupBy(col("dst").as("node2"))
            .agg(sum(col("pr") * col("__w")).as("__c"))
          val dmass = dangling.join(broadcast(ranks), "node")
            .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dm"))
          nodes
            .join(broadcast(contribs), col("node") === col("node2"), "left")
            .crossJoin(broadcast(dmass))
            .select(col("node"),
              (lit((1.0 - 0.85) / n) +
                lit(0.85) * (coalesce(col("__c"), lit(0.0)) +
                  col("__dm") / lit(n))).as("pr"))
            .localCheckpoint()
        }
      }
      t("final count")(ranks.count())
    }
    spark.stop()
  }
}
