package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Phase-level timing for `x_dedup_clusters` at sf0.1: pair generation
  * vs connected components vs the sizes join.
  * Run: `sbt "runMain graft.tools.ClustersProbe"`. */
object ClustersProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-clusters-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")

    def cold(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[clusters] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    {
      val w = Tables.documents(spark, "/root/testdata/sf0.001")
      val p = Dedup.minhashNearDups(w, 0.8).select(col("a_id"), col("b_id"))
      Dedup.clusterTable(w.select(col("doc_id").as("id")), p).count()
    }
    cold()

    time("full_query") {
      val p = Dedup.minhashNearDups(docs, 0.8).select(col("a_id"), col("b_id"))
      Dedup.clusterTable(docs.select(col("doc_id").as("id")), p).count()
    }
    cold()

    val pairs = time("pairs_only")(
      Dedup.minhashNearDups(docs, 0.8).select(col("a_id"), col("b_id"))
        .localCheckpoint(true))
    time("pairs_count")(pairs.count())
    time("cc_from_pinned_pairs")(
      Dedup.clusterTable(docs.select(col("doc_id").as("id")), pairs).count())

    spark.stop()
  }
}
