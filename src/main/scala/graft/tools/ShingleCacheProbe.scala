package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** A/B for [[Dedup.minhashNearDups]]'s `cacheShingles` knob at sf0.1:
  * alternating min-of-2, cold caches between runs. Decides the knob's
  * default (SCALE.md). */
object ShingleCacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-shingle-cache-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")

    def cold(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def run(cache: Boolean): Double = {
      cold()
      val t0 = System.nanoTime()
      Dedup.minhashNearDups(docs, threshold = 0.8, cacheShingles = cache)
        .select(col("a_id"), col("b_id")).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up both variants (JIT/codegen), then alternate
    run(cache = false); run(cache = true)
    val offs = Seq(run(false), run(true), run(false), run(true))
    println(f"[shingle-cache] rebuild=${math.min(offs(0), offs(2))}%.2f s " +
      f"cached=${math.min(offs(1), offs(3))}%.2f s (min-of-2 each, sf0.1)")
    spark.stop()
  }
}
