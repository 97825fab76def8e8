package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Phase-level timing for `x_dedup_ngram_inverted` at sf0.1 — finds
  * where the wall-clock goes before optimizing it.
  * Run: `sbt "runMain graft.tools.NgramProbe"`. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-ngram-probe")
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
      cold()
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngram] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm JIT/codegen
    Dedup.invertedIndexNearDups(docs.limit(200), 5, 10, 0.5).count()
    cold()

    time("full_query")(
      Dedup.invertedIndexNearDups(docs, 5, 10, 0.5).count())

    val sh = Dedup.shingleTable(docs)
    time("shingle_table")(sh.count())

    val posting = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("posting_explode")(posting.count())

    val buckets = posting.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")).between(2, 5))
    time("bucket_group")(buckets.count())

    val pairs = buckets
      .select(explode(Dedup.orderedPairs(col("ids"))).as("p"))
      .groupBy(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 10)
    val n = time("pair_group")(pairs.count())
    println(s"[ngram] candidate pairs = $n")

    time("full_query_again")(
      Dedup.invertedIndexNearDups(docs, 5, 10, 0.5).count())

    spark.stop()
  }
}
