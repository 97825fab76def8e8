package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Dumps the MinHash CANDIDATE-GENERATION plan — the banding exchange
  * plus the capped-bucket aggregation — which the query-level explain
  * of any near-dup query cannot show (the pair table is eagerly
  * checkpointed inside `verifyPairs`, so downstream plans start at the
  * checkpoint scan). This is the r17 evidence gap for the band-key
  * narrowing: the committed artifact must show `band_key: bigint`
  * (a 60-bit md5-prefix long) flowing through
  * `Exchange hashpartitioning(band_idx, band_key)`, not a 32-char md5
  * string. Run: `sbt "runMain graft.tools.BandPlanProbe"`. */
object BandPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-band-plan-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, dir)
    val sh = Dedup.shingleTable(docs)
    val sig = sh.select(col("doc_id"),
      Dedup.minhashSignature(col("sh")).as("sig"))
    println("===== MinHash banding candidate plan " +
      "(shared by minhash_lsh/fast, clusters, keep_best, " +
      "split_by_cluster, streaming near-dup index) =====")
    Dedup.lshCandidates(sig).explain("formatted")
    spark.stop()
  }
}
