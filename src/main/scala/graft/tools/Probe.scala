package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Ad-hoc dev probe: stage-by-stage timing of the MinHash-LSH pipeline. */
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    val sh = Dedup.shingleTable(docs).persist()
    time("shingles")(sh.count())
    val sig = sh.select(col("doc_id"), Dedup.minhashSignature(col("sh")).as("sig")).persist()
    time("signature")(sig.count())
    val bands = sig.select(col("doc_id"),
      posexplode(array(Dedup.bandKeys(col("sig")): _*)).as(Seq("band_idx", "band_key"))).persist()
    time("bands")(bands.count())
    val sized = bands.join(
      bands.groupBy("band_idx", "band_key").agg(count(lit(1)).as("n"))
        .where(col("n").between(2, 100)), Seq("band_idx", "band_key"))
    val pairs = sized.as("x").join(sized.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct().persist()
    time("pairs")(pairs.count())
    val verified = pairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6).as("j"))
      .where(col("j") >= 0.8)
    time("verify")(verified.count())
    time("full query")(Dedup.minhashNearDups(docs, 0.8).count())
    spark.stop()
  }
}
