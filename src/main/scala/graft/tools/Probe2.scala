package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, TextFunctions}
object Probe2 {
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
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val docs = Tables.documents(spark, dir).repartition(32).persist()
    time("docs materialize")(docs.count())
    val toks = TextFunctions.tokens(col("text"))
    time("tokens only")(docs.select(size(toks).as("n")).agg(sum(col("n"))).collect()) // force
    time("tokens only 2nd")(docs.select(size(toks).as("n")).agg(sum(col("n"))).collect())
    val ng = TextFunctions.wordNGrams(toks, 3)
    time("ngrams")(docs.select(size(ng).as("n")).agg(sum(col("n"))).collect())
    time("ngrams+distinct")(docs.select(size(array_distinct(ng)).as("n")).agg(sum(col("n"))).collect())
    time("full shingles col")(docs.select(size(Dedup.shingles(col("text"))).as("n")).agg(sum(col("n"))).collect())
    spark.stop()
  }
}
