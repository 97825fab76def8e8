package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc dev probe: does repartition(col).localCheckpoint() preserve
  * output partitioning through LogicalRDD (i.e. does a downstream
  * groupBy on the same key skip its Exchange)? */
object PartProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val f = (1 to 1000).map(i => (i % 97L, i % 13, i * 0.5))
      .toDF("doc_id", "b", "x")
      .repartition(col("doc_id")).localCheckpoint()
    println("== groupBy(doc_id) after repartition+localCheckpoint:")
    f.groupBy("doc_id").agg(sum("x")).explain()
    println("== join on doc_id between two frames partitioned the same way:")
    val l = (1 to 97).map(i => (i.toLong, i % 2)).toDF("doc_id", "y")
      .repartition(col("doc_id")).localCheckpoint()
    f.join(l, "doc_id").groupBy("b").agg(sum($"x" * $"y")).explain()
    spark.stop()
  }
}
