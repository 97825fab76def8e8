package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.withColumn("ts2", timestamp_micros(col("ts") / 1000 cast "long")).show(3, false)
    } catch { case e: Throwable => println("EVENTS FAIL: " + e.getMessage.take(400)) }
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    em.printSchema(); em.show(2)
    spark.stop()
  }
}
