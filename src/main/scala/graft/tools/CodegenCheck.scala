package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.ops.VectorOps
object CodegenCheck {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorExpressions.register(spark)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorOps.dotNative(col("v"), col("v")).as("d"),
        VectorOps.normNative(col("v")).as("n"))
    df.explain("codegen")
    spark.stop()
  }
}
