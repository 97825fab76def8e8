package graft.functions

import graft.SparkTestBase
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def registered() = VectorExpressions.register(spark)

  test("vec_dot matches the HOF fold bit-for-bit") {
    registered()
    val df = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val diffs = df.select(
        (VectorOps.dotNative(col("v"), col("v")) -
          VectorOps.dot(col("v"), col("v"))).as("d"))
      .where(col("d") =!= 0.0).count()
    assert(diffs === 0)
  }

  test("vec_norm matches sqrt of the fold bit-for-bit") {
    registered()
    val df = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val diffs = df.select(
        (VectorOps.normNative(col("v")) - VectorOps.norm2(col("v"))).as("d"))
      .where(col("d") =!= 0.0).count()
    assert(diffs === 0)
  }

  test("expressions work from SQL text too") {
    registered()
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_norm(array(3.0d, 4.0d)) AS n").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }

  test("null inputs yield null") {
    registered()
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").head()
    assert(r.isNullAt(0))
  }
}
