package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: known values") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(3.0, 4.0), Seq(3.0, 4.0), 1.0))
      .toDF("a", "b", "expect")
    val got = df.select(VectorOps.cosine(col("a"), col("b")).as("c"), col("expect"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("hyperplanes are deterministic and bounded") {
    val a = VectorOps.hyperplanes(4, 64)
    val b = VectorOps.hyperplanes(4, 64)
    assert(a === b)
    assert(a.flatten.forall(v => v >= -1.0 && v <= 1.0))
    assert(a.flatten.distinct.size > 100) // not degenerate
  }

  test("lshBucket: same vector → same bucket, bucket in range") {
    val planes = VectorOps.hyperplanes(4, 3)
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0), Seq(-9.0, 0.1, 4.0))
      .toDF("v").select(VectorOps.lshBucket(col("v"), planes).as("b"))
    val bs = df.as[Long].collect()
    assert(bs(0) === bs(1))
    assert(bs.forall(b => b >= 0 && b < 16))
  }
}
