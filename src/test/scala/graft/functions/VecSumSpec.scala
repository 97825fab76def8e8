package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** `vec_sum` element-wise aggregate: parity with the posexplode
  * per-dimension form, null/ragged inputs, and partial-aggregation
  * correctness across partitions (merge path). */
class VecSumSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the posexplode per-dimension sum across many partitions") {
    val rows = (1 to 100).map(i =>
      (i % 7, Array(i.toDouble, 2.0 * i, -i.toDouble)))
    // 16 partitions on 100 rows forces real partial buffers + merges
    val df = rows.toDF("g", "v").repartition(16)

    val viaVecSum = df.groupBy("g")
      .agg(call_function("vec_sum", col("v")).as("s"))
      .as[(Int, Array[Double])].collect().toMap
    val viaExplode = df
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("g", "pos").agg(sum("x").as("sx"))
      .groupBy("g")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
        s => s.getField("sx")).as("s"))
      .as[(Int, Array[Double])].collect().toMap

    assert(viaVecSum.keySet === viaExplode.keySet)
    for (g <- viaVecSum.keySet; i <- 0 until 3)
      assert(math.abs(viaVecSum(g)(i) - viaExplode(g)(i)) < 1e-9,
        s"group $g dim $i")
  }

  test("null vectors are skipped; all-null group yields null") {
    val df = Seq(
      (1, Some(Array(1.0, 2.0))), (1, None), (1, Some(Array(3.0, 4.0))),
      (2, None))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(call_function("vec_sum", col("v")).as("s"))
      .as[(Int, Option[Array[Double]])].collect().toMap
    assert(got(1).get.toSeq === Seq(4.0, 6.0))
    assert(got(2).isEmpty)
  }

  test("ragged widths grow the buffer to the longest input") {
    val df = Seq(
      (1, Array(1.0)), (1, Array(1.0, 2.0, 3.0)), (1, Array(1.0, 1.0)))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(call_function("vec_sum", col("v")).as("s"))
      .as[(Int, Array[Double])].collect().head._2
    assert(got.toSeq === Seq(3.0, 3.0, 3.0))
  }

  test("non-double input is rejected at analysis time") {
    val df = Seq((1, "oops")).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(call_function("vec_sum", col("v"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
