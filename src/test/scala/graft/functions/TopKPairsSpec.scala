package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPairsSpec extends SparkTestBase {
  import spark.implicits._

  test("topk_pairs equals window row_number ranking, including ties") {
    VectorExpressions.register(spark)
    val df = Seq(
      ("a", 3.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 0L), ("a", 1.0, 3L),
      ("a", 4.0, 4L), ("b", 2.0, 9L), ("b", 7.0, 8L))
      .toDF("g", "score", "id")

    val viaAgg = df.groupBy("g")
      .agg(call_function("topk_pairs", col("score"), col("id"), lit(3)).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("g"), col("p.score"), col("p.id"),
        (col("pos") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet

    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("g", "score", "id", "rank")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet

    assert(viaAgg === viaWindow)
    // tie at score 5.0 broken by id ASC: id 0 ranks before id 2
    assert(viaAgg.contains(("a", 5.0, 0L, 1)))
    assert(viaAgg.contains(("a", 5.0, 2L, 2)))
  }

  test("bad arguments fail at analysis time, not with a runtime cast error") {
    VectorExpressions.register(spark)
    val df = Seq(("a", 1.0, 1L, 2)).toDF("g", "score", "id", "k")
    def analyze(c: org.apache.spark.sql.Column): Throwable =
      intercept[Throwable](df.groupBy("g").agg(c.as("t")).queryExecution
        .assertAnalyzed())
    // int score
    assert(analyze(call_function("topk_pairs", lit(1), col("id"), lit(3)))
      .getMessage.contains("double score"))
    // int id
    assert(analyze(call_function("topk_pairs", col("score"), lit(7), lit(3)))
      .getMessage.contains("bigint id"))
    // column-valued k
    assert(analyze(call_function("topk_pairs", col("score"), col("id"), col("k")))
      .getMessage.contains("literal int k"))
    // k < 1
    assert(analyze(call_function("topk_pairs", col("score"), col("id"), lit(0)))
      .getMessage.contains("k >= 1"))
  }

  test("buffer trim and merge survive partial aggregation across partitions") {
    VectorExpressions.register(spark)
    val big = spark.range(0, 10000).repartition(16)
      .select(lit("g").as("g"), (col("id") % 977).cast("double").as("score"),
        col("id").as("id"))
    val top = big.groupBy("g")
      .agg(call_function("topk_pairs", col("score"), col("id"), lit(5)).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.score"), col("p.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // best score is 976.0; smallest ids win ties
    assert(top === Seq((976.0, 976L), (976.0, 1953L), (976.0, 2930L),
      (976.0, 3907L), (976.0, 4884L)))
  }
}
