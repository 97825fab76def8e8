package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** Pins [[Percentiles.exactCont]] to Spark's exact `percentile` aggregate
  * (PERCENTILE_CONT semantics): the histogram formulation must be
  * value-identical, globally and per group, including at sf0.1 on the
  * real `documents` table — so swapping it into the x_ppl_buckets /
  * x_percentile_filter cut derivations cannot flip a bucket. */
class PercentilesSpec extends SparkTestBase {
  import spark.implicits._

  test("matches exact percentile globally, including interpolation") {
    val df = (1 to 1000).map(i => ((i * 37) % 101 / 7.0))
      .toDF("v")
    val got = Percentiles
      .exactCont(df, "v", Seq(0.0 -> "p0", 1.0 / 3 -> "p33", 0.5 -> "p50",
        0.9 -> "p90", 1.0 -> "p100"))
      .head()
    val want = df.agg(
      expr("percentile(v, 0.0)"), expr("percentile(v, cast(1 as double)/3)"),
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"),
      expr("percentile(v, 1.0)")).head()
    for (i <- 0 until 5)
      assert(got.getDouble(i) === want.getDouble(i),
        s"prob index $i: ${got.getDouble(i)} vs ${want.getDouble(i)}")
  }

  test("matches exact percentile per group, with single-element groups") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 5.0),
      ("c", 3.0), ("c", 3.0), ("c", 4.0), ("c", 9.0)).toDF("g", "v")
    val got = Percentiles.exactCont(df, "v", Seq(0.5 -> "med"), Seq("g"))
      .orderBy("g").collect()
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("med"))
      .orderBy("g").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      assert(g.getDouble(1) === w.getDouble(1), s"group ${g.getString(0)}")
    }
  }

  test("sf0.1: per-language median cuts equal the exact aggregate") {
    val d = sf("sf0.1")
    val scored = Tables.documents(spark, d)
      .select(col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
    val got = Percentiles
      .exactCont(scored, "n_tok", Seq(0.5 -> "m"), Seq("lang"))
      .select(col("lang"), round(col("m"), 4).as("m"))
      .orderBy("lang").collect()
    val want = scored.groupBy("lang")
      .agg(round(expr("percentile(n_tok, 0.5)"), 4).as("m"))
      .orderBy("lang").collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      assert(g.getDouble(1) === w.getDouble(1), s"lang ${g.getString(0)}")
    }
  }

  test("sf0.1: tercile cuts and bucket assignment equal the exact form") {
    val d = sf("sf0.1")
    // Same score shape as x_ppl_buckets but over the cheap per-doc token
    // count (the cut/bucket machinery under test is score-agnostic; the
    // full bigram LM is exercised by the oracle at sf0.01).
    val scored = Tables.documents(spark, d)
      .select(col("doc_id"),
        round(log2(size(TextFunctions.tokens(col("text"))) + 1), 6)
          .as("lm_score"))
    val gotCuts = Percentiles
      .exactCont(scored, "lm_score", Seq(1.0 / 3 -> "c1", 2.0 / 3 -> "c2"))
      .select(round(col("c1"), 4).as("c1"), round(col("c2"), 4).as("c2"))
    val wantCuts = scored.agg(
      round(expr("percentile(lm_score, cast(1 as double)/3)"), 4).as("c1"),
      round(expr("percentile(lm_score, cast(2 as double)/3)"), 4).as("c2"))
    assert(gotCuts.head() === wantCuts.head())

    def buckets(cuts: org.apache.spark.sql.DataFrame) =
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"),
          when(col("lm_score") <= col("c1"), lit("tail"))
            .when(col("lm_score") <= col("c2"), lit("middle"))
            .otherwise(lit("head")).as("b"))
    val diff = buckets(gotCuts).as("x")
      .join(buckets(wantCuts).as("y"), Seq("doc_id"))
      .where($"x.b" =!= $"y.b").count()
    assert(diff === 0L)
  }
}
