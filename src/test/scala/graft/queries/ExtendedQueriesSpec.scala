package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Behavioral pins for the round-3 surface additions, beyond the oracle
  * hash checks (which prove cross-engine equality, not the properties
  * themselves). */
class ExtendedQueriesSpec extends SparkTestBase {

  private val dir = sf("sf0.001")
  private def q(name: String) = Registry.byName(name).build(spark, dir)

  test("x_pii_scrub leaves no email or IPv4 literal behind") {
    val leaked = q("x_pii_scrub")
      .where(col("scrubbed").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+") ||
        col("scrubbed").rlike("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"))
    assert(leaked.count() === 0)
    // every doc got the synthetic enrichment, so every doc redacts >= 1+1
    val short = q("x_pii_scrub")
      .where(col("n_emails") < 1 || col("n_ips") < 1)
    assert(short.count() === 0)
  }

  test("x_table_checksum flips when any single row changes") {
    val base = graft.core.Tables.documents(spark, dir)
    def sums(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val row = graft.ops.PortableHash.hash60(concat_ws("|",
        col("doc_id").cast("string"), col("lang"), col("source"),
        col("n_chars").cast("string"), md5(col("text"))))
      df.select(col("lang"), row.as("h"))
        .groupBy("lang").agg(expr("bit_xor(h)").as("checksum"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val clean = sums(base)
    val tampered = sums(base.withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit("x")))
        .otherwise(col("text"))))
    val lang0 = base.where(col("doc_id") === 0)
      .select("lang").head().getString(0)
    assert(clean(lang0) !== tampered(lang0))
    assert((clean - lang0) === (tampered - lang0)) // other groups untouched
  }

  test("x_embed_quantize reconstruction error is bounded by half a step") {
    // err <= 0.5/s by construction; allow rounding slack on s itself
    val bad = q("x_embed_quantize")
      .where(col("max_err") > lit(0.5) / col("scale") * 1.0001)
    assert(bad.count() === 0)
  }

  test("k5_merge_upsert preserves row count of the key universe") {
    val customers = graft.core.Tables.customer(spark, dir).count()
    val merged = q("k5_merge_upsert")
    assert(merged.count() === customers)
    assert(merged.select("c_custkey").distinct().count() === customers)
    // at least one row actually took the update path at this SF
    assert(merged.where(col("c_mktsegment") === "UPGRADED").count() > 0)
  }

  test("x_events_funnel stage timestamps are monotone and consistent") {
    val bad = q("x_events_funnel").where(
      (col("t_view").isNotNull && col("t_view") < col("t_signup")) ||
        (col("t_purchase").isNotNull && col("t_purchase") < col("t_view")) ||
        (col("t_purchase").isNotNull && col("t_view").isNull) ||
        col("stage") =!= (lit(1) +
          when(col("t_view").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0)))
    assert(bad.count() === 0)
    assert(q("x_events_funnel").count() > 0)
  }

  test("x_fuzzy_neardup pairs share a block and respect the distance cap") {
    val rows = q("x_fuzzy_neardup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, dist) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b)
      assert(dist <= 3)
      assert(a.split(" ").last === b.split(" ").last) // same block
    }
  }

  test("a22 EXISTS/NOT EXISTS rewrite to semi/anti joins — no per-row subquery") {
    val plan = q("a22_exists_subquery").queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"))
    assert(plan.contains("LeftAnti"))
    assert(!plan.toLowerCase.contains("subquery"))
  }

  test("k5 merge plans the anti-join side as a broadcast") {
    val df = q("k5_merge_upsert")
    df.collect() // finalize THIS DataFrame's adaptive plan (count() would spawn its own)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("x_global_sort is totally ordered and planned as a range exchange") {
    val df = q("x_global_sort")
    val rows = df.collect()
    val key = rows.map(r => (-r.getDouble(2), r.getLong(0)))
    assert(key.sameElements(key.sorted), "output not in global order")
    // the collect above executed this DataFrame's own query execution
    assert(df.queryExecution.executedPlan.toString
      .toLowerCase.contains("rangepartitioning"))
  }

  test("x_vocab_coverage ratios are in [0,1] and counts are consistent") {
    val bad = q("x_vocab_coverage").where(
      col("in_vocab") > col("n_toks") ||
        col("coverage") < 0 || col("coverage") > 1)
    assert(bad.count() === 0)
  }

  test("x_cohort_retention: offset-0 cell equals the cohort size") {
    // every user is active in their own first week by construction
    val m = q("x_cohort_retention")
    val cohortSizes = m.where(col("week_offset") === 0)
    assert(cohortSizes.count() > 0)
    val total = cohortSizes.agg(sum("n_users")).head().getLong(0)
    val users = graft.core.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(total === users)
    assert(m.where(col("week_offset") < 0).count() === 0)
  }

  test("a24_argmax agrees with the window-ranking formulation") {
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      graft.core.Tables.customer(spark, dir)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("c_nationkey"), col("c_name").as("top_customer"),
          round(col("c_acctbal"), 2).as("acctbal"))
    }
    assert(q("a24_argmax").except(viaWindow).count() === 0)
    assert(viaWindow.except(q("a24_argmax")).count() === 0)
  }
}
