package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LevenshteinPruningSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    ("hot bolt", "cold bolt"),   // dist 3, len diff 1 — survives guard
    ("a", "abcdefgh"),           // len diff 7 — pruned by guard alone
    ("ring", "ring"))            // dist 0
    .toDF("a", "b")

  test("adds a length guard ahead of the edit-distance filter") {
    // file-backed scan: a LocalRelation would be constant-folded whole
    // before the plan could be inspected
    val part = graft.core.Tables.part(spark, sf("sf0.001"))
    val q = part.as("x").join(part.as("y"),
        col("x.p_brand") === col("y.p_brand"))
      .where(levenshtein(col("x.p_name"), col("y.p_name")) <= 3)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("abs((length"))
    // the rule runs to fixpoint without stacking duplicate guards
    assert("abs\\(\\(length".r.findAllIn(optimized.toLowerCase).size === 1)
  }

  test("guarded filter returns exactly the unguarded rows") {
    val got = df.where(levenshtein(col("a"), col("b")) <= 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("hot bolt", "cold bolt"), ("ring", "ring")))
  }

  test("a threshold inside a disjunction contributes no guard") {
    // levenshtein(a,b) <= 2 OR c = 1: rows satisfying only c = 1 must
    // survive — a top-level length guard would wrongly drop them
    val part = graft.core.Tables.part(spark, sf("sf0.001"))
    val q = part.where(
      levenshtein(col("p_name"), col("p_brand")) <= 2 || col("p_size") === 1)
    assert(!q.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("abs((length"))
    val orDf = Seq(("a", "abcdefgh", 1), ("a", "abcdefgh", 2), ("x", "xy", 2))
      .toDF("a", "b", "c")
    val got = orDf
      .where(levenshtein(col("a"), col("b")) <= 2 || col("c") === 1)
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    // ("a", 1) survives via the c = 1 disjunct despite len diff 7
    assert(got === Set(("a", 1), ("x", 2)))
  }

  test("a conjunct beside a disjunction still gets its guard") {
    val part = graft.core.Tables.part(spark, sf("sf0.001"))
    val q = part.where(
      levenshtein(col("p_name"), col("p_brand")) <= 2 &&
        (col("p_size") === 1 || col("p_size") === 2))
    assert(q.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("abs((length"))
  }

  test("distance-threshold forms other than <= literal are left alone") {
    val part = graft.core.Tables.part(spark, sf("sf0.001"))
    val q = part.where(levenshtein(col("p_name"), col("p_brand")) > 3)
    assert(!q.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("abs((length"))
  }
}
