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

  test("distance-threshold forms other than <= literal are left alone") {
    val part = graft.core.Tables.part(spark, sf("sf0.001"))
    val q = part.where(levenshtein(col("p_name"), col("p_brand")) > 3)
    assert(!q.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("abs((length"))
  }
}
