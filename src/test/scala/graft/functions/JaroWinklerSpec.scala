package graft.functions

import graft.SparkTestBase

/** Canonical Jaro-Winkler vectors (the textbook values, identical to
  * DuckDB's implementation — the oracle query `x_fuzzy_jw` fuzzes the
  * agreement over real data; this pins the landmarks and the edges). */
class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    spark.sql(s"SELECT jaro_winkler('$a', '$b')").head().getDouble(0)

  test("canonical vectors") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
  }

  test("edges: empty, disjoint, equal, boost threshold") {
    assert(jw("", "") === 0.0)   // both-empty is 0, not 1 (engine parity)
    assert(jw("", "abc") === 0.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    // jaro <= 0.7: the Winkler prefix boost must NOT apply
    assert(math.abs(jw("abcd", "abzzzzzzzzzzzz") - 0.5476190476190476) < 1e-12)
    // jaro > 0.7: boost applies, prefix capped at 4
    assert(math.abs(jw("ab", "abcdefghijkl") - 0.7777777777777779) < 1e-10)
  }

  test("symmetry and range on real names") {
    val bad = graft.core.Tables.part(spark, sf("sf0.001"))
      .selectExpr("p_name AS a", "reverse(p_name) AS b")
      .selectExpr(
        "jaro_winkler(a, b) AS ab", "jaro_winkler(b, a) AS ba")
      .where("ab <> ba OR ab < 0 OR ab > 1")
    assert(bad.count() === 0)
  }
}
