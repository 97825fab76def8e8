package graft.queries

import graft.SparkTestBase

/** Error-bound checks for the approximate-aggregate surface at the bench
  * scale factor: the A16/A17 queries emit a boolean per group asserting
  * the sketch landed within its configured tolerance, so the DuckDB
  * oracle (which emits literal `true`) verifies the bound per row. This
  * spec runs them at sf0.1 — the driver's bench SF — and at sf0.001 to
  * cover small-population behavior. */
class ApproxAggSpec extends SparkTestBase {

  private def allFlagsTrue(name: String, dir: String): Unit = {
    val rows = Registry.byName(name).build(spark, dir).collect()
    assert(rows.nonEmpty)
    val flagIdx = rows.head.length - 1
    assert(rows.forall(!_.isNullAt(flagIdx)))
    assert(rows.forall(_.getBoolean(flagIdx)),
      s"$name sketch outside tolerance at $dir")
  }

  test("approx_count_distinct within ±6% (3×rsd) of exact, sf0.1 and sf0.001") {
    allFlagsTrue("a16_approx_count_distinct", sf("sf0.1"))
    allFlagsTrue("a16_approx_count_distinct", sf("sf0.001"))
  }

  test("approx_percentile within ±2% of exact p90, sf0.1 and sf0.001") {
    allFlagsTrue("a17_approx_percentile", sf("sf0.1"))
    allFlagsTrue("a17_approx_percentile", sf("sf0.001"))
  }
}
