package graft.immigration

import graft.SparkTestBase

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("strict mode throws on an empty table; warn mode only reports") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val full = Seq(("a", 1L)).toDF("k", "v")
    val results = Seq(
      Quality.nonEmpty("fact", empty),
      Quality.nonEmpty("dim", full))
    assert(!results.head.passed && results(1).passed)
    Quality.enforce(results, strict = false) // must not throw
    intercept[Quality.QualityCheckFailure] {
      Quality.enforce(results, strict = true)
    }
  }

  test("referential check compares fact-column vs whole-dim distincts (ref quirk)") {
    val fact = Seq(("A", 1), ("A", 2), ("B", 3)).toDF("code", "x")
    val dim = Seq(("A", "a"), ("B", "b")).toDF("code", "name")
    val r = Quality.referential("codes", fact, "code", dim)
    assert(r.passed) // 2 distinct fact codes == 2 distinct dim ROWS
    val dimDup = Seq(("A", "a"), ("A", "a2"), ("B", "b")).toDF("code", "name")
    assert(!Quality.referential("codes", fact, "code", dimDup).passed)
  }
}
