package graft.queries

import graft.SparkTestBase

/** The bench's two-stage path (`GraftQuery.benchBuild`) must measure the
  * SAME query that the correctness harness verifies: for every query
  * that carries a `benchBuild`, the thunk's result set must equal the
  * canonical `build` output (schema-wise and row-wise). Otherwise the
  * bench number stops being evidence about the verified operator. */
class BenchBuildSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("every benchBuild read-side plan reproduces its build result") {
    val staged = Registry.all.filter(_.benchBuild.isDefined)
    assert(staged.nonEmpty, "expected write-heavy queries to carry benchBuild")
    staged.foreach { q =>
      val expected = q.build(spark, dir)
      val thunk = q.benchBuild.get(spark, dir)
      val actual = thunk()
      assert(actual.columns.toSeq == expected.columns.toSeq,
        s"${q.name}: benchBuild column mismatch")
      // order-insensitive multiset compare on stringified rows
      val e = expected.collect().map(_.toString).sorted.toSeq
      val a = actual.collect().map(_.toString).sorted.toSeq
      assert(a == e, s"${q.name}: benchBuild rows differ from build rows")
      // the thunk must be re-runnable (the bench times it `runs` times)
      assert(thunk().count() == e.size)
    }
  }
}
