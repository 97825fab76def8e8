package graft.ops

import graft.SparkTestBase

/** Bucketed range join: boundary exactness (gap = tol inclusive, just
  * past tol excluded), cross-bucket pairs, key isolation, and no
  * duplicate emission for same-bucket pairs. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("finds exactly the in-tolerance pairs, each once") {
    val tol = 10L
    val rows = Seq(
      // key "x": ids at us 0, 9 (gap 9 ✓), 10 (gap-to-0 = 10 ✓ inclusive,
      // crosses the bucket boundary), 21 (gap-to-10 = 11 ✗)
      ("x", 1L, 0L), ("x", 2L, 9L), ("x", 3L, 10L), ("x", 4L, 21L),
      // key "y": same timestamps as x-1 — must not pair across keys
      ("y", 5L, 0L))
      .toDF("k", "id", "us")
    val got = RangeJoin.temporalNearPairs(rows, "k", "id", "us", tol)
      .select("a_id", "b_id", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 2L, 9L),   // same bucket
      (1L, 3L, 10L),  // adjacent bucket, gap == tol (inclusive)
      (2L, 3L, 1L)))  // adjacent bucket
  }

  test("rejects tolUs <= 0 at the API boundary") {
    val rows = Seq(("x", 1L, 0L)).toDF("k", "id", "us")
    for (tol <- Seq(0L, -5L)) {
      val e = intercept[IllegalArgumentException] {
        RangeJoin.temporalNearPairs(rows, "k", "id", "us", tol)
      }
      assert(e.getMessage.contains("tolUs > 0"))
    }
  }
}
