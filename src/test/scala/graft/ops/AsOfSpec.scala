package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("asOfJoin: most recent prior build row per key, equal time matches, no prior -> null") {
    val probe = Seq(
      ("u1", 10L, 1L), ("u1", 12L, 2L), ("u1", 15L, 3L), ("u1", 5L, 4L),
      ("u2", 8L, 5L)) // u2 has no build rows at all
      .toDF("k", "t", "event_id")
    val build = Seq(
      ("u1", 12L, "a"), ("u1", 14L, "b"))
      .toDF("k", "t", "tag")

    val got = AsOf.asOfJoin(probe, build, key = "k", time = "t",
        payload = Seq("tag"))
      .select("event_id", "tag")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(got === Map(
      1L -> None, // before any build
      2L -> Some("a"), // equal timestamp matches
      3L -> Some("b"), // most recent prior, not first
      4L -> None,
      5L -> None)) // key with no build rows
  }

  test("asOfJoin keeps every probe row and all probe columns") {
    val probe = Seq(("u1", 1L, "x", 3.5)).toDF("k", "t", "extra", "val")
    val build = Seq(("u1", 1L, 9L)).toDF("k", "t", "p")
    val out = AsOf.asOfJoin(probe, build, "k", "t", Seq("p"))
    assert(out.columns.toSeq === Seq("k", "t", "extra", "val", "p"))
    assert(out.count() === 1)
    assert(out.head().getLong(4) === 9L)
  }
}
