package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SCD Type 2 semantics of [[Scd2]]: version chains, validity stamps,
  * current flags, and the four row fates per batch (carried / closed /
  * opened / new-chain) across multiple applied batches. */
class Scd2Spec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  private def dim(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "seg", "bal")
  }

  private def state0 = Scd2.init(dim(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0)), version = 1L)

  test("init stamps every row open at the load version") {
    val s = state0
    assert(s.where(col("_current") && col("_valid_to").isNull &&
      col("_valid_from") === 1L).count() === 3)
  }

  test("one batch: carried, closed+opened, and new chains") {
    import spark.implicits._
    val updates = dim(
      (2L, "B", 25.0),  // changed -> close v1 row, open v2 row
      (3L, "C", 30.0),  // unchanged -> carried, NO new version
      (9L, "Z", 99.0))  // new key -> new chain
    val out = Scd2(state0, updates, Seq("id"), Seq("seg", "bal"), 2L)
    val rows = out.select("id", "seg", "bal", "_valid_from", "_valid_to",
        "_current")
      .as[(Long, String, Double, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(rows === Set(
      (1L, "A", 10.0, 1L, None, true),      // untouched key: carried
      (2L, "B", 20.0, 1L, Some(2L), false), // closed old version
      (2L, "B", 25.0, 2L, None, true),      // opened new version
      (3L, "C", 30.0, 1L, None, true),      // unchanged update: carried
      (9L, "Z", 99.0, 2L, None, true)))     // new chain
  }

  test("chains extend across batches; history rows never rejoin") {
    import spark.implicits._
    val b2 = Scd2(state0, dim((2L, "B", 25.0)), Seq("id"),
      Seq("seg", "bal"), 2L)
    val b3 = Scd2(b2, dim((2L, "B", 27.0), (1L, "A2", 10.0)), Seq("id"),
      Seq("seg", "bal"), 3L)
    val two = b3.where(col("id") === 2L)
      .select("bal", "_valid_from", "_valid_to", "_current")
      .as[(Double, Long, Option[Long], Boolean)].collect().toSet
    assert(two === Set(
      (20.0, 1L, Some(2L), false),
      (25.0, 2L, Some(3L), false),
      (27.0, 3L, None, true)))
    // a three-version chain has exactly one current row per key
    val perKey = b3.groupBy("id")
      .agg(sum(when(col("_current"), 1).otherwise(0)).as("open"))
    assert(perKey.where(col("open") =!= 1).count() === 0)
  }

  test("null-safe change detection: null -> value and value -> null both close") {
    import spark.implicits._
    val s0 = Scd2.init(
      Seq((1L, Option.empty[String], 1.0), (2L, Some("x"), 2.0))
        .toDF("id", "seg", "bal"), 1L)
    val out = Scd2(s0,
      Seq((1L, Some("now-set"), 1.0), (2L, Option.empty[String], 2.0))
        .toDF("id", "seg", "bal"),
      Seq("id"), Seq("seg", "bal"), 2L)
    assert(out.where(!col("_current")).count() === 2)
    assert(out.where(col("_current")).count() === 2)
  }

  test("duplicate update keys are refused") {
    val e = intercept[IllegalArgumentException] {
      Scd2(state0, dim((2L, "B", 1.0), (2L, "B", 2.0)), Seq("id"),
        Seq("seg", "bal"), 2L)
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
