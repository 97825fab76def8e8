package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("latestWins replaces matched keys, passes others, inserts new keys") {
    val target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("k", "name", "bal")
    val updates = Seq((2, "b2", 99.0), (4, "d", 40.0))
      .toDF("k", "name", "bal")
    val got = Upsert.latestWins(target, updates, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1, "a", 10.0),  // untouched
      (2, "b2", 99.0), // updated wholesale
      (3, "c", 30.0),  // untouched
      (4, "d", 40.0))) // inserted
  }

  test("compound keys and column order differences are handled") {
    val target = Seq((1, "x", 1.0), (1, "y", 2.0)).toDF("k1", "k2", "v")
    // updates with the same schema in a different column order
    val updates = Seq(("y", 1, 9.0)).toDF("k2", "k1", "v")
    val got = Upsert.latestWins(target, updates, Seq("k1", "k2"))
      .select("k1", "k2", "v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1, "x", 1.0), (1, "y", 9.0)))
  }

  test("empty keys are rejected") {
    val df = Seq((1, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](Upsert.latestWins(df, df, Seq.empty))
  }
}
