package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  private def lineitem = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
  private def supplier = spark.read.parquet(sf("sf0.001") + "/supplier.parquet")

  test("saltedJoin returns exactly the unsalted join's rows") {
    val plain = lineitem.join(supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("p"))
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(lineitem, supplier,
        col("l_suppkey"), col("s_suppkey"), col("l_orderkey"), salts = 8)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("p"))
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin keeps probe rows whose salt source is null") {
    import spark.implicits._
    val probe = Seq((1L, Some(10L)), (1L, None), (2L, Some(7L)), (3L, None))
      .toDF("k", "salt_src")
    val build = Seq((1L, "a"), (3L, "c")).toDF("bk", "v")
    val got = Skew.saltedJoin(probe, build,
        col("k"), col("bk"), col("salt_src"), salts = 4)
      .select("k", "v").as[(Long, String)].collect().toSet
    // both null-salt probe rows (k=1 and k=3) must survive the join
    assert(got === Set((1L, "a"), (3L, "c")))
    assert(Skew.saltedJoin(probe, build,
      col("k"), col("bk"), col("salt_src"), salts = 4).count() === 3L)
  }

  test("saltedDistinctCount equals single-phase COUNT DISTINCT") {
    val plain = lineitem.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedDistinctCount(lineitem,
        col("l_returnflag"), col("l_partkey"), salts = 16, outName = "n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === plain)
  }
}
