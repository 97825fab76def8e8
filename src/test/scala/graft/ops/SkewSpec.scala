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
