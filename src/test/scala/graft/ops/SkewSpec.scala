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

  test("AQE splits a skewed sort-merge join at runtime (the built-in alternative)") {
    // Salting is the manual tool; AQE's OptimizeSkewedJoin is the
    // built-in one. Demonstrate it fires: one hot key holding ~90% of
    // the probe side, tiny advisory sizes so the hot partition trips
    // the skew thresholds, broadcast disabled so the join sort-merges.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val probe = spark.range(0, 40000)
        .select((when(col("id") % 10 === 0, 7L).otherwise(col("id")))
          .as("k"), lpad(col("id").cast("string"), 64, "x").as("pad"))
      val build = spark.range(0, 2000).select(col("id").as("bk"),
        lit("v").as("v"))
      val joined = probe.join(build, col("k") === col("bk"))
      // collect(), not count(): count() wraps the plan in its own query
      // execution, so the join DataFrame's AQE plan would never finalize
      val n = joined.collect().length
      assert(n === 5800)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
