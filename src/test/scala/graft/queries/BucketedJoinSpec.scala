package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

class BucketedJoinSpec extends SparkTestBase {

  test("bucketed co-located join plans without a shuffle before the join") {
    // disable auto-broadcast so the tiny test tables take the same
    // sort-merge path a 100 TB fact-to-fact join would, and AQE so the
    // executed plan is directly traversable (query stages hide subplans)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assertColocated()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  private def assertColocated(): Unit = {
    val df = Registry.byName("k2_bucketed_colocated_join")
      .build(spark, sf("sf0.001"))
    df.collect() // force planning + execution
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // unwrap AQE
      case p => p
    }
    val joins = plan.collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, s"expected a sort-merge join in:\n$plan")
    // no shuffle exchange anywhere BELOW the join: buckets line up
    val shufflesUnderJoin = joins.head.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n$plan")
  }
}
