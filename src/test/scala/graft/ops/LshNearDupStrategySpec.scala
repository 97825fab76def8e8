package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the size-adaptive join strategy of
  * [[VectorOps.lshNearDupPairs]]: broadcast build under the ceiling,
  * bucket-key shuffle join past it — same pairs either way. */
class LshNearDupStrategySpec extends SparkTestBase {

  private val planes = VectorOps.hyperplanes(4, 64)

  private def emb = {
    graft.functions.VectorExpressions.register(spark)
    graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.normNative(col("v")))
  }

  test("under the ceiling the build side broadcasts") {
    val q = VectorOps.lshNearDupPairs(emb, planes, minCos = 0.4)
    assert(q.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
  }

  test("past the ceiling the join becomes a bucket-key shuffle join") {
    val q = VectorOps.lshNearDupPairs(emb, planes, minCos = 0.4,
      broadcastBytes = 1L)
    val plan = q.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
  }

  test("both regimes emit identical pairs") {
    def rows(q: org.apache.spark.sql.DataFrame) =
      q.collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaBroadcast = rows(VectorOps.lshNearDupPairs(emb, planes, 0.4))
    val viaShuffle = rows(
      VectorOps.lshNearDupPairs(emb, planes, 0.4, broadcastBytes = 1L))
    assert(viaBroadcast === viaShuffle)
    assert(viaBroadcast.nonEmpty)
  }
}
