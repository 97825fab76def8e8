package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the size-adaptive join strategy of
  * [[VectorOps.labelNearDupPairs]]: broadcast build under the ceiling,
  * salted (label, salt) shuffle join past it — same pairs either way,
  * and the salted key fans out to strictly more distinct values than
  * |labels| (the whole point: parallelism no longer capped by the
  * label cardinality, and no full-corpus broadcast at scale). */
class LabelNearDupStrategySpec extends SparkTestBase {

  private def emb = {
    graft.functions.VectorExpressions.register(spark)
    graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.normNative(col("v")))
  }

  test("under the ceiling the build side broadcasts") {
    val q = VectorOps.labelNearDupPairs(emb, "label", minCos = 0.4)
    assert(q.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
  }

  test("past the ceiling the join becomes a salted shuffle join") {
    val q = VectorOps.labelNearDupPairs(emb, "label", minCos = 0.4,
      broadcastBytes = 1L)
    val plan = q.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    assert(plan.contains("salt"), "join key must include the salt column")
  }

  test("salted key has more distinct values than |labels|") {
    val e = emb
    val labels = e.select(col("label")).distinct.count()
    val saltedKeys = e
      .withColumn("salt", pmod(hash(col("vec_id")), lit(32)))
      .select(col("label"), col("salt")).distinct.count()
    assert(labels >= 2)
    assert(saltedKeys > labels,
      s"salting must fan the shuffle key out past |labels| ($saltedKeys vs $labels)")
  }

  test("both regimes emit identical pairs") {
    def rows(q: org.apache.spark.sql.DataFrame) =
      q.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val viaBroadcast = rows(VectorOps.labelNearDupPairs(emb, "label", 0.4))
    val viaSalted = rows(
      VectorOps.labelNearDupPairs(emb, "label", 0.4, broadcastBytes = 1L))
    assert(viaBroadcast === viaSalted)
    assert(viaBroadcast.nonEmpty)
  }

  test("replica count 1 degenerates to the plain label join, same pairs") {
    val base = VectorOps.labelNearDupPairs(emb, "label", 0.4)
      .collect().map(_.toString).toSet
    val r1 = VectorOps.labelNearDupPairs(emb, "label", 0.4,
        saltReplicas = 1, broadcastBytes = 1L)
      .collect().map(_.toString).toSet
    assert(base === r1)
  }
}
