package graft.queries

import graft.SparkTestBase
import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The property `x_split_by_cluster` exists for: NO near-dup pair may
  * straddle the train/eval boundary. Hashing the cluster id makes this
  * true by construction — the spec guards the construction (a regression
  * to doc-id hashing would pass the oracle compare but leak). */
class SplitLeakageSpec extends SparkTestBase {

  test("every near-dup pair lands on one side of the split, sf0.01") {
    val d = sf("sf0.01")
    val split = Registry.byName("x_split_by_cluster").build(spark, d)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup
      .minhashNearDups(Tables.documents(spark, d), threshold = 0.8)
      .select(col("a_id"), col("b_id"))
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "a_split"), "a_id")
      .join(split.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "b_split"), "b_id")
      .where(col("a_split") =!= col("b_split"))
    assert(pairs.count() > 0, "no near-dup pairs at sf0.01 — bad fixture")
    assert(straddling.count() == 0, "near-dup pair crossed the split")
  }

  test("the split lands near its 90/10 target") {
    val split = Registry.byName("x_split_by_cluster")
      .build(spark, sf("sf0.01"))
    val n = split.count().toDouble
    val train = split.where(col("split") === "train").count().toDouble
    // hash-mod is uniform; tolerate small-corpus variance
    assert(train / n > 0.8 && train / n < 0.98,
      s"train share ${train / n} far from 0.9")
  }
}
