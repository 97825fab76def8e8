package graft.plans

import graft.SparkTestBase
import graft.ops.RuntimeFilters
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction ([[graft.ops.RuntimeFilters]]): the filter
  * must (a) change nothing about the join RESULT — false positives are
  * absorbed by the exact join downstream, false negatives are impossible
  * by the Bloom contract; (b) sit BELOW the fact side's exchange in the
  * physical plan, so pruned rows never reach the shuffle; and (c) prune
  * for real — a ~1%-selective dimension must cut the shuffled fact rows
  * by an order of magnitude, not a rounding error. */
class BloomSemiJoinSpec extends SparkTestBase {

  private def fact = spark.read
    .parquet(sf("sf0.01") + "/orders.parquet")
  private def dim = spark.read
    .parquet(sf("sf0.01") + "/customer.parquet")
    .where(col("c_custkey") % 97 === 0)

  test("pruned join result is identical to the plain join") {
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(_.toString).sorted.toSeq
    val pruned = RuntimeFilters
      .prunedJoin(fact, "o_custkey", dim, "c_custkey")
      .select("o_orderkey", "c_custkey").collect()
      .map(_.toString).sorted.toSeq
    assert(pruned.nonEmpty, "test dimension selected nothing — bad fixture")
    assert(pruned == plain)
  }

  test("the bloom filter prunes the fact side by ~the dim selectivity") {
    val bytes = RuntimeFilters.bloomBytes(dim, "c_custkey")
    val total = fact.count()
    val kept = fact
      .where(RuntimeFilters.mightContain(bytes, col("o_custkey"))).count()
    val semi = fact.join(dim, col("o_custkey") === col("c_custkey"),
      "left_semi").count()
    assert(kept >= semi, "bloom dropped a true match (false negative)")
    // ~1% of customers selected + 1% fpp → kept should be well under 10%
    assert(kept < total / 10,
      s"bloom barely pruned: kept $kept of $total")
  }

  test("the filter sits below the fact-side exchange in the plan") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force a shuffle join so "below the exchange" is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RuntimeFilters
        .prunedJoin(fact, "o_custkey", dim, "c_custkey")
        .queryExecution.executedPlan
      val exchangesWithBloom = plan.collect {
        case e: ShuffleExchangeExec if e.child.collectFirst {
          case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain") => f
        }.isDefined => e
      }
      assert(exchangesWithBloom.nonEmpty,
        s"no exchange has the bloom filter below it:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("generated code compiles and agrees with the interpreted path") {
    val bytes = RuntimeFilters.bloomBytes(dim, "c_custkey")
    val fallback = "spark.sql.codegen.fallback"
    val whole = "spark.sql.codegen.wholeStage"
    val prevF = spark.conf.get(fallback)
    val prevW = spark.conf.get(whole)
    val probe = fact.where(
      RuntimeFilters.mightContain(bytes, col("o_custkey")))
    try {
      spark.conf.set(fallback, "false")
      spark.conf.set(whole, "true")
      val gen = probe.count()
      spark.conf.set(whole, "false")
      val interp = probe.count()
      assert(gen == interp)
    } finally {
      spark.conf.set(fallback, prevF)
      spark.conf.set(whole, prevW)
    }
  }

  test("an empty dimension yields an empty join, not a crash") {
    val none = dim.where(lit(false))
    val out = RuntimeFilters
      .prunedJoin(fact, "o_custkey", none, "c_custkey")
    assert(out.count() == 0)
  }

  test("dim is pinned — build side reads checkpointed blocks, not the source") {
    // the nondeterminism guard: count, bloom build, and join must all
    // read ONE materialization of dim. Pinning shows up in the plan as
    // an RDD scan on the dim side instead of a second parquet scan.
    val plan = RuntimeFilters
      .prunedJoin(fact, "o_custkey", dim, "c_custkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"dim side should read the pinned checkpoint:\n$plan")
  }

  test("nondeterministic dim: pruned join result is self-consistent") {
    // rand() without a seed resamples on every evaluation; before the
    // pin, the bloom pass and the join pass could disagree on the key
    // set. With the pin, the output must be exactly fact ⋈ (one sample):
    // every output key's fact-row count matches the unpruned fact.
    val nd = spark.read.parquet(sf("sf0.01") + "/customer.parquet")
      .where(rand() < 0.01)
    val out = RuntimeFilters
      .prunedJoin(fact, "o_custkey", nd, "c_custkey")
      .groupBy("c_custkey").count()
    val factCounts = fact.groupBy("o_custkey").count()
      .withColumnRenamed("count", "fact_count")
    val mismatched = out
      .join(factCounts, col("c_custkey") === col("o_custkey"))
      .where(col("count") =!= col("fact_count"))
      .count()
    assert(mismatched == 0,
      "a key appeared with only part of its fact rows — inconsistent dim passes")
  }

  test("string keys probe the same bytes putString stored") {
    import spark.implicits._
    val d = Seq("alpha", "beta", "gamma").toDF("k")
    val bytes = RuntimeFilters.bloomBytes(d, "k", expectedItems = Some(3))
    val probed = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      .toDF("k")
      .where(RuntimeFilters.mightContain(bytes, col("k")))
      .as[String].collect().toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(probed),
      "false negative on string keys — hashing mismatch with putString")
  }
}
