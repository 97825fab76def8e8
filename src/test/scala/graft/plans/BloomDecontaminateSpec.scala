package graft.plans

import graft.SparkTestBase
import graft.queries.Registry
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** `x_decontaminate_bloom` is the eval-set-scale plan for the same
  * question `x_decontaminate` answers with an exact broadcast: the two
  * must agree row-for-row (the bloom's false positives die in the exact
  * verify join; false negatives are impossible), and the bloom
  * membership test must run BELOW the corpus-side exchange so pruned
  * postings never shuffle. */
class BloomDecontaminateSpec extends SparkTestBase {

  private def run(name: String) =
    Registry.byName(name).build(spark, sf("sf0.001"))

  test("bloom path agrees exactly with the broadcast path") {
    val exact = run("x_decontaminate")
      .collect().map(_.toString).sorted.toSeq
    val bloom = run("x_decontaminate_bloom")
      .collect().map(_.toString).sorted.toSeq
    assert(exact.nonEmpty, "fixture selected no contaminated docs")
    assert(bloom == exact)
  }

  test("the bloom membership filter sits below a corpus-side exchange") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the verify join to shuffle, as it would at eval-suite scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = run("x_decontaminate_bloom").queryExecution.executedPlan
      val pruned = plan.collect {
        case e: ShuffleExchangeExec if e.child.collectFirst {
          case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain") => f
        }.isDefined => e
      }
      assert(pruned.nonEmpty,
        s"no exchange has the bloom filter below it:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
