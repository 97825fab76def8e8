package graft.corpus

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end corpus pipeline at sf0.001: stage counts must be monotone
  * non-increasing through the filters, the sink must round-trip, and the
  * whole run must be deterministic (hash sampling, not rand()). */
class CorpusPipelineSpec extends SparkTestBase {

  test("pipeline runs end-to-end with monotone stage counts") {
    val out = Files.createTempDirectory("graft-corpus-").toString
    val s = CorpusPipeline.run(spark, sf("sf0.001"), out)

    assert(s.input === 500)
    assert(s.afterQuality <= s.input)
    assert(s.afterExactDedup <= s.afterQuality)
    assert(s.afterNearDedup <= s.afterExactDedup)
    assert(s.sampled <= s.afterNearDedup)
    assert(s.sequences > 0 && s.sequences <= s.sampled)
    // the corpus genuinely contains planted dups — the stages must bite
    assert(s.afterNearDedup < s.afterQuality,
      "near/exact dedup should remove planted duplicates")

    val written = spark.read.parquet(s"$out/corpus")
    assert(written.count() === s.sampled)
    // partition pruning surface: one lang directory readable alone
    val langs = written.select("lang").distinct().count()
    assert(langs >= 2)
    // no doc survives twice
    assert(written.select("doc_id").distinct().count() === s.sampled)
    // leakage-safe split rides the sink as a partition column: training
    // jobs read split=train alone, and the split hashed CLUSTER ids
    val splits = written.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "eval")) && splits.contains("train"))
    val trainOnly = spark.read
      .parquet(s"$out/corpus").where(col("split") === "train")
    assert(trainOnly.count() > 0 && trainOnly.count() < written.count() + 1)
  }

  test("pipeline is deterministic across runs") {
    val out1 = Files.createTempDirectory("graft-corpus-d1-").toString
    val out2 = Files.createTempDirectory("graft-corpus-d2-").toString
    val s1 = CorpusPipeline.run(spark, sf("sf0.001"), out1)
    val s2 = CorpusPipeline.run(spark, sf("sf0.001"), out2)
    assert(s1 === s2)
    val ids1 = spark.read.parquet(s"$out1/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = spark.read.parquet(s"$out2/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
  }
}
