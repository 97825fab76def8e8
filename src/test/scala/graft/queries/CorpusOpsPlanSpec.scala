package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkTestBase

/** Plan audits for the corpus-curation queries — the properties that make
  * them viable at 100 TB, asserted on the actual physical plans. AQE
  * wraps materialized stages as leaf nodes, so the join/exchange checks
  * read the final plan rendering rather than collecting typed nodes. */
class CorpusOpsPlanSpec extends SparkTestBase {

  private def build(name: String) =
    Registry.byName(name).build(spark, sf("sf0.001"))

  /** Final (post-AQE) physical plan rendering. */
  private def finalPlan(name: String): String = {
    val df = build(name)
    df.collect() // materialize every adaptive stage
    df.queryExecution.executedPlan.toString
  }

  test("stratified sample never reads the text column") {
    val scans = build("x_sample_stratified")
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("text"), s"text in ReadSchema: $read")
      assert(read.subsetOf(Set("doc_id", "lang")))
    }
  }

  test("stratified sample is a pure scan-side filter: no exchange at all") {
    val plan = finalPlan("x_sample_stratified")
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("decontamination joins the corpus against a BROADCAST bench side") {
    assert(finalPlan("x_decontaminate").contains("BroadcastHashJoin"),
      "bench shingle set must broadcast")
  }

  test("percentile filter broadcasts the per-language thresholds") {
    assert(finalPlan("x_percentile_filter").contains("BroadcastHashJoin"),
      "lang medians must broadcast")
  }

  test("dense-id assignment never funnels data through one partition") {
    // eager=false keeps the lazy plan (the query surface's eager form
    // checkpoints, which truncates exactly the lineage this audit reads)
    import org.apache.spark.sql.functions._
    val df = graft.ops.DenseIds.assign(
      spark.read.parquet(sf("sf0.001") + "/supplier.parquet")
        .select("s_suppkey", "s_acctbal"),
      Seq(desc("s_acctbal"), col("s_suppkey")), eager = false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"dense ids must not use a global-order window:\n$plan")
    assert(plan.contains("Window"), "expected the per-partition window")
  }

  test("document chunking is entirely map-side: no exchange at all") {
    val plan = finalPlan("x_chunk_documents")
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate"), "expected the explode of chunk starts")
  }

  test("bm25 explodes only query-matching terms, never the vocabulary") {
    // the term filter must sit INSIDE the token array (ArrayFilter under
    // the Generate), so the fan-out is |matching terms|, not |tokens|
    val analyzed = build("x_bm25_search")
      .queryExecution.optimizedPlan.toString
    assert(analyzed.contains("filter(toks"),
      s"term filter should run inside the array before explode:\n$analyzed")
  }

  test("hybrid search pushes the metadata predicates into the doc scan") {
    val scans = build("x_embed_hybrid_search")
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    val docScan = scans.find(
      _.requiredSchema.fieldNames.contains("doc_id")).getOrElse(
      fail("no documents scan in the plan"))
    // lang/n_chars filter AND column pruning: the scan reads only what
    // the filter + join need, never the text payload
    val pushed = docScan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("n_chars") || pushed.contains("lang"),
      s"metadata predicates not pushed: $pushed")
    assert(!docScan.requiredSchema.fieldNames.contains("text"),
      "hybrid search must not read document text")
  }
}
