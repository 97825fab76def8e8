package graft.queries

import graft.SparkTestBase
import graft.ops.{ProductQuantization, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality gates for the PQ ANN path: the rows-level oracle proves the
  * engine computes the DEFINED pipeline exactly; this spec proves the
  * pipeline is a GOOD approximation — codes are compact, ADC distances
  * track true distances, and recall against exact L2 top-k clears a
  * floor. Bounds are measured-then-pinned: a regression in the trainer
  * (seeding, rounding, carry-forward) shows up here, not in production. */
class PqSpec extends SparkTestBase {

  import ProductQuantization._

  private def corpus(dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    spark.read.parquet(dir + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private lazy val e = corpus(sf("sf0.01")).cache()
  private lazy val cents = trainCodebooks(e).cache()
  private lazy val codes = encode(e, cents).cache()

  test("codes are M small ints within their codebook") {
    val bad = codes.where(size(col("codes")) =!= M ||
      exists(col("codes"), c => c < 0 || c >= K)).count()
    assert(bad == 0)
    assert(codes.count() == e.count())
  }

  test("every subspace keeps a full, dense codebook (carry-forward)") {
    val perM = cents.groupBy("m").agg(
      count(lit(1)).as("n"), min("c_id").as("lo"), max("c_id").as("hi"))
      .collect()
    assert(perM.length == M)
    perM.foreach { r =>
      assert(r.getLong(1) == K && r.getInt(2) == 0 && r.getInt(3) == K - 1,
        s"subspace ${r.get(0)} codebook not dense: $r")
    }
  }

  test("ADC distance tracks true squared L2 distance") {
    val q = e.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val luts = queryLuts(q.select(col("q_id"), col("qv").as("v")), cents)
    // true d2 vs ADC d2 on ALL query-corpus pairs
    val joined = codes.join(e, "vec_id")
      .crossJoin(broadcast(q.join(luts, "q_id")))
      .where(col("vec_id") =!= col("q_id"))
      .select(
        call_function("pq_adc", col("codes"), col("lut")).as("adist"),
        (VectorOps.dotNative(col("v"), col("v")) +
          VectorOps.dotNative(col("qv"), col("qv")) -
          lit(2.0) * VectorOps.dotNative(col("v"), col("qv"))).as("d2"))
    val row = joined.agg(
      avg(abs(col("adist") - col("d2")) / col("d2")).as("mre"),
      corr(col("adist"), col("d2")).as("r")).head()
    val (mre, r) = (row.getDouble(0), row.getDouble(1))
    // measured at sf0.01: mre 0.162 (dominated by near pairs, where the
    // additive quantization error is large RELATIVE to a small true d²)
    // and corr 0.78 (synthetic vectors concentrate pairwise distances,
    // squeezing the correlation's dynamic range) — pinned with slack as
    // regression floors for the trainer, not absolute quality claims
    assert(mre < 0.25, s"mean relative ADC error $mre")
    assert(r > 0.7, s"ADC/true distance correlation $r")
  }

  test("IVF-PQ + exact re-rank recall@3 vs exact COSINE clears the floor") {
    val d = sf("sf0.01")
    val full = spark.read.parquet(d + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.normNative(col("v")))
    val qv = full.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val exact = full.crossJoin(broadcast(qv))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dotNative(col("v"), col("qv")) /
          (col("nrm") * col("qn"))).as("cos"))
      .groupBy("q_id")
      .agg(call_function("topk_pairs", col("cos"), col("vec_id"), lit(3))
        .as("top"))
      .select(col("q_id"), explode(col("top.id")).as("n_id"))
    val approx = Registry.byName("x_embed_ivfpq_rerank").build(spark, d)
      .select(col("q_id"), col("n_id"))
    val nQ = qv.count()
    val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi").count()
    val recall = hits.toDouble / (3.0 * nQ)
    info(f"IVF-PQ rerank recall@3 = $recall%.3f over $nQ queries")
    // recall loss comes only from the shortlist (cells + ADC); the
    // re-rank itself is exact — floor pinned from measurement with slack
    assert(recall >= 0.4, s"ivfpq rerank recall@3 $recall below floor")
  }

  test("recall@3 against exact L2 top-3 clears the floor") {
    val qv = e.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = e.crossJoin(broadcast(qv))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dotNative(col("v"), col("v")) +
          VectorOps.dotNative(col("qv"), col("qv")) -
          lit(2.0) * VectorOps.dotNative(col("v"), col("qv"))).as("d2"))
      .groupBy("q_id")
      .agg(call_function("topk_pairs", -col("d2"), col("vec_id"), lit(3))
        .as("top"))
      .select(col("q_id"), explode(col("top.id")).as("n_id"))
    val luts = queryLuts(qv.select(col("q_id"), col("qv").as("v")), cents)
    val approx = adcTopK(codes, luts, 3)
      .select(col("q_id"), col("n_id"))
    val nQ = qv.count()
    val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi").count()
    val recall = hits.toDouble / (3.0 * nQ)
    info(f"PQ recall@3 = $recall%.3f over $nQ queries")
    // K=16 codebooks over M=16 4-dim subspaces: measured ~0.6+ at
    // sf0.01; pinned with slack — a broken trainer lands near the
    // random-baseline (~3/corpus ≈ 0)
    assert(recall >= 0.4, s"recall@3 $recall below floor")
  }
}
