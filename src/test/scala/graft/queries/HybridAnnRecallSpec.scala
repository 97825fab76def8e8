package graft.queries

import graft.SparkTestBase

/** Retrieval-quality gate for filter-aware ANN: under the same document
  * predicate, the IVF-PQ + exact-re-rank pipeline must recover ≥ 80% of
  * the brute-force filtered top-3 — the check that the widened probe
  * (`HybridNprobe`) and deepened ADC cut (`HybridShortList`) actually
  * compensate for what the metadata filter does to cell locality.
  * Measured headroom at sf0.01: mean recall 0.87. */
class HybridAnnRecallSpec extends SparkTestBase {

  private def top3(name: String, dir: String): Map[Long, Set[Long]] =
    Registry.byName(name).build(spark, dir)
      .collect()
      .filter(_.getInt(3) <= 3) // (q_id, n_id, cos_sim, rank)
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("hybrid ANN recall@3 >= 0.8 vs brute-force hybrid at sf0.01") {
    val exact = top3("x_embed_hybrid_search", sf("sf0.01"))
    val approx = top3("x_embed_hybrid_ann", sf("sf0.01"))
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Set.empty)
      (truth intersect got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@3 = $mean (per-query: $recalls)")
  }
}
