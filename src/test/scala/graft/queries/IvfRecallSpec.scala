package graft.queries

import graft.SparkTestBase

/** Retrieval-quality gate for the IVF index: with real (Lloyd-iterated)
  * centroids and nprobe=2, the approximate top-3 must recover ≥ 90% of
  * the exact brute-force top-3 — the check that separates an actual IVF
  * from arbitrary bucketing. */
class IvfRecallSpec extends SparkTestBase {

  private def top3(name: String, dir: String): Map[Long, Set[Long]] =
    Registry.byName(name).build(spark, dir)
      .collect()
      .filter(_.getInt(3) <= 3) // (q_id, n_id, cos_sim, rank)
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("IVF recall@3 >= 0.9 vs brute-force cosine top-k at sf0.01") {
    val exact = top3("x_embed_cosine_topk", sf("sf0.01"))
    val approx = top3("x_embed_ann_ivf", sf("sf0.01"))
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, truth) =>
      val got = approx.getOrElse(q, Set.empty)
      (truth intersect got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@3 = $mean (per-query: $recalls)")
  }
}
