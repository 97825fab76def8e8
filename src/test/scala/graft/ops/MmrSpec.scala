package graft.ops

import graft.SparkTestBase

/** [[Mmr.rerank]] greedy semantics: diversity beats redundancy,
  * lambda=1 degenerates to relevance order, deterministic tie-breaks,
  * short pools, and the negative-similarity reward. */
class MmrSpec extends SparkTestBase {

  private def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)

  private def cand(q: Long, id: Long, rel: Double, v: Double*) =
    Mmr.Cand(q, id, rel, v.toArray, nrm(v.toArray))

  private def picks(cs: Seq[Mmr.Cand], k: Int, lambda: Double = 0.7) = {
    import spark.implicits._
    Mmr.rerank(cs.toDS(), k, lambda).collect().sortBy(_.rank).toSeq
  }

  test("a redundant near-copy is deferred in favor of a diverse candidate") {
    // 1 and 2 are near-identical vectors with top relevance; 3 is
    // orthogonal with lower relevance. Pure relevance would return
    // (1, 2); MMR picks the diverse 3 second.
    val cs = Seq(
      cand(0L, 1L, 0.99, 1.0, 0.01),
      cand(0L, 2L, 0.98, 1.0, 0.02),
      cand(0L, 3L, 0.60, 0.0, 1.0))
    assert(picks(cs, 2).map(_.n_id) === Seq(1L, 3L))
    // lambda = 1: pure relevance order restores (1, 2)
    assert(picks(cs, 2, lambda = 1.0).map(_.n_id) === Seq(1L, 2L))
  }

  test("first pick's score is lambda*rel; ranks are 1-based and dense") {
    val cs = Seq(cand(0L, 1L, 0.5, 1.0, 0.0), cand(0L, 2L, 0.4, 0.0, 1.0))
    val ps = picks(cs, 5)
    assert(ps.map(_.rank) === Seq(1, 2))
    assert(math.abs(ps.head.mmr_score - 0.7 * 0.5) < 1e-12)
    // k beyond the pool: every candidate picked once, nothing invented
    assert(ps.size === 2)
  }

  test("anti-similar candidates are rewarded (max-sim may be negative)") {
    // 2 is the near-copy of 1; 3 is ANTI-similar to 1. After picking 1,
    // 3's max-sim term is negative, boosting it past the copy despite
    // equal relevance.
    val cs = Seq(
      cand(0L, 1L, 0.9, 1.0, 0.0),
      cand(0L, 2L, 0.5, 1.0, 0.1),
      cand(0L, 3L, 0.5, -1.0, 0.0))
    assert(picks(cs, 2).map(_.n_id) === Seq(1L, 3L))
  }

  test("queries re-rank independently; ties break on smaller id") {
    val cs = Seq(
      cand(0L, 9L, 0.5, 1.0, 0.0), cand(0L, 4L, 0.5, 0.0, 1.0),
      cand(1L, 7L, 0.8, 1.0, 0.0))
    val ps = picks(cs, 1)
    assert(ps.filter(_.q_id == 0L).map(_.n_id) === Seq(4L)) // tie -> min id
    assert(ps.filter(_.q_id == 1L).map(_.n_id) === Seq(7L))
  }
}
