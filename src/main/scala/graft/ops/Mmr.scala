package graft.ops

import org.apache.spark.sql.Dataset

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the standard diversity-aware re-rank between retrieval and
  * consumption: from a per-query candidate pool, greedily pick the
  * item maximizing `λ·relevance − (1−λ)·max-similarity-to-picked`, so
  * the final k trade raw relevance against redundancy. In a RAG or
  * training-data pipeline this is what keeps the top-k from being five
  * near-copies of the same document.
  *
  * Scale shape: the GREEDY loop is inherently sequential PER QUERY but
  * embarrassingly parallel ACROSS queries — exactly
  * `groupByKey(query).flatMapGroups`: each group is one candidate pool
  * (k·overfetch rows, bounded small by construction), the O(k·n)
  * pairwise work happens in-memory inside the group, and no similarity
  * matrix ever shuffles. The candidate pool is the output of any ANN /
  * top-k stage (its own scale story); MMR adds one key-partitioned
  * pass.
  */
object Mmr {

  /** One retrieval candidate: query, item, relevance (higher =
    * better), the item's embedding and its precomputed L2 norm. */
  final case class Cand(q_id: Long, n_id: Long, rel: Double,
      v: Array[Double], nrm: Double)

  /** One MMR pick: `mmr_score` is the greedy objective at pick time
    * (`λ·rel` for the first pick — the max-sim term over an empty set
    * is 0), `rank` is 1-based pick order. */
  final case class Pick(q_id: Long, n_id: Long, mmr_score: Double,
      rank: Int)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Greedy MMR over each query's candidate pool: `k` picks with
    * trade-off `lambda` (1.0 = pure relevance, 0.0 = pure diversity).
    * Ties break on the smaller item id — deterministic and
    * cross-engine checkable. Similarity is cosine of the candidate
    * embeddings; the max-sim term tracks the TRUE maximum over picked
    * items (which can be negative — a candidate anti-similar to every
    * pick is rewarded), not a zero-floored one. */
  def rerank(cands: Dataset[Cand], k: Int,
      lambda: Double = 0.7): Dataset[Pick] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    import cands.sparkSession.implicits._
    cands.groupByKey(_.q_id).flatMapGroups { (q, it) =>
      val cs = it.toArray
      val n = cs.length
      val chosen = new Array[Boolean](n)
      val maxSim = Array.fill(n)(Double.NegativeInfinity)
      val out = Vector.newBuilder[Pick]
      var r = 0
      while (r < math.min(k, n)) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!chosen(i)) {
            val ms = if (maxSim(i) == Double.NegativeInfinity) 0.0
              else maxSim(i)
            val sc = lambda * cs(i).rel - (1.0 - lambda) * ms
            if (sc > bestScore ||
              (sc == bestScore && best >= 0 && cs(i).n_id < cs(best).n_id))
            { best = i; bestScore = sc }
          }
          i += 1
        }
        chosen(best) = true
        out += Pick(q, cs(best).n_id, bestScore, r + 1)
        var j = 0
        while (j < n) {
          if (!chosen(j)) {
            val s = dot(cs(j).v, cs(best).v) / (cs(j).nrm * cs(best).nrm)
            if (s > maxSim(j)) maxSim(j) = s
          }
          j += 1
        }
        r += 1
      }
      out.result().iterator
    }
  }
}
