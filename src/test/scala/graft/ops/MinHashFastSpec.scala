package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** The engine-internal XXH64 MinHash path against the oracle-portable md5
  * path: same banding, same exact-Jaccard verification. LSH recall is a
  * per-hash-family coin flip for pairs near the detection threshold, so
  * the two VERIFIED sets need not be identical (at sf0.001 the fast
  * family in fact finds 3 extra true near-dups) — but false positives
  * are impossible in either (exact verify), perfect pairs (J = 1 means
  * identical signatures in ANY family) must appear in both, and
  * agreement must be high. */
class MinHashFastSpec extends SparkTestBase {

  test("fast path agrees with the portable path up to LSH family recall") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val portable = pairs(Dedup.minhashNearDups(docs, threshold = 0.8))
    val fast = pairs(Dedup.minhashNearDupsFast(docs, threshold = 0.8))

    assert(portable.nonEmpty, "corpus must contain planted near-dups")
    // every emitted pair is exact-verified at or above the threshold
    (portable.values ++ fast.values).foreach(j => assert(j >= 0.8))
    // J = 1 pairs have identical signatures under any hash family
    val perfect = portable.filter(_._2 == 1.0).keySet
    assert(perfect.subsetOf(fast.keySet))
    // the families agree on the overwhelming majority of pairs
    val overlap = portable.keySet.intersect(fast.keySet).size.toDouble
    assert(overlap / portable.size >= 0.85,
      s"portable=${portable.size} fast=${fast.size} overlap=$overlap")
    // symmetric-difference pairs are true near-dups missed by the OTHER
    // family's banding, never fabrications — already implied by the
    // per-pair verify assertion above
  }

  test("fast signature is a pure function of the shingle SET") {
    import org.apache.spark.unsafe.types.UTF8String
    def sig(t: String): Seq[Long] = {
      val a = graft.functions.DedupKernels
        .minhashSigFast(UTF8String.fromString(t), 3, 12)
      (0 until a.numElements()).map(a.getLong)
    }
    // same call, same result (stateless kernel)
    assert(sig("a b c d e") === sig("a b c d e"))
    // "a b c a b" and "a b c a b c" produce the same DISTINCT shingle set
    // {abc, bca, cab} (the second just repeats abc) — min is multiset-
    // invariant, so the signatures must be identical
    assert(sig("a b c a b") === sig("a b c a b c"))
    // case/extra whitespace fold away in tokenization
    assert(sig("A  b\tC d") === sig("a b c d"))
    // different shingle sets diverge
    assert(sig("a b c d") !== sig("a b c e"))
  }

  test("short texts yield null signatures, not a degenerate bucket") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, "solo"), (3L, ""),
      (4L, "a b c d e"), (5L, "a b c d e"))
      .toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      call_function("minhash_sig_fast", col("text"), lit(3), lit(12))
        .as("sig"))
      .collect().map(r => r.getLong(0) -> (r.get(1) != null)).toMap
    assert(sigs === Map(1L -> false, 2L -> false, 3L -> false,
      4L -> true, 5L -> true))

    // identical texts get identical signatures -> guaranteed same buckets
    val pair = Dedup.minhashNearDupsFast(df, threshold = 0.99)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pair.toSeq === Seq((4L, 5L)))
  }
}
