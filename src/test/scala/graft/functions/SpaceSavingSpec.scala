package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SpaceSaving]] (`heavy_hitters`): exact recovery below capacity,
  * the eviction inheritance rule, the per-item certificate under
  * parallel merges, and the heavy-hitter presence guarantee on skew. */
class SpaceSavingSpec extends SparkTestBase {

  private def sketch(terms: Seq[String], m: Int,
      partitions: Int = 1): Seq[(String, Long, Long)] = {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    spark.sparkContext.parallelize(terms, partitions).toDF("term")
      .agg(call_function("heavy_hitters", col("term"), lit(m)).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.term", "h.est", "h.err")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("below capacity the summary is exact counting") {
    val out = sketch(Seq("a", "b", "a", "c", "a", "b"), m = 8)
    assert(out.toSet === Set(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
    // sorted (est DESC, term ASC)
    assert(out.map(_._1) === Seq("a", "b", "c"))
  }

  test("eviction: the newcomer inherits the evicted minimum as error") {
    // m=2, stream a a b c: c evicts b(1) and enters with est 2, err 1
    val full = sketch(Seq("a", "a", "b", "c"), m = 2)
    assert(full.map(_._1).toSet === Set("a", "c"))
    assert(full.find(_._1 == "a").get === (("a", 2L, 0L)))
    assert(full.find(_._1 == "c").get === (("c", 2L, 1L)))
  }

  test("certificate holds under parallel merge; heavy hitter always present") {
    // Zipf-ish: one hot term (100x) over 50 singleton tails, m = 8:
    // hot count 100 > N/(m+1) = 150/9 -> guaranteed in the summary
    val terms = Seq.fill(100)("hot") ++ (1 to 50).map(i => s"tail$i")
    val exact = terms.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    for (parts <- Seq(1, 8)) {
      val out = sketch(scala.util.Random.shuffle(terms), m = 8,
        partitions = parts)
      assert(out.size <= 8)
      val hot = out.find(_._1 == "hot")
      assert(hot.isDefined, s"heavy hitter missing at $parts partitions")
      out.foreach { case (t, est, err) =>
        val truth = exact.getOrElse(t, 0L)
        assert(truth <= est && est - err <= truth,
          s"certificate violated for $t: [$est-$err, $est] vs $truth")
      }
    }
  }
}
