package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Connected-components label propagation: fixpoint labels, singleton
  * handling, and convergence on a chain longer than one hop (the case a
  * fixed single propagation round would get wrong). */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("chain, triangle, and singletons resolve to min-id components") {
    // components: {1,2,3,4} (a 3-hop chain), {10,11,12} (triangle), {99}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a_id", "b_id")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L).toDF("id")

    val got = Dedup.connectedComponents(vertices, pairs)
      .as[(Long, Long)].collect().toMap

    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      99L -> 99L))
  }

  test("empty pair set leaves every vertex a singleton") {
    val vertices = Seq(5L, 7L).toDF("id")
    val pairs = spark.emptyDataset[(Long, Long)]
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(vertices, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 5L, 7L -> 7L))
  }

  test("exhausting the round budget fails loudly, never mislabels") {
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val vertices = (0L to 9L).toDF("id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(vertices, pairs, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("long path converges past the iteration-1 horizon") {
    // 0-1-2-...-9: diameter 9, so one propagation round cannot finish
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val vertices = (0L to 9L).toDF("id")
    val got = Dedup.connectedComponents(vertices, pairs)
      .agg(countDistinct(col("label")), max(col("label")))
      .as[(Long, Long)].head()
    assert(got === ((1L, 0L)))
  }

  test("star variant: 1000-vertex chain converges within 12 rounds") {
    // diameter 999 — label propagation would need ~1000 rounds; the
    // alternating large-star/small-star contraction needs O(log n)
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val vertices = (0L to 999L).toDF("id")
    val got = Dedup.connectedComponentsStar(vertices, pairs, maxIters = 12)
      .agg(countDistinct(col("label")), max(col("label")), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(got === ((1L, 0L, 1000L)))
  }

  test("star variant agrees with label propagation on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200L
    val pairs = Seq.fill(150)(
      (rnd.nextLong(n).abs, rnd.nextLong(n).abs))
      .filter { case (a, b) => a != b }
      .toDF("a_id", "b_id")
    val vertices = (0L until n).toDF("id")
    val prop = Dedup.connectedComponents(vertices, pairs)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(vertices, pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
  }

  test("star variant: empty pairs and singletons") {
    val vertices = Seq(5L, 7L).toDF("id")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("a_id", "b_id")
    val got = Dedup.connectedComponentsStar(vertices, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 5L, 7L -> 7L))
  }
}
