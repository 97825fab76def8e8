package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Graph.pageRank]]: hand-computed fixtures (cycle, dangling chain,
  * star), mass conservation, and determinism across runs. */
class GraphSpec extends SparkTestBase {

  private def edges(es: (String, String)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Double] = {
    import spark.implicits._
    df.as[(String, Double)].collect().toMap
  }

  test("cycle: uniform vector is stationary") {
    val pr = ranks(Graph.pageRank(edges(
      ("a", "b"), ("b", "c"), ("c", "a")), iterations = 5))
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("dangling chain: mass teleports, ranks sum to 1") {
    // a -> b, b dangling; after one round from (.5, .5):
    //   dangling mass = .5; contribs: b <- .5
    //   pr(a) = .15/2 + .85*(0 + .25)  = .2875
    //   pr(b) = .15/2 + .85*(.5 + .25) = .7125
    val pr = ranks(Graph.pageRank(edges(("a", "b")), iterations = 1))
    assert(math.abs(pr("a") - 0.2875) < 1e-12)
    assert(math.abs(pr("b") - 0.7125) < 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
  }

  test("star: the hub out-ranks every spoke; mass conserved") {
    val pr = ranks(Graph.pageRank(edges(
      ("s1", "hub"), ("s2", "hub"), ("s3", "hub"),
      ("hub", "s1"), ("hub", "s2"), ("hub", "s3")), iterations = 10))
    assert(pr("hub") > pr("s1") * 2)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // spokes are symmetric
    assert(math.abs(pr("s1") - pr("s2")) < 1e-12)
  }

  test("labelPropagation: two cliques bridged by one edge separate") {
    import spark.implicits._
    // clique {a1,a2,a3} and clique {b1,b2,b3}, mirrored edges, plus a
    // single bridge a3->b1: after propagation each clique shares one
    // label and the bridge does not merge them
    def clique(ns: Seq[String]) =
      for (x <- ns; y <- ns if x != y) yield (x, y)
    val e = (clique(Seq("a1", "a2", "a3")) ++
      clique(Seq("b1", "b2", "b3")) :+ (("a3", "b1"))).toDF("src", "dst")
    val out = Graph.labelPropagation(e, iterations = 4)
      .as[(String, String)].collect().toMap
    assert(Set("a1", "a2", "a3").map(out).size === 1)
    assert(Set("b1", "b2", "b3").map(out).size === 1)
    assert(out("a1") !== out("b1"))
  }

  test("labelPropagation: ties pick the smallest label; no-inbox keeps its own") {
    import spark.implicits._
    // c has two in-neighbors with distinct labels after round 1 start:
    // a->c and b->c tie at count 1 -> label 'a' wins; 'a' itself has
    // no in-edges and keeps its own label forever
    val e = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = Graph.labelPropagation(e, iterations = 2)
      .as[(String, String)].collect().toMap
    assert(out("c") === "a")
    assert(out("a") === "a")
    assert(out("b") === "b")
  }

  test("packedLongLabels path matches the generic struct-argmax path") {
    import spark.implicits._
    // random-ish multigraph over long ids incl. hubs and isolated-vote
    // ties — every (node, label) trajectory must agree round by round
    val es = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (4L, 5L),
      (5L, 4L), (6L, 4L), (4L, 6L), (7L, 3L), (8L, 3L), (9L, 3L),
      (3L, 7L), (3L, 8L), (3L, 9L), (10L, 11L), (12L, 11L)).toDF("src", "dst")
    for (it <- 1 to 4) {
      val generic = Graph.labelPropagation(es, it)
        .as[(Long, Long)].collect().toMap
      val packed = Graph.labelPropagation(es, it, packedLongLabels = true)
        .as[(Long, Long)].collect().toMap
      assert(packed === generic, s"diverged at iterations=$it")
    }
  }

  test("packedLongLabels refuses labels outside [0, 2^40)") {
    import spark.implicits._
    val es = Seq((-1L, 2L)).toDF("src", "dst")
    val ex = intercept[Exception] {
      Graph.labelPropagation(es, 1, packedLongLabels = true).collect()
    }
    assert(ex.getMessage.contains("outside [0,") ||
      ex.getCause != null)
  }

  test("fixed iterations are deterministic across runs") {
    val e = edges(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a"))
    val r1 = ranks(Graph.pageRank(e, iterations = 4))
    val r2 = ranks(Graph.pageRank(e, iterations = 4))
    assert(r1 === r2)
  }
}
