package graft.corpus

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.TxTable

/** [[VectorIndex]] — the IVF index persisted on the transactional
  * layer: one atomic commit per (re)build, time-travelable retrieval,
  * crash-safe by commit atomicity. */
class VectorIndexSpec extends SparkTestBase {
  import spark.implicits._

  /** Two well-separated deterministic clusters in 8-d: cluster A
    * points along e0 (ids 0..59), cluster B along e1 (ids 100..159),
    * each with a small per-id perturbation so neighbors rank stably. */
  private def vecs(aN: Int, bN: Int) = {
    def v(axis: Int, i: Long): Array[Double] = {
      val a = Array.fill(8)(0.01 * ((i % 7) + 1))
      a(axis) = 10.0 + (i % 5)
      a
    }
    ((0L until aN.toLong).map(i => (i, v(0, i))) ++
      (100L until (100L + bN)).map(i => (i, v(1, i))))
      .toDF("vec_id", "v")
  }

  private def neighbors(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Set[Long]] =
    df.select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("build is one atomic commit; search stays in-cluster; rebuild time-travels") {
    val dir = Files.createTempDirectory("graft-vidx-").toString + "/ivf"
    val v0 = VectorIndex.build(vecs(60, 60), dir)
    val t = TxTable(spark, dir)
    assert(t.snapshot().version === v0)
    assert(t.history().orderBy(desc("version")).head().getString(1)
      === "ivf-build",
      "centroids and assignments must land as ONE tagged commit")
    val q = Seq((0L, {
      val a = Array.fill(8)(0.0); a(0) = 10.0; a
    }), (1L, {
      val a = Array.fill(8)(0.0); a(1) = 10.0; a
    })).toDF("q_id", "qv")
    val r0 = neighbors(VectorIndex.search(spark, dir, q))
    // an e0-axis query retrieves only cluster-A members; e1 only B
    assert(r0(0L).nonEmpty && r0(0L).forall(_ < 100L), s"got ${r0(0L)}")
    assert(r0(1L).nonEmpty && r0(1L).forall(_ >= 100L), s"got ${r0(1L)}")

    // REBUILD over a grown corpus: one more atomic version
    val v1 = VectorIndex.build(vecs(60, 120), dir)
    assert(v1 === v0 + 1)
    val r1 = neighbors(VectorIndex.search(spark, dir, q))
    assert(r1(1L).nonEmpty && r1(1L).forall(_ >= 100L))
    // time travel: the OLD index still answers exactly as before —
    // no vector added by the rebuild can appear at the old version
    val rOld = neighbors(VectorIndex.searchAt(spark, dir, v0, q))
    assert(rOld === r0, "prior index version must serve its own results")
    // both builds are in the audit trail
    assert(t.history().where(col("action") === "ivf-build").count() === 2)
  }
}
