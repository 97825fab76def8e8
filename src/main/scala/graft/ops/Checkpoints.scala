package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Rolling localCheckpoint bookkeeping for iterative DataFrame loops
  * (label propagation, Lloyd iterations).
  *
  * `localCheckpoint(true)` persists the materialized RDD outside the
  * SQL cache, so neither `Dataset.unpersist()` nor
  * `spark.catalog.clearCache()` ever frees it — without explicit
  * release every round of every loop leaks its blocks for the life of
  * the SparkContext (and across bench repeats). The pattern here: pin
  * the new round, then release the superseded round's blocks once the
  * new one is materialized. The FINAL round's blocks stay pinned — the
  * returned frame reads from them — and are small (labels/centroids,
  * never corpus rows).
  */
object Checkpoints {

  /** Eagerly localCheckpoint `df`; returns the pinned frame plus the
    * ids of the storage blocks the checkpoint registered (diffed from
    * the persistent-RDD registry around the call — the only public
    * handle Spark exposes for checkpoint storage). */
  def pin(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint(true)
    val ids = sc.getPersistentRDDs.keySet.toSet -- before
    (out, ids)
  }

  /** Release checkpoint blocks by id. Non-blocking: the loop's next
    * round never rereads a superseded checkpoint. */
  def release(spark: SparkSession, ids: Set[Int]): Unit = {
    val reg = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
  }
}
