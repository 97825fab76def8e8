package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators.
  *
  * AQE's runtime skew-join split handles sort-merge skew adaptively; the
  * operators here are the explicit-plan tools for when the skew is known
  * ahead of time — a hot join key whose reducer would otherwise absorb a
  * disproportionate share of the shuffle, or a grouped distinct-count
  * whose single hot group serializes on one task.
  */
object Skew {

  /** Salted equi-join: the probe side gets a deterministic salt derived
    * from `saltSource` (any well-distributed probe column); the build
    * side is replicated once per salt value; the join key widens to
    * (key, salt). The result is row-identical to the unsalted join while
    * a hot key's probe rows spread over `salts` reducers. Use when the
    * build side is small enough to replicate ×salts but too large (or
    * too hot) to broadcast whole. */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column,
      saltSource: Column, salts: Int): DataFrame = {
    // coalesce: a null saltSource must still land in a bucket (salt 0),
    // or the salt equi-condition would silently drop probe rows whose
    // join key matches — the join must stay row-identical to unsalted.
    val salted = probe.withColumn("__salt_p",
      coalesce(pmod(saltSource, lit(salts)), lit(0)))
    val replicated = build.withColumn("__salt_b",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        probeKey === buildKey && col("__salt_p") === col("__salt_b"))
      .drop("__salt_p", "__salt_b")
  }

  /** Two-phase salted distinct count: counting distinct `of` per (skewed)
    * `key` normally shuffles every row of a hot key to one reducer.
    * Salting BY THE COUNTED COLUMN keeps salt buckets disjoint, so phase
    * 1 counts distinct within (key, of % salts) and phase 2 plain-SUMs
    * the partials — exact, and the hot key's work spreads over `salts`
    * tasks. */
  def saltedDistinctCount(
      df: DataFrame, key: Column, of: Column, salts: Int,
      outName: String): DataFrame =
    df.groupBy(key.as("__key"),
        coalesce(pmod(of, lit(salts)), lit(0)).as("__salt"))
      .agg(countDistinct(of).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum("__partial").as(outName))
}
