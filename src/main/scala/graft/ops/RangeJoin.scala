package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join — the banding trick applied to time. A pure
  * |Δt| ≤ tol theta-join has no equi key for a hash join, and a naive
  * cross product is quadratic; flooring timestamps to tol-wide buckets
  * gives one: a qualifying pair's buckets differ by at most 1 (the gap
  * spans at most one boundary), so probing each left row at buckets
  * {k−1, k, k+1} and equi-joining on the right row's own bucket finds
  * every qualifying pair exactly once, then the exact predicate filters
  * the coarse candidates. The shuffle carries 3× narrow (key, id, us)
  * rows — never payloads — and bucket keys distribute like the data. */
object RangeJoin {

  /** Self near-pairs: rows of `df` sharing `keyCol` whose `usCol`
    * (microsecond epoch) values lie within `tolUs`, as
    * (keyCol, a_id, b_id, gap_us) with a_id < b_id. */
  def temporalNearPairs(
      df: DataFrame, keyCol: String, idCol: String, usCol: String,
      tolUs: Long): DataFrame = {
    // tolUs = 0 would surface as DIVIDE_BY_ZERO deep inside the plan
    // (ANSI int DIV) and a negative tol silently returns nothing —
    // fail fast at the API boundary instead.
    require(tolUs > 0, s"temporalNearPairs requires tolUs > 0, got $tolUs")
    val probe = df
      .select(col(keyCol), col(idCol).as("a_id"), col(usCol).as("a_us"))
      .withColumn("__rj_bucket", expr(s"a_us DIV $tolUs")) // int DIV: exact
      .select(col(keyCol), col("a_id"), col("a_us"),
        explode(array(col("__rj_bucket") - 1, col("__rj_bucket"),
          col("__rj_bucket") + 1)).as("bucket"))
    val build = df
      .select(col(keyCol), col(idCol).as("b_id"), col(usCol).as("b_us"))
      .withColumn("bucket", expr(s"b_us DIV $tolUs"))
    probe.join(build, Seq(keyCol, "bucket"))
      .where(abs(col("a_us") - col("b_us")) <= tolUs &&
        col("a_id") < col("b_id"))
      .select(col(keyCol), col("a_id"), col("b_id"),
        (col("b_us") - col("a_us")).as("gap_us"))
  }
}
