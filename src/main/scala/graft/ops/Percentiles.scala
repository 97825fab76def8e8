package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (ANSI `PERCENTILE_CONT` semantics,
  * identical to DuckDB's `quantile_cont` and Spark's `percentile`) computed
  * from a distributed (value, count) histogram instead of a single-reducer
  * value buffer.
  *
  * Why not `expr("percentile(...)")`: Spark's exact `Percentile` aggregate
  * accumulates a value→count map for the whole group inside ONE aggregation
  * buffer on one reducer — at 100 TB that is billions of distinct document
  * scores in a single JVM map, the classic scale-killer. Why not
  * `approx_percentile`: its GK sketch returns a rank-approximate *data*
  * value, which breaks hash-exact cross-engine oracles and can flip
  * threshold-bucket assignments near the cut.
  *
  * This shape keeps both properties:
  *
  *   1. `groupBy(value).count()` — fully distributed, partial-agg
  *      (map-side combine), shuffles one row per DISTINCT value, never the
  *      data rows.
  *   2. A cumulative-count window over the histogram locates the two order
  *      statistics bracketing rank `(n-1)·p` and interpolates between them —
  *      bit-identical to PERCENTILE_CONT.
  *
  * The window partitions by the group keys, so its per-partition row count
  * is the number of distinct values IN THAT GROUP — bounded by value
  * granularity (integer token counts: ≤ max doc length; scores rounded to
  * k decimals over a bounded range: ≤ range·10^k), NOT by corpus size.
  * That bound is the contract: callers quantize the value column (round /
  * integer-cast) before calling, making the histogram a metadata-sized
  * relation even at 100 TB.
  */
object Percentiles {

  /** Exact PERCENTILE_CONT of `valueCol` at each probability in `probs`,
    * one output column per `(prob, name)` pair, one row per group (one
    * global row when `groupCols` is empty). The value column is cast to
    * double; outputs are doubles (round at the call site).
    */
  def exactCont(
      df: DataFrame,
      valueCol: String,
      probs: Seq[(Double, String)],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(probs.nonEmpty, "at least one (prob, name) required")
    probs.foreach { case (p, _) =>
      require(p >= 0.0 && p <= 1.0, s"probability out of [0,1]: $p")
    }
    val v = col("__pv")
    val hist = df
      .select((groupCols.map(col) :+ col(valueCol).cast("double").as("__pv")): _*)
      .where(v.isNotNull)
      .groupBy((groupCols.map(col) :+ v): _*)
      .agg(count(lit(1)).as("__pc"))

    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cumW = byGroup.orderBy(v)
    // __cum = count of rows with value <= this value (1-based cumulative);
    // the row therefore covers 0-based order-statistic indices
    // [__cum - __pc, __cum - 1].
    val ranked = hist
      .withColumn("__cum", sum(col("__pc")).over(cumW))
      .withColumn("__n", sum(col("__pc")).over(byGroup))

    // For each target probability locate the bracketing order statistics
    // v_lo (index floor(r)) and v_hi (index ceil(r)), r = (n-1)p, then
    // interpolate v_lo + (r - floor(r))·(v_hi - v_lo). Exactly one
    // histogram row covers each index, so max(when(covers, v)) selects it.
    val aggs = probs.zipWithIndex.flatMap { case ((p, _), i) =>
      val r = (col("__n") - 1) * lit(p)
      val lo = floor(r)
      val hi = ceil(r)
      def covers(k: org.apache.spark.sql.Column) =
        (col("__cum") - col("__pc") <= k) && (k < col("__cum"))
      Seq(
        max(when(covers(lo), v)).as(s"__lo_$i"),
        max(when(covers(hi), v)).as(s"__hi_$i"),
        max(r - lo).as(s"__frac_$i"))
    }
    val grouped =
      if (groupCols.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
      else ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)

    val outCols = groupCols.map(col) ++ probs.zipWithIndex.map {
      case ((_, name), i) =>
        (col(s"__lo_$i") +
          col(s"__frac_$i") * (col(s"__hi_$i") - col(s"__lo_$i"))).as(name)
    }
    grouped.select(outCols: _*)
  }
}
