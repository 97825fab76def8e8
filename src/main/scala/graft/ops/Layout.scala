package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout optimization for scan pruning — the write-side half
  * of "push down and prune".
  *
  * Columnar formats keep min/max statistics per file (and per row
  * group); a reader skips a file whose stats exclude the predicate.
  * Those stats are only as tight as the layout: sorting by one key
  * makes its per-file ranges tight and every other column's ranges
  * full-width. Z-ordering sorts by the Morton interleave of two
  * dimensions instead, so BOTH columns' per-file ranges stay narrow —
  * two-dimensional data skipping from one write. At 100 TB this is the
  * difference between scanning a file stripe and scanning the table
  * for a `WHERE a BETWEEN ... AND b BETWEEN ...` workload.
  */
object Layout {

  private val Buckets = 1 << 15

  /** Z-ordered parquet rewrite on dimensions (a, b); returns the
    * read-back frame.
    *
    * Dimension normalization is linear min/max into 2^15 buckets. The
    * global min/max pair is ONE scalar-aggregate row broadcast into the
    * scan (no window, no sort of the data by anything but the curve
    * key) — the whole rewrite is aggregate + one range exchange, which
    * is what lets it run on the full corpus. Heavily skewed dimensions
    * should be rank-bucketed instead (approx-quantile boundaries,
    * sketch + broadcast — same plan shape, stats-based split points).
    *
    * `repartitionByRange` on the curve key tiles the curve across
    * `numFiles` files (sampled split points); `sortWithinPartitions`
    * tightens row-group stats inside each file. */
  def zorderedWrite(
      df: DataFrame, a: String, b: String, path: String,
      numFiles: Int = 8): DataFrame = {
    zordered(df, a, b, numFiles).write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** The curve-clustered frame behind [[zorderedWrite]], for sinks that
    * own their write path (e.g. [[TxTable.compactZOrdered]] staging):
    * range-partitioned into `numFiles` tiles of the Morton curve and
    * sorted within each — whatever writes it inherits the layout. */
  def zordered(
      df: DataFrame, a: String, b: String, numFiles: Int = 8): DataFrame =
    zorderedN(df, Seq(a, b), numFiles)

  /** N-dimensional Z-order (Delta's `ZORDER BY (c1, …, cn)`): the
    * curve key interleaves `min(15, 62/n)` bucket bits per dimension.
    * n = 2 takes the codegen'd `morton2` expression; higher arities
    * build the interleave from builtin shift/and/or columns — still
    * whole-stage-codegen'd, just as one composed expression (bits×n
    * terms, driver-side construction). Same plan shape at every
    * arity: one scalar-aggregate broadcast for the per-dimension
    * min/max, one range exchange on the curve key, an in-partition
    * sort — no shuffle of the data by anything but the curve. More
    * dimensions widen each one's per-file range (fewer bits each and
    * more curve directions), the same trade Delta documents; past
    * 4-5 dimensions the stats stop being narrow enough to prune. */
  def zorderedN(df: DataFrame, dims: Seq[String],
      numFiles: Int = 8): DataFrame = {
    require(dims.size >= 2, s"zorder needs at least 2 dimensions")
    // duplicates are legal (zordered(a, a) is an idiom for a plain
    // range-clustered sort through the same code path) — they just
    // spend curve bits on a repeated dimension
    val n = dims.size
    val bits = math.min(15, 62 / n)
    val buckets = 1L << bits
    // each dimension must order NUMERICALLY for linear bucketing to
    // preserve range locality: dates go through their timestamp cast
    // (a direct date→double cast is silently NULL — a degenerate
    // constant curve, not an error); strings refuse loudly (rank-
    // bucket them first, per the scaladoc above)
    import org.apache.spark.sql.types.{BooleanType, DateType, NumericType, TimestampType}
    def numCol(d: String): Column =
      df.schema(d).dataType match {
        case DateType => col(d).cast("timestamp").cast("double")
        case _: NumericType | TimestampType | BooleanType =>
          col(d).cast("double")
        case other => sys.error(
          s"zorder dimension $d has non-orderable-as-number type " +
            s"$other — rank-bucket it into a numeric column first")
      }
    // distinct for the bounds agg: a repeated dimension must not
    // produce colliding __min_/__max_ aliases
    val aggs = dims.distinct.flatMap(d => Seq(
      min(numCol(d)).as(s"__min_$d"),
      max(numCol(d)).as(s"__max_$d")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    def dense(c: Column, lo: Column, hi: Column): Column =
      least(floor((c - lo) / greatest(hi - lo, lit(1e-300))
        * buckets), lit((buckets - 1).toDouble)).cast("long")
    val dcols = dims.map(d =>
      dense(numCol(d), col(s"__min_$d"), col(s"__max_$d")))
    val z =
      if (n == 2) call_function("morton2", dcols(0), dcols(1))
      else (0 until bits).flatMap { j =>
        dcols.zipWithIndex.map { case (v, i) =>
          shiftleft(shiftright(v, j).bitwiseAND(lit(1L)), j * n + i)
        }
      }.reduce(_.bitwiseOR(_))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .drop(dims.distinct.flatMap(d => Seq(s"__min_$d", s"__max_$d")): _*)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
