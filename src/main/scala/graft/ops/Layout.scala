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
      df: DataFrame, a: String, b: String, numFiles: Int = 8): DataFrame = {
    val bounds = df.agg(
      min(col(a)).cast("double").as("__amin"),
      max(col(a)).cast("double").as("__amax"),
      min(col(b)).cast("double").as("__bmin"),
      max(col(b)).cast("double").as("__bmax"))
    def dense(c: Column, lo: Column, hi: Column): Column =
      least(floor((c.cast("double") - lo) / greatest(hi - lo, lit(1e-300))
        * Buckets), lit((Buckets - 1).toDouble)).cast("long")
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", call_function("morton2",
        dense(col(a), col("__amin"), col("__amax")),
        dense(col(b), col("__bmin"), col("__bmax"))))
      .drop("__amin", "__amax", "__bmin", "__bmax")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
