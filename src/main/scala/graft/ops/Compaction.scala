package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance half of a streaming
  * ingest. Micro-batch sinks and over-parallel writers leave thousands
  * of KB-scale files; every downstream scan then pays file-open +
  * footer-read + scheduling per file, and the namenode pays the
  * metadata. Compaction rewrites a directory to ~`targetBytes` files.
  *
  * Sizing reads the FILESYSTEM (sum of current file lengths), not row
  * counts — parquet size per row varies wildly with encoding, and the
  * existing encoded size is the best predictor of the rewritten size.
  * The rewrite is one `repartition` (round-robin exchange, no skew by
  * construction) + write; at 100 TB this runs per-partition-directory
  * (compose with a partition predicate), never whole-table.
  */
object Compaction {

  /** Current (fileCount, totalBytes) of the data files under `dir`. */
  def dataFileStats(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter { s =>
      s.isFile && !s.getPath.getName.startsWith("_")
    }
    (files.length, files.map(_.getLen).sum)
  }

  /** Rewrites parquet `dir` in place to ceil(totalBytes/targetBytes)
    * files; returns the read-back frame. In-place = write to a sibling
    * temp dir then swap, so a failed rewrite never loses DATA — but the
    * two-rename swap is not crash-ATOMIC: a crash between the renames
    * leaves no directory at `dir` with the data stranded in `dir__old`.
    * Contract: single writer, no concurrent readers during the swap
    * window (HDFS rename gives no multi-path transaction to do better
    * with). Recovery is automatic: on entry, a missing `dir` beside a
    * surviving `dir__old` is renamed back before compacting. */
  def compactParquet(
      spark: SparkSession, dir: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    recoverInterrupted(spark, dir)
    val (_, bytes) = dataFileStats(spark, dir)
    val numFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compacting")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .repartition(numFiles)
      .write.parquet(tmp.toString)
    val old = new Path(dir + "__old")
    fs.delete(old, true)
    require(fs.rename(p, old), s"compaction swap failed for $dir")
    require(fs.rename(tmp, p), s"compaction swap failed for $dir")
    fs.delete(old, true)
    spark.read.parquet(dir)
  }

  /** Heals a swap interrupted between the two renames: `dir` gone but
    * `dir__old` present → rename the old data back. Returns true if a
    * recovery was performed. */
  def recoverInterrupted(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + "__old")
    if (!fs.exists(p) && fs.exists(old)) {
      require(fs.rename(old, p), s"compaction recovery failed for $dir")
      true
    } else false
  }
}
