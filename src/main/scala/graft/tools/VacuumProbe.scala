package graft.tools

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ops.TxTable

/** Flat-table VACUUM listing probe (r15 "missing #4"): an
  * UNPARTITIONED table keeps its root listing on the driver — one
  * `File.listFiles()` over every root-level file — while partitioned
  * layouts fan the walk out by `col=value` subtree. This probe
  * quantifies that single O(n) listing at the 10⁵–10⁶ dead-file scale
  * the verdict asked about: it fabricates N age-expired dead files at
  * a flat table's root, then times `vacuum(dryRun = true)` (the walk
  * and guards of the real run, zero deletes) and the real reclaim.
  *
  * Run: `sbt "runMain graft.tools.VacuumProbe [N]"` (default 200000).
  * The finding rides SCALE.md — code changes only if this shows a
  * cliff, per the verdict's own "probe first" framing.
  */
object VacuumProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-vacuum-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft-vacprobe-").toString + "/t"
    val t = TxTable(spark, dir)
    t.append((0L until 1000L).map(i => (i, s"row-$i")).toDF("k", "tag"))
    val head = t.snapshot().version

    // fabricate n DEAD files at the root: reclaimable names, never
    // referenced by any log entry, mtimes far past any age guard
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val f = new File(dir, f"data-dead-$i%08d.parquet")
      Files.createFile(f.toPath)
      f.setLastModified(old)
    }
    println(f"[vacuum-probe] fabricated $n%d dead files in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time[T](f: => T): (T, Double) = {
      val s = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - s) / 1e9)
    }
    // dry run = the listing + reference/age guards, zero deletes
    val (listed, dryS) = time(t.vacuum(head, minAgeMs = 0L, dryRun = true))
    // real run adds the delete fan-out (distributed above the
    // VacuumDistributeMinDeletes threshold)
    val (deleted, realS) = time(t.vacuum(head, minAgeMs = 0L))
    println(f"[vacuum-probe] n=$n%d dry_run_s=$dryS%.2f " +
      f"listed=${listed.size}%d real_s=$realS%.2f " +
      f"deleted=${deleted.size}%d")
    assert(listed.size == n && deleted.size == n,
      s"expected $n reclaimed, got dry=${listed.size} real=${deleted.size}")
    // table content untouched
    assert(t.read().count() == 1000L)
    spark.stop()
  }
}
