package graft.ops

import graft.SparkTestBase

class CompactionSpec extends SparkTestBase {

  test("compaction collapses small files and preserves every row") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact-spec-").toString + "/t"
    val orders = graft.core.Tables.orders(spark, sf("sf0.01"))
    orders.repartition(32).write.parquet(dir)
    val (before, bytes) = Compaction.dataFileStats(spark, dir)
    assert(before === 32)

    // target = half the data → expect exactly 2 files
    val back = Compaction.compactParquet(spark, dir, targetBytes = bytes / 2 + 1)
    val (after, _) = Compaction.dataFileStats(spark, dir)
    assert(after === 2, s"expected 2 files, got $after")
    assert(back.count() === orders.count())
    // no leftover temp/old directories from the swap
    assert(!new java.io.File(dir + "__compacting").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("interrupted swap is healed on the next compaction entry") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact-recover-").toString + "/t"
    val nation = graft.core.Tables.nation(spark, sf("sf0.01"))
    nation.repartition(4).write.parquet(dir)
    val n = nation.count()
    // simulate a crash between the two renames: data stranded in __old
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    assert(!new java.io.File(dir).exists())

    val back = Compaction.compactParquet(spark, dir, targetBytes = Long.MaxValue)
    assert(back.count() === n)
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("invalid target size is rejected") {
    intercept[IllegalArgumentException](
      Compaction.compactParquet(spark, "/tmp/nowhere", targetBytes = 0))
  }
}
