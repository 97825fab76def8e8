package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.corpus.StreamingIngest

/** Growth probe for the incremental near-dup index
  * ([[StreamingIngest.nearDupIndexSink]]): drives the sf0.1 corpus
  * through B sequential micro-batches and times each `nearDupBatch` as
  * the on-disk signature index grows. The scaling claim under test: the
  * per-batch cost is dominated by the BATCH side (signing + banding),
  * and the index probe — an equi-join on band keys whose probe side is
  * the batch — grows far slower than the index. Near-flat per-batch
  * seconds across the run is the evidence.
  *
  * Run: `sbt "runMain graft.tools.IngestProbe [numBatches]"` (default 8).
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val b = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-ingest-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .localCheckpoint(true)
    val n = docs.count()
    val per = math.ceil(n.toDouble / b).toLong
    val base = java.nio.file.Files
      .createTempDirectory("graft-ingest-probe-").toString
    val (idx, out) = (s"$base/idx", s"$base/out")

    (0 until b).foreach { i =>
      val lo = i * per
      val batch = docs
        .where(col("doc_id") >= lo && col("doc_id") < lo + per)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      StreamingIngest.nearDupBatch(batch, i.toLong, idx, out, minSim = 0.75)
      val secs = (System.nanoTime() - t0) / 1e9
      val idxRows = graft.ops.TxTable(spark, idx).read().count()
      println(f"[ingest] batch=$i%-2d docs=${batch.count()}%-5d " +
        f"index_bands=$idxRows%-7d secs=$secs%6.2f")
    }
    spark.stop()
  }
}
