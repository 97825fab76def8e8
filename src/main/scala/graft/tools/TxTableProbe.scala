package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.ops.TxTable

/** Commit-throughput and snapshot-resolution evidence for
  * [[graft.ops.TxTable]]: N sequential appends, then time `snapshot()`
  * resolution WITH the checkpoints the commits wrote vs with them
  * deleted (full log replay). Backs SCALE.md's "replay is O(interval),
  * not O(history)" claim with measured numbers. */
object TxTableProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-txtable-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files
      .createTempDirectory("graft-txprobe-").toString
    val t = TxTable(spark, dir)

    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      t.append((i * 10 until i * 10 + 10)
        .map(j => (j.toLong, s"row-$j")).toDF("id", "payload"))
    }
    val commitSecs = (System.nanoTime() - t0) / 1e9

    def timeResolutions(reps: Int): Double = {
      val s = System.nanoTime()
      (0 until reps).foreach(_ => t.snapshot())
      (System.nanoTime() - s) / 1e9 / reps * 1000 // ms per resolution
    }
    timeResolutions(20) // warm-up
    val withCkpt = timeResolutions(100)
    val ckpts = new File(s"$dir/_log").listFiles()
      .filter(_.getName.endsWith(".ckpt.json"))
    val nCkpts = ckpts.length
    ckpts.foreach(_.delete())
    val fullReplay = timeResolutions(100)

    println(f"[txtable] commits=$n total=${commitSecs}%.1f s " +
      f"(${commitSecs / n * 1000}%.0f ms/commit incl. parquet write); " +
      f"snapshot resolution: with $nCkpts checkpoints ${withCkpt}%.2f ms, " +
      f"full replay ${fullReplay}%.2f ms")
    spark.stop()
  }
}
