package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TxTable

/** Cost split for merge-on-read vs rewrite deletes
  * ([[graft.ops.TxTable.deleteVectorBetween]] vs
  * [[graft.ops.TxTable.deleteBetween]]): on the same z-ordered lineitem
  * table, time (a) the DELETE commit alone for both modes and (b) the
  * full-table read-back before any delete, with one active vector, and
  * after compaction materializes it. Backs SCALE.md's claim that the
  * vector WRITE is the scale win while the read pays a bounded
  * anti-join tax until compaction. Args: [sfDir]. */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-dv-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def mkTable(): TxTable = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-dvprobe-").toString
      val t = TxTable(spark, s"$dir/lineitem")
      t.append(Tables.lineitem(spark, sfDir).select(
        col("l_orderkey"), col("l_partkey"),
        col("l_quantity"), col("l_returnflag")))
      t.compactZOrdered("l_orderkey", "l_partkey", targetFiles = 16)
      t
    }

    def timed[A](what: String)(f: => A): A = {
      val s = System.nanoTime()
      val r = f
      println(f"$what%-34s ${(System.nanoTime() - s) / 1e9}%.3f s")
      r
    }

    def readAgg(t: TxTable): Unit =
      t.read().groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect()

    // warm both table shapes once (JIT + codegen)
    { val w = mkTable(); readAgg(w); w.deleteVectorBetween("l_orderkey", 1L, 2L) }

    Seq(("needle (~2k rows)", 500L), ("broad (~200k rows)", 50000L))
      .foreach { case (label, width) =>
        println(s"== $label ==")
        val a = mkTable()
        timed("read-back, no deletes")(readAgg(a))
        timed("rewrite deleteBetween commit")(
          a.deleteBetween("l_orderkey", 100000L, 100000L + width))
        timed("read-back after rewrite")(readAgg(a))

        val b = mkTable()
        timed("vector deleteVectorBetween commit")(
          b.deleteVectorBetween("l_orderkey", 100000L, 100000L + width))
        println(s"  active vectors: ${b.snapshot().dvs.size}, entries: " +
          b.snapshot().dvs.map(f => spark.read.parquet(f).count()).sum)
        timed("read-back with 1 active vector")(readAgg(b))
        // 2nd run = steady state (1st pays one-time codegen compile of
        // the union+anti-join plan shape plus the scoping job)
        timed("read-back with vector, 2nd run")(readAgg(b))
        timed("compact (materialize + retire)")(b.compact(targetFiles = 16))
        timed("read-back after compaction")(readAgg(b))
      }
    spark.stop()
  }
}
