package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Load-immune plan-shape audit: for each named registry query, one
  * cold execution's JOB COUNT, STAGE COUNT, TASK COUNT and total
  * shuffle read/write bytes — counters a congested neighborhood cannot
  * inflate, unlike wall time. The dev loop for fixed-job-overhead
  * optimizations (setup fusion, observe-fused counts, checkpoint
  * elision): the win is a smaller job/stage count at equal output.
  * Run: `sbt "runMain graft.tools.JobCountProbe <query> [query...]"`. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-jobcount-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("x_graph_pagerank", "x_graph_label_prop", "x_dedup_clusters")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })

    names.foreach { n =>
      // warm once at the smallest SF so JIT/codegen classloads don't
      // count, then measure one cold run at the target SF
      try Registry.byName(n).build(spark, "/root/testdata/sf0.001").count()
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // drain listener events from the warmup before zeroing (the bus
      // is private — a short quiesce sleep is enough for this dev tool)
      Thread.sleep(400)
      jobs.set(0); stages.set(0); tasks.set(0); shufR.set(0); shufW.set(0)
      val t0 = System.nanoTime()
      Registry.byName(n).build(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"[jobcount] $n%-28s jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%6d shufR=${shufR.get / 1024}%8d KiB shufW=${shufW.get / 1024}%8d KiB wall=$secs%6.2f s")
    }
    spark.stop()
  }
}
