package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** State-store growth evidence for the stateful streaming operators
  * (`sessionCounts`, `purchaseAttribution`): replays the sf0.1 `events`
  * table as an 8-micro-batch file stream (time-ordered chunks, so the
  * watermark advances batch over batch exactly as it would on a live
  * source) and records each operator's `stateOperators` metrics — rows
  * held, bytes held, rows evicted — at two watermark settings.
  *
  * The claim under test (SCALE.md): state is bounded by the WATERMARK,
  * not the stream length — a tighter watermark must hold strictly fewer
  * rows at the same input, because eviction runs as the watermark
  * passes (session end + gap) / (event time + horizon). If peak state
  * were instead proportional to total input, an unbounded stream would
  * OOM the state store and neither operator would be production-safe.
  *
  * Run: `sbt "runMain graft.tools.StateProbe"`.
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-state-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- time-ordered replay chunks -----------------------------------
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.1")
    val chunks = 8
    val streamDir = Files.createTempDirectory("graft-state-stream-").toString
    val stageDir = Files.createTempDirectory("graft-state-stage-").toString
    val Row2 = events.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (Row2.getTimestamp(0).getTime, Row2.getTimestamp(1).getTime)
    val span = hi - lo + 1
    (0 until chunks).foreach { i =>
      val a = lo + span * i / chunks
      val b = lo + span * (i + 1) / chunks
      val slice = events.where(
        col("ts") >= lit(new java.sql.Timestamp(a)) &&
          col("ts") < lit(new java.sql.Timestamp(b)))
      slice.coalesce(1).write.mode("overwrite").parquet(s"$stageDir/c$i")
      // one file per chunk, moved in order so mod-time ordering (the
      // file source's processing order) matches event-time ordering
      val part = Files.list(Paths.get(s"$stageDir/c$i"))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, Paths.get(s"$streamDir/chunk-$i.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val schema = events.schema

    def stream(): DataFrame = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)

    // --- run one operator, harvest stateOperators metrics -------------
    def probe(tag: String, df: DataFrame): Unit = {
      val ckpt = Files.createTempDirectory("graft-state-ckpt-").toString
      val q = df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sos = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      val peakRows = if (sos.isEmpty) 0L else sos.map(_.numRowsTotal).max
      val peakMem = if (sos.isEmpty) 0L else sos.map(_.memoryUsedBytes).max
      val removed = sos.map(_.numRowsRemoved).sum
      println(f"[state] $tag%-42s peak_rows=$peakRows%7d " +
        f"peak_mem_kb=${peakMem / 1024}%7d evicted=$removed%7d")
      q.stop()
    }

    val nEvents = events.count()
    println(s"[state] input=$nEvents events in $chunks time-ordered chunks")
    Seq("30 minutes", "4 hours").foreach { wm =>
      probe(s"sessionCounts wm=$wm",
        EventStreams.sessionCounts(stream(), gap = "30 minutes",
          watermark = wm))
      val s = stream()
      probe(s"purchaseAttribution wm=$wm",
        EventStreams.purchaseAttribution(
          s.where(col("event_type") === "view"),
          s.where(col("event_type") === "purchase"),
          horizon = "1 hour", watermark = wm))
    }
    spark.stop()
  }
}
