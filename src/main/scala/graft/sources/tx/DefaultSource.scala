package graft.sources.tx

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.ops.TxTable

/** [[graft.ops.TxTable]] as a Structured Streaming SOURCE —
  * `spark.readStream.format("graft.sources.tx").option("path", dir)` —
  * the read-side twin of `EventStreams.txCdcApplySink`: a pipeline can
  * now both LAND results transactionally and TAIL a transactional
  * table incrementally, the same loop Delta's streaming reader closes.
  *
  * Semantics (same contract as Delta's default streaming read):
  *  - offsets are COMMIT VERSIONS; micro-batch (from, to] emits exactly
  *    the rows the append commits in that window added. Exactly-once
  *    falls out of the log's immutability: a replayed batch re-reads
  *    the same committed versions, never a prefix of one;
  *  - compaction commits are content-neutral and silently skipped;
  *  - any other rewrite (overwrite / upsert / delete / restore) FAILS
  *    the stream by default — an append-only reader silently dropping
  *    a rewrite would un-count rows downstream. Opt in to
  *    `skipChangeCommits=true` (Delta's option of the same name) to
  *    ignore rewrites, or consume `readChanges()` in batch for the
  *    full CDF;
  *  - vacuuming files out of an unread window fails loudly (shared
  *    retention contract with restore/readChanges).
  *
  * Scale shape: `getOffset` is a driver-side log listing (O(checkpoint
  * interval) reads); each batch plans a plain parquet scan over ONLY
  * the new files — column pruning and predicate pushdown apply as in
  * any batch read, and no state is kept beyond the engine's own offset
  * checkpoint. */
final class DefaultSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "txtable"

  private def opts(params: Map[String, String]): Map[String, String] =
    params.map { case (k, v) => k.toLowerCase -> v }

  private def table(ctx: SQLContext, params: Map[String, String]): TxTable = {
    val path = opts(params).getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    TxTable(ctx.sparkSession, path)
  }

  override def sourceSchema(
      ctx: SQLContext, schema: Option[StructType], providerName: String,
      params: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "the txtable source derives its schema from the table's snapshot; " +
        "do not pass one")
    val snap = table(ctx, params).snapshot()
    require(snap.files.nonEmpty,
      "cannot infer the stream schema from an empty table: commit data " +
        "first (the schema is read from the snapshot's parquet footers)")
    (shortName(), snap.read(ctx.sparkSession).schema)
  }

  override def createSource(
      ctx: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, params: Map[String, String]): Source = {
    val o = opts(params)
    val maxCommits = o.get("maxcommitspertrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxCommitsPerTrigger must be positive, got $n")
      n
    }
    new TxTableSource(ctx, table(ctx, params),
      skipChangeCommits = o.get("skipchangecommits").exists(_.toBoolean),
      maxCommitsPerTrigger = maxCommits)
  }
}

final class TxTableSource(
    ctx: SQLContext, t: TxTable, skipChangeCommits: Boolean,
    maxCommitsPerTrigger: Option[Long] = None)
    extends Source {

  private val spark = ctx.sparkSession

  override val schema: StructType = t.snapshot().read(spark).schema

  /** Highest version this source has already handed to the engine —
    * the base the per-trigger rate limit counts from. Volatile, not
    * persisted: on restart the engine replays its own checkpointed
    * batch first (`getBatch` re-seeds this), so the cap is a SOFT
    * throughput bound exactly like Delta's `maxFilesPerTrigger`, never
    * a correctness device. */
  @volatile private var servedThrough: Option[Long] = None

  /** Head version, capped to `servedThrough + maxCommitsPerTrigger`
    * when rate limiting is on (Delta's `maxFilesPerTrigger` shape, in
    * this log's natural unit: commits). Bounding a micro-batch keeps
    * its scan, its downstream state update, and its sink transaction
    * sized to O(cap) commits no matter how far behind the stream falls
    * — without it, a consumer catching up on a week of backlog plans
    * ONE batch over the whole backlog. The initial snapshot batch is
    * intentionally uncapped: it reads one coherent version, not a
    * commit window. */
  override def getOffset: Option[V1Offset] = {
    val v = t.snapshot().version
    if (v < 0) None
    else {
      val capped = (maxCommitsPerTrigger, servedThrough) match {
        case (Some(m), Some(p)) => math.min(v, p + m)
        case _                  => v
      }
      if (capped <= servedThrough.getOrElse(-1L)) None
      else Some(LongOffset(capped))
    }
  }

  private def ver(o: V1Offset): Long = o match {
    case LongOffset(v)          => v
    case SerializedOffset(json) => json.trim.toLong
    case other                  => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    servedThrough = Some(math.max(ver(end), servedThrough.getOrElse(-1L)))
    val batch = start match {
      case None =>
        // Initial batch: the FULL SNAPSHOT as of the first offset —
        // Delta's streaming-read contract, deletion vectors applied
        // (readAt reads CONTENT). Pre-stream history may hold any
        // commit shape (overwrites, deletes, restores); only
        // post-start commits must be append-only. Deterministic on
        // replay: the engine re-calls with the same `end` version.
        t.readAt(ver(end))
      case Some(s) =>
        val files = t.commitsBetween(ver(s), ver(end)).flatMap { c =>
          c.action match {
            case "append" =>
              t.resolveFiles(c.add, s"streaming batch v${c.version}")
            case "compact" => Nil
            case other =>
              if (skipChangeCommits) Nil
              else sys.error(
                s"streaming read hit a '$other' commit at v${c.version}: " +
                  "this source is append-only past its starting snapshot. " +
                  "Set skipChangeCommits=true to ignore rewrites, or " +
                  "consume readChanges() in batch for the full CDF.")
          }
        }
        if (files.isEmpty) t.snapshot().read(spark).limit(0)
        else spark.read.option("basePath", t.tableDir).parquet(files: _*)
    }
    org.apache.spark.sql.graft.StreamingShim.asStreaming(batch)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()
}
