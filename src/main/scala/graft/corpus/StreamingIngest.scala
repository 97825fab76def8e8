package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextFunctions

/** Streaming ingest curation — the continuous-crawl face of
  * [[CorpusPipeline]]'s leading stages. A landing stream of documents
  * (with an `ingest_ts` event time) passes a per-row quality gate, then
  * exact content dedup bounded by the watermark horizon: the first
  * arrival of a fingerprint wins, re-crawls and mirror copies inside the
  * horizon are dropped, and state for fingerprints older than the
  * watermark is evicted — the property that lets the query run forever.
  * The same gate+fingerprint transform runs in batch; only the dedup
  * call branches (`dropDuplicatesWithinWatermark` REJECTS batch frames,
  * so batch uses plain dropDuplicates — same keep-one-per-fingerprint
  * contract, which is how the spec pins stream ≡ batch).
  *
  * Near-dup (MinHash) dedup stays a periodic batch compaction over the
  * sunk output by design: LSH banding needs a corpus-wide shuffle, which
  * an unbounded stream cannot express with finite state.
  */
object StreamingIngest {

  /** Quality-gated, content-deduped document stream. Input columns:
    * doc_id, text, lang, source, ingest_ts. */
  def curated(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    // the quality gate resolves the native ws_tokens function; callers
    // hand us an arbitrary stream, so register here rather than rely on
    // a prior Tables load or the extensions config
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val gated = docs
      .withColumn("n_tok", size(TextFunctions.tokens(col("text"))))
      .where(col("n_tok") >= CorpusPipeline.MinTokens)
      .withColumn("fp", TextFunctions.fingerprintMd5(col("text")))
    val deduped =
      if (docs.isStreaming)
        gated.withWatermark("ingest_ts", watermark)
          .dropDuplicatesWithinWatermark("fp")
      else gated.dropDuplicates("fp")
    deduped.drop("fp")
  }
}
