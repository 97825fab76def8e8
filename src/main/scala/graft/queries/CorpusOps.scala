package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, PortableHash, RuntimeFilters, TextFunctions}

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and training: deterministic stratified sampling,
  * sequence packing, intra-document repetition scoring, and benchmark
  * decontamination. All pure column algebra over the `documents` table —
  * no UDFs, no collects — and every value is re-derivable in ANSI-ish
  * SQL, so each query hash-matches the DuckDB oracle.
  */
object CorpusOps {

  /** DuckDB tokenization CTE — the SQL face of `ws_tokens`. */
  private val tokensCte =
    """toks AS (
      |  SELECT doc_id, lang,
      |         list_filter(str_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
      |  FROM documents)""".stripMargin

  private val shinglesCte =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           generate_series(1, len(toks) - 2),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM toks WHERE len(toks) >= 3)""".stripMargin

  // --------------------------------------------- stratified hash sampling
  /** Deterministic per-stratum downsampling: each language keeps a quota
    * percentage, membership decided by a portable content-free hash of
    * the doc id (md5 — reproducible in any engine, stable across runs
    * and cluster sizes, unlike `rand()`-based `sampleBy`). Pure per-row
    * filter: no shuffle, fully pushdown-friendly, and at 100 TB the
    * sample is decided during the scan without materializing anything. */
  private val sampleStratified = GraftQuery(
    "x_sample_stratified",
    (s, d) => {
      val quota = when(col("lang") < "m", lit(50)).otherwise(lit(20))
      Tables.documents(s, d)
        .where(PortableHash.hash60(col("doc_id").cast("string")) % 100 < quota)
        .select(col("doc_id"), col("lang"))
    },
    Some("""SELECT doc_id, lang FROM documents
      WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
            % 100 < CASE WHEN lang < 'm' THEN 50 ELSE 20 END"""))

  // ----------------------------------------------------- weighted sample
  /** Quality-weighted deterministic sampling: each document's keep
    * probability is proportional to a quality proxy (here: tokens
    * capped at 60, so longer docs up to the cap are likelier to
    * survive), decided by comparing the portable id hash against the
    * per-row weight — reproducible across runs and engines, no rand(),
    * still a pure scan-side filter. The curriculum/quality-weighted
    * subsampling step of a training-data pipeline. */
  private val sampleWeighted = GraftQuery(
    "x_sample_weighted",
    (s, d) => {
      val w = least(size(TextFunctions.tokens(col("text"))), lit(60))
      Tables.documents(s, d)
        .where(PortableHash.hash60(col("doc_id").cast("string")) % 100 < w)
        .select(col("doc_id"), col("lang"))
    },
    Some("""SELECT doc_id, lang FROM documents
      WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
            % 100 < LEAST(len(list_filter(
                str_split_regex(lower(text), '\s+'), t -> t <> '')), 60)"""))

  // --------------------------------------------------------- source caps
  /** Per-source quota capping: keep at most N documents per source,
    * chosen by HASH RANK (not arrival order) so the kept subset is
    * unbiased and reproducible. The window partitions by source —
    * parallel across sources, never a global sort; the classic
    * "no single crawl domain may dominate the corpus" guard. */
  private val sourceCap = GraftQuery(
    "x_source_cap",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val CapN = 120
      val hw = Window.partitionBy("source")
        .orderBy(PortableHash.hash60(col("doc_id").cast("string")),
          col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(hw))
        .where(col("rk") <= CapN)
        .select(col("doc_id"), col("source"), col("rk"))
    },
    Some("""SELECT doc_id, source, rk FROM (
              SELECT doc_id, source, CAST(row_number() OVER (
                PARTITION BY source
                ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                          1, 15) AS BIGINT), doc_id) AS INTEGER) AS rk
              FROM documents)
            WHERE rk <= 120"""))

  // ------------------------------------------------------ sequence packing
  /** Greedy sequence packing: documents are laid out in stable (doc_id)
    * order within each language shard, a running token total assigns each
    * doc to the 2048-token training sequence where it starts, and the
    * output is one row per packed sequence. The window partitions by the
    * shard key, so no global single-partition sort exists at any scale —
    * the production form packs within whatever shard key the corpus is
    * already bucketed by. */
  private val packSequences = GraftQuery(
    "x_pack_sequences",
    (s, d) => {
      val SeqLen = 2048
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TextFunctions.tokens(col("text"))).as("n_tok"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks.withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("seq_id",
          floor((col("cum") - col("n_tok")) / lit(SeqLen)))
        .groupBy("lang", "seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("seq_tokens"))
    },
    Some(s"""WITH $tokensCte,
      sized AS (SELECT doc_id, lang, len(toks) AS n_tok FROM toks),
      packed AS (SELECT lang, doc_id, n_tok,
          SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized)
      SELECT lang, CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS seq_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS seq_tokens
      FROM packed GROUP BY 1, 2"""))

  // ---------------------------------------------------- repetition scoring
  /** Intra-document repetition (the C4/Gopher-style quality signal):
    * 1 − distinct/total 3-gram shingles. Highly repetitive documents
    * (boilerplate, keyword stuffing) score near 1. Both shingle counts
    * come from ONE codegen'd `shingle_set`/`ws_tokens` pass per row — no
    * explode, no shuffle; the scan stays pruned to (doc_id, text). */
  private val repetitionRatio = GraftQuery(
    "x_repetition_ratio",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).as("n_tok"),
          size(TextFunctions.shingles(col("text"), 3)).as("n_distinct"))
        .where(col("n_tok") >= 3)
        .select(col("doc_id"),
          (col("n_tok") - 2).cast("long").as("n_shingles"),
          col("n_distinct").cast("long").as("n_distinct"),
          round(lit(1.0) - col("n_distinct").cast("double")
            / (col("n_tok") - 2).cast("double"), 6).as("repetition"))
    },
    Some(s"""WITH $tokensCte,
      counted AS (SELECT doc_id, len(toks) AS n_tok,
          len(list_distinct(list_transform(
            generate_series(1, len(toks) - 2),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS n_distinct
        FROM toks WHERE len(toks) >= 3)
      SELECT doc_id, n_tok - 2 AS n_shingles, n_distinct,
             ROUND(1.0 - CAST(n_distinct AS DOUBLE) / (n_tok - 2), 6)
               AS repetition
      FROM counted"""))

  // ------------------------------------------------------ decontamination
  /** Benchmark decontamination: flag training documents sharing any
    * 3-gram shingle with the held-out evaluation set (here: every 97th
    * doc plays the benchmark). The benchmark shingle set is tiny relative
    * to the corpus, so it broadcasts and the corpus-side posting scan
    * streams through a broadcast hash join — at 100 TB the training side
    * never shuffles, which is the only workable plan shape. */
  private val decontaminate = GraftQuery(
    "x_decontaminate",
    (s, d) => {
      val posting = Dedup.shingleTable(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
      val bench = posting.where(col("doc_id") % 97 === 0)
        .select("shingle").distinct()
      posting.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(countDistinct(col("shingle")).as("n_contaminated_shingles"))
    },
    Some(s"""WITH $tokensCte, $shinglesCte,
      posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
      bench AS (SELECT DISTINCT shingle FROM posting WHERE doc_id % 97 = 0)
      SELECT doc_id,
             CAST(count(DISTINCT shingle) AS BIGINT) AS n_contaminated_shingles
      FROM posting JOIN bench USING (shingle)
      WHERE doc_id % 97 <> 0
      GROUP BY 1"""))

  // --------------------------------------- decontamination at eval scale
  /** The same contamination question when the evaluation suite is too
    * big to broadcast its shingles exactly — the multi-benchmark /
    * multi-epoch eval-suite case. The exact-broadcast plan above ships
    * every benchmark shingle STRING to every task; this variant ships a
    * few-MB Bloom filter instead ([[graft.ops.RuntimeFilters]]), drops
    * non-matching corpus postings in the scan stage, and lets the exact
    * equi-join downstream absorb the false positives — so the answer is
    * hash-identical to `x_decontaminate` while the corpus-side exchange
    * carries only the ~contamination-rate fraction of postings. At
    * 100 TB that is the difference between shuffling every posting of
    * the training corpus and shuffling the rare suspects
    * (`BloomDecontaminateSpec` pins result equality with the broadcast
    * plan and the bloom-below-exchange plan shape). */
  private val decontaminateBloom = GraftQuery(
    "x_decontaminate_bloom",
    (s, d) => {
      val posting = Dedup.shingleTable(Tables.documents(s, d))
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
      val bench = posting.where(col("doc_id") % 97 === 0)
        .select(col("shingle")).distinct()
        .withColumnRenamed("shingle", "bench_shingle")
      val train = posting.where(col("doc_id") % 97 =!= 0)
      RuntimeFilters.prunedJoin(train, "shingle", bench, "bench_shingle")
        .groupBy("doc_id")
        .agg(countDistinct(col("shingle")).as("n_contaminated_shingles"))
    },
    Some(s"""WITH $tokensCte, $shinglesCte,
      posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
      bench AS (SELECT DISTINCT shingle FROM posting WHERE doc_id % 97 = 0)
      SELECT doc_id,
             CAST(count(DISTINCT shingle) AS BIGINT) AS n_contaminated_shingles
      FROM posting JOIN bench USING (shingle)
      WHERE doc_id % 97 <> 0
      GROUP BY 1"""))

  // ------------------------------------------------------- mixing ratios
  /** Data-mixing weights: per-source document and token counts plus each
    * source's share of total tokens — the table a curation run consults
    * to set sampling weights. One map-side-combinable aggregate over the
    * corpus; the global-share window runs over the aggregated table
    * (|sources| rows), so the single-partition window is free. */
  private val sourceMix = GraftQuery(
    "x_source_mix",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      toks.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double")
            / sum(col("n_tokens")).over(Window.partitionBy()), 6)
            .as("token_share"))
    },
    Some("""WITH toks AS (
        SELECT source,
               len(list_filter(str_split_regex(lower(text), '\s+'),
                   t -> t <> '')) AS n_tok
        FROM documents),
      agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n_tok) AS BIGINT) AS n_tokens
              FROM toks GROUP BY 1)
      SELECT source, n_docs, n_tokens,
             ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
               AS token_share
      FROM agg"""))

  // --------------------------------------------- percentile-based filter
  /** Per-stratum percentile-threshold retention: keep documents at or
    * above their language's median token count. The thresholds reduce to
    * |langs| rows, broadcast back, and the corpus passes once — no
    * per-stratum window over full data (which would buffer whole
    * partitions at 100 TB). The medians come from
    * [[graft.ops.Percentiles.exactCont]] — a distributed (value, count)
    * histogram per language (distinct integer token counts, bounded by
    * max doc length) instead of Spark's exact `percentile`, whose
    * single buffer would hold every score of the language at 100 TB —
    * while matching `quantile_cont` bit-for-bit, so the oracle stays
    * hash-exact. */
  private val percentileFilter = GraftQuery(
    "x_percentile_filter",
    (s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      val med = graft.ops.Percentiles
        .exactCont(scored, "n_tok", Seq(0.5 -> "lang_median"), Seq("lang"))
        .select(col("lang"), round(col("lang_median"), 4).as("lang_median"))
      scored.join(broadcast(med), "lang")
        .where(col("n_tok") >= col("lang_median"))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("lang_median"))
    },
    Some(s"""WITH $tokensCte,
      sized AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tok
                FROM toks),
      med AS (SELECT lang, ROUND(quantile_cont(n_tok, 0.5), 4) AS lang_median
              FROM sized GROUP BY 1)
      SELECT doc_id, lang, n_tok, lang_median
      FROM sized JOIN med USING (lang)
      WHERE n_tok >= lang_median"""))

  // ------------------------------------------------------------ profiling
  /** One-pass corpus profile — the monitoring row a curation run logs
    * before/after each stage: row count, per-column null counts,
    * distinct cardinalities, value ranges, token mean. All partial-agg
    * friendly (single map-side-combinable aggregate, no shuffle of data
    * rows, one scan). */
  private val profile = GraftQuery(
    "x_profile",
    (s, d) => Tables.documents(s, d).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("null_lang"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      round(avg(size(TextFunctions.tokens(col("text")))), 4).as("avg_tokens")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS null_text,
            CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS null_lang,
            CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
            CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
            MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
            ROUND(AVG(len(list_filter(str_split_regex(lower(text), '\s+'),
                  t -> t <> ''))), 4) AS avg_tokens
            FROM documents"""))

  // ------------------------------------------------------- RAG chunking
  /** Overlapping token-window chunking — the retrieval/embedding prep
    * step: every document becomes ⌈tokens/stride⌉ chunks of up to
    * `ChunkWindow` tokens starting every `ChunkStride` (10-token
    * overlap carries context across boundaries). Entirely map-side:
    * tokenize → `sequence` of starts → `explode` → `slice`, so at
    * 100 TB chunking is a pure scan-stage rewrite with NO shuffle —
    * the chunk table partitions exactly like its source, and the
    * downstream embedding/indexing job (x_embed_*) starts co-located.
    * (chunk_id = (doc_id, chunk_idx) stays derivable, never hashed, so
    * provenance joins back to documents are equi-joins.) */
  private val ChunkWindow = 40
  private val ChunkStride = 30
  private val chunkDocuments = GraftQuery(
    "x_chunk_documents",
    (s, d) => {
      val toks = TextFunctions.tokens(col("text")) // ws_tokens lower-cases
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1,
            lit(ChunkStride))).as("start"))
        .select(col("doc_id"),
          (col("start") / ChunkStride).cast("int").as("chunk_idx"),
          slice(col("toks"), col("start") + 1, lit(ChunkWindow)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("n_tokens"),
          array_join(col("chunk"), " ").as("chunk_text"))
    },
    Some(s"""WITH $tokensCte,
      starts AS (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 1, $ChunkStride))
                     AS start
                 FROM toks WHERE len(toks) > 0)
      SELECT doc_id,
        CAST(start // $ChunkStride AS INTEGER) AS chunk_idx,
        CAST(len(list_slice(toks, start + 1, start + $ChunkWindow))
             AS INTEGER) AS n_tokens,
        array_to_string(list_slice(toks, start + 1, start + $ChunkWindow), ' ')
          AS chunk_text
      FROM starts"""))

  val queries: Seq[GraftQuery] =
    Seq(sampleStratified, sampleWeighted, sourceCap, packSequences,
      repetitionRatio, decontaminate, decontaminateBloom, sourceMix,
      percentileFilter, profile, chunkDocuments)
}
