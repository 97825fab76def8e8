package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Bpe

/** BPE tokenizer training and tokenizer-aware token counting over the
  * `documents` corpus ([[graft.ops.Bpe]]). The DuckDB oracle replays
  * the ENTIRE training loop with its 30 iterations UNROLLED as chained
  * CTEs — pair count → argmax (ties lexicographic) → doubled-space
  * merge rewrite, the exact same relational steps the engine runs
  * distributedly — so the learned merge list is hash-checked as a
  * CHAIN: merge k depends on every merge before it, and one divergent
  * pick anywhere would cascade into a different tail.
  */
object BpeQueries {

  private val NMerges = 30

  /** Shared oracle prelude + unrolled training chain: defines `w`
    * (word counts), `s0` (character segmentation), and `b1..bN` /
    * `s1..sN` (per-round best pair and post-merge segmentation). */
  private val chainCtes: String = {
    val prelude = """WITH w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
             FROM (SELECT unnest(list_filter(
                     str_split_regex(lower(text), '\s+'), t -> t <> ''))
                     AS word FROM documents)
             GROUP BY word),
      s0 AS MATERIALIZED (SELECT word, freq,
              array_to_string(list_transform(
                generate_series(1, length(word)),
                i -> substring(word, i, 1)), ' ') AS seg
             FROM w)"""
    val rounds = (1 to NMerges).map { i =>
      s""",
      p$i AS MATERIALIZED (SELECT p, CAST(SUM(freq) AS BIGINT) AS n FROM
               (SELECT freq, unnest(list_transform(
                  generate_series(1, len(ss) - 1),
                  j -> ss[j] || ' ' || ss[j + 1])) AS p
                FROM (SELECT freq, str_split(seg, ' ') AS ss
                      FROM s${i - 1}))
              GROUP BY p),
      b$i AS MATERIALIZED (SELECT p, n FROM p$i ORDER BY n DESC, p LIMIT 1),
      s$i AS MATERIALIZED (SELECT word, freq,
               trim(replace(replace(
                 ' ' || replace(seg, ' ', '  ') || ' ',
                 ' ' || replace((SELECT p FROM b$i), ' ', '  ') || ' ',
                 ' ' || replace((SELECT p FROM b$i), ' ', '') || ' '),
                 '  ', ' ')) AS seg
              FROM s${i - 1})"""
    }.mkString
    prelude + rounds
  }

  /** The learned merge list: rank, merged pair, winning count. The
    * training loop is the benched artifact of `x_bpe_token_count`'s
    * untimed build; here it is the correctness artifact. Not benched
    * on its own — training is a build step, like the ANN index
    * builds. */
  private val bpeTrain = GraftQuery(
    "x_bpe_train_merges",
    (s, d) => {
      val (merges, _) =
        Bpe.train(Bpe.wordCounts(Tables.documents(s, d)), NMerges)
      import s.implicits._
      merges.toDF()
        .select(col("rank"), col("left").as("lhs"),
          col("right").as("rhs"), col("pair_count"))
    },
    Some(chainCtes + "\n      " +
      (1 to NMerges).map(i =>
        s"""SELECT CAST($i AS INTEGER) AS rank,
            split_part(p, ' ', 1) AS lhs,
            split_part(p, ' ', 2) AS rhs,
            n AS pair_count FROM b$i""")
        .mkString("\n      UNION ALL ")),
    bench = false)

  /** Tokenizer-aware token counting: encode the corpus under the
    * trained segmentation. Because BPE trains on the corpus's own
    * word-frequency table, every word's segmentation is a LOOKUP — the
    * encode pass is a join against the vocabulary, never a per-word
    * merge walk (the 100 TB shape: corpus joins a vocab-sized,
    * broadcastable-when-small table). BENCHED with the training loop
    * as untimed build and the encode join as the timed path. */
  private val bpeTokenCount = GraftQuery(
    "x_bpe_token_count",
    (s, d) => {
      val (_, seg) =
        Bpe.train(Bpe.wordCounts(Tables.documents(s, d)), NMerges)
      Bpe.encodeCounts(Tables.documents(s, d), seg)
    },
    Some(chainCtes + s"""
      SELECT doc_id,
             CAST(SUM(len(str_split(seg, ' '))) AS BIGINT) AS bpe_tokens,
             CAST(COUNT(*) AS BIGINT) AS ws_tokens
      FROM (SELECT doc_id, unnest(list_filter(
              str_split_regex(lower(text), '\\s+'), t -> t <> ''))
              AS word FROM documents) dw
      JOIN s$NMerges USING (word)
      GROUP BY doc_id"""),
    bench = false,
    benchBuild = Some((s, d) => {
      // the trained segmentation goes to a temp-dir PARQUET like the
      // ANN index benchBuilds (the production shape: the tokenizer is
      // a persisted artifact) — a persisted/checkpointed frame would
      // not survive the harness's between-run cache clearing
      val (_, seg) =
        Bpe.train(Bpe.wordCounts(Tables.documents(s, d)), NMerges)
      val segDir = java.nio.file.Files
        .createTempDirectory("graft-bpe-bench-").toString
      seg.write.mode("overwrite").parquet(segDir)
      () => Bpe.encodeCounts(Tables.documents(s, d),
        s.read.parquet(segDir))
    }))

  def queries: Seq[GraftQuery] = Seq(bpeTrain, bpeTokenCount)
}
