package graft.queries

import graft.core.Tables
import graft.ops.Dedup

/** Near-duplicate detection over `documents`: MinHash+LSH, SimHash, and
  * inverted-index n-gram Jaccard. Spark side in [[graft.ops.Dedup]]; the
  * SQL here is the independent DuckDB re-derivation of the identical
  * semantics (same md5-based hashes, same band structure, same skew
  * caps), so every emitted pair and similarity value hash-matches.
  */
object DedupQueries {

  /** Shared oracle CTEs: tokens and distinct 3-word shingles. */
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

  private val jaccardSql =
    """ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.sh, b.sh))), 6)""".stripMargin

  // ------------------------------------------------------- MinHash + LSH
  /** Same Kirsch–Mitzenhacker double-hash family as
    * [[graft.ops.Dedup.minhashSignature]]: one md5 per shingle, component
    * i = min(h1 + i·h2). */
  private def minhashSql(i: Int) =
    s"""list_min(list_transform(sh,
       |  s -> CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)
       |       + $i * CAST('0x' || substring(md5(s), 17, 14) AS BIGINT)))""".stripMargin

  // 60-bit md5-prefix band keys, truncated exactly like the engine's
  // PortableHash.hash60 (see Dedup.bandKeys) — longs, not md5 strings,
  // through the banding exchange
  private val bandCols = (0 until Dedup.Bands).map { b =>
    val parts = (0 until Dedup.RowsPerBand)
      .map(r => s"CAST(m${b * Dedup.RowsPerBand + r} AS VARCHAR)")
    s"CAST('0x' || substring(md5(${parts.mkString(" || '|' || ")}), 1, 15) AS BIGINT) AS b$b"
  }

  private val minhashLsh = GraftQuery(
    "x_dedup_minhash_lsh",
    (s, d) => Dedup.minhashNearDups(Tables.documents(s, d), threshold = 0.8),
    Some(s"""WITH $tokensCte, $shinglesCte,
      msig AS (SELECT doc_id,
        ${(0 until Dedup.MinHashK).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
        FROM sh),
      sig AS (SELECT doc_id, ${bandCols.mkString(", ")} FROM msig),
      bands AS (${(0 until Dedup.Bands).map(b =>
        s"SELECT doc_id, $b AS band_idx, b$b AS band_key FROM sig")
        .mkString(" UNION ALL ")}),
      sized AS (SELECT band_idx, band_key FROM bands
                GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND ${Dedup.MaxBucket}),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
               FROM bands x
               JOIN sized USING (band_idx, band_key)
               JOIN bands y ON x.band_idx = y.band_idx
                AND x.band_key = y.band_key AND x.doc_id < y.doc_id)
      SELECT * FROM (
        SELECT a_id, b_id, $jaccardSql AS jaccard
        FROM cand JOIN sh a ON a.doc_id = a_id JOIN sh b ON b.doc_id = b_id)
      WHERE jaccard >= 0.8"""))

  /** The production-speed MinHash path: XXH64 signatures straight from
    * text (`minhash_sig_fast`), identical banding + exact-Jaccard verify.
    * No SQL oracle by design — engine-internal hash values are not
    * reproducible in external engines (the portable md5 twin above is);
    * `MinHashFastSpec` pins family agreement instead, and the bench
    * carries the speed story (see `tools.ScaleProbe` for the slope). */
  private val minhashFast = GraftQuery(
    "x_dedup_minhash_fast",
    (s, d) => Dedup.minhashNearDupsFast(Tables.documents(s, d), threshold = 0.8),
    None)

  // -------------------------------------------------------------- SimHash
  /** 64-bit per-token hash = first 16 hex chars of md5 (digest bytes
    * 0-7), matching [[graft.functions.DedupKernels.simhash64]]. UBIGINT
    * so the high-bit half parses; bit probes below are sign-agnostic. */
  private val hashesCte =
    """hs AS (
      |  SELECT doc_id,
      |         list_transform(toks,
      |           t -> CAST('0x' || substring(md5(t), 1, 16) AS UBIGINT)) AS hs
      |  FROM toks)""".stripMargin

  /** The 64 majority-vote bit terms, assembled as a SIGNED 64-bit value
    * (bit 63 contributes Long.MinValue) so the oracle column is the same
    * two's-complement long the Spark kernel emits. */
  private val simhashExpr = {
    val terms = (0 until 64).map { j =>
      val bit = if (j == 63) Long.MinValue.toString else (1L << j).toString
      s"""(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> $j) & 1))
         |      > len(hs) THEN CAST($bit AS BIGINT) ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")
    s"CAST($terms AS BIGINT)"
  }

  private val simhashSig = GraftQuery(
    "x_dedup_simhash",
    (s, d) => {
      import org.apache.spark.sql.functions._
      Tables.documents(s, d)
        .select(col("doc_id"), Dedup.simhash64(col("text")).as("simhash"))
    },
    Some(s"""WITH $tokensCte, $hashesCte
      SELECT doc_id, $simhashExpr AS simhash FROM hs"""))

  /** 4×16-bit banding over the signed sh64: arithmetic shift + mask
    * keeps exactly bits 16k..16k+15, identical to the Spark side's
    * `shiftrightunsigned & 0xFFFF`. The `sized` cap mirrors
    * [[graft.ops.Dedup.MaxBucket]] (same guard as the MinHash oracle). */
  private val simhashPairs = GraftQuery(
    "x_dedup_simhash_pairs",
    (s, d) => Dedup.simhashNearDups(Tables.documents(s, d), maxHamming = 3),
    Some(s"""WITH $tokensCte, $hashesCte,
      sig AS (SELECT doc_id, $simhashExpr AS sh64 FROM hs),
      bands AS (${(0 until 4).map(k =>
        s"SELECT doc_id, sh64, $k AS band_idx, (sh64 >> ${16 * k}) & 65535 AS band_val FROM sig")
        .mkString(" UNION ALL ")}),
      sized AS (SELECT band_idx, band_val FROM bands
                GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND ${Dedup.MaxBucket}),
      pairs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
                  CAST(bit_count(xor(x.sh64, y.sh64)) AS INTEGER) AS hamming
                FROM bands x
                JOIN sized USING (band_idx, band_val)
                JOIN bands y ON x.band_idx = y.band_idx
                 AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
      SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 3"""))

  /** The permuted-table band SQL for hamming 4 at 6 blocks: per
    * t-subset of the disjoint bit blocks (t = 2), the concatenated
    * block values as one BIGINT key — the same
    * [[graft.ops.Dedup.permutedBandKeys]] construction, re-derived
    * from documented semantics (arithmetic shift + mask equals the
    * Spark side's unsigned shift + mask once masked). */
  private def permutedBandSql(blocks: Int, maxHamming: Int): String = {
    val t = blocks - maxHamming
    val widths = (0 until blocks)
      .map(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    def blockSql(b: Int) =
      s"((sh64 >> ${offsets(b)}) & ${(1L << widths(b)) - 1})"
    (0 until blocks).combinations(t).toSeq.zipWithIndex.map {
      case (c, i) =>
        val expr = c.foldLeft("CAST(0 AS BIGINT)")((acc, b) =>
          s"(($acc << ${widths(b)}) | ${blockSql(b)})")
        s"SELECT doc_id, sh64, $i AS band_idx, $expr AS band_val FROM sig"
    }.mkString(" UNION ALL ")
  }

  /** SimHash at hamming ≤ 4 — the permuted-table generalization
    * ([[graft.ops.Dedup.simhashNearDupsPermuted]], 6 blocks × C(6,2)
    * = 15 band tables of ~21-bit keys): the 4×16 scheme's pigeonhole
    * tops out at hamming 3, and the naive 5-block widening would key
    * on 13 bits (8,192 values — the r15 saturation lesson). Oracle
    * re-derives the same 15 tables from the signed signature. */
  private val simhashPairsH4 = GraftQuery(
    "x_dedup_simhash_h4",
    (s, d) => graft.ops.Dedup.simhashNearDupsPermuted(
      Tables.documents(s, d), maxHamming = 4),
    Some(s"""WITH $tokensCte, $hashesCte,
      sig AS (SELECT doc_id, $simhashExpr AS sh64 FROM hs),
      bands AS (${permutedBandSql(6, 4)}),
      sized AS (SELECT band_idx, band_val FROM bands
                GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND ${Dedup.MaxBucket}),
      pairs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
                  CAST(bit_count(xor(x.sh64, y.sh64)) AS INTEGER) AS hamming
                FROM bands x
                JOIN sized USING (band_idx, band_val)
                JOIN bands y ON x.band_idx = y.band_idx
                 AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
      SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 4"""))

  /** Connected components of the MinHash near-dup graph as DuckDB CTEs
    * (recursive transitive closure; `comp` = doc_id → cluster_id) —
    * shared by the clustering and split oracles. */
  private val componentsCtes =
    s"""WITH RECURSIVE $tokensCte, $shinglesCte,
      msig AS (SELECT doc_id,
        ${(0 until Dedup.MinHashK).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
        FROM sh),
      sig AS (SELECT doc_id, ${bandCols.mkString(", ")} FROM msig),
      bands AS (${(0 until Dedup.Bands).map(b =>
        s"SELECT doc_id, $b AS band_idx, b$b AS band_key FROM sig")
        .mkString(" UNION ALL ")}),
      sized AS (SELECT band_idx, band_key FROM bands
                GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND ${Dedup.MaxBucket}),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
               FROM bands x
               JOIN sized USING (band_idx, band_key)
               JOIN bands y ON x.band_idx = y.band_idx
                AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
      pairs AS (SELECT a_id, b_id FROM (
                  SELECT a_id, b_id, $jaccardSql AS jaccard
                  FROM cand JOIN sh a ON a.doc_id = a_id
                            JOIN sh b ON b.doc_id = b_id)
                WHERE jaccard >= 0.8),
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.id, e.dst FROM reach w JOIN edges e ON w.r = e.src),
      comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)"""

  // ------------------------------------------------ dedup cluster assign
  /** The clustering step a real dedup pipeline runs AFTER pair finding:
    * connected components over the MinHash near-dup graph, every document
    * labeled with its cluster (min doc_id of the component), cluster
    * size, and whether it is the canonical keeper. Filtering
    * `is_canonical` yields the deduplicated corpus. Oracle re-derives
    * the components via a recursive transitive-closure CTE — exact for
    * the test SFs; the Spark side's label propagation is the form that
    * survives 100 TB (per-round shuffle of long pairs only). */
  private val clusterAssign = GraftQuery(
    "x_dedup_clusters",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.clusterTable(docs.select(col("doc_id").as("id")), pairs)
    },
    Some(s"""$componentsCtes
      SELECT doc_id, cluster_id, cluster_size, doc_id = cluster_id AS is_canonical
      FROM comp JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                      FROM comp GROUP BY 1) USING (cluster_id)"""))

  // -------------------------------------------- leakage-safe split
  /** Deterministic train/eval split that CANNOT leak near-duplicates
    * across the boundary: the split hashes the CLUSTER id, not the
    * document id, so every member of a near-dup component lands on the
    * same side — the eval set never contains a paraphrase of a training
    * document. Hash is the portable md5-derived 60-bit family, so any
    * engine re-derives the same split (and a re-run after corpus growth
    * keeps existing clusters' assignments unless their canonical id
    * changes). 90/10 by hash mod 100. */
  private val splitByCluster = GraftQuery(
    "x_split_by_cluster",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.clusterTable(docs.select(col("doc_id").as("id")), pairs)
        .select(col("doc_id"), col("cluster_id"),
          when(pmod(graft.ops.PortableHash
            .hash60(col("cluster_id").cast("string")), lit(100)) < 90,
            "train").otherwise("eval").as("split"))
    },
    Some(s"""$componentsCtes
      SELECT doc_id, cluster_id,
        CASE WHEN CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 100 < 90
             THEN 'train' ELSE 'eval' END AS split
      FROM comp"""),
    // Bench the split itself: in a real pipeline the cluster table is an
    // input (x_dedup_clusters carries the clustering cost); the timed
    // region is the hash-split projection over the persisted clusters.
    benchBuild = Some((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-split-bench-").toString
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.8)
        .select(col("a_id"), col("b_id"))
      Dedup.clusterTable(docs.select(col("doc_id").as("id")), pairs)
        .write.mode("overwrite").parquet(dir)
      () => s.read.parquet(dir)
        .select(col("doc_id"), col("cluster_id"),
          when(pmod(graft.ops.PortableHash
            .hash60(col("cluster_id").cast("string")), lit(100)) < 90,
            "train").otherwise("eval").as("split"))
    }))

  // --------------------------------------- quality-aware canonical pick
  /** Canonical selection a curation pipeline actually wants: instead of
    * the arbitrary min-id keeper (`x_dedup_clusters`), keep the LONGEST
    * member of each near-dup cluster (tie → min doc_id) — the usual
    * "most complete version wins" policy when one copy is a truncated
    * crawl of another. Keeper choice is one `max_by` aggregate over the
    * (doc, cluster) pairs — |clusters| rows out — joined back, so no
    * window function ever scans the corpus and the added cost at 100 TB
    * is two key-only shuffles past what clustering already paid. */
  private val keepBest = GraftQuery(
    "x_dedup_keep_best",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.8)
        .select(col("a_id"), col("b_id"))
      val clusters =
        Dedup.clusterTable(docs.select(col("doc_id").as("id")), pairs)
      val joined = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
      // struct max: longer doc wins, then smaller id (negated for max)
      val keepers = joined.groupBy("cluster_id")
        .agg(max_by(col("doc_id"),
          struct(col("n_chars"), -col("doc_id"))).as("keeper"))
      joined.join(keepers, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("doc_id") === col("keeper")).as("keep"))
    },
    Some(s"""$componentsCtes,
      sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
             FROM comp GROUP BY 1),
      ranked AS (SELECT c.doc_id, c.cluster_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                     ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
                 FROM comp c JOIN documents d USING (doc_id))
      SELECT r.doc_id, r.cluster_id, sz.cluster_size, r.rn = 1 AS keep
      FROM ranked r JOIN sz USING (cluster_id)"""))

  // ------------------------------------------- inverted-index n-gram set
  private val ngramInverted = GraftQuery(
    "x_dedup_ngram_inverted",
    (s, d) => Dedup.invertedIndexNearDups(
      Tables.documents(s, d), maxDf = 5, minShared = 10, threshold = 0.5),
    Some(s"""WITH $tokensCte, $shinglesCte,
      posting AS (SELECT doc_id,
                    CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)
                      AS shingle_h
                  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh)),
      rare AS (SELECT p.doc_id, p.shingle_h FROM posting p
               JOIN (SELECT shingle_h FROM posting
                     GROUP BY 1 HAVING count(*) BETWEEN 2 AND 5) r
               USING (shingle_h)),
      pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                  CAST(count(*) AS BIGINT) AS shared
                FROM rare x JOIN rare y
                  ON x.shingle_h = y.shingle_h AND x.doc_id < y.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 10)
      SELECT * FROM (
        SELECT a_id, b_id, shared, $jaccardSql AS jaccard
        FROM pairs JOIN sh a ON a.doc_id = a_id JOIN sh b ON b.doc_id = b_id)
      WHERE jaccard >= 0.5"""))

  // ------------------------------------------- containment (asymmetric)
  /** Asymmetric containment dedup ([[Dedup.containmentNearDups]]):
    * |A∩B| / |A| catches a small document living INSIDE a large one —
    * excerpts, quotes, boilerplate inclusion — which Jaccard structurally
    * misses (the union is dominated by the larger doc). Same rare-shingle
    * candidate machinery as `x_dedup_ngram_inverted`; the oracle
    * re-derives both directed containments over the same posting groups. */
  private val containment = GraftQuery(
    "x_dedup_containment",
    (s, d) => Dedup.containmentNearDups(
      Tables.documents(s, d), maxDf = 5, minShared = 5, threshold = 0.5),
    Some(s"""WITH $tokensCte, $shinglesCte,
      posting AS (SELECT doc_id,
                    CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)
                      AS shingle_h
                  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh)),
      rare AS (SELECT p.doc_id, p.shingle_h FROM posting p
               JOIN (SELECT shingle_h FROM posting
                     GROUP BY 1 HAVING count(*) BETWEEN 2 AND 5) r
               USING (shingle_h)),
      pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                  CAST(count(*) AS BIGINT) AS shared
                FROM rare x JOIN rare y
                  ON x.shingle_h = y.shingle_h AND x.doc_id < y.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT * FROM (
        SELECT a_id, b_id, shared,
          ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(a.sh), 6) AS containment_a,
          ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(b.sh), 6) AS containment_b
        FROM pairs JOIN sh a ON a.doc_id = a_id JOIN sh b ON b.doc_id = b_id)
      WHERE greatest(containment_a, containment_b) >= 0.5"""))

  // -------------------------------------- duplicated n-gram fraction
  /** Cross-corpus exact-duplication quality signal (the large-corpus
    * filtering literature's "duplicate n-gram fraction"): per doc, the
    * share of its distinct 3-gram shingles found in ≥2 documents.
    * Distinct from `x_dedup_ngram_inverted` (pairwise similarity) and
    * `x_repetition_ratio` (within-doc repetition). Same md5-derived
    * posting hash as the inverted index, so the oracle re-derives
    * identical groups. */
  private val dupNgramFraction = GraftQuery(
    "x_dup_ngram_fraction",
    (s, d) => graft.ops.Dedup.dupNgramStats(Tables.documents(s, d)),
    Some(s"""WITH $tokensCte, $shinglesCte,
      posting AS (SELECT doc_id,
                    CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)
                      AS shingle_h
                  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh)),
      dup AS (SELECT shingle_h FROM posting
              GROUP BY 1 HAVING count(*) >= 2),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_ngrams
                 FROM posting JOIN dup USING (shingle_h) GROUP BY 1)
      SELECT s.doc_id,
             COALESCE(p.dup_ngrams, 0) AS dup_ngrams,
             CAST(len(s.sh) AS BIGINT) AS total_ngrams,
             ROUND(CAST(COALESCE(p.dup_ngrams, 0) AS DOUBLE)
                   / len(s.sh), 6) AS dup_fraction
      FROM sh s LEFT JOIN perdoc p USING (doc_id)"""))

  // ------------------------------------------ duplicated token spans
  /** Exact-substring duplication as SPANS ([[Dedup.duplicatedSpans]]):
    * maximal runs of tokens whose 10-grams occur verbatim in ≥2
    * documents — the "cut the repeated passage" primitive, positional
    * where `x_dup_ngram_fraction` is a per-doc rate. The oracle
    * re-derives the identical islands with window functions over the
    * same md5-hashed positional grams. */
  private val dupSpans = GraftQuery(
    "x_dup_token_spans",
    (s, d) => Dedup.duplicatedSpans(Tables.documents(s, d)),
    Some("""WITH toks AS (
        SELECT doc_id,
               list_filter(str_split_regex(lower(text), '\s+'),
                           t -> t <> '') AS toks
        FROM documents),
      pgrams AS (SELECT doc_id, pos,
          CAST('0x' || substring(md5(
            array_to_string(toks[pos:pos+9], ' ')), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, toks,
                unnest(generate_series(1, len(toks) - 9)) AS pos
              FROM toks WHERE len(toks) >= 10)),
      dup AS (SELECT h FROM pgrams
              GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      dp AS (SELECT doc_id, pos FROM pgrams JOIN dup USING (h)),
      isl AS (SELECT doc_id, pos,
          SUM(CASE WHEN prev IS NOT NULL AND pos - prev <= 10
                   THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM (SELECT doc_id, pos,
                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dp))
      SELECT doc_id, CAST(MIN(pos) - 1 AS BIGINT) AS start_tok,
             CAST(MAX(pos) - 1 + 10 AS BIGINT) AS end_tok,
             CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM isl GROUP BY doc_id, grp"""))

  // ------------------------------------------ duplicated byte spans
  /** BYTE-level duplicated spans ([[Dedup.duplicatedByteSpans]]) — the
    * published exact-substring pipeline's semantics: verbatim repeats
    * of ≥ 50 raw BYTES, no tokenization, offsets in bytes. The
    * token-gram twin above approximates this with whitespace 10-grams;
    * this query pins the byte-exact form. Oracle re-derives identical
    * islands over DuckDB's 1-based string slices of the same text. */
  private val byteSpans = GraftQuery(
    "x_dedup_byte_spans",
    (s, d) => Dedup.duplicatedByteSpans(Tables.documents(s, d)),
    Some("""WITH g AS (
        SELECT doc_id, p - 1 AS pos,
               CAST('0x' || substring(md5(text[p:p+49]), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, length(text) - 49)) AS p
              FROM documents WHERE length(text) >= 50)),
      dup AS (SELECT h FROM g
              GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      dp AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
      isl AS (SELECT doc_id, pos,
          SUM(CASE WHEN prev IS NOT NULL AND pos - prev <= 50
                   THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM (SELECT doc_id, pos,
                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dp))
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_byte,
             CAST(MAX(pos) + 50 AS BIGINT) AS end_byte,
             CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM isl GROUP BY doc_id, grp"""))

  /** Engine-internal FAST twin of `x_dedup_byte_spans`: XXH64 gram
    * hashes straight from the byte windows, no md5 — the hash is the
    * detector's dominant CPU at scale. Output is positions, never hash
    * values, so the spans are identical to the portable form's unless
    * a collision differs between hash families (`DedupSpec` pins
    * equality); rows-only in the oracle gate for the same reason
    * `x_dedup_minhash_fast` is — the grouping hash is not externally
    * reproducible, even though no hash reaches the output. */
  private val byteSpansFast = GraftQuery(
    "x_dedup_byte_spans_fast",
    (s, d) => Dedup.duplicatedByteSpans(Tables.documents(s, d),
      portable = false),
    None)

  // ---------------------------------------- span removal (the cut step)
  /** The REMOVE step over the spans above ([[Dedup.removeDuplicatedSpans]]):
    * every token covered by a cross-document duplicated 10-gram span is
    * cut and the document rebuilt from the survivors — exact-substring
    * deduplication's actual output table, where `x_dup_token_spans` is
    * its diagnostic view. The oracle re-derives the islands, anti-joins
    * positions against span coverage, and reassembles with an ordered
    * string_agg — same text, independently rebuilt. */
  private val spanRemoval = GraftQuery(
    "x_dedup_span_removal",
    (s, d) => Dedup.removeDuplicatedSpans(Tables.documents(s, d)),
    Some("""WITH toks AS (
        SELECT doc_id,
               list_filter(str_split_regex(lower(text), '\s+'),
                           t -> t <> '') AS toks
        FROM documents),
      pgrams AS (SELECT doc_id, pos,
          CAST('0x' || substring(md5(
            array_to_string(toks[pos:pos+9], ' ')), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, toks,
                unnest(generate_series(1, len(toks) - 9)) AS pos
              FROM toks WHERE len(toks) >= 10)),
      dup AS (SELECT h FROM pgrams
              GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      dp AS (SELECT doc_id, pos FROM pgrams JOIN dup USING (h)),
      isl AS (SELECT doc_id, pos,
          SUM(CASE WHEN prev IS NOT NULL AND pos - prev <= 10
                   THEN 0 ELSE 1 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM (SELECT doc_id, pos,
                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dp)),
      spans AS (SELECT doc_id, MIN(pos) - 1 AS s, MAX(pos) - 1 + 10 AS e
                FROM isl GROUP BY doc_id, grp),
      pos AS (SELECT doc_id,
                unnest(generate_series(1, len(toks))) AS p
              FROM toks),
      kept AS (SELECT t.doc_id, t.p FROM pos t
               WHERE NOT EXISTS (SELECT 1 FROM spans s
                 WHERE s.doc_id = t.doc_id
                   AND t.p - 1 >= s.s AND t.p - 1 < s.e))
      SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             CAST(len(t.toks) - count(k.p) AS BIGINT) AS n_removed,
             COALESCE(string_agg(t.toks[k.p], ' ' ORDER BY k.p), '')
               AS clean_text
      FROM toks t LEFT JOIN kept k USING (doc_id)
      GROUP BY t.doc_id, len(t.toks)"""))

  // ------------------------------------------------ line-level dedup
  /** LINE-level corpus deduplication ([[Dedup.dedupLines]]) — the
    * CCNet/RefinedWeb curation step that cuts boilerplate lines
    * occurring verbatim in ≥2 documents and rebuilds each document from
    * the survivors. The synthetic corpus carries no newlines, so the
    * query first derives a deterministic multi-line view (12-token
    * lines — near-duplicate documents share aligned windows, giving the
    * operator real cross-document duplicate lines to cut) and the
    * oracle re-derives the identical view; the operator itself is the
    * generic newline-based one a real corpus would call directly. */
  private val lineDedup = GraftQuery(
    "x_dedup_lines",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextFunctions.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 1)
      val lined = toks.select(col("doc_id"),
        array_join(transform(
          sequence(lit(0),
            floor((size(col("toks")) - lit(1)) / lit(12)).cast("int")),
          i => array_join(slice(col("toks"), i * lit(12) + lit(1), lit(12)),
            " ")),
          "\n").as("text"))
      Dedup.dedupLines(lined)
    },
    Some(s"""WITH $tokensCte,
      lined AS (
        SELECT doc_id,
               list_transform(
                 generate_series(0, CAST(floor((len(toks) - 1) / 12.0)
                                         AS BIGINT)),
                 i -> array_to_string(toks[i*12+1 : i*12+12], ' ')) AS lines
        FROM toks WHERE len(toks) >= 1),
      posted AS (
        SELECT doc_id, p - 1 AS pos,
               CAST('0x' || substring(md5(lines[p]), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, lines,
                unnest(generate_series(1, len(lines))) AS p
              FROM lined)
        WHERE lines[p] <> ''),
      dup AS (SELECT h FROM posted
              GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      kill AS (SELECT doc_id, pos FROM posted JOIN dup USING (h)),
      pos AS (SELECT doc_id, unnest(generate_series(1, len(lines))) AS p
              FROM lined),
      kept AS (SELECT t.doc_id, t.p FROM pos t
               WHERE NOT EXISTS (SELECT 1 FROM kill k
                 WHERE k.doc_id = t.doc_id AND k.pos = t.p - 1))
      SELECT l.doc_id,
             CAST(len(l.lines) AS BIGINT) AS n_lines,
             CAST(len(l.lines) - count(k.p) AS BIGINT) AS n_removed,
             COALESCE(string_agg(l.lines[k.p], chr(10) ORDER BY k.p), '')
               AS clean_text
      FROM lined l LEFT JOIN kept k USING (doc_id)
      GROUP BY l.doc_id, len(l.lines)"""))

  val queries: Seq[GraftQuery] =
    Seq(minhashLsh, minhashFast, simhashSig, simhashPairs,
      simhashPairsH4, ngramInverted,
      containment, clusterAssign, splitByCluster, keepBest, dupNgramFraction,
      dupSpans, byteSpans, byteSpansFast, spanRemoval, lineDedup)
}
