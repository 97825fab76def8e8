package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives for the document pipeline: word
  * shingles, MinHash signatures + LSH banding, SimHash bit signatures,
  * and exact n-gram Jaccard verification.
  *
  * Scale design (the 100 TB shape, exercised at test SF):
  *  - candidate generation is always a *band/bucket equi-join* — the only
  *    shuffle carries (doc_id, band_key) pairs, never document bodies;
  *  - shingle sets are re-joined by doc_id only for the final verify of
  *    the (tiny) candidate set;
  *  - hot buckets are capped (`MaxBucket`) so one degenerate key cannot
  *    go quadratic — the standard LSH skew guard;
  *  - all hashes are [[PortableHash]] md5 derivatives so the DuckDB
  *    oracle reproduces every value bit-for-bit.
  */
object Dedup {

  val ShingleN = 3
  val MinHashK = 12
  val Bands = 4
  val RowsPerBand = 3 // MinHashK / Bands
  /** Skew guard: LSH buckets larger than this are dropped from candidate
    * generation (a bucket this hot is a stop-phrase artifact, not dup
    * evidence, and would blow up quadratically). */
  val MaxBucket = 100

  /** Distinct `n`-word shingles of a text, from lower-cased whitespace
    * tokens. Empty array when the text has fewer than `n` tokens. */
  def shingles(text: Column, n: Int = ShingleN): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature component `i`: the lexicographic minimum of
    * `md5(i ++ ":" ++ shingle)` over the shingle set. A hex-string min
    * under an independent hash per seed is a standard min-wise permutation
    * family, and — unlike integer mixing — is identical in any engine
    * with md5. */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$seed:"), s))))

  /** The `Bands` LSH band keys: each hashes `RowsPerBand` consecutive
    * signature components. Docs sharing any band key become candidates. */
  def bandKeys(sh: Column): Seq[Column] =
    (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand).map(r => minhash(sh, b * RowsPerBand + r))
      md5(concat_ws("|", parts: _*))
    }

  /** Exact Jaccard similarity of two (already-distinct) string sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 32-bit SimHash over the token multiset: bit j is set iff tokens whose
    * 32-bit hash has bit j outnumber those that don't. Computed entirely
    * inside the row (array fold — no explode, no shuffle). */
  def simhash32(text: Column): Column = {
    val hs = transform(TextFunctions.tokens(text), t => PortableHash.hash32(t))
    val n = size(hs)
    (0 until 32).map { j =>
      val ones = aggregate(hs, lit(0L),
        (acc, h) => acc + shiftrightunsigned(h, j).bitwiseAND(lit(1L)))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** doc_id + shingle-set projection, rows with too few tokens dropped. */
  def shingleTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)

  /** Candidate pairs from MinHash-LSH banding over `docs`, verified with
    * exact shingle Jaccard ≥ `threshold`. Output: (a_id, b_id, jaccard).
    */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingleTable(docs)
    val bands = sh.select(
      col("doc_id"),
      posexplode(array(bandKeys(col("sh")): _*)).as(Seq("band_idx", "band_key")))
    // Skew guard: drop buckets with fewer than 2 (no pair) or more than
    // MaxBucket members before the self-join.
    val sized = bands.join(
      bands.groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("bucket_n"))
        .where(col("bucket_n").between(2, MaxBucket)),
      Seq("band_idx", "band_key"))
    val pairs = sized.as("x")
      .join(sized.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    pairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (≤ 3
    * guaranteed found: 4 bands of 8 bits — pigeonhole). Output:
    * (a_id, b_id, hamming). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col("doc_id"), simhash32(col("text")).as("sh32"))
    val bands = sig.select(col("doc_id"), col("sh32"),
      posexplode(array((0 until 4).map(k =>
        shiftrightunsigned(col("sh32"), 8 * k).bitwiseAND(lit(255L))): _*))
        .as(Seq("band_idx", "band_val")))
    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sh32").bitwiseXOR(col("y.sh32"))).as("hamming"))
      .distinct()
    pairs.where(col("hamming") <= maxHamming)
  }

  /** Inverted-index n-gram candidate generation: pairs sharing at least
    * `minShared` *rare* shingles (document frequency ≤ `maxDf`), verified
    * with exact Jaccard ≥ `threshold`. The df cap is the skew guard — a
    * shingle appearing in thousands of docs generates no pairs. */
  def invertedIndexNearDups(
      docs: DataFrame, maxDf: Int, minShared: Int, threshold: Double): DataFrame = {
    val sh = shingleTable(docs)
    val posting = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val rare = posting.join(
      posting.groupBy("shingle").agg(count(lit(1)).as("df"))
        .where(col("df").between(2, maxDf)),
      "shingle")
    val pairs = rare.as("x")
      .join(rare.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    pairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(col("a_id"), col("b_id"), col("shared"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
