package graft.functions

import graft.SparkTestBase
import graft.ops.{Dedup, PortableHash, TextFunctions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins the native text/dedup kernels bit-identical to the round-1
  * interpreted HOF folds (re-derived inline here as the reference
  * semantics). The DuckDB oracle SQL was written against the fold forms;
  * these tests are what lets the oracle stay unchanged.
  */
class TextExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  /** Round-1 fold forms, kept as the executable spec of the semantics. */
  private def foldTokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  private def foldShingles(text: Column, n: Int): Column = {
    val toks = foldTokens(text)
    val len = size(toks)
    val grams = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc,
        slice(toks, lit(k), greatest(len - (k - 1), lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    array_distinct(
      when(len >= n, slice(grams, lit(1), len - (n - 1)))
        .otherwise(array().cast("array<string>")))
  }

  private def foldMinhash(sh: Column, k: Int): Column = {
    val pairs = transform(transform(sh, s => md5(s)), x => array(
      conv(substring(x, 1, 15), 16, 10).cast(LongType),
      conv(substring(x, 17, 14), 16, 10).cast(LongType)))
    aggregate(pairs, array_repeat(lit(Long.MaxValue), k),
      (acc, p) => zip_with(acc,
        array((0 until k).map(i =>
          p.getItem(0) + lit(i.toLong) * p.getItem(1)): _*),
        (a, b) => least(a, b)))
  }

  private def foldSimhash(text: Column): Column = {
    val hs = transform(foldTokens(text), t => PortableHash.hash32(t))
    val n = size(hs)
    val bitCounts = aggregate(
      hs, array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc,
        array((0 until 32).map(j =>
          shiftrightunsigned(h, j).bitwiseAND(lit(1L))): _*),
        (a, b) => a + b))
    val weights = array((0 until 32).map(j => lit(1L << j)): _*)
    aggregate(
      zip_with(bitCounts, weights,
        (cnt, w) => when(cnt * 2 > n, w).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  private lazy val docs =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("ws_tokens matches the filtered split fold on real documents") {
    val bad = docs
      .select(TextFunctions.tokens(col("text")).as("a"),
        foldTokens(col("text")).as("b"))
      .where(not(col("a") <=> col("b")))
    assert(bad.count() === 0)
  }

  test("ws_tokens yields [] for blank and whitespace-only text") {
    val got = Seq("", "   ", "\t\n", "a  b").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq.empty)
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("a", "b"))
  }

  test("shingle_set matches the zip_with n-gram fold as a SET on real documents") {
    val bad = docs
      .select(Dedup.shingles(col("text")).as("a"),
        foldShingles(col("text"), 3).as("b"))
      .where(size(array_except(col("a"), col("b"))) > 0 ||
        size(array_except(col("b"), col("a"))) > 0)
    assert(bad.count() === 0)
  }

  test("minhash_sig matches the interpreted double-hash fold bit-for-bit") {
    val bad = docs
      .select(Dedup.shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .select(Dedup.minhashSignature(col("sh")).as("a"),
        foldMinhash(col("sh"), Dedup.MinHashK).as("b"))
      .where(not(col("a") <=> col("b")))
    assert(bad.count() === 0)
  }

  test("simhash32 matches the interpreted 32-wide zip_with fold bit-for-bit") {
    val bad = docs
      .select(Dedup.simhash32(col("text")).as("a"),
        foldSimhash(col("text")).as("b"))
      .where(not(col("a") <=> col("b")))
    assert(bad.count() === 0)
  }

  test("minhash_sig skips null array elements instead of crashing the task") {
    // SQL-exposed function: array(...NULL...) has containsNull=true; a
    // null entry must contribute nothing to the component minima
    val r = spark.sql(
      """SELECT minhash_sig(array('x', NULL, 'y'), 4) AS a,
        |       minhash_sig(array('x', 'y'), 4) AS b,
        |       minhash_sig(array(CAST(NULL AS STRING)), 4) AS empty
        |""".stripMargin).head()
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    assert(r.getSeq[Long](2) === Seq.fill(4)(Long.MaxValue))
  }

  test("nfc_normalize recomposes decomposed text and is idempotent") {
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS a, " +
        "nfc_normalize('café') AS b, " +
        "nfc_normalize(nfc_normalize('café')) AS c, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) === "café") // e + U+0301 -> é
    assert(r.getString(1) === "café") // already composed: unchanged
    assert(r.getString(2) === "café") // idempotent
    assert(r.isNullAt(3))
  }

  test("native expressions resolve from SQL text too") {
    val r = spark.sql(
      """SELECT ws_tokens('A  b') AS t,
        |       shingle_set('a b c d', 3) AS s,
        |       minhash_sig(array('x'), 2) AS m,
        |       simhash32('a') AS h,
        |       simhash64('hello') AS h64""".stripMargin).head()
    assert(r.getSeq[String](0) === Seq("a", "b"))
    assert(r.getSeq[String](1) === Seq("a b c", "b c d"))
    assert(r.getSeq[Long](2).length === 2)
    assert(r.getLong(3) >= 0L && r.getLong(3) < (1L << 32))
    assert(r.getLong(4) === 0x5d41402abc4b2a76L) // md5('hello') bytes 0-7
  }
}
