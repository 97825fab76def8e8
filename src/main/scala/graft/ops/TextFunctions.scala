package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text Column builders for the training-data pipeline operators.
  *
  * Everything here is a native Catalyst expression tree (no UDFs): the hot
  * path of a 100 TB document pipeline must stay inside whole-stage codegen
  * and keep the parquet scan prunable to the `text` column alone.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** BPE-ish lexer: letter runs, digit runs, single punctuation marks.
    * ASCII classes so external SQL engines tokenize identically. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Contiguous word n-grams over a token array (1-based `slice`). */
  def wordNGrams(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(-1))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Distinct n-gram shingle set of a document. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(wordNGrams(tokens(text), n))

  /** Whitespace-collapsed, trimmed, lower-cased canonical text. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic 128-bit content fingerprint of the canonical text. */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** Polynomial rolling hash (base-31) over token xxhash64 values — an
    * order-sensitive 64-bit fingerprint, cheaper to join on than md5
    * strings at scale. Engine-internal (not oracle-comparable). */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => xxhash64(t)),
      lit(0L),
      (acc, h) => acc * lit(31L) + h)
}
