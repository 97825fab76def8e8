package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level text analysis: quality scoring, token statistics,
  * language identification. All per-row narrow transforms — they scale
  * linearly with the scan and never shuffle.
  */
object TextAnalysis {

  /** Small per-language stopword dictionaries for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny — the operator's value is
    * the scoring plumbing; swap in real dictionaries for production. */
  val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zhe", "ta"))

  private def containsLit(values: Seq[String])(t: Column): Column =
    array_contains(array(values.map(lit): _*), t)

  /** Count of tokens that appear in `values`. */
  def stopwordHits(toks: Column, values: Seq[String]): Column =
    size(filter(toks, t => containsLit(values)(t)))

  /** Language-ID by stopword-hit scoring: argmax over per-language hit
    * counts, ties broken by language code; `und` when nothing hits. */
  def langIdCol(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    // build [struct(hits, lang), ...] and take the max — struct ordering
    // compares fields left-to-right, so (hits, lang) max = argmax w/ tie
    // on the *largest* code; negate via reverse alphabet trick is
    // overkill — instead order by (hits, reversed rank) using index.
    val scored = StopwordsByLang.toSeq.sortBy(_._1).reverse.zipWithIndex.map {
      case ((lang, words), idx) =>
        struct(
          stopwordHits(toks, words).as("hits"),
          lit(idx).as("rank"), // later in alphabet = lower rank
          lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality-signal columns for a document text column:
    * character/word counts, mean word length, punctuation and stopword
    * ratios, and a blended [0,1] quality score. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val toks = TextFunctions.tokens(text)
    val nChars = length(text).cast("double")
    val nWords = size(toks).cast("double")
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
      .cast("double")
    val stops = stopwordHits(toks, StopwordsByLang("en")).cast("double")
    val meanWordLen = when(nWords > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / nWords).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val stopRatio = when(nWords > 0, stops / nWords).otherwise(lit(0.0))
    // Blend: reward stopword presence and 3-8 char mean words, punish
    // punctuation soup and degenerate lengths.
    val score =
      when(nWords < 5, lit(0.0)).otherwise(
        lit(0.4) * least(stopRatio * 4, lit(1.0)) +
        lit(0.3) * when(meanWordLen.between(3, 8), 1.0).otherwise(0.3) +
        lit(0.3) * (lit(1.0) - least(punctRatio * 5, lit(1.0))))
    Seq(
      "n_chars_m" -> length(text).cast("long"),
      "n_words" -> size(toks).cast("long"),
      "mean_word_len" -> round(meanWordLen, 4),
      "punct_ratio" -> round(punctRatio, 6),
      "stopword_ratio" -> round(stopRatio, 6),
      "quality_score" -> round(score, 4))
  }

  /** documents → per-doc quality signal table. */
  def qualityTable(docs: DataFrame): DataFrame = {
    val cols = qualitySignals(col("text")).map { case (n, c) => c.as(n) }
    docs.select(col("doc_id") +: cols: _*)
  }

  /** documents → predicted language table. */
  def langIdTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang").as("lang_actual"),
      langIdCol(col("text")).as("lang_pred"))

  /** Hashed LINEAR quality classifier inference (the fastText shape the
    * published curation pipelines run at corpus scale): each document is
    * scored `sigmoid(mean of w[hash(token) % B])` against a pretrained
    * bucket-weight table, `keep` = positive margin.
    *
    * `weights` is the model artifact — a (b: bucket id, w: weight)
    * table covering every bucket in [0, B). It is collapsed to a SINGLE
    * map row and broadcast, so scoring is a scan-side array fold over
    * each document's tokens: inference pays ZERO corpus-side shuffle
    * and stays embarrassingly parallel at 100 TB (contrast
    * `x_dsir_weights`, which must shuffle (doc, bucket) counts because
    * it FITS its model on the corpus — applying a model needs no such
    * pass). The map row is O(B) bytes; a 2^20-bucket production model
    * broadcasts at ~8 MB, the same ballpark as a Bloom runtime filter.
    *
    * The margin rounds to 6 dp BEFORE the sigmoid so an external
    * engine's floating sum order cannot flip `keep` or the 6-dp score. */
  def linearQualityScore(docs: DataFrame, weights: DataFrame,
      buckets: Int): DataFrame = {
    val model = weights.agg(map_from_arrays(
      collect_list(col("b")), collect_list(col("w"))).as("wmap"))
    docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 1)
      .crossJoin(broadcast(model))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0.0), (acc, t) =>
          acc + element_at(col("wmap"),
            PortableHash.hash32(t) % buckets)).as("raw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("raw") / col("n_tokens"), 6).as("margin"))
      .select(col("doc_id"), col("n_tokens"), col("margin"),
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6).as("score"),
        (col("margin") > 0).as("keep"))
  }
}
