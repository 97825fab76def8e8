package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def langOf(texts: String*): Seq[String] =
    texts.toDF("text")
      .select(TextAnalysis.langIdCol(col("text")).as("l"))
      .as[String].collect().toSeq

  test("langId: clear stopword majority wins") {
    assert(langOf("der hund und die katze ist") === Seq("de"))
    assert(langOf("the cat and the dog is it") === Seq("en"))
  }

  test("langId: ties break to the alphabetically-first language") {
    // 'the' (en) vs 'der' (de): one hit each → de
    assert(langOf("the der xyzzy") === Seq("de"))
  }

  test("langId: no stopword hits yields 'und'") {
    assert(langOf("xyzzy plugh quux") === Seq("und"))
    assert(langOf("") === Seq("und"))
  }

  test("quality: degenerate short texts score zero") {
    val rows = Seq("x", "", "one two three four")
      .toDF("text")
      .select(TextAnalysis.qualitySignals(col("text"))
        .find(_._1 == "quality_score").get._2.as("q"))
      .as[Double].collect()
    assert(rows.forall(_ === 0.0)) // all under the 5-word floor
  }

  test("quality: stopword-rich clean prose outscores punctuation soup") {
    val qs = Seq(
      "the cat and the dog is in it the end of a story",
      "x@#$ y!%^ z&*( w)_+ v{}| u<>?")
      .toDF("text")
      .select(TextAnalysis.qualitySignals(col("text"))
        .find(_._1 == "quality_score").get._2.as("q"))
      .as[Double].collect()
    assert(qs(0) > 0.7) // short common words cap mean-word-len factor
    assert(qs(1) < 0.4)
    assert(qs(0) > qs(1))
  }
}
