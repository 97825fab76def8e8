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

  test("linearQualityScore: hand-computed margin, sigmoid, and keep flag") {
    // 2-bucket model: w(even bucket)=+1, w(odd)=-1 → margin is the mean
    // sign of each token's bucket; sigmoid and keep follow from it
    val weights = Seq((0L, 1.0), (1L, -1.0)).toDF("b", "w")
    val docs = Seq((1L, "aa bb cc"), (2L, "zz")).toDF("doc_id", "text")
    val out = TextAnalysis.linearQualityScore(docs, weights, 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    def bucket(t: String): Long = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(t).take(8), 16)
      h % 2
    }
    for ((id, text) <- Seq(1L -> "aa bb cc", 2L -> "zz")) {
      val ws = text.split(" ").map(t => if (bucket(t) == 0L) 1.0 else -1.0)
      val margin = BigDecimal(ws.sum / ws.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (n, m, s, keep) = out(id)
      assert(n === ws.length)
      assert(m === margin)
      assert(math.abs(s - 1.0 / (1.0 + math.exp(-margin))) < 1e-6)
      assert(keep === (margin > 0))
    }
  }

  test("linearQualityScore plan: no shuffle on the corpus side") {
    val weights = Seq((0L, 1.0), (1L, -1.0)).toDF("b", "w")
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val plan = TextAnalysis.linearQualityScore(docs, weights, 2)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the broadcast of the one-row model
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus-side shuffle in:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
