package graft.immigration

import org.apache.spark.sql.DataFrame

/** Data-quality checks (ref `etl.py:360-411`).
  *
  * The reference's checks can never fail: every branch builds an
  * `Exception(...)` without `raise`, so they only force materialization.
  * Its referential check is also logically inverted for three of the five
  * code columns (the inner-join fact can only LOSE dim codes, so
  * `distinct(fact.code) != distinct(dim)` is the expected state, not an
  * anomaly). We reimplement the same check QUERIES faithfully but make
  * failure behavior explicit: warn mode (default — observable parity
  * with the reference: log and continue) and strict mode (throws on the
  * non-empty checks; the referential comparisons stay report-only
  * because, as published, they'd abort every healthy run).
  */
object Quality {

  final case class CheckResult(name: String, passed: Boolean, detail: String)

  final class QualityCheckFailure(msg: String) extends RuntimeException(msg)

  def nonEmpty(name: String, df: DataFrame): CheckResult = {
    val n = df.count()
    CheckResult(s"non_empty_$name", n > 0, s"$name has $n rows")
  }

  /** The reference's referential-consistency comparison, verbatim:
    * distinct fact codes vs distinct dim ROWS (its `dim.distinct().count()`
    * counts whole rows, another preserved quirk). */
  def referential(name: String, fact: DataFrame, factCol: String,
      dim: DataFrame): CheckResult = {
    val factDistinct = fact.select(factCol).distinct().count()
    val dimDistinct = dim.distinct().count()
    CheckResult(s"referential_$name", factDistinct == dimDistinct,
      s"fact.$factCol distinct=$factDistinct vs dim distinct=$dimDistinct")
  }

  def runAll(
      fact: DataFrame, cityDemographics: DataFrame, countries: DataFrame,
      states: DataFrame, ports: DataFrame, travelModes: DataFrame,
      visaCategories: DataFrame): Seq[CheckResult] =
    Seq(
      nonEmpty("fact_immigrations", fact),
      nonEmpty("dim_city_demographics", cityDemographics),
      nonEmpty("dim_ports", ports),
      nonEmpty("dim_country", countries),
      nonEmpty("dim_us_state", states),
      nonEmpty("dim_visa_category", visaCategories),
      nonEmpty("dim_travel_mode", travelModes),
      referential("visa_category", fact, "visa_category_code", visaCategories),
      referential("travel_mode", fact, "travel_mode_code", travelModes),
      referential("port", fact, "port_code", ports),
      referential("country", fact, "origin_country_code", countries),
      referential("us_state", fact, "us_state_code", states))

  /** Warn mode logs failures and continues (the reference's observable
    * behavior); strict mode throws on any failed NON-EMPTY check. */
  def enforce(results: Seq[CheckResult], strict: Boolean): Unit = {
    results.filterNot(_.passed).foreach { r =>
      System.err.println(s"[quality] FAILED ${r.name}: ${r.detail}")
    }
    if (strict) {
      val fatal = results.filter(r => !r.passed && r.name.startsWith("non_empty"))
      if (fatal.nonEmpty)
        throw new QualityCheckFailure(
          fatal.map(r => s"${r.name}: ${r.detail}").mkString("; "))
    }
  }
}
