package graft.immigration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Star-schema builders (ref `etl.py:278-357`).
  *
  * The reference writes five LEFT JOINs over temp views and then
  * null-filters the dim keys, relying on Catalyst's EliminateOuterJoin to
  * get inner joins back; we declare the inner broadcast joins directly —
  * same semantics (every filtered key is a join key), explicit plan. The
  * 3.1M-row fact side never shuffles: every dim is 3–660 rows and
  * explicitly `broadcast()`. String-vs-double key coercions of the
  * reference are explicit casts here (ANSI-safe: every dim code is
  * numeric-parsable, verified by the SasLabels golden tests).
  */
object StarSchema {

  /** fact_immigrations (ref `etl.py:292-323`): 19-column projection with
    * renames; inner-joins the five dims; drops rows missing any dim key. */
  def factImmigrations(
      immigration: DataFrame, countries: DataFrame, states: DataFrame,
      ports: DataFrame, visaCategories: DataFrame, travelModes: DataFrame): DataFrame =
    // Key-column-only dim projections: avoids name collisions (cleaned
    // ports carry their own city/state_code) while preserving row
    // multiplicity, so join cardinality matches the reference exactly.
    immigration
      .join(broadcast(countries.select("country_code")),
        col("country_code").cast("double") === col("i94res"))
      .join(broadcast(ports.select("port_code")),
        col("port_code") === col("i94port"))
      .join(broadcast(states.select("state_code")),
        col("state_code") === col("i94addr"))
      .join(broadcast(visaCategories.select("visa_category_id")),
        col("visa_category_id").cast("double") === col("i94visa"))
      .join(broadcast(travelModes.select("mode_id")),
        col("mode_id").cast("double") === col("i94mode"))
      .select(
        col("cicid"),
        col("i94yr").as("entry_year"),
        col("i94mon").as("entry_month"),
        col("country_code").as("origin_country_code"),
        col("port_code"),
        col("arrdate").as("arrival_date"),
        col("mode_id").as("travel_mode_code"),
        col("state_code").as("us_state_code"),
        col("depdate").as("departure_date"),
        col("i94bir").as("age"),
        col("visa_category_id").as("visa_category_code"),
        col("occup").as("occupation"),
        col("gender"),
        col("biryear").as("birth_year"),
        col("dtaddto").as("entry_date"),
        col("airline"),
        col("admnum").as("admission_number"),
        col("fltno").as("flight_number"),
        col("visatype").as("visa_type"))

  /** dim_city_demographics (ref `etl.py:328-357`): race-level rows rolled
    * up to city level (SUM over int widens to long), then joined to
    * cleaned ports case-insensitively on city + state. */
  def cityDemographics(demographics: DataFrame, ports: DataFrame): DataFrame = {
    val combined = demographics
      .groupBy("city", "state_code")
      .agg(
        sum("male_population").as("male_population"),
        sum("female_population").as("female_population"),
        sum("total_population").as("total_population"),
        sum("number_of_veterans").as("number_of_veterans"),
        sum("foreign_born").as("num_foreign_born"))
    ports.as("sp")
      .join(broadcast(combined.as("cd")),
        lower(col("cd.city")) === lower(col("sp.city")) &&
          col("cd.state_code") === col("sp.state_code"))
      .select(col("sp.port_code").as("port_code"),
        col("cd.city"), col("cd.state_code"),
        col("cd.male_population"), col("cd.female_population"),
        col("cd.total_population"), col("cd.number_of_veterans"),
        col("cd.num_foreign_born"))
  }
}
