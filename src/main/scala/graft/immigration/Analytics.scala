package graft.immigration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The three published analytics queries (ref notebook cells 45-47).
  *
  * Shape preserved exactly: top-10 derived table FIRST (Spark plans the
  * `ORDER BY cnt DESC LIMIT 10` as TakeOrderedAndProject — per-partition
  * heap, no global sort), THEN the broadcast join to the dim for display
  * columns, then the outer re-sort. Joining before limiting would change
  * results (dims don't cover all keys), so LIMIT-before-join is
  * semantics, not just a plan choice.
  */
object Analytics {

  /** Q1: most-visited cities in a month (ref `:1386-1410`). Output columns
    * `port_code, immigrant_visits, city, state_code, total_population`. */
  def mostVisitedCities(fact: DataFrame, cityDemographics: DataFrame,
      month: Int = 4): DataFrame = {
    val top = fact.where(col("entry_month") === month)
      .groupBy("port_code").agg(count(lit(1)).as("immigrant_visits"))
      .orderBy(desc("immigrant_visits")).limit(10)
    top.join(broadcast(cityDemographics.select(
        col("port_code"), col("city"), col("state_code"),
        col("total_population"))), Seq("port_code"))
      .select(col("port_code"), col("immigrant_visits"), col("city"),
        col("state_code"), col("total_population"))
      .orderBy(desc("immigrant_visits"))
  }

  /** Q2: top origin countries, all visitors (ref `:1437-1456`). */
  def topOriginCountries(fact: DataFrame, countries: DataFrame): DataFrame = {
    val top = fact.groupBy("origin_country_code")
      .agg(count(lit(1)).as("country_visitors"))
      .orderBy(desc("country_visitors")).limit(10)
    top.join(broadcast(countries),
        col("origin_country_code") === col("country_code"))
      .orderBy(desc("country_visitors"))
  }

  /** Q3: top origin countries of students — visa category 3
    * (ref `:1484-1503`; the string-vs-int comparison made explicit). */
  def topStudentOriginCountries(fact: DataFrame, countries: DataFrame): DataFrame = {
    val top = fact.where(col("visa_category_code").cast("int") === 3)
      .groupBy("origin_country_code")
      .agg(count(lit(1)).as("student_visitors"))
      .orderBy(desc("student_visitors")).limit(10)
    top.join(broadcast(countries),
        col("origin_country_code") === col("country_code"))
      .orderBy(desc("student_visitors"))
  }

  /** The reference's SQL entry point (notebook cell 31 + `spark.sql`):
    * registers the star schema under the published view names so the
    * verbatim notebook queries run unchanged. */
  def registerViews(o: ImmigrationPipeline.Outputs): Unit = {
    o.fact.createOrReplaceTempView("fact_immigrations")
    o.cityDemographics.createOrReplaceTempView("dim_city_demographics")
    o.countries.createOrReplaceTempView("dim_country")
    o.states.createOrReplaceTempView("dim_us_state")
    o.ports.createOrReplaceTempView("dim_ports")
    o.visaCategories.createOrReplaceTempView("dim_visa_category")
    o.travelModes.createOrReplaceTempView("dim_travel_mode")
  }

  /** Q1-Q3 as the notebook's verbatim SQL (ref cells 45-47). Requires
    * [[registerViews]]. Plans are the same TakeOrderedAndProject +
    * broadcast-join shapes as the typed builders. */
  val q1Sql: String = """
    SELECT tvc.port_code, tvc.immigrant_visits, dcd.city, dcd.state_code,
           dcd.total_population
    FROM (SELECT fi.port_code AS port_code, COUNT(*) AS immigrant_visits
          FROM fact_immigrations fi
          WHERE fi.entry_month = 4
          GROUP BY fi.port_code
          ORDER BY immigrant_visits DESC
          LIMIT 10) AS tvc
    JOIN dim_city_demographics dcd ON dcd.port_code = tvc.port_code
    ORDER BY tvc.immigrant_visits DESC"""

  val q2Sql: String = """
    SELECT *
    FROM (SELECT fi.origin_country_code AS origin_country_code,
                 COUNT(*) AS country_visitors
          FROM fact_immigrations fi
          GROUP BY fi.origin_country_code
          ORDER BY country_visitors DESC
          LIMIT 10) AS tcv
    JOIN dim_country dc ON tcv.origin_country_code = dc.country_code
    ORDER BY country_visitors DESC"""

  val q3Sql: String = """
    SELECT *
    FROM (SELECT fi.origin_country_code AS origin_country_code,
                 COUNT(*) AS student_visitors
          FROM fact_immigrations fi
          WHERE visa_category_code = 3
          GROUP BY fi.origin_country_code
          ORDER BY student_visitors DESC
          LIMIT 10) AS tcv
    JOIN dim_country dc ON tcv.origin_country_code = dc.country_code
    ORDER BY student_visitors DESC"""
}
