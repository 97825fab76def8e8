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
}
