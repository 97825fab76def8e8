package graft.immigration

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** End-to-end golden test against the reference's bundled April-2016
  * dataset (read-only at /root/reference/data). Every number here is a
  * published value from the reference notebook / README images —
  * see BASELINE.md.
  */
class ImmigrationE2ESpec extends SparkTestBase {

  private lazy val cfg =
    ImmigrationConfig.reference("/tmp/graft_e2e_unused")
  private lazy val o = ImmigrationPipeline.build(spark, cfg)

  test("dimension cardinalities match the reference") {
    assert(o.countries.count() === 289)
    assert(o.ports.count() === 583)        // cleaned, as etl.py writes
    assert(o.states.count() === 54)        // 55 raw minus the '99' row
    assert(o.visaCategories.count() === 3)
    assert(o.travelModes.count() === 4)
  }

  test("fact_immigrations row count matches notebook cell 32") {
    assert(o.fact.count() === 2823272L)
  }

  test("dim_city_demographics has 113 rows (588 city-level groups)") {
    assert(o.cityDemographics.count() === 113)
    val groups = Cleaning.cleanDemographics(Sources.demographics(spark, cfg))
      .groupBy("city", "state_code").count()
    assert(groups.count() === 588)
  }

  private def rows(df: DataFrame, cols: (Int, Int)): Seq[(String, Long)] =
    df.collect().map(r => (r.getString(cols._1), r.getLong(cols._2))).toSeq

  test("Q1 most-visited cities (April) matches the golden image") {
    val q1 = Analytics.mostVisitedCities(o.fact, o.cityDemographics)
    val got = rows(q1, (0, 1))
    assert(got.take(8) === Seq(
      "NYC" -> 470975L, "MIA" -> 326916L, "LOS" -> 290262L,
      "SFR" -> 148239L, "ORL" -> 143991L, "CHI" -> 125484L,
      "HOU" -> 95175L, "FTL" -> 91217L))
    assert(got.size === 8) // only 8 of the top-10 ports survive the join
  }

  test("Q2 top origin countries matches the golden image") {
    val q2 = Analytics.topOriginCountries(o.fact, o.countries)
    val got = rows(q2.select("origin_country_code", "country_visitors"), (0, 1))
    assert(got === Seq(
      "135" -> 339928L, "209" -> 230840L, "111" -> 175445L,
      "582" -> 163778L, "245" -> 159887L, "112" -> 146230L,
      "689" -> 128960L, "276" -> 116534L, "438" -> 99731L,
      "213" -> 87988L))
  }

  test("Q3 top student origin countries matches the golden image") {
    val q3 = Analytics.topStudentOriginCountries(o.fact, o.countries)
    val got = rows(q3.select("origin_country_code", "student_visitors"), (0, 1))
    assert(got === Seq(
      "245" -> 9760L, "213" -> 2683L, "276" -> 2498L,
      "209" -> 2157L, "582" -> 1817L, "689" -> 1677L,
      "261" -> 1425L, "268" -> 1060L, "696" -> 890L,
      "691" -> 756L))
  }

  test("SQL twins: the notebook's verbatim queries match the typed builders") {
    Analytics.registerViews(o)
    val sqlQ1 = spark.sql(Analytics.q1Sql)
      .select("port_code", "immigrant_visits").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val typedQ1 = Analytics.mostVisitedCities(o.fact, o.cityDemographics)
      .select("port_code", "immigrant_visits").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlQ1 === typedQ1)

    val sqlQ3 = spark.sql(Analytics.q3Sql)
      .select("origin_country_code", "student_visitors").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val typedQ3 = Analytics.topStudentOriginCountries(o.fact, o.countries)
      .select("origin_country_code", "student_visitors").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlQ3 === typedQ3)
  }

  test("quality checks: non-empty all pass; referential report as reference") {
    val results = Quality.runAll(o.fact, o.cityDemographics, o.countries,
      o.states, o.ports, o.travelModes, o.visaCategories)
    assert(results.filter(_.name.startsWith("non_empty")).forall(_.passed))
    // The reference's referential check is satisfied only for visa + mode
    // (every category/mode occurs in April 2016); ports/countries/states
    // have unvisited codes — the reference's un-raised checks "fail"
    // silently there, and we report the same outcome.
    val ref = results.filter(_.name.startsWith("referential"))
      .map(r => r.name -> r.passed).toMap
    assert(ref("referential_visa_category"))
    assert(ref("referential_travel_mode"))
    assert(!ref("referential_port"))
    assert(!ref("referential_country"))
  }

  test("CONVERT adopts the pipeline's own three-level fact layout") {
    import org.apache.spark.sql.functions.col
    // the reference's real K1 output shape: the 2.8M-row fact written
    // partitionBy(entry_year, entry_month, port_code) — exactly what a
    // migrating user would point CONVERT TO TXTABLE at
    val dir = java.nio.file.Files
      .createTempDirectory("graft-e2e-conv-").toString + "/fact"
    val total = o.fact.count()
    o.fact.write.partitionBy("entry_year", "entry_month", "port_code")
      .parquet(dir)
    val t = graft.ops.TxTable.convert(spark, dir)
    // wholesale adoption: every row, zero bytes rewritten
    assert(t.read().count() === total)
    assert(t.snapshot().files.forall { f =>
      val s = f.stripPrefix(s"$dir/").split('/')
      s.length == 4 && s(0).startsWith("entry_year=") &&
        s(1).startsWith("entry_month=") && s(2).startsWith("port_code=")
    })
    // manifest-pruned leaf read over the adopted files equals the
    // declarative filter (NYC, the golden Q1 port)
    val nyc = o.fact.where(col("port_code") === "NYC").count()
    assert(nyc > 0)
    assert(t.readPartitions(Seq("port_code" -> "NYC")).count() === nyc)
    // and transactional DML works immediately over the adopted lake
    t.deleteWhere("port_code", "NYC")
    assert(t.read().count() === total - nyc)
  }
}
