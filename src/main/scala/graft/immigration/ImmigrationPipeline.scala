package graft.immigration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** End-to-end pipeline (ref `etl.py:28-82` `main()`): load → clean →
  * star-schema build → quality checks → partitioned parquet sinks.
  *
  * One deliberate divergence from the reference: the fact DataFrame is
  * persisted before the quality checks. The reference re-executes the
  * full source DAG for every one of its 12 check actions plus the final
  * write (no `cache()` anywhere in `etl.py`); at 100 TB that is 13 scans
  * of the fact source. Behavior is identical, cost is not.
  */
object ImmigrationPipeline {

  final case class Outputs(
      fact: DataFrame, cityDemographics: DataFrame, countries: DataFrame,
      states: DataFrame, ports: DataFrame, travelModes: DataFrame,
      visaCategories: DataFrame, qualityResults: Seq[Quality.CheckResult])

  /** Build every table of the star schema (no writes, no actions). */
  def build(spark: SparkSession, cfg: ImmigrationConfig): Outputs = {
    val immigration = Cleaning.cleanImmigration(Sources.immigration(spark, cfg))
    val demographics = Cleaning.cleanDemographics(Sources.demographics(spark, cfg))
    val countries = Cleaning.cleanCountries(Sources.countries(spark, cfg))
    val ports = Cleaning.cleanPorts(Sources.ports(spark, cfg))
    val states = Cleaning.cleanStates(Sources.states(spark, cfg))
    val travelModes = Sources.travelModes(spark, cfg)
    val visaCategories = Sources.visaCategories(spark, cfg)

    val fact = StarSchema.factImmigrations(
        immigration, countries, states, ports, visaCategories, travelModes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cityDemo = StarSchema.cityDemographics(demographics, ports)

    Outputs(fact, cityDemo, countries, states, ports, travelModes,
      visaCategories, qualityResults = Nil)
  }

  /** Full run: build, check, write. Returns the built tables + check
    * results. */
  def run(spark: SparkSession, cfg: ImmigrationConfig,
      strict: Boolean = false): Outputs = {
    val o = build(spark, cfg)
    val results = Quality.runAll(o.fact, o.cityDemographics, o.countries,
      o.states, o.ports, o.travelModes, o.visaCategories)
    Quality.enforce(results, strict)

    val out = cfg.outputDir.stripSuffix("/")
    // Fact partitioned by (entry_year, entry_month, port_code) — partition
    // values render from doubles, e.g. entry_year=2016.0 (ref layout).
    o.fact.write.mode("overwrite")
      .partitionBy("entry_year", "entry_month", "port_code")
      .parquet(s"$out/fact_immigrations.parquet")
    o.cityDemographics.write.mode("overwrite")
      .partitionBy("state_code")
      .parquet(s"$out/dim_city_demographics.parquet")
    o.countries.write.mode("overwrite").parquet(s"$out/dim_country.parquet")
    o.states.write.mode("overwrite").parquet(s"$out/dim_us_state.parquet")
    o.ports.write.mode("overwrite").parquet(s"$out/dim_ports.parquet")
    o.travelModes.write.mode("overwrite").parquet(s"$out/dim_travel_mode.parquet")
    o.visaCategories.write.mode("overwrite").parquet(s"$out/dim_visa_category.parquet")

    o.copy(qualityResults = results)
  }
}

/** CLI entry: `runMain graft.immigration.ImmigrationPipeline <outDir>`. */
object ImmigrationPipelineMain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_immigration_out")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = ImmigrationPipeline.run(spark, ImmigrationConfig.reference(outDir))
    println(s"fact rows: ${o.fact.count()}")
    o.qualityResults.foreach(r =>
      println(f"${if (r.passed) "PASS" else "FAIL"}%s ${r.name}%-28s ${r.detail}"))
    spark.stop()
  }
}
