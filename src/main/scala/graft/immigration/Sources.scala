package graft.immigration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Input paths for one pipeline run (ref `capstone.cfg`). */
final case class ImmigrationConfig(
    i94ParquetDir: String,
    demographicsCsv: String,
    sasLabelsFile: String,
    outputDir: String)

object ImmigrationConfig {
  /** The bundled April-2016 dataset of the reference repo. */
  def reference(outputDir: String): ImmigrationConfig = ImmigrationConfig(
    i94ParquetDir = "/root/reference/data/input/sas_data",
    demographicsCsv = "/root/reference/data/input/us-cities-demographics.csv",
    sasLabelsFile = "/root/reference/data/I94_SAS_Labels_Descriptions.SAS",
    outputDir = outputDir)
}

/** Sources of the immigration star schema (ref `etl.py:128-228`).
  *
  * The sas7bdat path of the reference needs a third-party reader that is
  * not resolvable offline; parquet — the reference's own fallback
  * (`etl.py:136-138`) — is the supported format. The five dimension
  * tables come from the driver-side [[SasLabels]] parse; at 3–660 rows
  * each they are local-collection sources and later broadcast-join sides.
  */
object Sources {

  /** Explicit 12-field demographics CSV schema (ref `etl.py:143-158`). */
  val demographicsSchema: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("median_age", DoubleType),
    StructField("male_population", IntegerType),
    StructField("female_population", IntegerType),
    StructField("total_population", IntegerType),
    StructField("number_of_veterans", IntegerType),
    StructField("foreign_born", IntegerType),
    StructField("average_household_size", DoubleType),
    StructField("state_code", StringType),
    StructField("race", StringType),
    StructField("count", IntegerType)))

  def immigration(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    spark.read.parquet(cfg.i94ParquetDir)

  def demographics(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    spark.read.option("sep", ";").option("header", "true")
      .schema(demographicsSchema).csv(cfg.demographicsCsv)

  private def dim(
      spark: SparkSession, cfg: ImmigrationConfig, label: String,
      codeCol: String, nameCol: String): DataFrame = {
    val pairs = SasLabels.parseFile(cfg.sasLabelsFile, label)
    import spark.implicits._
    pairs.toDF(codeCol, nameCol)
  }

  def countries(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    dim(spark, cfg, "I94RES", "country_code", "country_name")

  def ports(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    dim(spark, cfg, "I94PORT", "port_code", "port_name")

  def states(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    dim(spark, cfg, "I94ADDR", "state_code", "state_name")

  def travelModes(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    dim(spark, cfg, "I94MODE", "mode_id", "mode_name")

  def visaCategories(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    dim(spark, cfg, "I94VISA", "visa_category_id", "visa_category")
}
