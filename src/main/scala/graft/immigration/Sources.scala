package graft.immigration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Input paths for one pipeline run (ref `capstone.cfg`). */
final case class ImmigrationConfig(
    i94ParquetDir: String,
    demographicsCsv: String,
    sasLabelsFile: String,
    outputDir: String,
    /** Raw monthly .sas7bdat file — preferred when it exists, exactly as
      * the reference prefers it over the parquet fallback
      * (`etl.py:128-138`). */
    i94SasFile: Option[String] = None)

object ImmigrationConfig {
  /** The bundled April-2016 dataset of the reference repo. */
  def reference(outputDir: String): ImmigrationConfig = ImmigrationConfig(
    i94ParquetDir = "/root/reference/data/input/sas_data",
    demographicsCsv = "/root/reference/data/input/us-cities-demographics.csv",
    sasLabelsFile = "/root/reference/data/I94_SAS_Labels_Descriptions.SAS",
    outputDir = outputDir)

  /** Loads an INI config in the reference's `capstone.cfg` shape
    * (`[DATA]` section; see `capstone.cfg:1-9`). Section headers are
    * flattened away; `#`/`;`-prefixed lines are comments. */
  def fromIni(path: String, outputDirOverride: Option[String] = None): ImmigrationConfig = {
    val src = scala.io.Source.fromFile(path)
    val kv: Map[String, String] =
      try src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("[") &&
          !l.startsWith("#") && !l.startsWith(";"))
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k.trim.toUpperCase -> v.trim)
            case _ => None
          }
        }.toMap
      finally src.close()
    val supp = kv.getOrElse("SUPPLEMENTARY_DATASETS_DIR", "")
    // join with an explicit separator: a dir value without a trailing
    // slash must not produce ".../dataus-cities-demographics.csv";
    // empty supp keeps the path relative (the reference's default)
    val demographics =
      if (supp.isEmpty) "us-cities-demographics.csv"
      else supp.stripSuffix("/") + "/us-cities-demographics.csv"
    ImmigrationConfig(
      i94ParquetDir = kv("I94_LOCAL_DATA_DIR"),
      demographicsCsv = demographics,
      sasLabelsFile = kv("SAS_LABELS_DESCRIPTION_FILE_PATH"),
      outputDir = outputDirOverride.getOrElse(kv.getOrElse("OUTPUT_DATA_DIR", "/tmp/graft_out")),
      i94SasFile = kv.get("I94_DATA_FILE_PATH"))
  }
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

  /** Third-party sas7bdat DataSource format name (`etl.py:89,135`). The
    * package is not resolvable in an offline build, so the format string
    * is data, not a dependency — it resolves only when the jar is on the
    * cluster classpath. */
  val SasFormat = "com.github.saurfang.sas.spark"

  /** Built-in pure-Scala sas7bdat reader
    * ([[graft.sources.sas.Sas7bdat]]) — the offline fallback decoder. */
  val BuiltinSasFormat = "graft.sources.sas"

  /** I94 source with the reference's own preference order: the raw
    * monthly .sas7bdat when present (S1), else the parquet extract (S2,
    * `etl.py:128-138`). The sas branch prefers the reference's
    * third-party reader when its jar is on the classpath and falls back
    * to the engine's built-in decoder, so the branch works in an
    * offline deployment too. */
  def immigration(spark: SparkSession, cfg: ImmigrationConfig): DataFrame =
    cfg.i94SasFile match {
      case Some(f) if new java.io.File(f).exists() =>
        try spark.read.format(SasFormat).load(f)
        catch {
          // lookupDataSource throws when the third-party jar is absent
          case _: ClassNotFoundException | _: NoClassDefFoundError =>
            spark.read.format(BuiltinSasFormat).load(f)
        }
      case _ => spark.read.parquet(cfg.i94ParquetDir)
    }

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
