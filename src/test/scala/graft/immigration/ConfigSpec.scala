package graft.immigration

import java.nio.file.Files

import graft.SparkTestBase

class ConfigSpec extends SparkTestBase {

  test("fromIni parses the reference's capstone.cfg shape") {
    val cfg = ImmigrationConfig.fromIni("/root/reference/capstone.cfg")
    assert(cfg.i94ParquetDir === "data/input/sas_data/")
    assert(cfg.demographicsCsv === "data/input/us-cities-demographics.csv")
    assert(cfg.sasLabelsFile === "data/I94_SAS_Labels_Descriptions.SAS")
    assert(cfg.outputDir === "data/output/")
    assert(cfg.i94SasFile ===
      Some("../../data/18-83510-I94-Data-2016/i94_apr16_sub.sas7bdat"))
  }

  test("fromIni: comments and section headers are skipped, overrides apply") {
    val f = Files.createTempFile("graft-cfg-", ".cfg")
    Files.writeString(f,
      """[DATA]
        |# a comment
        |; another
        |I94_LOCAL_DATA_DIR=/x/parquet
        |SAS_LABELS_DESCRIPTION_FILE_PATH=/x/labels.SAS
        |SUPPLEMENTARY_DATASETS_DIR=/x/
        |[COMMON]
        |NUM_SPARK_SHUFFLE_PARTITIONS=50
        |""".stripMargin)
    val cfg = ImmigrationConfig.fromIni(f.toString, Some("/tmp/o"))
    assert(cfg.i94ParquetDir === "/x/parquet")
    assert(cfg.demographicsCsv === "/x/us-cities-demographics.csv")
    assert(cfg.outputDir === "/tmp/o")
    assert(cfg.i94SasFile === None)
  }

  test("immigration source falls back to parquet when the sas file is absent") {
    val cfg = ImmigrationConfig.reference("/tmp/unused")
      .copy(i94SasFile = Some("/nonexistent/i94.sas7bdat"))
    val df = Sources.immigration(spark, cfg) // must NOT try the sas format
    assert(df.columns.contains("i94yr"))
    assert(df.count() === 3096313L)
  }

  test("fromIni: a SUPPLEMENTARY_DATASETS_DIR without trailing slash still joins the path") {
    val f = Files.createTempFile("graft-cfg-", ".cfg")
    Files.writeString(f,
      """I94_LOCAL_DATA_DIR=/x/parquet
        |SAS_LABELS_DESCRIPTION_FILE_PATH=/x/labels.SAS
        |SUPPLEMENTARY_DATASETS_DIR=/x/data
        |""".stripMargin)
    val cfg = ImmigrationConfig.fromIni(f.toString, Some("/tmp/o"))
    assert(cfg.demographicsCsv === "/x/data/us-cities-demographics.csv")
  }

  test("immigration source loads THROUGH the sas format when the raw file exists") {
    // The saurfang jar is offline-unresolvable, so a test-classpath stub
    // under the same package name (com.github.saurfang.sas.spark
    // .DefaultSource — reads the path as parquet) stands in for the
    // decoder. The sas file and the parquet fallback carry DIFFERENT
    // rows; getting the sas rows back proves the preference branch and
    // the format-string resolution executed live, not just compiled.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sas-live-")
    val sasPath = dir.resolve("i94_apr16_sub.sas7bdat").toString
    val pqDir = dir.resolve("pq").toString
    Seq((1.0, 101.0), (2.0, 102.0)).toDF("cicid", "i94res")
      .write.parquet(sasPath)
    Seq((9.0, 999.0)).toDF("cicid", "i94res").write.parquet(pqDir)
    val cfg = ImmigrationConfig(
      i94ParquetDir = pqDir, demographicsCsv = "", sasLabelsFile = "",
      outputDir = "/tmp/unused", i94SasFile = Some(sasPath))
    val got = Sources.immigration(spark, cfg)
      .select("cicid").as[Double].collect().toSet
    assert(got === Set(1.0, 2.0)) // sas rows, not the parquet fallback's
  }
}
