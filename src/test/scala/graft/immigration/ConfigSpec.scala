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

  test("immigration source selects the sas7bdat format when the raw file exists") {
    // The third-party reader jar is not resolvable offline, so the sas
    // branch must be observed via the data-source lookup failing ON THE
    // SAS FORMAT (proving the branch fired) rather than a successful read.
    val f = Files.createTempFile("graft-i94-", ".sas7bdat")
    val cfg = ImmigrationConfig.reference("/tmp/unused")
      .copy(i94SasFile = Some(f.toString))
    val err = intercept[Throwable](Sources.immigration(spark, cfg))
    val chain = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(e => s"${e.getClass.getName}: ${e.getMessage}").mkString("\n")
    assert(chain.contains(Sources.SasFormat))
  }
}
