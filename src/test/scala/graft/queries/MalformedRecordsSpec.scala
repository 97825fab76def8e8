package graft.queries

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dirty-input contract of the CSV scan path: a 100 TB crawl ingest WILL
  * meet rows that don't parse, and the engine must offer all three
  * stances — keep with nulls + captured raw text (PERMISSIVE, the
  * audit-friendly default), silently drop (DROPMALFORMED), or refuse
  * the batch (FAILFAST). Pinned here because the oracle-checked s3
  * roundtrip only ever sees clean data. */
class MalformedRecordsSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-badcsv-").toString
    Files.write(Paths.get(d, "rows.csv"),
      ("""id;name;val
         |1;alpha;1.5
         |2;beta;2.5
         |oops;gamma;3.5
         |4;delta;not_a_number
         |""".stripMargin).getBytes("UTF-8"))
    d
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("val", DoubleType),
    StructField("_corrupt", StringType)))

  private def read(mode: String) = spark.read
    .option("sep", ";").option("header", "true")
    .option("mode", mode)
    .option("columnNameOfCorruptRecord", "_corrupt")
    .schema(schema)
    .csv(dir)

  test("PERMISSIVE keeps every row, nulls bad fields, captures raw text") {
    val rows = read("PERMISSIVE").cache()
    assert(rows.count() == 4)
    val corrupt = rows.where(col("_corrupt").isNotNull)
    assert(corrupt.count() == 2)
    // the raw line survives for quarantine/audit
    assert(corrupt.where(col("_corrupt").contains("oops")).count() == 1)
    // well-typed fields of a corrupt row are nulled, not guessed
    assert(rows.where(col("id") === 4).select("val").head().isNullAt(0))
  }

  test("DROPMALFORMED keeps only fully-parsed rows — and malformedness " +
      "is judged on the PRUNED column set") {
    val df = spark.read
      .option("sep", ";").option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.dropRight(1)))
      .csv(dir)
    // full-row read: both bad rows drop
    val full = df.collect().map(_.getInt(0)).toSet
    assert(full === Set(1, 2))
    // the quirk every pipeline author trips over: CSV column pruning
    // means a projection that never touches the bad field never PARSES
    // it — the row isn't malformed "as read" and survives. Pushdown
    // changes row counts under DROPMALFORMED; audits must read all
    // columns (or use PERMISSIVE + corrupt capture, which is stable).
    val pruned = df.select("id").collect().map(_.getInt(0)).toSet
    assert(pruned === Set(1, 2, 4))
  }

  test("FAILFAST refuses the scan on the first bad row") {
    intercept[SparkException] {
      read("FAILFAST").drop("_corrupt").collect()
    }
  }
}
