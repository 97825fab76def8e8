package graft.sources.sas

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.SparkTestBase
import graft.immigration.{Cleaning, ImmigrationConfig, Sources}

/** The built-in sas7bdat decoder against a REAL binary fixture
  * (April-2016 I94 column shape, written by [[SasFixtureWriter]] in the
  * same public uncompressed 32-bit LE layout [[Sas7bdat]] documents):
  * golden schema + values, null encodings (NaN numeric, all-blank
  * char), truncated-width numerics, multi-page decode, bad-magic
  * rejection — and the whole thing loaded END-TO-END through
  * `Sources.immigration`'s sas-preference branch. */
class Sas7bdatReaderSpec extends SparkTestBase {

  import SasFixtureWriter.Col

  // April-2016 monthly extract shape (the reference's i94 columns):
  // numerics as SAS doubles, codes/flags as fixed-width chars, plus one
  // truncated-width numeric (SAS compresses small ints this way).
  private val cols = Seq(
    Col("cicid", isNumeric = true, 8), Col("i94yr", isNumeric = true, 8),
    Col("i94mon", isNumeric = true, 8), Col("i94cit", isNumeric = true, 8),
    Col("i94res", isNumeric = true, 8), Col("i94port", isNumeric = false, 3),
    Col("arrdate", isNumeric = true, 8), Col("i94mode", isNumeric = true, 8),
    Col("i94addr", isNumeric = false, 3), Col("depdate", isNumeric = true, 8),
    Col("i94bir", isNumeric = true, 8), Col("i94visa", isNumeric = true, 8),
    Col("count", isNumeric = true, 4), // truncated width
    Col("biryear", isNumeric = true, 8), Col("gender", isNumeric = false, 1),
    Col("airline", isNumeric = false, 3), Col("admnum", isNumeric = true, 8),
    Col("fltno", isNumeric = false, 5), Col("visatype", isNumeric = false, 3))

  // 60 rows → 4 data pages at the writer's page size (multi-page path).
  // arrdate 20554.0 = 2016-04-10; row 1 carries the 0.0-date quirk and
  // a null depdate; row 2 is all-blank strings → nulls.
  private def mkRow(i: Int): Seq[Any] = Seq(
    1000.0 + i, 2016.0, 4.0, 135.0, 135.0,
    if (i % 20 == 2) null else "NYC",
    if (i % 20 == 1) 0.0 else 20554.0 + (i % 7),
    1.0,
    if (i % 20 == 2) null else "NY",
    if (i % 20 == 1) null else 20560.0 + (i % 7),
    35.0, 2.0, 1.0, 1981.0 + (i % 5),
    if (i % 2 == 0) "M" else "F",
    "AA", 1.0e10 + i, "00123", "B2")
  private val rows = (0 until 60).map(mkRow)

  private def writeFixture(
      u64: Boolean = false, rle: Boolean = false,
      rdc: Boolean = false, bigEndian: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft-sas-fixture-")
    val path = s"$dir/i94_apr16_sub.sas7bdat"
    SasFixtureWriter.write(path, cols, rows, u64 = u64, rle = rle,
      rdc = rdc, bigEndian = bigEndian)
    path
  }

  for (u64 <- Seq(false, true)) {
    val variant = if (u64) "u64" else "32-bit"

    test(s"[big-endian $variant] golden values roundtrip, truncated numerics included") {
      val path = writeFixture(u64, bigEndian = true)
      val meta = Sas7bdat.readMeta(path)
      assert(meta.bigEndian)
      val df = spark.read.format(Sources.BuiltinSasFormat).load(path)
      assert(df.count() === 60)
      val got = df.orderBy("cicid").collect()
      rows.indices.foreach { i =>
        cols.indices.foreach { j =>
          assert(got(i).get(j) === rows(i)(j),
            s"row $i col ${cols(j).name}")
        }
      }
    }
  }

  test("[big-endian] RDC-compressed rows golden-decode") {
    val path = writeFixture(rdc = true, bigEndian = true)
    val meta = Sas7bdat.readMeta(path)
    assert(meta.rdc && meta.bigEndian)
    val df = spark.read.format(Sources.BuiltinSasFormat).load(path)
    assert(df.count() === 60)
    assert(df.orderBy("cicid").head().getDouble(0) === 1000.0)
  }

  for (u64 <- Seq(false, true)) {
    val variant = if (u64) "u64" else "32-bit"

    test(s"[$variant] golden schema: names in order, numeric→double, char→string") {
      val df = spark.read.format(Sources.BuiltinSasFormat)
        .load(writeFixture(u64))
      assert(df.schema.fields.map(_.name).toSeq === cols.map(_.name))
      assert(df.schema.fields.map(_.dataType).toSeq ===
        cols.map(c => if (c.isNumeric) DoubleType else StringType))
    }

    test(s"[$variant] golden values roundtrip exactly, including nulls and truncated numerics") {
      val df = spark.read.format(Sources.BuiltinSasFormat)
        .load(writeFixture(u64))
      assert(df.count() === 60)
      val got = df.orderBy("cicid").collect()
      rows.indices.foreach { i =>
        val r = got(i)
        cols.indices.foreach { j =>
          assert(r.get(j) === rows(i)(j),
            s"row $i col ${cols(j).name}: ${r.get(j)} vs ${rows(i)(j)}")
        }
      }
    }

    test(s"[$variant] multi-page: rows split across several data pages") {
      val meta = Sas7bdat.readMeta(writeFixture(u64))
      assert(meta.u64 === u64)
      assert(meta.pageCount > 2, "fixture should span multiple data pages")
      assert(meta.rowCount === 60)
    }
  }

  for (u64 <- Seq(false, true)) {
    val variant = if (u64) "u64" else "32-bit"

    test(s"[$variant] RLE (SASYZCRL) fixture golden-decodes through the preference branch") {
      val path = writeFixture(u64, rle = true)
      val meta = Sas7bdat.readMeta(path)
      assert(meta.rle, "compression marker should be detected")
      val df = spark.read.format(Sources.BuiltinSasFormat).load(path)
      assert(df.count() === 60)
      val got = df.orderBy("cicid").collect()
      rows.indices.foreach { i =>
        val r = got(i)
        cols.indices.foreach { j =>
          assert(r.get(j) === rows(i)(j),
            s"row $i col ${cols(j).name}: ${r.get(j)} vs ${rows(i)(j)}")
        }
      }
    }
  }

  for (u64 <- Seq(false, true)) {
    val variant = if (u64) "u64" else "32-bit"

    test(s"[$variant] RDC (SASYZCR2) fixture golden-decodes through the preference branch") {
      val path = writeFixture(u64, rdc = true)
      val meta = Sas7bdat.readMeta(path)
      assert(meta.rdc, "RDC compression marker should be detected")
      assert(!meta.rle)
      val df = spark.read.format(Sources.BuiltinSasFormat).load(path)
      assert(df.count() === 60)
      val got = df.orderBy("cicid").collect()
      rows.indices.foreach { i =>
        val r = got(i)
        cols.indices.foreach { j =>
          assert(r.get(j) === rows(i)(j),
            s"row $i col ${cols(j).name}: ${r.get(j)} vs ${rows(i)(j)}")
        }
      }
    }
  }

  test("RDC codec roundtrips arbitrary byte patterns, runs and back-references included") {
    val rnd = new scala.util.Random(7)
    val abab = Array.tabulate[Byte](80)(i => if (i % 2 == 0) 'a' else 'b')
    val patterns = Seq(
      Array.fill[Byte](100)(0),                   // long run
      Array.fill[Byte](10)(' '),                  // short run
      abab,                                       // short-offset back-refs
      (abab ++ Array.fill[Byte](5)('x') ++ abab), // long back-ref re-use
      Array.tabulate[Byte](300)(i => (i % 97).toByte), // literal-heavy
      Array.fill(500)(rnd.nextInt(3).toByte),     // mixed short runs
      (Array.fill[Byte](20)(9) ++ Array.tabulate[Byte](40)(_.toByte)
        ++ Array.fill[Byte](4200)(' ') ++ Array.fill[Byte](2)(1)),
      Array.emptyByteArray)
    patterns.zipWithIndex.foreach { case (p, i) =>
      val comp = SasFixtureWriter.rdcCompress(p)
      val back = Sas7bdat.rdcDecompress(comp, 0, comp.length, p.length)
      assert(back.toSeq === p.toSeq, s"pattern $i failed roundtrip")
    }
  }

  test("RLE codec roundtrips arbitrary byte patterns, runs included") {
    val rnd = new scala.util.Random(42)
    val patterns = Seq(
      Array.fill[Byte](100)(0),                  // all zeros
      Array.fill[Byte](50)(' '),                 // all blanks
      Array.fill[Byte](30)(7),                   // arbitrary byte run
      Array.tabulate[Byte](200)(i => i.toByte),  // no runs at all
      Array.fill(300)(rnd.nextInt(4).toByte),    // mixed short runs
      (Array.fill[Byte](20)(0) ++ Array.tabulate[Byte](70)(i => i.toByte)
        ++ Array.fill[Byte](4200)(' ') ++ Array.fill[Byte](19)(3)),
      Array.emptyByteArray)
    patterns.zipWithIndex.foreach { case (p, i) =>
      val comp = SasFixtureWriter.rleCompress(p)
      val back = Sas7bdat.rleDecompress(comp, 0, comp.length, p.length)
      assert(back.toSeq === p.toSeq, s"pattern $i failed roundtrip")
    }
  }

  test("an RDC marker on plain data pages detects but does not disturb row decode") {
    // marker planted on an UNCOMPRESSED fixture: data-page rows decode
    // by position regardless of the compression flag, so the values
    // must be untouched (only subheader-stored rows decompress)
    val path = writeFixture()
    SasFixtureWriter.plantRdcMarker(path)
    val meta = Sas7bdat.readMeta(path)
    assert(meta.rdc)
    val df = spark.read.format(Sources.BuiltinSasFormat).load(path)
    assert(df.count() === 60)
    assert(df.orderBy("cicid").head().getDouble(0) === 1000.0)
  }

  test("bad magic is rejected, not misparsed") {
    val path = writeFixture()
    SasFixtureWriter.corruptMagic(path)
    val e = intercept[IllegalArgumentException](Sas7bdat.readMeta(path))
    assert(e.getMessage.contains("bad magic"))
    assert(!Sas7bdat.looksLikeSas(path))
  }

  test("Sources.immigration loads the binary fixture through the sas-preference branch") {
    val path = writeFixture()
    val cfg = ImmigrationConfig(
      i94ParquetDir = "/nonexistent-parquet-dir",
      demographicsCsv = "unused", sasLabelsFile = "unused",
      outputDir = "/tmp/unused", i94SasFile = Some(path))
    val df = Sources.immigration(spark, cfg)
    // branch proof: the parquet fallback path does not exist, so these
    // rows can only have come through the sas branch
    assert(df.count() === 60)
    assert(df.schema.fieldNames.toSeq === cols.map(_.name))
    // and the cleaning layer's SAS-date quirks hold on real sas input:
    // 20554.0 → 2016-04-10, the 0.0 day-offset → null
    val cleaned = Cleaning.cleanImmigration(df)
    val r0 = cleaned.where(col("cicid") === 1000.0).head()
    assert(r0.getAs[String]("arrdate") === "2016-04-10")
    val r1 = cleaned.where(col("cicid") === 1001.0).head()
    assert(r1.getAs[String]("arrdate") === null) // 0.0-date quirk
    assert(r1.getAs[String]("depdate") === null) // missing numeric
  }
}
