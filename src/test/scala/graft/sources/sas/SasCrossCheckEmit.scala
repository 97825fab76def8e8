package graft.sources.sas

import java.io.PrintWriter
import java.nio.file.{Files, Paths}

/** Emits the spec fixtures to a directory alongside expected-value CSVs
  * so an INDEPENDENT sas7bdat implementation (pandas.read_sas, driver-
  * side) can cross-validate the format our writer emits and our reader
  * consumes: `sbt "Test/runMain graft.sources.sas.SasCrossCheckEmit
  * /tmp/sas_xcheck"` then `python3 tools/check_sas_pandas.py
  * /tmp/sas_xcheck`. Closes the self-validation loop ADVICE flagged —
  * a shared misreading of the public spec between writer and reader
  * would disagree with pandas' parser here.
  *
  * Each CSV cell: numeric value (repr of the Double), empty for null;
  * strings written verbatim (no padding — both sides strip trailing
  * blanks). Also decodes every fixture through [[Sas7bdat]] and writes
  * `<name>.reader.csv` in the same shape, so the checker diffs
  * pandas-vs-golden AND reader-vs-golden from one artifact set. */
object SasCrossCheckEmit {
  import SasFixtureWriter.Col

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sas_xcheck")
    Files.createDirectories(Paths.get(dir))

    val cols = Seq(
      Col("cicid", isNumeric = true, 8),
      Col("i94yr", isNumeric = true, 6), // truncated-width numeric
      Col("port", isNumeric = false, 8),
      Col("visatype", isNumeric = false, 12))

    // values chosen to exercise: exact doubles, truncated-width-safe
    // values (integers survive 6-byte truncation), NaN→null numerics,
    // blank→null strings, repeated-char strings (RLE run commands),
    // multi-page row counts
    val rows: Seq[Seq[Any]] = (0 until 900).map { i =>
      Seq(
        i.toDouble + 0.5,
        if (i % 7 == 0) null else (2016.0 + (i % 3)),
        if (i % 11 == 0) "" else s"P${"X" * (i % 5)}${i % 100}",
        if (i % 2 == 0) "WT" + ("A" * 6) else "B2")
    }

    val variants = Seq(
      ("fix32", false, false, false, false),
      ("fixu64", true, false, false, false),
      ("fixrle", false, true, false, false),
      ("fixrdc", false, false, true, false),
      ("fixrdc64", true, false, true, false),
      ("fixbe", false, false, false, true),
      ("fixbe64rdc", true, false, true, true))

    def emit(name: String, cs: Seq[Col], rs: Seq[Seq[Any]], u64: Boolean,
        rle: Boolean, rdc: Boolean, be: Boolean): Unit = {
      val path = s"$dir/$name.sas7bdat"
      SasFixtureWriter.write(path, cs, rs, u64 = u64, rle = rle,
        rdc = rdc, bigEndian = be)
      writeCsv(s"$dir/$name.expected.csv", cs, rs)
      // decode through the engine reader (same page loop the Spark scan
      // runs per-task) and dump the same CSV shape
      val meta = Sas7bdat.readMeta(path)
      val in = new java.io.RandomAccessFile(path, "r")
      val decoded =
        try {
          val buf = new Array[Byte](meta.pageSize)
          (0 until meta.pageCount).flatMap { pg =>
            in.seek(meta.headerSize.toLong + pg.toLong * meta.pageSize)
            in.readFully(buf)
            Sas7bdat.pageRows(buf, meta)
          }
        } finally in.close()
      val asCells: Seq[Seq[Any]] = decoded.map(_.toSeq.map {
        case null => null
        case d: java.lang.Double => d.doubleValue: Any
        case other => other
      })
      writeCsv(s"$dir/$name.reader.csv", cs, asCells)
    }

    variants.foreach { case (name, u64, rle, rdc, be) =>
      emit(name, cols, rows, u64, rle, rdc, be)
    }

    // r15 stretch: one LARGE multi-MB, many-page, RDC-compressed
    // fixture (u64 layout) so page-boundary truncation bugs cannot
    // hide in small fixtures — wide string columns push row size up,
    // tens of thousands of rows span hundreds of pages, and the
    // mixed literal/run content gives RDC realistic work. Values
    // avoid trailing blanks (both decoders strip them by contract).
    val bigCols = Seq(
      Col("cicid", isNumeric = true, 8),
      Col("i94yr", isNumeric = true, 6),
      Col("port", isNumeric = false, 24),
      Col("note", isNumeric = false, 48))
    val bigRows: Seq[Seq[Any]] = (0 until 60000).map { i =>
      Seq(
        i.toDouble + 0.25,
        if (i % 13 == 0) null else 1990.0 + (i % 40),
        if (i % 17 == 0) "" else s"PORT${"Z" * (i % 12)}_${i % 1000}",
        (if (i % 3 == 0) "ARRIVED" * 3 else s"note-$i") + ("#" * (i % 9)))
    }
    emit("fixbig64rdc", bigCols, bigRows, u64 = true, rle = false,
      rdc = true, be = false)

    println(s"[xcheck] wrote ${variants.size + 1} fixtures to $dir")
  }

  private def writeCsv(path: String, cols: Seq[Col],
      rows: Seq[Seq[Any]]): Unit = {
    val w = new PrintWriter(path)
    try {
      w.println(cols.map(_.name).mkString(","))
      rows.foreach { r =>
        w.println(r.zip(cols).map {
          case (null, _) => ""
          case (d: Double, c) if c.isNumeric =>
            if (d.isNaN) "" else f"$d%.6f"
          case (s: String, _) => s
          case (other, _) => other.toString
        }.mkString(","))
      }
    } finally w.close()
  }
}
