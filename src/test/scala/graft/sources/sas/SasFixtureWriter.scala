package graft.sources.sas

import java.io.{FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Test-scope sas7bdat WRITER: emits the uncompressed little-endian
  * 32-bit variant of the public format — the same layout
  * [[Sas7bdat]] documents (header magic + sizes, meta page with
  * ROW_SIZE / COLUMN_SIZE / COLUMN_TEXT / COLUMN_NAME / COLUMN_ATTRS
  * subheaders, packed DATA pages). Exists so specs can hand the READER
  * a real binary `.sas7bdat` fixture with author-known golden values;
  * kept in test scope because the engine only ever needs to read the
  * format. */
object SasFixtureWriter {

  final case class Col(name: String, isNumeric: Boolean, width: Int) {
    require(isNumeric || width > 0)
    require(!isNumeric || (width >= 3 && width <= 8))
  }

  private val HeaderSize = 1024
  private val PageSize = 4096

  /** `rows(i)(j)`: Double / String / null matching `cols(j)`. */
  def write(path: String, cols: Seq[Col], rows: Seq[Seq[Any]]): Unit = {
    val rowLength = cols.map(_.width).sum
    val rowOffsets = cols.scanLeft(0)(_ + _.width).init
    val rowsPerDataPage = (PageSize - 24) / rowLength
    require(rowsPerDataPage > 0, "row too wide for the page size")
    val dataPages = (rows.size + rowsPerDataPage - 1) / rowsPerDataPage
    val pageCount = 1 + dataPages

    // ---- header ------------------------------------------------------
    val header = ByteBuffer.allocate(HeaderSize).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Sas7bdat.magicBytes)
    header.put(32, 0x22.toByte) // a2 indicator: not 64-bit
    header.put(35, 0x22.toByte) // a1 indicator: no extra alignment
    header.put(37, 0x01.toByte) // little-endian
    header.put(39, '1'.toByte)  // unix
    header.position(84)
    header.put("SAS FILE".getBytes(StandardCharsets.ISO_8859_1))
    header.position(92)
    header.put(pad("I94_FIXTURE", 64))
    header.position(156)
    header.put(pad("DATA", 8))
    val sasNow = 1.7e9 // seconds since 1960 — value is cosmetic
    header.putDouble(164, sasNow)
    header.putDouble(172, sasNow)
    header.putInt(196, HeaderSize)
    header.putInt(200, PageSize)
    header.putInt(204, pageCount)

    // ---- meta page ---------------------------------------------------
    val meta = ByteBuffer.allocate(PageSize).order(ByteOrder.LITTLE_ENDIAN)
    meta.putInt(0, 1) // page sequence
    meta.putShort(16, 0.toShort) // page type: meta
    meta.putShort(18, 5.toShort) // block count
    meta.putShort(20, 5.toShort) // subheader count

    // column text content (relative to signature end): int16 size,
    // 14 bytes pad, then the names
    val nameBytes = cols.map(_.name.getBytes(StandardCharsets.ISO_8859_1))
    val textContentLen = 16 + nameBytes.map(_.length).sum
    val text = ByteBuffer.allocate(4 + textContentLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    text.putInt(0, Sas7bdat.SigColText)
    text.putShort(4, textContentLen.toShort)
    val nameOffsets = new Array[Int](cols.size)
    var cursor = 16
    nameBytes.zipWithIndex.foreach { case (nb, i) =>
      nameOffsets(i) = cursor
      text.position(4 + cursor)
      text.put(nb)
      cursor += nb.length
    }

    val rowSize = ByteBuffer.allocate(80).order(ByteOrder.LITTLE_ENDIAN)
    rowSize.putInt(0, Sas7bdat.SigRowSize)
    rowSize.putInt(20, rowLength)
    rowSize.putInt(24, rows.size)
    rowSize.putInt(60, 0) // no mix-page rows

    val colSize = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    colSize.putInt(0, Sas7bdat.SigColSize)
    colSize.putInt(4, cols.size)

    val colName = ByteBuffer.allocate(12 + 8 * cols.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    colName.putInt(0, Sas7bdat.SigColName)
    cols.indices.foreach { i =>
      val base = 12 + 8 * i
      colName.putShort(base, 0.toShort) // text subheader index
      colName.putShort(base + 2, nameOffsets(i).toShort)
      colName.putShort(base + 4, nameBytes(i).length.toShort)
    }

    val colAttr = ByteBuffer.allocate(12 + 12 * cols.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    colAttr.putInt(0, Sas7bdat.SigColAttr)
    cols.zipWithIndex.foreach { case (c, i) =>
      val base = 12 + 12 * i
      colAttr.putInt(base, rowOffsets(i))
      colAttr.putInt(base + 4, c.width)
      colAttr.put(base + 10, if (c.isNumeric) 1.toByte else 2.toByte)
    }

    val contents =
      Seq(rowSize, colSize, text, colName, colAttr).map(_.array())
    var off = 88 // after the 5 pointers at 24..84, 8-aligned
    contents.zipWithIndex.foreach { case (c, i) =>
      val ptr = 24 + i * 12
      meta.putInt(ptr, off)
      meta.putInt(ptr + 4, c.length)
      meta.put(ptr + 8, 0.toByte) // uncompressed
      meta.position(off)
      meta.put(c)
      off = (off + c.length + 7) & ~7
    }
    require(off <= PageSize, "meta subheaders exceed the page")

    // ---- data pages --------------------------------------------------
    val out = new FileOutputStream(path)
    try {
      out.write(header.array())
      out.write(meta.array())
      rows.grouped(rowsPerDataPage).zipWithIndex.foreach { case (chunk, pi) =>
        val page = ByteBuffer.allocate(PageSize).order(ByteOrder.LITTLE_ENDIAN)
        page.putInt(0, 2 + pi)
        page.putShort(16, 0x0100.toShort) // data page
        page.putShort(18, chunk.size.toShort)
        page.putShort(20, 0.toShort)
        chunk.zipWithIndex.foreach { case (row, ri) =>
          val base = 24 + ri * rowLength
          row.zip(cols).zipWithIndex.foreach { case ((v, c), ci) =>
            val o = base + rowOffsets(ci)
            if (c.isNumeric) {
              val d = v match {
                case null => Double.NaN
                case x: Double => x
                case x: Int => x.toDouble
              }
              if (c.width == 8) page.putDouble(o, d)
              else {
                // keep the HIGH bytes of the LE representation
                val bits = java.lang.Double.doubleToRawLongBits(d)
                (0 until c.width).foreach { b =>
                  page.put(o + b,
                    ((bits >>> (8 * (8 - c.width + b))) & 0xFF).toByte)
                }
              }
            } else {
              val s = v match { case null => ""; case x: String => x }
              page.position(o)
              page.put(pad(s, c.width))
            }
          }
        }
        out.write(page.array())
      }
    } finally out.close()
  }

  /** Flip one magic byte in place — for the bad-magic rejection test. */
  def corruptMagic(path: String): Unit = {
    val f = new RandomAccessFile(path, "rw")
    try { f.seek(12); f.writeByte(0x00) } finally f.close()
  }

  private def pad(s: String, width: Int): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.ISO_8859_1)
    require(b.length <= width, s"'$s' wider than $width")
    b ++ Array.fill(width - b.length)(' '.toByte)
  }
}
