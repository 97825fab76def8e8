package graft.sources.sas

import java.io.{FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Test-scope sas7bdat WRITER: emits the public format across the full
  * variant matrix — little- and big-endian, 32-bit and u64 alignment,
  * uncompressed / RLE (`SASYZCRL`) / RDC (`SASYZCR2`) — the same
  * structures [[Sas7bdat]] documents (header magic + sizes, meta page
  * with ROW_SIZE / COLUMN_SIZE / COLUMN_TEXT / COLUMN_NAME /
  * COLUMN_ATTRS / FORMAT subheaders, packed DATA pages or
  * subheader-stored compressed rows). Exists so specs can hand the
  * READER a real binary `.sas7bdat` fixture with author-known golden
  * values; kept in test scope because the engine only ever needs to
  * read the format. Spec fidelity is cross-validated against
  * pandas.read_sas by `tools/check_sas_pandas.py`. */
object SasFixtureWriter {

  final case class Col(name: String, isNumeric: Boolean, width: Int) {
    require(isNumeric || width > 0)
    require(!isNumeric || (width >= 3 && width <= 8))
  }

  private val HeaderSize = 1024
  private val PageSize = 4096
  // FORMAT_AND_LABEL signature (the reader skips these; emitted for
  // spec fidelity so independent readers see one per column)
  private val SigColFormat = 0xFFFFFBFE

  /** `rows(i)(j)`: Double / String / null matching `cols(j)`.
    *
    * `rle = true` emits the COMPRESS=CHAR (`SASYZCRL`) layout: the
    * marker lands in the COLUMN_TEXT heap and every row is stored as a
    * SUBHEADER on meta-type pages — RLE-compressed when that shrinks
    * it (pointer compression byte 4), raw otherwise (byte 0) — the
    * same two storage forms real SAS emits. `rdc = true` does the same
    * with the COMPRESS=BINARY (`SASYZCR2`) Ross Data Compression
    * scheme. */
  def write(path: String, cols: Seq[Col], rows: Seq[Seq[Any]],
      u64: Boolean = false, rle: Boolean = false,
      rdc: Boolean = false, bigEndian: Boolean = false): Unit = {
    require(!(rle && rdc), "pick one compression scheme")
    val ord =
      if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val w = if (u64) 8 else 4
    val base = if (u64) 32 else 16 // page-header offset
    val ptrSize = 3 * w
    val rowLength = cols.map(_.width).sum
    val rowOffsets = cols.scanLeft(0)(_ + _.width).init

    def encodeRowBytes(row: Seq[Any]): Array[Byte] = {
      val rb = ByteBuffer.allocate(rowLength).order(ord)
      row.zip(cols).zipWithIndex.foreach { case ((v, c), ci) =>
        val o = rowOffsets(ci)
        if (c.isNumeric) {
          val d = v match {
            case null => Double.NaN
            case x: Double => x
            case x: Int => x.toDouble
          }
          if (c.width == 8) rb.putDouble(o, d)
          else {
            // keep the HIGH bytes of the representation: the tail of
            // the LE byte layout, the head of the BE one
            val bits = java.lang.Double.doubleToRawLongBits(d)
            (0 until c.width).foreach { b =>
              val shift =
                if (bigEndian) 8 * (7 - b) else 8 * (8 - c.width + b)
              rb.put(o + b, ((bits >>> shift) & 0xFF).toByte)
            }
          }
        } else {
          val s = v match { case null => ""; case x: String => x }
          rb.position(o)
          rb.put(pad(s, c.width))
        }
      }
      rb.array()
    }

    val dataPageBytes: Seq[Array[Byte]] =
      if (!rle && !rdc) {
        val rowsPerDataPage = (PageSize - (base + 8)) / rowLength
        require(rowsPerDataPage > 0, "row too wide for the page size")
        rows.grouped(rowsPerDataPage).zipWithIndex.map { case (chunk, pi) =>
          val page = ByteBuffer.allocate(PageSize)
            .order(ord)
          page.putInt(0, 2 + pi)
          page.putShort(base, 0x0100.toShort) // data page
          page.putShort(base + 2, chunk.size.toShort)
          page.putShort(base + 4, 0.toShort)
          chunk.zipWithIndex.foreach { case (row, ri) =>
            page.position(base + 8 + ri * rowLength)
            page.put(encodeRowBytes(row))
          }
          page.array()
        }.toSeq
      } else {
        // subheader-per-row pages: pointers grow from the front,
        // payloads from the back (layout real compressed files use);
        // each payload is the RLE form when that shrinks the row,
        // the raw row otherwise
        val payloads = rows.map { r =>
          val raw = encodeRowBytes(r)
          val comp = if (rdc) rdcCompress(raw) else rleCompress(raw)
          if (comp.length < raw.length) (comp, 4) else (raw, 0)
        }
        val pages = Seq.newBuilder[Array[Byte]]
        var pending = payloads
        var pi = 0
        while (pending.nonEmpty) {
          var ptrEnd = base + 8
          var payStart = PageSize
          val taken = pending.takeWhile { case (bytes, _) =>
            val fits = ptrEnd + ptrSize <= payStart - bytes.length
            if (fits) { ptrEnd += ptrSize; payStart -= bytes.length }
            fits
          }
          require(taken.nonEmpty, "compressed row too wide for the page")
          val page = ByteBuffer.allocate(PageSize)
            .order(ord)
          page.putInt(0, 2 + pi)
          page.putShort(base, 0x0000.toShort) // meta-type page
          page.putShort(base + 2, taken.size.toShort)
          page.putShort(base + 4, taken.size.toShort)
          var off = PageSize
          taken.zipWithIndex.foreach { case ((bytes, comp), i) =>
            off -= bytes.length
            val ptr = base + 8 + i * ptrSize
            putWord(page, ptr, off, u64)
            putWord(page, ptr + w, bytes.length, u64)
            page.put(ptr + 2 * w, comp.toByte)
            page.put(ptr + 2 * w + 1, 1.toByte) // pointer type: data row
            page.position(off)
            page.put(bytes)
          }
          pages += page.array()
          pending = pending.drop(taken.size)
          pi += 1
        }
        pages.result()
      }
    val pageCount = 1 + dataPageBytes.size

    // ---- header ------------------------------------------------------
    val a1 = if (u64) 4 else 0
    val header = ByteBuffer.allocate(HeaderSize).order(ord)
    header.put(Sas7bdat.magicBytes)
    header.put(32, (if (u64) 0x33 else 0x22).toByte) // a2/u64 indicator
    header.put(35, (if (u64) 0x33 else 0x22).toByte) // a1 indicator
    header.put(37, (if (bigEndian) 0x00 else 0x01).toByte) // endianness
    header.put(39, '1'.toByte)  // unix
    header.position(84)
    header.put("SAS FILE".getBytes(StandardCharsets.ISO_8859_1))
    header.position(92)
    header.put(pad("I94_FIXTURE", 64))
    header.position(156)
    header.put(pad("DATA", 8))
    val sasNow = 1.7e9 // seconds since 1960 — value is cosmetic
    header.putDouble(164 + a1, sasNow)
    header.putDouble(172 + a1, sasNow)
    header.putInt(196 + a1, HeaderSize)
    header.putInt(200 + a1, PageSize)
    if (u64) header.putLong(204 + a1, pageCount.toLong)
    else header.putInt(204 + a1, pageCount)

    // ---- meta page ---------------------------------------------------
    val meta = ByteBuffer.allocate(PageSize).order(ord)
    meta.putInt(0, 1) // page sequence
    meta.putShort(base, 0.toShort) // page type: meta
    meta.putShort(base + 2, 5.toShort) // block count
    meta.putShort(base + 4, 5.toShort) // subheader count

    def sig(b: ByteBuffer, s: Int): Unit =
      if (u64) {
        // u64 widens the FFFF* family (high byte 0xFF) by
        // sign-extension and the F7/F6 pair by zero-padding — the
        // byte forms independent readers' u64 signature tables carry;
        // the engine reader matches on the low 32 bits
        if ((s >>> 24) == 0xFF) b.putLong(0, s.toLong) // sign-extends
        else b.putLong(0, s.toLong & 0xFFFFFFFFL)
      } else b.putInt(0, s)

    // column text content (relative to signature end = +w): int16 size,
    // pad to 16, then the names
    val nameBytes = cols.map(_.name.getBytes(StandardCharsets.ISO_8859_1))
    val textContentLen = 16 + nameBytes.map(_.length).sum
    val text = ByteBuffer.allocate(w + textContentLen)
      .order(ord)
    sig(text, Sas7bdat.SigColText)
    text.putShort(w, textContentLen.toShort)
    if (rle || rdc) {
      // the compression marker lives in the text heap's pad region
      text.position(w + 4)
      text.put((if (rdc) "SASYZCR2" else "SASYZCRL")
        .getBytes(StandardCharsets.US_ASCII))
    }
    val nameOffsets = new Array[Int](cols.size)
    var cursor = 16
    nameBytes.zipWithIndex.foreach { case (nb, i) =>
      nameOffsets(i) = cursor
      text.position(w + cursor)
      text.put(nb)
      cursor += nb.length
    }

    // full spec size (480 / 808 bytes): independent readers address
    // fixed offsets deep into this blob (creator-proc LCS/LCP fields at
    // +354/+378 in the 32-bit variant) — a truncated blob makes them
    // read neighboring subheaders as garbage
    val rowSize = ByteBuffer.allocate(if (u64) 808 else 480)
      .order(ord)
    sig(rowSize, Sas7bdat.SigRowSize)
    putWord(rowSize, 5 * w, rowLength, u64)
    putWord(rowSize, 6 * w, rows.size, u64)
    putWord(rowSize, 9 * w, cols.size, u64) // col_count_p1 (+p2 = ncols)
    putWord(rowSize, 10 * w, 0, u64)        // col_count_p2
    putWord(rowSize, 15 * w, 0, u64) // no mix-page rows

    val colSize = ByteBuffer.allocate(2 * w + 8)
      .order(ord)
    sig(colSize, Sas7bdat.SigColSize)
    putWord(colSize, w, cols.size, u64)

    // entries start 8 bytes after the signature and the blob carries 12
    // bytes of trailing padding: the spec's count formula is
    // (len - 2w - 12) / 8, which independent readers apply literally
    val colName = ByteBuffer.allocate(w + 8 + 8 * cols.size + 12)
      .order(ord)
    sig(colName, Sas7bdat.SigColName)
    cols.indices.foreach { i =>
      val b = w + 8 + 8 * i
      colName.putShort(b, 0.toShort) // text subheader index
      colName.putShort(b + 2, nameOffsets(i).toShort)
      colName.putShort(b + 4, nameBytes(i).length.toShort)
    }

    val attrEntry = 8 + w
    // same trailing-pad contract: count = (len - 2w - 12) / (w + 8)
    val colAttr = ByteBuffer.allocate(w + 8 + attrEntry * cols.size + 12)
      .order(ord)
    sig(colAttr, Sas7bdat.SigColAttr)
    cols.zipWithIndex.foreach { case (c, i) =>
      val b = w + 8 + attrEntry * i
      putWord(colAttr, b, rowOffsets(i), u64)
      colAttr.putInt(b + w, c.width)
      colAttr.put(b + w + 6, if (c.isNumeric) 1.toByte else 2.toByte)
    }

    // one FORMAT_AND_LABEL subheader per column (all fields zero = no
    // format): real files always carry them and independent readers
    // index column_formats[j] unconditionally
    val fmtSubheaders = cols.map { _ =>
      val fmt = ByteBuffer.allocate((3 * w + 34 + 7) & ~7)
        .order(ord)
      sig(fmt, SigColFormat)
      fmt
    }

    val contents =
      (Seq(rowSize, colSize, text, colName, colAttr) ++ fmtSubheaders)
        .map(_.array())
    val nSub = contents.size
    meta.putShort(base + 2, nSub.toShort)
    meta.putShort(base + 4, nSub.toShort)
    var off = (base + 8 + nSub * ptrSize + 7) & ~7 // after the pointers
    contents.zipWithIndex.foreach { case (c, i) =>
      val ptr = base + 8 + i * ptrSize
      putWord(meta, ptr, off, u64)
      putWord(meta, ptr + w, c.length, u64)
      meta.put(ptr + 2 * w, 0.toByte) // uncompressed
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
      dataPageBytes.foreach(out.write)
    } finally out.close()
  }

  /** `SASYZCRL` compressor — the inverse of the reader's decoder, used
    * to author compressed fixtures. Runs of ≥3 identical bytes become
    * insert commands (dedicated blank/zero forms, explicit byte
    * otherwise; extended variants past the short commands' reach);
    * everything else is emitted as literal copy chunks. */
  private[sas] def rleCompress(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def literal(start: Int, len0: Int): Unit = {
      var s = start; var len = len0
      while (len > 0) {
        val n =
          if (len >= 64) math.min(len, 64 + 255 + 15 * 256)
          else len
        if (n >= 64) {
          val ext = n - 64
          out.write(0x00 | (ext >> 8)); out.write(ext & 0xFF)
        } else if (n >= 49) out.write(0xB0 | (n - 49))
        else if (n >= 33) out.write(0xA0 | (n - 33))
        else if (n >= 17) out.write(0x90 | (n - 17))
        else out.write(0x80 | (n - 1))
        out.write(row, s, n)
        s += n; len -= n
      }
    }
    var i = 0
    val n = row.length
    var litStart = 0
    while (i < n) {
      val b = row(i)
      var run = 1
      while (i + run < n && row(i + run) == b) run += 1
      if (run >= 3) {
        if (i > litStart) literal(litStart, i - litStart)
        var left = run
        while (left > 0) {
          if (b == ' ' || b == 0) {
            val ctrlShort = if (b == ' ') 0xE0 else 0xF0
            val ctrlExt = if (b == ' ') 0x60 else 0x70
            if (left >= 18) {
              val take = math.min(left, 17 + 255 + 15 * 256)
              val ext = take - 17
              out.write(ctrlExt | (ext >> 8)); out.write(ext & 0xFF)
              left -= take
            } else if (left >= 2) {
              out.write(ctrlShort | (left - 2)); left = 0
            } else { literal(i + run - left, left); left = 0 }
          } else {
            if (left >= 19) {
              val take = math.min(left, 18 + 255 + 15 * 256)
              val ext = take - 18
              out.write(0x40 | (ext >> 8)); out.write(ext & 0xFF)
              out.write(b); left -= take
            } else if (left >= 3) {
              out.write(0xC0 | (left - 3)); out.write(b); left = 0
            } else { literal(i + run - left, left); left = 0 }
          }
        }
        i += run
        litStart = i
      } else i += run
    }
    if (n > litStart) literal(litStart, n - litStart)
    out.toByteArray
  }

  /** `SASYZCR2` (RDC) compressor — the inverse of the reader's decoder.
    * Greedy: at each position prefer a same-byte run (short 3–18 /
    * long 19–4114 fill commands), else the longest back-reference with
    * offset 3–4098 (short 3–15 / long 16–271 copy commands), else a
    * literal byte. Items are emitted under 16-bit control words, one
    * bit per item, exactly as the decoder consumes them. */
  private[sas] def rdcCompress(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val flags = new scala.collection.mutable.ArrayBuffer[Boolean](16)
    val items = new scala.collection.mutable.ArrayBuffer[Array[Byte]](16)
    def flush(): Unit = {
      if (flags.isEmpty) return
      var ctrl = 0
      flags.zipWithIndex.foreach { case (f, i) =>
        if (f) ctrl |= 0x8000 >>> i
      }
      out.write((ctrl >> 8) & 0xFF); out.write(ctrl & 0xFF)
      items.foreach(b => out.write(b, 0, b.length))
      flags.clear(); items.clear()
    }
    def item(flag: Boolean, bytes: Byte*): Unit = {
      if (flags.size == 16) flush()
      flags += flag
      items += bytes.toArray
    }
    val n = row.length
    var i = 0
    while (i < n) {
      val b = row(i)
      var run = 1
      while (i + run < n && row(i + run) == b && run < 4114) run += 1
      // longest back-reference (offset >= 3 — smaller can't encode)
      var bestLen = 0
      var bestOfs = 0
      val maxLen = math.min(271, n - i)
      var ofs = 3
      val maxOfs = math.min(i, 4098)
      while (ofs <= maxOfs) {
        var k = 0
        while (k < maxLen && row(i - ofs + k) == row(i + k)) k += 1
        if (k > bestLen) { bestLen = k; bestOfs = ofs }
        ofs += 1
      }
      if (run >= 3 && run >= bestLen) {
        if (run <= 18) item(flag = true, (0x00 | (run - 3)).toByte, b)
        else {
          val v = run - 19
          item(flag = true, (0x10 | (v & 0xF)).toByte,
            ((v >> 4) & 0xFF).toByte, b)
        }
        i += run
      } else if (bestLen >= 3) {
        val v = bestOfs - 3
        if (bestLen <= 15)
          item(flag = true, ((bestLen << 4) | (v & 0xF)).toByte,
            ((v >> 4) & 0xFF).toByte)
        else
          item(flag = true, (0x20 | (v & 0xF)).toByte,
            ((v >> 4) & 0xFF).toByte, (bestLen - 16).toByte)
        i += bestLen
      } else {
        item(flag = false, b)
        i += 1
      }
    }
    flush()
    out.toByteArray
  }

  /** Plant a compression marker in the text heap of an EXISTING
    * uncompressed fixture — for the RDC-rejection test (the reader must
    * refuse, not misparse). Byte offset: header + meta-page text
    * subheader; the writer's layout puts the first text blob's pad
    * region at a fixed location only the writer knows, so this helper
    * recomputes it the same way. */
  def plantRdcMarker(path: String, u64: Boolean = false): Unit = {
    val w = if (u64) 8 else 4
    val base = if (u64) 32 else 16
    val ptrSize = 3 * w
    val f = new RandomAccessFile(path, "rw")
    try {
      // text subheader is the 3rd content block (rowSize, colSize, text)
      val page = new Array[Byte](PageSize)
      f.seek(HeaderSize); f.readFully(page)
      val pb = ByteBuffer.wrap(page).order(ByteOrder.LITTLE_ENDIAN)
      val ptr = base + 8 + 2 * ptrSize
      val off =
        (if (u64) pb.getLong(ptr) else pb.getInt(ptr).toLong).toInt
      f.seek(HeaderSize.toLong + off + w + 4)
      f.write("SASYZCR2".getBytes(StandardCharsets.US_ASCII))
    } finally f.close()
  }

  private def putWord(b: ByteBuffer, off: Int, v: Int, u64: Boolean): Unit =
    if (u64) b.putLong(off, v.toLong) else b.putInt(off, v)

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
