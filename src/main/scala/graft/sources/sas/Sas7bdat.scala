package graft.sources.sas

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pure-Scala reader for the sas7bdat binary format: **little- and
  * big-endian files, both the 32-bit and the 64-bit "u64" alignment
  * variants, numeric (double) and character columns, uncompressed,
  * RLE-compressed (`SASYZCRL`, SAS's COMPRESS=CHAR) or RDC-compressed
  * (`SASYZCR2`, COMPRESS=BINARY)** — the full variant matrix real SAS
  * deployments emit. Writer/reader agreement is additionally
  * cross-validated against an independent implementation
  * (pandas.read_sas) by `tools/check_sas_pandas.py`.
  *
  * The format is publicly documented — the layout here follows the
  * independently reverse-engineered specification ("SAS7BDAT Database
  * Binary Format", M. Shotwell, the basis of the R `sas7bdat` package
  * and cross-checked against the parso/readstat readers' behavior).
  * With `w` = 4 (32-bit) or 8 (u64; header byte 32 == 0x33) and `a1`
  * = 4 when header byte 35 == 0x33:
  *
  *  - header: 32-byte magic; endianness byte at 37 (0x01 = little,
  *    0x00 = big — all multi-byte fields below honor it);
  *    "SAS FILE" at 84; dataset name at 92; header size int32 at
  *    196+a1, page size int32 at 200+a1, page count int(4 or 8) at
  *    204+a1.
  *  - fixed-size pages follow: page type int16 at `B` (= 16 for
  *    32-bit, 32 for u64), block count at B+2, subheader count at B+4,
  *    subheader pointers from B+8 (each 3w: data offset `w`, length
  *    `w`, compression byte, type byte, pad).
  *  - metadata subheaders, matched on the low 32 bits of their
  *    signature (first `w` bytes): ROW_SIZE 0xF7F7F7F7 (row byte
  *    length at +5w, total row count at +6w, mix-page row count at
  *    +15w), COLUMN_SIZE 0xF6F6F6F6 (+w), COLUMN_TEXT 0xFFFFFFFD
  *    (name bytes, addressed relative to signature end = +w),
  *    COLUMN_NAME 0xFFFFFFFF (8-byte entries from +w+8: text-subheader
  *    idx, offset, length int16s), COLUMN_ATTRS 0xFFFFFFFC ((8+w)-byte
  *    entries from +w+8: row offset `w`, width int32 at +w, column
  *    type byte at +w+6 — 1 numeric, 2 character).
  *  - rows are packed back-to-back: DATA pages (type 0x100) from
  *    B+8, `block count` rows; MIX pages (type 0x200) after the
  *    pointers, 8-byte aligned, `min(mix row count, block count −
  *    subheader count)` rows.
  *  - numerics are IEEE doubles; SAS truncates to width 3–7 by KEEPING
  *    the high-order bytes (for a little-endian file, the stored bytes
  *    are the TOP of the 8-byte representation). NaN encodes missing →
  *    null. Characters are fixed-width latin-1, right-padded;
  *    all-blank → null. (SAS dates stay raw doubles here — epoch
  *    conversion is the cleaning layer's job, same contract as the
  *    parquet extract.)
  *
  * Reference behavior mirrored: `/root/reference/etl.py:133-135` loads
  * this format via the third-party `saurfang` package;
  * [[graft.immigration.Sources.immigration]] prefers that jar when it
  * is on the classpath and falls back to THIS reader, so the sas branch
  * works in an offline deployment too.
  *
  * Scale shape: [[readMeta]] is a driver-side parse of the header +
  * metadata pages only; row decode is per-page ([[pageRows]]), so the
  * relation distributes PAGE RANGES to executors — each task seeks
  * straight to its pages (the format is page-aligned and uncompressed
  * pages are independently decodable). Nothing materializes on the
  * driver.
  */
object Sas7bdat {

  final case class SasColumn(
      name: String, rowOffset: Int, width: Int, isNumeric: Boolean)

  final case class SasMeta(
      u64: Boolean, headerSize: Int, pageSize: Int, pageCount: Int,
      rowLength: Int, rowCount: Long, mixRowCount: Long,
      columns: Seq[SasColumn], rle: Boolean = false,
      rdc: Boolean = false, bigEndian: Boolean = false) {
    def byteOrder: ByteOrder =
      if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    def schema: StructType = StructType(columns.map(c =>
      StructField(c.name,
        if (c.isNumeric) DoubleType else StringType, nullable = true)))
    /** Page-header base offset: fields sit deeper in u64 pages. */
    def pageBase: Int = if (u64) 32 else 16
    def wordSize: Int = if (u64) 8 else 4
    def pointerSize: Int = 3 * wordSize
  }

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  private[sas] val SigRowSize = 0xF7F7F7F7
  private[sas] val SigColSize = 0xF6F6F6F6
  private[sas] val SigColText = 0xFFFFFFFD
  private[sas] val SigColName = 0xFFFFFFFF
  private[sas] val SigColAttr = 0xFFFFFFFC

  private val PageData = 0x0100
  private val PageMix = 0x0200

  /** Compression markers, found in the first COLUMN_TEXT blob. */
  private val RleMarker = "SASYZCRL".getBytes(StandardCharsets.US_ASCII)
  private val RdcMarker = "SASYZCR2".getBytes(StandardCharsets.US_ASCII)

  /** Subheader-pointer flags for compressed files: data rows are stored
    * as subheaders whose pointer carries type 1, compression 4
    * (compressed payload) or 0 (stored raw); compression 1 marks a
    * truncated/deleted entry to skip. */
  private val PtrTypeData = 1
  private val CompRle = 4
  private val CompTruncated = 1

  def magicBytes: Array[Byte] = Magic.clone()

  /** True when the file starts with the sas7bdat magic — the sniff the
    * source-preference branch uses. */
  def looksLikeSas(path: String): Boolean = {
    val f = new java.io.File(path)
    if (!f.isFile || f.length() < Magic.length) return false
    val in = new RandomAccessFile(f, "r")
    try {
      val head = new Array[Byte](Magic.length)
      in.readFully(head)
      java.util.Arrays.equals(head, Magic)
    } finally in.close()
  }

  private def buf(bytes: Array[Byte],
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): ByteBuffer =
    ByteBuffer.wrap(bytes).order(order)

  /** `w`-byte offset/length read (values fit int here — offsets are
    * within one page, lengths within one file). */
  private def word(pb: ByteBuffer, off: Int, w: Int): Long =
    if (w == 8) pb.getLong(off) else pb.getInt(off).toLong

  /** Driver-side metadata parse: header + the meta/mix pages' signed
    * subheaders. Fails fast on the unsupported variants (big-endian,
    * compression) with a message naming them. */
  def readMeta(path: String): SasMeta = {
    val in = new RandomAccessFile(path, "r")
    try {
      val head = new Array[Byte](288)
      in.readFully(head)
      require(java.util.Arrays.equals(head.take(32), Magic),
        s"$path: not a sas7bdat file (bad magic)")
      require(head(37) == 0x01 || head(37) == 0x00,
        s"$path: unrecognized endianness byte ${head(37)}")
      val bigEndian = head(37) == 0x00
      val order =
        if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val u64 = head(32) == 0x33
      val a1 = if (head(35) == 0x33) 4 else 0
      val w = if (u64) 8 else 4
      val hb = buf(head, order)
      val headerSize = hb.getInt(196 + a1)
      val pageSize = hb.getInt(200 + a1)
      val pageCount =
        (if (u64) hb.getLong(204 + a1) else hb.getInt(204 + a1).toLong).toInt
      require(headerSize >= 288 && pageSize > 0 && pageCount >= 0,
        s"$path: implausible header ($headerSize/$pageSize/$pageCount)")
      val base = if (u64) 32 else 16
      val ptrSize = 3 * w

      var rowLength = -1
      var rowCount = -1L
      var mixRowCount = 0L
      val texts = Seq.newBuilder[Array[Byte]]
      var nCols = -1
      val names = Seq.newBuilder[(Int, Int, Int)] // (textIdx, off, len)
      val attrs = Seq.newBuilder[(Int, Int, Boolean)] // (rowOff, width, isNum)

      val page = new Array[Byte](pageSize)
      var p = 0
      while (p < pageCount) {
        in.seek(headerSize.toLong + p.toLong * pageSize)
        in.readFully(page)
        val pb = buf(page, order)
        val pType = pb.getShort(base) & 0xFFFF
        if ((pType & PageData) == 0) { // meta/mix/amd — pages with pointers
          val shCount = pb.getShort(base + 4) & 0xFFFF
          var i = 0
          while (i < shCount) {
            val pBase = base + 8 + i * ptrSize
            val off = word(pb, pBase, w).toInt
            val len = word(pb, pBase + w, w).toInt
            val compression = page(pBase + 2 * w)
            if (len > 0 && compression == 0) {
              // signatures matched on their low 32 bits: identical
              // across the variants (u64 widens the FFFF* family by
              // sign-extension and the F7/F6 pair by zero-padding)
              (word(pb, off, w) & 0xFFFFFFFFL).toInt match {
                case SigRowSize =>
                  rowLength = word(pb, off + 5 * w, w).toInt
                  rowCount = word(pb, off + 6 * w, w)
                  mixRowCount = word(pb, off + 15 * w, w)
                case SigColSize =>
                  nCols = word(pb, off + w, w).toInt
                case SigColText =>
                  // content addressed relative to signature end (+w)
                  texts += java.util.Arrays.copyOfRange(
                    page, off + w, off + len)
                case SigColName =>
                  var e = w + 8
                  while (e + 8 <= len) {
                    val ti = pb.getShort(off + e) & 0xFFFF
                    val no = pb.getShort(off + e + 2) & 0xFFFF
                    val nl = pb.getShort(off + e + 4) & 0xFFFF
                    if (nl > 0) names += ((ti, no, nl))
                    e += 8
                  }
                case SigColAttr =>
                  var e = w + 8
                  val entry = 8 + w
                  while (e + entry <= len) {
                    val ro = word(pb, off + e, w).toInt
                    val cw = pb.getInt(off + e + w)
                    val tpe = page(off + e + w + 6)
                    if (cw > 0) attrs += ((ro, cw, tpe == 1))
                    e += entry
                  }
                case _ => () // formats/labels/lists — not needed
              }
            }
            i += 1
          }
        }
        p += 1
      }

      require(rowLength > 0 && rowCount >= 0,
        s"$path: ROW_SIZE subheader missing")
      val textArr = texts.result()
      val nameSeq = names.result().map { case (ti, no, nl) =>
        new String(textArr(ti), no, nl, StandardCharsets.ISO_8859_1).trim
      }
      val attrSeq = attrs.result()
      require(nCols > 0 && nameSeq.size == nCols && attrSeq.size == nCols,
        s"$path: column metadata incomplete " +
          s"(ncols=$nCols names=${nameSeq.size} attrs=${attrSeq.size})")
      val columns = nameSeq.zip(attrSeq).map { case (n, (ro, cw, num)) =>
        SasColumn(n, ro, cw, num)
      }
      // compression marker lives in the text heap (first COLUMN_TEXT)
      def containsMarker(blob: Array[Byte], m: Array[Byte]): Boolean = {
        var i = 0
        while (i + m.length <= blob.length) {
          var j = 0
          while (j < m.length && blob(i + j) == m(j)) j += 1
          if (j == m.length) return true
          i += 1
        }
        false
      }
      val firstText = textArr.headOption.getOrElse(Array.emptyByteArray)
      val rle = containsMarker(firstText, RleMarker)
      val rdc = containsMarker(firstText, RdcMarker)
      SasMeta(u64, headerSize, pageSize, pageCount, rowLength, rowCount,
        mixRowCount, columns, rle, rdc, bigEndian)
    } finally in.close()
  }

  /** Decompress one `SASYZCRL` (RLE, COMPRESS=CHAR) payload into
    * exactly `outLen` bytes. The scheme is the command-nibble coding of
    * the public format note: each control byte's high nibble selects a
    * command, the low nibble a length field; commands either copy
    * literal bytes that follow or insert a run of one byte (an
    * explicit byte, '@', blank, or zero), with short and extended
    * (one extra count byte) variants of each. */
  private[sas] def rleDecompress(
      src: Array[Byte], srcOff: Int, srcLen: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = srcOff
    val end = srcOff + srcLen
    var op = 0
    def copy(n: Int): Unit = {
      System.arraycopy(src, ip, out, op, n); ip += n; op += n
    }
    def fill(b: Byte, n: Int): Unit = {
      java.util.Arrays.fill(out, op, op + n, b); op += n
    }
    while (ip < end && op < outLen) {
      val ctrl = src(ip) & 0xFF; ip += 1
      val cmd = ctrl >> 4
      val len = ctrl & 0x0F
      cmd match {
        case 0x0 => // extended literal copy
          val n = (src(ip) & 0xFF) + 64 + len * 256; ip += 1; copy(n)
        case 0x4 => // extended byte run
          val n = (src(ip) & 0xFF) + 18 + len * 256; ip += 1
          val b = src(ip); ip += 1; fill(b, n)
        case 0x5 =>
          val n = (src(ip) & 0xFF) + 17 + len * 256; ip += 1; fill('@', n)
        case 0x6 =>
          val n = (src(ip) & 0xFF) + 17 + len * 256; ip += 1; fill(' ', n)
        case 0x7 =>
          val n = (src(ip) & 0xFF) + 17 + len * 256; ip += 1; fill(0, n)
        case 0x8 => copy(len + 1)   // short literal copies
        case 0x9 => copy(len + 17)
        case 0xA => copy(len + 33)
        case 0xB => copy(len + 49)
        case 0xC => // short byte run
          val b = src(ip); ip += 1; fill(b, len + 3)
        case 0xD => fill('@', len + 2)
        case 0xE => fill(' ', len + 2)
        case 0xF => fill(0, len + 2)
        case c => sys.error(s"corrupt SASYZCRL stream: command $c")
      }
    }
    require(op == outLen,
      s"SASYZCRL row decompressed to $op bytes, expected $outLen")
    out
  }

  /** Decompress one `SASYZCR2` (RDC, COMPRESS=BINARY) payload into
    * exactly `outLen` bytes. Ross Data Compression, publicly specified
    * and mirrored by the parso/readstat/pandas readers: a 16-bit
    * control word precedes up to 16 items, each bit selecting a
    * literal byte (0) or a command (1). Command high nibble: 0 short
    * run (3–18 of the next byte), 1 long run (19–4114), 2 long
    * back-reference copy (16–271 bytes), 3–15 short back-reference
    * copy of `cmd` bytes; back-reference offsets are
    * `low-nibble + 3 + (next byte << 4)`, copied byte-by-byte so
    * overlapping references extend runs. */
  private[sas] def rdcDecompress(
      src: Array[Byte], srcOff: Int, srcLen: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = srcOff
    val end = srcOff + srcLen
    var op = 0
    var ctrlBits = 0
    var ctrlMask = 0
    def fill(b: Byte, n: Int): Unit = {
      java.util.Arrays.fill(out, op, op + n, b); op += n
    }
    while (ip < end && op < outLen) {
      ctrlMask >>= 1
      if (ctrlMask == 0) {
        ctrlBits = ((src(ip) & 0xFF) << 8) | (src(ip + 1) & 0xFF)
        ip += 2
        ctrlMask = 0x8000
      }
      if ((ctrlBits & ctrlMask) == 0) {
        out(op) = src(ip); ip += 1; op += 1
      } else {
        val cmd = (src(ip) >> 4) & 0x0F
        val cnt = src(ip) & 0x0F
        ip += 1
        cmd match {
          case 0 => // short RLE
            fill(src(ip), cnt + 3); ip += 1
          case 1 => // long RLE
            val n = cnt + ((src(ip) & 0xFF) << 4) + 19; ip += 1
            fill(src(ip), n); ip += 1
          case 2 => // long back-reference
            val ofs = cnt + 3 + ((src(ip) & 0xFF) << 4); ip += 1
            val n = (src(ip) & 0xFF) + 16; ip += 1
            var k = 0
            while (k < n) { out(op) = out(op - ofs); op += 1; k += 1 }
          case c => // 3–15: short back-reference of c bytes
            val ofs = cnt + 3 + ((src(ip) & 0xFF) << 4); ip += 1
            var k = 0
            while (k < c) { out(op) = out(op - ofs); op += 1; k += 1 }
        }
      }
    }
    require(op == outLen,
      s"SASYZCR2 row decompressed to $op bytes, expected $outLen")
    out
  }

  /** Is this 32-bit signature one of the metadata subheader family?
    * (Compressed files store data rows as UNSIGNED subheaders — anything
    * whose leading word is not metadata.) The families: F7F7F7F7 /
    * F6F6F6F6 and the 0xFFFFFFFx block (text, names, attrs, formats,
    * lists). */
  private def isMetaSig(sig: Int): Boolean =
    sig == SigRowSize || sig == SigColSize ||
      (sig & 0xFFFFFFF0) == 0xFFFFFFF0

  /** Decode one page's rows (empty for pure-metadata pages). Pure
    * function of (page bytes, meta) — the executor-side half.
    *
    * Three row placements, all publicly specified: DATA pages pack rows
    * back-to-back; MIX pages pack them after the subheader pointers;
    * COMPRESSED files store each row as a SUBHEADER (pointer type 1) on
    * meta-type pages — payload RLE-decompressed when the pointer's
    * compression byte says so, raw when the row didn't shrink. */
  def pageRows(page: Array[Byte], meta: SasMeta): Seq[Row] = {
    val pb = buf(page, meta.byteOrder)
    val w = meta.wordSize
    val base = meta.pageBase
    val pType = pb.getShort(base) & 0xFFFF
    val blockCount = pb.getShort(base + 2) & 0xFFFF
    val shCount = pb.getShort(base + 4) & 0xFFFF
    if ((pType & PageData) != 0) {
      val start = base + 8
      (0 until blockCount).map { r =>
        decodeRow(page, pb, start + r * meta.rowLength, meta.columns,
          meta.bigEndian)
      }
    } else {
      // subheader-stored rows (compressed files) — pointer order
      val subRows = (0 until shCount).flatMap { i =>
        val pBase = base + 8 + i * meta.pointerSize
        val off = word(pb, pBase, w).toInt
        val len = word(pb, pBase + w, w).toInt
        val compression = page(pBase + 2 * w) & 0xFF
        val ptrType = page(pBase + 2 * w + 1) & 0xFF
        if (len <= 0 || compression == CompTruncated || ptrType != PtrTypeData)
          None
        else if (compression == CompRle && (meta.rle || meta.rdc)) {
          val raw =
            if (meta.rdc) rdcDecompress(page, off, len, meta.rowLength)
            else rleDecompress(page, off, len, meta.rowLength)
          Some(decodeRow(raw, buf(raw, meta.byteOrder), 0, meta.columns,
            meta.bigEndian))
        } else if (compression == 0 && len == meta.rowLength &&
            !isMetaSig((word(pb, off, w) & 0xFFFFFFFFL).toInt)) {
          // a row RLE couldn't shrink is stored raw in its subheader
          Some(decodeRow(page, pb, off, meta.columns, meta.bigEndian))
        } else None
      }
      val mixRows =
        if (pType == PageMix) {
          val afterPtrs = base + 8 + shCount * meta.pointerSize
          val aligned = (afterPtrs + 7) & ~7
          val n = math.min(meta.mixRowCount,
            (blockCount - shCount).toLong).toInt
          (0 until n).map { r =>
            decodeRow(page, pb, aligned + r * meta.rowLength,
              meta.columns, meta.bigEndian)
          }
        } else Seq.empty
      subRows ++ mixRows
    }
  }

  private def decodeRow(
      page: Array[Byte], pb: ByteBuffer, rowOff: Int,
      columns: Seq[SasColumn], bigEndian: Boolean): Row = {
    val vals = columns.map { c =>
      val o = rowOff + c.rowOffset
      if (c.isNumeric) {
        val d =
          if (c.width == 8) pb.getDouble(o)
          else {
            // truncated numeric: stored bytes are the HIGH bytes of
            // the double — the TAIL of a little-endian representation,
            // the HEAD of a big-endian one
            var bits = 0L
            var i = 0
            while (i < c.width) {
              val shift =
                if (bigEndian) 8 * (7 - i) else 8 * (8 - c.width + i)
              bits |= (page(o + i) & 0xFFL) << shift
              i += 1
            }
            java.lang.Double.longBitsToDouble(bits)
          }
        if (java.lang.Double.isNaN(d)) null else java.lang.Double.valueOf(d)
      } else {
        val s = new String(page, o, c.width, StandardCharsets.ISO_8859_1)
        val t = s.replace('\u0000', ' ').trim
        if (t.isEmpty) null else t
      }
    }
    Row.fromSeq(vals)
  }
}
