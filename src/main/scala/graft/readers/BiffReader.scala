package graft.readers

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Native legacy Excel `.xls` (BIFF8) worksheet parser — the
  * SpssReader difficulty class: a Compound File Binary (MS-CFB)
  * container walk to the `Workbook` stream, then a BIFF8 record scan
  * of the workbook-globals substream (SST shared strings, BOUNDSHEET
  * sheet directory) and the first worksheet substream's cell records
  * (reference reads .xls via pandas/xlrd, intake/readers/readers.py:319
  * PandasExcel; the layouts here are from the public MS-CFB and MS-XLS
  * specifications).
  *
  * Stated profile: BIFF8 (Excel 97-2003) and BIFF5/BIFF7 (Excel
  * 5.0/95 — round 8). BIFF5 stores plain byte strings (no flags byte,
  * no SST/LABELSST; inline LABEL text decodes as latin-1 — the
  * CODEPAGE record is not consulted, so non-Latin legacy codepages
  * read as their byte values); earlier versions refuse. Cell records
  * LABELSST / NUMBER / RK / MULRK / BOOLERR / LABEL; SST strings
  * compressed (latin-1) or UTF-16LE, with rich/ext payloads skipped and
  * Continue-record splits handled at character-data boundaries (each
  * continued chunk restarts its own encoding flag byte, per MS-XLS
  * 2.5.293); formulas yield their cached NUMBER/STRING result when
  * present, else empty. Inline LABEL/STRING text parses the full grbit
  * (rich/ext headers skipped) and refuses if split across Continue
  * records. Encrypted workbooks (FILEPASS) refuse.
  */
object BiffReader {

  private val EndOfChain = 0xfffffffeL
  private val FreeSect = 0xffffffffL

  /** Resolve the `Workbook`/`Book` stream out of a CFB container. */
  private[readers] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 && bb.getLong(0) == 0xe11ab1a1e011cfd0L, "not a CFB (.xls) file")
    val secSize = 1 << bb.getShort(30)
    val miniSecSize = 1 << bb.getShort(32)
    val nFat = bb.getInt(44)
    val firstDir = bb.getInt(48)
    val miniCutoff = bb.getInt(56)
    val firstMiniFat = bb.getInt(60)
    val firstDifat = bb.getInt(68)

    def sector(id: Long): Array[Byte] = {
      val off = (id + 1) * secSize
      java.util.Arrays.copyOfRange(bytes, off.toInt, math.min(bytes.length, (off + secSize).toInt))
    }
    // DIFAT: 109 header entries + optional DIFAT sector chain
    val fatSectors = mutable.ArrayBuffer[Long]()
    for (i <- 0 until math.min(109, nFat)) fatSectors += (bb.getInt(76 + i * 4).toLong & 0xffffffffL)
    var difat = firstDifat.toLong & 0xffffffffL
    while (difat != EndOfChain && difat != FreeSect && fatSectors.length < nFat) {
      val s = ByteBuffer.wrap(sector(difat)).order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until secSize / 4 - 1 if fatSectors.length < nFat)
        fatSectors += (s.getInt(i * 4).toLong & 0xffffffffL)
      difat = s.getInt(secSize - 4).toLong & 0xffffffffL
    }
    val fat: Array[Long] = fatSectors.toArray.flatMap { fs =>
      val s = ByteBuffer.wrap(sector(fs)).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(secSize / 4)(i => s.getInt(i * 4).toLong & 0xffffffffL)
    }
    def chain(start: Long, sizeHint: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var id = start
      var guard = 0
      while (id != EndOfChain && id != FreeSect && guard <= fat.length) {
        out.write(sector(id))
        id = fat(id.toInt)
        guard += 1
      }
      val b = out.toByteArray
      if (sizeHint >= 0 && sizeHint <= b.length) java.util.Arrays.copyOf(b, sizeHint.toInt) else b
    }
    // directory entries: 128 bytes each
    val dir = chain(firstDir.toLong & 0xffffffffL, -1)
    case class Entry(name: String, entryType: Int, start: Long, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val e = ByteBuffer.wrap(dir, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = math.max(0, (e.getShort(i * 128 + 64) & 0xffff) - 2) // minus trailing NUL
      val name = new String(dir, i * 128, math.min(nameLen, 64), StandardCharsets.UTF_16LE)
      Entry(name, dir(i * 128 + 66) & 0xff,
        e.getInt(i * 128 + 116).toLong & 0xffffffffL, e.getInt(i * 128 + 120).toLong & 0xffffffffL)
    }
    val root = entries.find(_.entryType == 5).getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
    val wb = entries.find(e => e.entryType == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: no Workbook stream (streams: ${entries.filter(_.entryType == 2).map(_.name).mkString(",")})"))
    if (wb.size >= miniCutoff) chain(wb.start, wb.size)
    else {
      // mini stream: 64-byte sectors inside the root entry's chain,
      // addressed through the miniFAT chain
      val miniStream = chain(root.start, root.size)
      val miniFatBytes = chain(firstMiniFat.toLong & 0xffffffffL, -1)
      val mf = ByteBuffer.wrap(miniFatBytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = new java.io.ByteArrayOutputStream()
      var id = wb.start
      var guard = 0
      while (id != EndOfChain && id != FreeSect && guard <= miniFatBytes.length / 4) {
        val off = (id * miniSecSize).toInt
        out.write(miniStream, off, math.min(miniSecSize, miniStream.length - off))
        id = mf.getInt(id.toInt * 4).toLong & 0xffffffffL
        guard += 1
      }
      java.util.Arrays.copyOf(out.toByteArray, wb.size.toInt)
    }
  }

  // ---- BIFF8 record scan ----------------------------------------------

  private case class Rec(id: Int, at: Int, data: Array[Byte])

  private def records(stream: Array[Byte], from: Int): Iterator[Rec] = new Iterator[Rec] {
    private var pos = from
    def hasNext: Boolean = pos + 4 <= stream.length
    def next(): Rec = {
      val bb = ByteBuffer.wrap(stream, pos, 4).order(ByteOrder.LITTLE_ENDIAN)
      val id = bb.getShort(pos) & 0xffff
      val len = bb.getShort(pos + 2) & 0xffff
      val r = Rec(id, pos, java.util.Arrays.copyOfRange(stream, pos + 4, pos + 4 + len))
      pos += 4 + len
      r
    }
  }

  /** Cursor over a record payload plus its Continue (0x003C) payloads.
    * Fixed fields read byte-wise across splits; character data restarts
    * its encoding flag byte at each continued chunk (MS-XLS 2.5.293). */
  private final class Cursor(chunks: IndexedSeq[Array[Byte]]) {
    private var ci = 0
    private var pos = 0
    private def skipEmpty(): Unit = while (ci < chunks.length && pos >= chunks(ci).length) { ci += 1; pos = 0 }
    def hasNext: Boolean = { skipEmpty(); ci < chunks.length }
    def u8(): Int = { skipEmpty(); val v = chunks(ci)(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def atChunkBoundary: Boolean = { skipEmpty(); pos == 0 && ci > 0 }
    /** Read `cch` characters: `wide0` is the current grbit bit0; a chunk
      * boundary mid-string re-reads the flag byte. */
    def chars(cch: Int, wide0: Boolean): String = {
      val sb = new StringBuilder
      var remaining = cch
      var wide = wide0
      while (remaining > 0) {
        skipEmpty()
        require(ci < chunks.length, "BIFF8: string runs past its record/Continue data")
        if (pos == 0 && ci > 0) wide = (u8() & 1) != 0 // continued chunk restarts its flag byte
        val availBytes = chunks(ci).length - pos
        val take = math.min(remaining, if (wide) availBytes / 2 else availBytes)
        require(take > 0, "BIFF8: malformed string split")
        if (wide) {
          sb.append(new String(chunks(ci), pos, take * 2, StandardCharsets.UTF_16LE)); pos += take * 2
        } else {
          sb.append(new String(chunks(ci), pos, take, StandardCharsets.ISO_8859_1)); pos += take
        }
        remaining -= take
      }
      sb.toString
    }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) { skipEmpty(); val t = math.min(left, chunks(ci).length - pos); pos += t; left -= t }
    }
  }

  /** XLUnicodeRichExtendedString (SST entries). */
  private def sstString(c: Cursor): String = {
    val cch = c.u16()
    val grbit = c.u8()
    val rich = (grbit & 8) != 0
    val ext = (grbit & 4) != 0
    val cRun = if (rich) c.u16() else 0
    val cbExt = if (ext) c.u32() else 0L
    val s = c.chars(cch, (grbit & 1) != 0)
    c.skip(cRun * 4)
    c.skip(cbExt.toInt)
    s
  }

  /** ShortXLUnicodeString (sheet names) / XLUnicodeRichExtendedString
    * (LABEL 0x0204, cached-formula STRING 0x0207). Parses the full
    * grbit — rich (0x08) and ext (0x04) payload counts sit between the
    * flags byte and the character data, so ignoring them would parse
    * cRun/cbExt header bytes as text — and refuses via Cursor bounds
    * when the string continues past this record (a Continue split this
    * single-record path can't stitch). */
  private def biffString(data: Array[Byte], at: Int, shortLen: Boolean,
      biff5: Boolean = false): String = {
    val c = new Cursor(IndexedSeq(java.util.Arrays.copyOfRange(data, at, data.length)))
    val cch = if (shortLen) c.u8() else c.u16()
    if (biff5) // BIFF5 byte string: no flags byte, latin-1 bytes follow
      return c.chars(cch, wide0 = false)
    val grbit = c.u8()
    if ((grbit & 8) != 0) c.u16() // cRun (rich runs follow the text; count precedes it)
    if ((grbit & 4) != 0) c.u32() // cbExt
    c.chars(cch, (grbit & 1) != 0)
  }

  private def rkValue(rk: Long): Double = {
    val base =
      if ((rk & 2) != 0) (rk.toInt >> 2).toDouble // 30-bit signed int
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  private def numString(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** Parse one .xls payload to positional rows (ExcelReader.parse's
    * contract: ragged rows of display strings, first worksheet only). */
  private[readers] def parse(bytes: Array[Byte]): Seq[Seq[String]] = {
    val stream = workbookStream(bytes)
    // workbook-globals substream: BOF .. EOF
    val globals = records(stream, 0)
    val first = globals.next()
    require(first.id == 0x0809, "BIFF: stream doesn't start with BOF")
    val vers = ByteBuffer.wrap(first.data).order(ByteOrder.LITTLE_ENDIAN).getShort(0) & 0xffff
    val biff5 = vers == 0x0500 // Excel 5.0 and 95 both stamp 0x0500
    require(vers == 0x0600 || biff5,
      f"BIFF version 0x$vers%04x outside the supported profile (BIFF8 and BIFF5 only)")
    val sst = mutable.ArrayBuffer[String]()
    var sheetOffsets = mutable.ArrayBuffer[Int]()
    var depth = 1
    var pendingSst: mutable.ArrayBuffer[Array[Byte]] = null
    var pendingSstDone = false
    def flushSst(): Unit = if (pendingSst != null && !pendingSstDone) {
      val c = new Cursor(pendingSst.toIndexedSeq)
      c.skip(4) // cstTotal
      val unique = c.u32()
      var i = 0L
      while (i < unique) { sst += sstString(c); i += 1 }
      pendingSstDone = true
    }
    while (depth > 0 && globals.hasNext) {
      val r = globals.next()
      r.id match {
        case 0x0809 => depth += 1
        case 0x000a => depth -= 1
        case 0x002f => throw new UnsupportedOperationException("BIFF8: encrypted workbook (FILEPASS)")
        case 0x00fc => pendingSst = mutable.ArrayBuffer(r.data); pendingSstDone = false
        case 0x003c => if (pendingSst != null && !pendingSstDone) pendingSst += r.data
        case 0x0085 =>
          flushSst()
          // byte 5 is the sheet type: keep 0x00 worksheets only — a
          // leading chart (0x02) or macro (0x01) sheet would otherwise
          // be parsed as "the" sheet and return no cells
          val isWorksheet = r.data.length < 6 || (r.data(5) & 0xff) == 0
          if (isWorksheet) {
            val off = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
            sheetOffsets += off
          }
        case _ => flushSst()
      }
    }
    flushSst()
    require(sheetOffsets.nonEmpty, "BIFF8: no BOUNDSHEET records")

    // first worksheet substream
    val cells = mutable.Map[(Int, Int), String]()
    var maxRow = -1
    val sheet = records(stream, sheetOffsets.head)
    val bof = sheet.next()
    require(bof.id == 0x0809, "BIFF8: worksheet offset doesn't point at BOF")
    var d2 = 1
    var lastString: Option[(Int, Int)] = None // FORMULA awaiting its STRING record
    def put(row: Int, col: Int, v: String): Unit = { cells((row, col)) = v; maxRow = math.max(maxRow, row) }
    while (d2 > 0 && sheet.hasNext) {
      val r = sheet.next()
      val bb = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
      r.id match {
        case 0x0809 => d2 += 1
        case 0x000a => d2 -= 1
        case 0x00fd => // LABELSST
          val isst = bb.getInt(6)
          put(bb.getShort(0) & 0xffff, bb.getShort(2) & 0xffff, sst.lift(isst).getOrElse(""))
        case 0x0203 => // NUMBER
          put(bb.getShort(0) & 0xffff, bb.getShort(2) & 0xffff, numString(bb.getDouble(6)))
        case 0x027e => // RK
          put(bb.getShort(0) & 0xffff, bb.getShort(2) & 0xffff,
            numString(rkValue(bb.getInt(6).toLong & 0xffffffffL)))
        case 0x00bd => // MULRK: row, colFirst, (ixfe, rk)*, colLast
          val row = bb.getShort(0) & 0xffff
          val colFirst = bb.getShort(2) & 0xffff
          val n = (r.data.length - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, numString(rkValue(bb.getInt(4 + i * 6 + 2).toLong & 0xffffffffL)))
        case 0x0205 => // BOOLERR: cell header (6) + bBoolErr + fError
          val fErr = r.data(7) & 0xff
          put(bb.getShort(0) & 0xffff, bb.getShort(2) & 0xffff,
            if (fErr != 0) "" else if ((r.data(6) & 0xff) != 0) "true" else "false")
        case 0x0204 => // LABEL (inline string; BIFF5: byte string)
          put(bb.getShort(0) & 0xffff, bb.getShort(2) & 0xffff,
            biffString(r.data, 6, shortLen = false, biff5 = biff5))
        case 0x0006 => // FORMULA: cached f64 result, or string marker 0xFFFF0000-style
          val row = bb.getShort(0) & 0xffff; val col = bb.getShort(2) & 0xffff
          if ((bb.getShort(12) & 0xffff) == 0xffff && (r.data(6) & 0xff) == 0)
            lastString = Some((row, col)) // cached value is a STRING record that follows
          else if ((bb.getShort(12) & 0xffff) != 0xffff)
            put(row, col, numString(bb.getDouble(6)))
          else put(row, col, "") // bool/err/blank cached results
        case 0x0207 => // STRING (cached formula result; BIFF5: byte string)
          lastString.foreach { case (row, col) =>
            put(row, col, biffString(r.data, 0, shortLen = false, biff5 = biff5)) }
          lastString = None
        case _ => ()
      }
    }
    if (maxRow < 0) return Nil
    (0 to maxRow).map { row =>
      val cols = cells.keysIterator.collect { case (r, c) if r == row => c }.toSeq
      val width = cols.maxOption.fold(0)(_ + 1)
      (0 until width).map(c => cells.getOrElse((row, c), ""))
    }
  }
}
