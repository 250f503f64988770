package graft.readers

import graft.SparkSpec
import graft.pipeline.Pipeline
import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class ExcelReaderSpec extends SparkSpec {

  /** Hand-built minimal OOXML workbook: shared strings + one sheet. */
  private def writeXlsx(path: String): Unit = {
    val shared =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>name</t></si><si><t>score</t></si><si><t>ada</t></si><si><t>grace</t></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>9.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>12</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    put("xl/sharedStrings.xml", shared)
    put("xl/worksheets/sheet1.xml", sheet)
    zout.close()
  }

  test("xlsx reads with header, shared strings, and numeric inference") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsx").toString
    writeXlsx(s"$dir/t.xlsx")
    val df = ExcelReader.read(spark, s"file://$dir/t.xlsx")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(("name", "string"), ("score", "double")))
    assert(df.as[(String, Double)].collect().sortBy(_._1).toSeq == Seq(("ada", 9.5), ("grace", 12.0)))
  }

  test("colIndex maps A/Z/AA correctly") {
    assert(ExcelReader.colIndex("A1") == 0)
    assert(ExcelReader.colIndex("Z9") == 25)
    assert(ExcelReader.colIndex("AA3") == 26)
  }

  test("detection routes .xlsx to the excel reader") {
    val dir = Files.createTempDirectory("xlsx2").toString
    writeXlsx(s"$dir/u.xlsx")
    val p = Pipeline.auto(s"file://$dir/u.xlsx")
    assert(p.source.name == "excel_reader")
    assert(p.read(spark).count() == 2)
  }

  // ---- legacy .xls (BIFF8 in a CFB container) -------------------------

  import java.nio.{ByteBuffer, ByteOrder}

  private def rec(id: Int, data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(id.toShort).putShort(data.length.toShort).put(data)
    bb.array()
  }
  private def le(parts: (Int, Long)*): Array[Byte] = { // (byteWidth, value)*
    val bb = ByteBuffer.allocate(parts.map(_._1).sum).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach {
      case (1, v) => bb.put(v.toByte)
      case (2, v) => bb.putShort(v.toShort)
      case (4, v) => bb.putInt(v.toInt)
      case (8, v) => bb.putLong(v)
      case (w, _) => fail(s"width $w")
    }
    bb.array()
  }
  private def f64(prefix: Array[Byte], v: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(prefix.length + 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(prefix).putDouble(v)
    bb.array()
  }
  private def sstStr(s: String, wide: Boolean = false): Array[Byte] = {
    val chars = if (wide) s.getBytes("UTF-16LE") else s.getBytes("ISO-8859-1")
    le((2, s.length.toLong), (1, if (wide) 1L else 0L)) ++ chars
  }

  /** Workbook stream: globals (SST split across a Continue, BOUNDSHEET)
    * + one worksheet (LABELSST/NUMBER/RK/MULRK/BOOLERR cells). */
  private def biffWorkbookStream(pad: Int = 0, chartFirst: Boolean = false): Array[Byte] = {
    val bofGlobals = rec(0x0809, le((2, 0x0600L), (2, 0x0005L), (4, 0L)))
    val bofSheet = rec(0x0809, le((2, 0x0600L), (2, 0x0010L), (4, 0L)))
    val bofChart = rec(0x0809, le((2, 0x0600L), (2, 0x0020L), (4, 0L)))
    // SST: 4 strings; "score" split mid-chars into a Continue record,
    // "naïve" wide (UTF-16LE) to pin both encodings
    val s0 = sstStr("name"); val s2 = sstStr("ada"); val s3 = sstStr("naïve", wide = true)
    val scoreHead = le((2, 5L), (1, 0L)) ++ "sco".getBytes("ISO-8859-1")
    val sstRec = rec(0x00fc, le((4, 4L), (4, 4L)) ++ s0 ++ scoreHead)
    val contRec = rec(0x003c, le((1, 0L)) ++ "re".getBytes("ISO-8859-1") ++ s2 ++ s3)
    val padRec = if (pad > 0) rec(0x00eb, new Array[Byte](pad)) else Array.emptyByteArray
    // worksheet cells:
    //   row0: headers (LABELSST 0, 1) ; row1: "ada", 9.5 (NUMBER)
    //   row2: "naïve", 12 (RK int) ; row3: MULRK 2.5/7 ; BOOLERR true
    val cells =
      rec(0x00fd, le((2, 0L), (2, 0L), (2, 0L), (4, 0L))) ++
      rec(0x00fd, le((2, 0L), (2, 1L), (2, 0L), (4, 1L))) ++
      rec(0x00fd, le((2, 1L), (2, 0L), (2, 0L), (4, 2L))) ++
      rec(0x0203, f64(le((2, 1L), (2, 1L), (2, 0L)), 9.5)) ++
      rec(0x00fd, le((2, 2L), (2, 0L), (2, 0L), (4, 3L))) ++
      rec(0x027e, le((2, 2L), (2, 1L), (2, 0L), (4, (12L << 2) | 2L))) ++
      rec(0x00bd, le((2, 3L), (2, 0L), (2, 0L), (4, (250L << 2) | 3L), (2, 0L), (4, (7L << 2) | 2L), (2, 1L))) ++
      rec(0x0205, le((2, 4L), (2, 0L), (2, 0L), (1, 1L), (1, 0L)))
    val sheet = bofSheet ++ cells ++ rec(0x000a, Array.emptyByteArray)
    // BOUNDSHEET needs the sheet substream offset — assemble in order
    val name = "Sheet1"
    val bsData = le((4, 0L), (1, 0L), (1, 0L), (1, name.length.toLong), (1, 0L)) ++ name.getBytes("ISO-8859-1")
    val bs = rec(0x0085, bsData)
    // optional leading chart sheet (type byte 0x02): its BOUNDSHEET must
    // be SKIPPED by the reader, not parsed as "the" worksheet
    val chartName = "Chart1"
    val bsChart = if (!chartFirst) Array.emptyByteArray
      else rec(0x0085, le((4, 0L), (1, 0L), (1, 2L), (1, chartName.length.toLong), (1, 0L)) ++ chartName.getBytes("ISO-8859-1"))
    val chartSheet = if (!chartFirst) Array.emptyByteArray
      else bofChart ++ rec(0x000a, Array.emptyByteArray)
    val globals = bofGlobals ++ padRec ++ sstRec ++ contRec ++ bsChart ++ bs ++ rec(0x000a, Array.emptyByteArray)
    val chartOff = globals.length
    val sheetOff = globals.length + chartSheet.length
    val full = globals ++ chartSheet ++ sheet
    // patch each BOUNDSHEET lbPlyPos (first 4 bytes of its data)
    val bsChartPos = bofGlobals.length + padRec.length + sstRec.length + contRec.length
    val bb = ByteBuffer.wrap(full).order(ByteOrder.LITTLE_ENDIAN)
    if (chartFirst) bb.putInt(bsChartPos + 4, chartOff)
    bb.putInt(bsChartPos + bsChart.length + 4, sheetOff)
    full
  }

  /** Minimal CFB container: FAT sector 0, directory sector 1, then the
    * stream — through the mini stream (64-byte sectors) when the
    * workbook is under the 4096-byte cutoff, regular sectors otherwise. */
  private def cfb(stream: Array[Byte]): Array[Byte] = {
    val Free = 0xffffffff; val End = 0xfffffffe; val FatSect = 0xfffffffd
    def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      e.put(n).position(64)
      e.putShort((n.length + 2).toShort)
      e.put(typ.toByte).put(1.toByte)
      e.position(116)
      e.putInt(start).putInt(size)
      e.array()
    }
    val mini = stream.length < 4096
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.putLong(0xe11ab1a1e011cfd0L)
    header.position(24)
    header.putShort(0x3e).putShort(3).putShort(0xfffe.toShort).putShort(9).putShort(6)
    header.position(44)
    if (mini) {
      val nMiniSec = (stream.length + 63) / 64
      val containerBytes = nMiniSec * 64
      val nContainerSec = (containerBytes + 511) / 512
      // sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. mini-stream container
      header.putInt(1).putInt(1).putInt(0) // nFat, firstDir, transaction
      header.putInt(4096).putInt(2).putInt(1) // cutoff, firstMiniFat, nMiniFat
      header.putInt(End).putInt(0) // firstDifat, nDifat
      header.putInt(0) // DIFAT[0] = FAT at sector 0
      for (_ <- 1 until 109) header.putInt(Free)
      val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      fat.putInt(FatSect).putInt(End).putInt(End) // 0 FAT, 1 dir, 2 miniFAT
      for (i <- 0 until nContainerSec) fat.putInt(if (i == nContainerSec - 1) End else 4 + i)
      while (fat.position() < 512) fat.putInt(Free)
      val dir = dirEntry("Root Entry", 5, 3, containerBytes) ++
        dirEntry("Workbook", 2, 0, stream.length) ++ new Array[Byte](256)
      val miniFat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until nMiniSec) miniFat.putInt(if (i == nMiniSec - 1) End else i + 1)
      while (miniFat.position() < 512) miniFat.putInt(Free)
      val container = java.util.Arrays.copyOf(stream, nContainerSec * 512)
      header.array() ++ fat.array() ++ dir ++ miniFat.array() ++ container
    } else {
      val nStreamSec = (stream.length + 511) / 512
      // sectors: 0 FAT(s), 1 dir, 2.. stream  (assume stream fits one FAT sector's entries)
      require(nStreamSec + 2 <= 128, "fixture stream too large for one FAT sector")
      header.putInt(1).putInt(1).putInt(0)
      header.putInt(4096).putInt(End).putInt(0) // cutoff, no miniFAT
      header.putInt(End).putInt(0)
      header.putInt(0)
      for (_ <- 1 until 109) header.putInt(Free)
      val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      fat.putInt(FatSect).putInt(End)
      for (i <- 0 until nStreamSec) fat.putInt(if (i == nStreamSec - 1) End else 3 + i)
      while (fat.position() < 512) fat.putInt(Free)
      val dir = dirEntry("Root Entry", 5, End, 0) ++
        dirEntry("Workbook", 2, 2, stream.length) ++ new Array[Byte](256)
      header.array() ++ fat.array() ++ dir ++ java.util.Arrays.copyOf(stream, nStreamSec * 512)
    }
  }

  private def checkXls(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(("name", "string"), ("score", "double")))
    val rows = df.collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(rows.toSet == Set(("ada", 9.5), ("naïve", 12.0), ("2.5", 7.0), ("true", null)))
  }

  test(".xls BIFF8 via the mini stream: SST continue split, RK/MULRK/BOOLERR") {
    val dir = Files.createTempDirectory("xls").toString
    val bytes = cfb(biffWorkbookStream())
    Files.write(java.nio.file.Paths.get(s"$dir/t.xls"), bytes)
    checkXls(ExcelReader.read(spark, s"file://$dir/t.xls"))
  }

  test(".xls with a leading chart sheet still parses the first worksheet") {
    val dir = Files.createTempDirectory("xlschart").toString
    val bytes = cfb(biffWorkbookStream(chartFirst = true))
    Files.write(java.nio.file.Paths.get(s"$dir/c.xls"), bytes)
    checkXls(ExcelReader.read(spark, s"file://$dir/c.xls"))
  }

  test(".xls BIFF8 via regular sectors (stream past the mini cutoff)") {
    val dir = Files.createTempDirectory("xlsbig").toString
    val bytes = cfb(biffWorkbookStream(pad = 5000))
    Files.write(java.nio.file.Paths.get(s"$dir/big.xls"), bytes)
    checkXls(ExcelReader.read(spark, s"file://$dir/big.xls"))
  }

  test(".xls BIFF5 (Excel 5.0/95) reads byte-string cells") {
    // BIFF5: no SST/LABELSST; inline LABEL text is a plain byte string
    // (u16 cch + latin-1 bytes, NO flags byte) — a BIFF8-style parse
    // would eat the first character as a flags byte
    val bof5g = rec(0x0809, le((2, 0x0500L), (2, 0x0005L), (4, 0L)))
    val bof5s = rec(0x0809, le((2, 0x0500L), (2, 0x0010L), (4, 0L)))
    def label5(row: Long, c: Long, s: String) =
      rec(0x0204, le((2, row), (2, c), (2, 0L), (2, s.length.toLong)) ++ s.getBytes("ISO-8859-1"))
    val cells =
      label5(0, 0, "name") ++ label5(0, 1, "score") ++
      label5(1, 0, "ada") ++ rec(0x0203, f64(le((2, 1L), (2, 1L), (2, 0L)), 9.5)) ++
      label5(2, 0, "naïve") ++ rec(0x027e, le((2, 2L), (2, 1L), (2, 0L), (4, (12L << 2) | 2L)))
    val sheet = bof5s ++ cells ++ rec(0x000a, Array.emptyByteArray)
    val name = "Sheet1"
    val bsData = le((4, 0L), (1, 0L), (1, 0L), (1, name.length.toLong)) ++ name.getBytes("ISO-8859-1")
    val globals = bof5g ++ rec(0x0085, bsData) ++ rec(0x000a, Array.emptyByteArray)
    val full = globals ++ sheet
    ByteBuffer.wrap(full).order(ByteOrder.LITTLE_ENDIAN).putInt(bof5g.length + 4, globals.length)
    val rows = BiffReader.parse(cfb(full))
    assert(rows == Seq(Seq("name", "score"), Seq("ada", "9.5"), Seq("naïve", "12")))
  }

  test(".xls pre-BIFF5 versions refuse with a clear error") {
    val bof4 = rec(0x0809, le((2, 0x0400L), (2, 0x0005L), (4, 0L)))
    val stream = bof4 ++ rec(0x000a, Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](BiffReader.parse(cfb(stream)))
    assert(e.getMessage.contains("BIFF8 and BIFF5 only"))
  }

  /** Workbook stream with a single LABEL (0x0204) cell carrying the
    * given XLUnicodeRichExtendedString payload (after the 6-byte cell
    * header). */
  private def labelWorkbook(stringPayload: Array[Byte]): Array[Byte] = {
    val bofGlobals = rec(0x0809, le((2, 0x0600L), (2, 0x0005L), (4, 0L)))
    val bofSheet = rec(0x0809, le((2, 0x0600L), (2, 0x0010L), (4, 0L)))
    val label = rec(0x0204, le((2, 0L), (2, 0L), (2, 0L)) ++ stringPayload)
    val sheet = bofSheet ++ label ++ rec(0x000a, Array.emptyByteArray)
    val name = "Sheet1"
    val bsData = le((4, 0L), (1, 0L), (1, 0L), (1, name.length.toLong), (1, 0L)) ++ name.getBytes("ISO-8859-1")
    val globals = bofGlobals ++ rec(0x0085, bsData) ++ rec(0x000a, Array.emptyByteArray)
    val full = globals ++ sheet
    ByteBuffer.wrap(full).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(bofGlobals.length + 4, globals.length) // patch lbPlyPos
    full
  }

  test(".xls inline LABEL with rich/ext flags parses text, not header bytes") {
    // rich (grbit 0x08): cRun sits between the flags and the chars —
    // ignoring it would read the cRun bytes as the first characters
    val rich = le((2, 2L), (1, 0x08L), (2, 2L)) ++ "hi".getBytes("ISO-8859-1") ++ new Array[Byte](8)
    assert(BiffReader.parse(cfb(labelWorkbook(rich))) == Seq(Seq("hi")))
    // rich + ext + wide (grbit 0x0D): cRun, cbExt, then UTF-16LE chars
    val richExtWide = le((2, 2L), (1, 0x0dL), (2, 1L), (4, 3L)) ++
      "éz".getBytes("UTF-16LE") ++ new Array[Byte](7)
    assert(BiffReader.parse(cfb(labelWorkbook(richExtWide))) == Seq(Seq("éz")))
  }

  test(".xls inline LABEL continued past its record refuses, no garbage") {
    // cch claims 40 chars but only 8 are in the record (a Continue
    // split this single-record path can't stitch) — must refuse
    val truncated = le((2, 40L), (1, 0L)) ++ "only8chr".getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](BiffReader.parse(cfb(labelWorkbook(truncated))))
    assert(e.getMessage.contains("BIFF8"))
  }

  test(".xlsb refuses with an explicit unsupported-format message") {
    val dir = Files.createTempDirectory("xlsb").toString
    val zout = new ZipOutputStream(new FileOutputStream(s"$dir/b.xlsb"))
    for (n <- Seq("xl/workbook.bin", "xl/worksheets/sheet1.bin")) {
      zout.putNextEntry(new ZipEntry(n)); zout.write(Array[Byte](1, 2, 3)); zout.closeEntry()
    }
    zout.close()
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/b.xlsb"))
    val e = intercept[IllegalArgumentException](ExcelReader.parse(bytes))
    assert(e.getMessage.contains("xlsb"))
  }

  test("detection routes .xls to the excel reader (CFB magic)") {
    val dir = Files.createTempDirectory("xlsroute").toString
    Files.write(java.nio.file.Paths.get(s"$dir/r.xls"), cfb(biffWorkbookStream()))
    val p = Pipeline.auto(s"file://$dir/r.xls")
    assert(p.source.name == "excel_reader")
    assert(p.read(spark).count() == 4)
  }
}
