package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Fixtures hand-encoded from the community-documented sas7bdat layout
  * (the same constants the public pandas/parso readers use), independent
  * of the reader: both the 32-bit and 64-bit little-endian layouts, one
  * meta page + two data pages, four columns including a truncated-width
  * numeric, a missing numeric and a blank char cell.
  */
class SasReaderSpec extends SparkSpec {
  import spark.implicits._

  private val magic = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  /** (name, seq of (id, name, score, qtyHighBytes)) rows are fixed. */
  private def build(u64: Boolean): Array[Byte] = {
    val ilen = if (u64) 8 else 4
    val bo = if (u64) 32 else 16
    val plen = if (u64) 24 else 12
    val pageLen = 1024
    val headerLen = 1024
    val rowLen = 28

    val out = ByteBuffer.allocate(headerLen + 3 * pageLen).order(ByteOrder.LITTLE_ENDIAN)
    // ---- header ----
    out.put(magic)
    if (u64) { out.put(32, 0x33.toByte); out.put(35, 0x33.toByte) }
    else { out.put(32, 0x22.toByte); out.put(35, 0x22.toByte) }
    out.put(37, 0x01.toByte) // little-endian
    "fixture".getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, i) => out.put(92 + i, b) }
    val align1 = if (u64) 4 else 0
    out.putInt(196 + align1, headerLen)
    out.putInt(200 + align1, pageLen)
    if (u64) out.putLong(204 + align1, 3L) else out.putInt(204 + align1, 3)

    // ---- meta page (page 0, type 0) ----
    val p0 = headerLen
    out.putShort(p0 + bo, 0.toShort)
    out.putShort(p0 + bo + 2, 5.toShort) // block count = subheaders
    out.putShort(p0 + bo + 4, 5.toShort)

    // subheader bodies placed at fixed offsets inside the page
    var at = 512
    def pointer(i: Int, off: Int, len: Int): Unit = {
      val p = p0 + bo + 8 + i * plen
      if (u64) { out.putLong(p, off.toLong); out.putLong(p + 8, len.toLong) }
      else { out.putInt(p, off); out.putInt(p + 4, len) }
      // compression byte and type byte stay 0 (uncompressed)
    }
    def sig32(off: Int, v: Long): Unit = out.putInt(p0 + off, v.toInt)

    // row size (sig F7F7F7F7): row_length @5*ilen, row_count @6*ilen,
    // mix row count @15*ilen
    val rsOff = at; val rsLen = 32 * ilen
    sig32(rsOff, 0xf7f7f7f7L)
    if (u64) {
      out.putLong(p0 + rsOff + 5 * ilen, rowLen.toLong)
      out.putLong(p0 + rsOff + 6 * ilen, 5L)
      out.putLong(p0 + rsOff + 15 * ilen, 0L)
    } else {
      out.putInt(p0 + rsOff + 5 * ilen, rowLen)
      out.putInt(p0 + rsOff + 6 * ilen, 5)
      out.putInt(p0 + rsOff + 15 * ilen, 0)
    }
    pointer(0, rsOff, rsLen); at += rsLen

    // column size (sig F6F6F6F6): col_count @ilen
    val csOff = at; val csLen = 3 * ilen
    sig32(csOff, 0xf6f6f6f6L)
    if (u64) out.putLong(p0 + csOff + ilen, 4L) else out.putInt(p0 + csOff + ilen, 4)
    pointer(1, csOff, csLen); at += csLen

    // column text (sig FFFFFFFD): buffer = [u16 size][6 pad]["id","name","score","qty"]
    val names = "id" + "name" + "score" + "qty"
    val textOff = at
    val bufSize = 8 + names.length
    sig32(textOff, 0xfffffffdL)
    out.putShort(p0 + textOff + ilen, bufSize.toShort)
    names.getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, i) =>
      out.put(p0 + textOff + ilen + 8 + i, b)
    }
    val textLen = ilen + bufSize
    pointer(2, textOff, textLen); at += ((textLen + 7) & ~7)

    // column names (sig FFFFFFFF): entries of 8 at shOff + ilen + 8*(i+1):
    // [u16 textIdx][u16 off][u16 len][u16 pad]
    val nameMeta = Seq((8, 2), (10, 4), (14, 5), (19, 3)) // offsets in text buffer
    val cnOff = at; val cnLen = 2 * ilen + 12 + 8 * 4
    sig32(cnOff, 0xffffffffL)
    nameMeta.zipWithIndex.foreach { case ((o, l), i) =>
      val e = p0 + cnOff + ilen + 8 * (i + 1)
      out.putShort(e, 0.toShort); out.putShort(e + 2, o.toShort); out.putShort(e + 4, l.toShort)
    }
    pointer(3, cnOff, cnLen); at += ((cnLen + 7) & ~7)

    // column attributes (sig FFFFFFFC): entries of ilen+8 at
    // shOff + ilen + 8 + i*(ilen+8): [int colOff][u32 width]...[u8 type @ +ilen+6]
    val attrMeta = Seq((0, 8, 1), (8, 8, 2), (16, 8, 1), (24, 4, 1))
    val caOff = at; val caLen = 2 * ilen + 12 + (ilen + 8) * 4
    sig32(caOff, 0xfffffffcL)
    attrMeta.zipWithIndex.foreach { case ((o, w, t), i) =>
      val e = p0 + caOff + ilen + 8 + i * (ilen + 8)
      if (u64) out.putLong(e, o.toLong) else out.putInt(e, o)
      out.putInt(e + ilen, w)
      out.put(e + ilen + 6, t.toByte)
    }
    pointer(4, caOff, caLen)

    // ---- data pages (type 256): rows at bo + 8 ----
    def numCell(p: Int, v: Double): Unit = out.putDouble(p, v)
    def charCell(p: Int, s: String): Unit =
      s.padTo(8, ' ').getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, i) => out.put(p + i, b) }
    def qtyCell(p: Int, v: Option[Double]): Unit = {
      // truncated numeric: the HIGH 4 bytes of the LE double pattern
      val full = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v.getOrElse(Double.NaN)).array()
      (0 until 4).foreach(i => out.put(p + i, full(4 + i)))
    }
    def dataPage(page: Int, rows: Seq[(Double, String, Double, Option[Double])]): Unit = {
      val p = headerLen + page * pageLen
      out.putShort(p + bo, 256.toShort)
      out.putShort(p + bo + 2, rows.size.toShort)
      rows.zipWithIndex.foreach { case ((id, nm, sc, qty), r) =>
        val rp = p + bo + 8 + r * rowLen
        numCell(rp, id); charCell(rp + 8, nm); numCell(rp + 16, sc); qtyCell(rp + 24, qty)
      }
    }
    dataPage(1, Seq((1.0, "alpha", 9.5, Some(3.0)), (2.0, "beta", -1.25, Some(8.0)), (3.0, "gamma", 0.0, None)))
    dataPage(2, Seq((4.0, "", 2.5, Some(16.0)), (5.0, "edge", 100.0, Some(0.0))))
    out.array()
  }

  private def write(u64: Boolean): String = {
    val dir = Files.createTempDirectory("sas")
    Files.write(dir.resolve("fix.sas7bdat"), build(u64))
    s"file://$dir/fix.sas7bdat"
  }

  private def check(url: String): Unit = {
    val df = SasReader.read(spark, url)
    assert(df.columns.toSeq == Seq("id", "name", "score", "qty"))
    assert(df.schema.map(_.dataType.typeName) == Seq("double", "string", "double", "double"))
    val rows = df.as[(Double, Option[String], Double, Option[Double])].collect().sortBy(_._1)
    assert(rows.length == 5)
    assert(rows(0) == ((1.0, Some("alpha"), 9.5, Some(3.0))))
    assert(rows(1) == ((2.0, Some("beta"), -1.25, Some(8.0))))
    assert(rows(2) == ((3.0, Some("gamma"), 0.0, None)))     // missing numeric -> null
    assert(rows(3) == ((4.0, None, 2.5, Some(16.0))))        // blank char -> null
    assert(rows(4) == ((5.0, Some("edge"), 100.0, Some(0.0))))
  }

  test("32-bit little-endian layout reads across data pages") {
    val url = write(u64 = false)
    val m = SasReader.meta(url, spark.sparkContext.hadoopConfiguration)
    assert(!m.u64 && m.littleEndian && m.datasetName == "fixture")
    assert(m.rowLength == 28 && m.rowCount == 5 && m.pageCount == 3)
    check(url)
  }

  test("64-bit little-endian layout reads across data pages") {
    val url = write(u64 = true)
    val m = SasReader.meta(url, spark.sparkContext.hadoopConfiguration)
    assert(m.u64 && m.columns.map(_.name) == Seq("id", "name", "score", "qty"))
    check(url)
  }

  test("kind detection and registry routing") {
    val head = build(u64 = false).take(64)
    assert(Detect.recommend("x.sas7bdat", head = head).head.kind.name == "sas")
    val df = SparkReaders.reader("sas_reader").get.read(spark, DataRef("sas", write(u64 = false)))
    assert(df.count() == 5)
    // .xpt transport files are the same kind but not this reader's format
    assert(!SparkReaders.reader("sas_reader").get.isOk(DataRef("sas", "file:///x.xpt")))
  }
}
