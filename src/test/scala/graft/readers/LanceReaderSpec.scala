package graft.readers

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Spec for the native Lance reader over a fixture dataset emitted by a
  * test-scope writer that follows the published Lance layout (manifest
  * trailer + v2 data-file footer/column-metadata walk). The writer
  * exercises both offsets profiles (u64 with leading 0, u32 without),
  * validity bitmaps, multi-fragment datasets, and version selection.
  */
object LanceFixture {

  // ---- protobuf wire writer -------------------------------------------
  final class Pb {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Pb = {
      var x = v
      do { val b = (x & 0x7f).toInt; x = x >>> 7; out.write(if (x != 0) b | 0x80 else b) } while (x != 0)
      this
    }
    def tag(field: Int, wire: Int): Pb = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Pb = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Pb = { tag(field, 2); varint(b.length); out.write(b); this }
    def str(field: Int, s: String): Pb = bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def msg(field: Int, m: Pb): Pb = bytes(field, m.out.toByteArray)
    def packed(field: Int, vs: Seq[Long]): Pb = {
      val p = new Pb; vs.foreach(p.varint); bytes(field, p.out.toByteArray)
    }
  }

  case class Col(name: String, id: Int, logicalType: String, nullable: Boolean,
      // page builder: (values per fragment) → (buffers, rowCount)
      pages: Seq[Seq[Array[Byte]]])

  private def le64(vs: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putLong); b.array()
  }

  def longs(vs: Seq[Long]): Array[Byte] = le64(vs)
  def doubles(vs: Seq[Double]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble); b.array()
  }
  def ints(vs: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putInt); b.array()
  }
  def bitmap(bits: Seq[Boolean]): Array[Byte] = {
    val b = new Array[Byte]((bits.length + 7) / 8)
    bits.zipWithIndex.foreach { case (set, i) => if (set) b(i >> 3) = (b(i >> 3) | (1 << (i & 7))).toByte }
    b
  }
  /** u64 offsets WITH leading 0 + bytes. */
  def stringBuffersU64(vs: Seq[String]): (Array[Byte], Array[Byte]) = {
    val enc = vs.map(_.getBytes(StandardCharsets.UTF_8))
    (le64(enc.scanLeft(0L)(_ + _.length)), enc.flatten.toArray)
  }
  /** u32 offsets WITHOUT leading 0 (end offsets only) + bytes. */
  def stringBuffersU32(vs: Seq[String]): (Array[Byte], Array[Byte]) = {
    val enc = vs.map(_.getBytes(StandardCharsets.UTF_8))
    val ends = enc.scanLeft(0L)(_ + _.length).tail
    val b = ByteBuffer.allocate(ends.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    ends.foreach(e => b.putInt(e.toInt))
    (b.array(), enc.flatten.toArray)
  }

  /** Write one v2 data file; one page per column. Returns file name. */
  def writeDataFile(dir: File, fileName: String, cols: Seq[(Seq[Array[Byte]], Int)]): Unit = {
    val out = new ByteArrayOutputStream()
    out.write("LANC".getBytes(StandardCharsets.US_ASCII)) // leading pad (parquet-style)
    // data buffers
    val colBuffers = cols.map { case (buffers, _) =>
      buffers.map { b => val at = out.size().toLong; out.write(b); (at, b.length.toLong) }
    }
    // column metadata protos
    val metaEntries = cols.zip(colBuffers).map { case ((_, nRows), buffers) =>
      val page = new Pb()
        .packed(1, buffers.map(_._1))
        .packed(2, buffers.map(_._2))
        .int(4, nRows)
      val colMeta = new Pb().msg(1, page)
      val at = out.size().toLong
      val bytes = colMeta.out.toByteArray
      out.write(bytes)
      (at, bytes.length.toLong)
    }
    val colMetaStart = metaEntries.head._1
    val colMetaOffsetsStart = out.size().toLong
    metaEntries.foreach { case (at, len) => out.write(le64(Seq(at, len))) }
    val globalStart = out.size().toLong
    val footer = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    footer.putLong(colMetaStart).putLong(colMetaOffsetsStart).putLong(globalStart)
    footer.putInt(0).putInt(cols.size).putShort(0).putShort(3)
    footer.put("LANC".getBytes(StandardCharsets.US_ASCII))
    out.write(footer.array())
    val dataDir = new File(dir, "data"); dataDir.mkdirs()
    val f = new FileOutputStream(new File(dataDir, fileName))
    try f.write(out.toByteArray) finally f.close()
  }

  case class FieldSpec(name: String, id: Int, logicalType: String, nullable: Boolean)
  case class FragSpec(id: Long, file: String, fieldIds: Seq[Int], rows: Long, withDeletion: Boolean = false)

  def writeManifest(dir: File, version: Long, fields: Seq[FieldSpec], frags: Seq[FragSpec]): Unit = {
    val m = new Pb
    fields.foreach { f =>
      m.msg(1, new Pb().int(1, 2) // LEAF
        .str(2, f.name).int(3, f.id).int(4, -1L) // parent_id -1 (root)
        .str(5, f.logicalType).int(6, if (f.nullable) 1 else 0))
    }
    frags.foreach { fr =>
      val df = new Pb().str(1, fr.file)
      fr.fieldIds.foreach(id => df.int(2, id))
      val frag = new Pb().int(1, fr.id).msg(2, df).int(4, fr.rows)
      if (fr.withDeletion) frag.msg(3, new Pb().int(1, 7))
      m.msg(2, frag)
    }
    m.int(3, version)
    val proto = m.out.toByteArray
    val file = new ByteArrayOutputStream()
    val lenPrefix = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(proto.length)
    val protoPos = file.size().toLong
    file.write(lenPrefix.array()); file.write(proto)
    val trailer = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    trailer.putLong(protoPos).putShort(0).putShort(3)
    trailer.put("LANC".getBytes(StandardCharsets.US_ASCII))
    file.write(trailer.array())
    val vdir = new File(dir, "_versions"); vdir.mkdirs()
    val f = new FileOutputStream(new File(vdir, s"$version.manifest"))
    try f.write(file.toByteArray) finally f.close()
  }
}

class LanceReaderSpec extends SparkSpec {
  import LanceFixture._

  private def fixture(): File = {
    val dir = java.nio.file.Files.createTempDirectory("lance").toFile
    // fragment 0: 3 rows; fragment 1: 2 rows
    writeDataFile(dir, "frag0.lance", Seq(
      (Seq(longs(Seq(1L, 2L, 3L))), 3),                                     // id
      (Seq(doubles(Seq(0.5, 1.5, 2.5))), 3),                                // score
      ({ val (o, d) = stringBuffersU64(Seq("alpha", "beta", "gamma")); Seq(o, d) }, 3), // name
      (Seq(bitmap(Seq(true, false, true)), ints(Seq(10, 0, 30))), 3)        // val (nullable int32)
    ))
    writeDataFile(dir, "frag1.lance", Seq(
      (Seq(longs(Seq(4L, 5L))), 2),
      (Seq(doubles(Seq(3.5, 4.5))), 2),
      ({ val (o, d) = stringBuffersU32(Seq("delta", "eps")); Seq(o, d) }, 2), // u32 no-leading profile
      (Seq(bitmap(Seq(false, true)), ints(Seq(0, 50))), 2)
    ))
    writeManifest(dir, 1,
      Seq(FieldSpec("id", 0, "int64", nullable = false),
        FieldSpec("score", 1, "double", nullable = false),
        FieldSpec("name", 2, "string", nullable = false),
        FieldSpec("val", 3, "int32", nullable = true)),
      Seq(FragSpec(0, "frag0.lance", Seq(0, 1, 2, 3), 3),
        FragSpec(1, "frag1.lance", Seq(0, 1, 2, 3), 2)))
    dir
  }

  test("reads a multi-fragment dataset with both offsets profiles and validity bitmaps") {
    import spark.implicits._
    val dir = fixture()
    val df = LanceReader.read(spark, dir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq == Seq("id", "score", "name", "val"))
    val rows = df.orderBy("id")
      .select($"id", $"score", $"name", $"val")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), if (r.isNullAt(3)) null else r.getInt(3)))
    assert(rows.toSeq == Seq(
      (1L, 0.5, "alpha", 10), (2L, 1.5, "beta", null), (3L, 2.5, "gamma", 30),
      (4L, 3.5, "delta", null), (5L, 4.5, "eps", 50)))
  }

  test("column pruning reaches the reader (single-column schema, values intact)") {
    import spark.implicits._
    val dir = fixture()
    val df = LanceReader.read(spark, dir.getAbsolutePath, columns = Seq("name"))
    assert(df.schema.fieldNames.toSeq == Seq("name"))
    assert(df.as[String].collect().sorted.toSeq == Seq("alpha", "beta", "delta", "eps", "gamma"))
  }

  test("the highest manifest version wins") {
    val dir = fixture()
    // v2 shrinks the dataset to fragment 0 only
    writeManifest(dir, 2,
      Seq(FieldSpec("id", 0, "int64", nullable = false),
        FieldSpec("score", 1, "double", nullable = false),
        FieldSpec("name", 2, "string", nullable = false),
        FieldSpec("val", 3, "int32", nullable = true)),
      Seq(FragSpec(0, "frag0.lance", Seq(0, 1, 2, 3), 3)))
    assert(LanceReader.read(spark, dir.getAbsolutePath).count() == 3)
  }

  test("fragments with deletion files are refused, not silently resurrected") {
    val dir = fixture()
    writeManifest(dir, 3,
      Seq(FieldSpec("id", 0, "int64", nullable = false)),
      Seq(FragSpec(0, "frag0.lance", Seq(0), 3, withDeletion = true)))
    val e = intercept[org.apache.spark.SparkException] {
      LanceReader.read(spark, dir.getAbsolutePath).count()
    }
    assert(e.getMessage.contains("deletion") || e.getCause.getMessage.contains("deletion"))
  }

  test("registered reader routes the lance kind") {
    val dir = fixture()
    val ref = graft.datatypes.DataRef("lance", dir.getAbsolutePath)
    val reader = SparkReaders.all.find(_.isOk(ref))
    assert(reader.exists(_.name == "lance_native"))
    assert(reader.get.read(spark, ref).count() == 5)
  }
}
