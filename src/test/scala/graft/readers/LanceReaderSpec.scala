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
  /** deletion = (readVersion, id, isBitmap) → `_deletions/{frag}-{rv}-{id}.{arrow|bin}` */
  case class FragSpec(id: Long, file: String, fieldIds: Seq[Int], rows: Long,
      deletion: Option[(Long, Long, Boolean)] = None)

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
      fr.deletion.foreach { case (rv, did, bitmap) =>
        frag.msg(3, new Pb().int(1, rv).int(2, did).int(3, if (bitmap) 1 else 0))
      }
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

  /** Real Arrow IPC file with one int32 column of local row offsets —
    * the ARROW_ARRAY deletion-file shape. */
  private def writeArrowDeletion(dir: File, name: String, offsets: Seq[Int]): Unit = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{IntVector, VectorSchemaRoot}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    val alloc = new RootAllocator()
    val vec = new IntVector("row_offset", alloc)
    vec.allocateNew(offsets.size)
    offsets.zipWithIndex.foreach { case (v, i) => vec.setSafe(i, v) }
    vec.setValueCount(offsets.size)
    val root = new VectorSchemaRoot(java.util.List.of(vec.getField), java.util.List.of[org.apache.arrow.vector.FieldVector](vec), offsets.size)
    val delDir = new File(dir, "_deletions"); delDir.mkdirs()
    val ch = new FileOutputStream(new File(delDir, name)).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    try { w.start(); w.writeBatch(); w.end() } finally { w.close(); ch.close(); root.close(); alloc.close() }
  }

  /** Portable-format Roaring bitmap with one array container (key 0). */
  private def writeRoaringDeletion(dir: File, name: String, offsets: Seq[Int]): Unit = {
    val bb = ByteBuffer.allocate(8 + 4 + 4 + 2 * offsets.size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
    bb.putInt(1)     // one container
    bb.putShort(0)   // key
    bb.putShort((offsets.size - 1).toShort) // cardinality - 1
    bb.putInt(bb.position() + 4) // offsets table (single entry)
    offsets.sorted.foreach(v => bb.putShort(v.toShort))
    val delDir = new File(dir, "_deletions"); delDir.mkdirs()
    val f = new FileOutputStream(new File(delDir, name))
    try f.write(bb.array()) finally f.close()
  }

  test("arrow deletion files filter the fragment's deleted rows") {
    import spark.implicits._
    val dir = fixture()
    writeArrowDeletion(dir, "0-7-3.arrow", Seq(1)) // drop "beta" from fragment 0
    writeManifest(dir, 3,
      Seq(FieldSpec("id", 0, "int64", nullable = false),
        FieldSpec("score", 1, "double", nullable = false),
        FieldSpec("name", 2, "string", nullable = false),
        FieldSpec("val", 3, "int32", nullable = true)),
      Seq(FragSpec(0, "frag0.lance", Seq(0, 1, 2, 3), 3, deletion = Some((7L, 3L, false))),
        FragSpec(1, "frag1.lance", Seq(0, 1, 2, 3), 2)))
    val df = LanceReader.read(spark, dir.getAbsolutePath)
    assert(df.count() == 4)
    assert(df.select("name").as[String].collect().sorted.toSeq ==
      Seq("alpha", "delta", "eps", "gamma"))
  }

  test("roaring bitmap deletion files filter rows; missing deletion file fails loudly") {
    import spark.implicits._
    val dir = fixture()
    writeRoaringDeletion(dir, "1-2-9.bin", Seq(0)) // drop "delta" from fragment 1
    writeManifest(dir, 3,
      Seq(FieldSpec("id", 0, "int64", nullable = false),
        FieldSpec("name", 2, "string", nullable = false)),
      Seq(FragSpec(0, "frag0.lance", Seq(0, 1, 2, 3), 3),
        FragSpec(1, "frag1.lance", Seq(0, 1, 2, 3), 2, deletion = Some((2L, 9L, true)))))
    val df = LanceReader.read(spark, dir.getAbsolutePath)
    assert(df.select("name").as[String].collect().sorted.toSeq ==
      Seq("alpha", "beta", "eps", "gamma"))
    // a manifest pointing at a deletion file that isn't there refuses
    writeManifest(dir, 4,
      Seq(FieldSpec("id", 0, "int64", nullable = false)),
      Seq(FragSpec(0, "frag0.lance", Seq(0), 3, deletion = Some((9L, 9L, true)))))
    val e = intercept[org.apache.spark.SparkException] {
      LanceReader.read(spark, dir.getAbsolutePath).count()
    }
    assert(e.getMessage.contains("deletion") || e.getCause.getMessage.contains("deletion"))
  }

  test("roaring parser: run containers, bitset containers, multi-key values") {
    // SERIAL_COOKIE (12347) with 2 containers: run container (key 0),
    // array container (key 1); run flags bitset marks container 0
    val bb = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12347 | ((2 - 1) << 16))
    bb.put(0x01.toByte) // run flag for container 0
    bb.putShort(0); bb.putShort((5 - 1).toShort)  // key 0, cardinality 5
    bb.putShort(1); bb.putShort((2 - 1).toShort)  // key 1, cardinality 2
    bb.putShort(2)  // container 0: 2 runs
    bb.putShort(3); bb.putShort(1)   // run [3,4]
    bb.putShort(10); bb.putShort(2)  // run [10,12]
    bb.putShort(7); bb.putShort(9)   // container 1: values 7, 9
    val got = LanceReader.parseRoaring(java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(got.toSeq == Seq(3, 4, 10, 11, 12, 65536 + 7, 65536 + 9))
  }

  test("dictionary-encoded string pages decode (bare and with validity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lancedict").toFile
    val dictWords = Seq("red", "green", "blue")
    val (dictOff, dictBytes) = {
      val enc = dictWords.map(_.getBytes(StandardCharsets.UTF_8))
      val offs = enc.scanLeft(0L)(_ + _.length)
      val b = ByteBuffer.allocate(offs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      offs.foreach(o => b.putInt(o.toInt))
      (b.array(), enc.flatten.toArray)
    }
    // col0: bare dict page (indices + dict offsets + dict bytes)
    // col1: nullable dict page (validity + indices + dict offsets + dict bytes)
    writeDataFile(dir, "frag0.lance", Seq(
      (Seq(ints(Seq(2, 0, 1, 0, 2)), dictOff, dictBytes), 5),
      (Seq(bitmap(Seq(true, true, false, true, true)), ints(Seq(0, 1, 0, 2, 1)), dictOff, dictBytes), 5)
    ))
    writeManifest(dir, 1,
      Seq(FieldSpec("color", 0, "string", nullable = false),
        FieldSpec("tint", 1, "string", nullable = true)),
      Seq(FragSpec(0, "frag0.lance", Seq(0, 1), 5)))
    val rows = LanceReader.read(spark, dir.getAbsolutePath)
      .as[(String, Option[String])].collect().toSeq
    assert(rows == Seq(
      ("blue", Some("red")), ("red", Some("green")), ("green", None),
      ("red", Some("blue")), ("blue", Some("green"))))
  }

  test("registered reader routes the lance kind") {
    val dir = fixture()
    val ref = graft.datatypes.DataRef("lance", dir.getAbsolutePath)
    val reader = SparkReaders.all.find(_.isOk(ref))
    assert(reader.exists(_.name == "lance_native"))
    assert(reader.get.read(spark, ref).count() == 5)
  }
}
