package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Fixture hand-laid straight from the flatbuffers wire format and the
  * published flatgeobuf schema (Header/Column/Feature/Geometry tables),
  * independent of the reader: vtables, soffsets and relative indirect
  * offsets computed by hand; a packed-R-tree-sized zero block exercises
  * the index skip.
  */
class FlatGeobufReaderSpec extends SparkSpec {
  import spark.implicits._

  /** Header flatbuffer: name="layer", geometry_type=0 (per-feature),
    * columns=[pop: Long(7), name: String(11)], features_count=3,
    * index_node_size=2. Positions laid out absolutely, offsets relative.
    */
  private def headerFb(): Array[Byte] = {
    val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, 32) // root table position
    // header vtable at 8: 10 field slots
    b.putShort(8, 24.toShort); b.putShort(10, 24.toShort)
    Seq(4, 0, 12, 0, 0, 0, 0, 8, 16, 14).zipWithIndex.foreach { case (v, i) =>
      b.putShort(12 + i * 2, v.toShort)
    }
    // header table at 32
    b.putInt(32, 32 - 8)        // soffset to vtable
    b.putInt(36, 56 - 36)       // name -> string at 56
    b.putInt(40, 68 - 40)       // columns -> vector at 68
    b.put(44, 0.toByte)         // geometry_type 0 = mixed
    b.putShort(46, 2.toShort)   // index_node_size
    b.putLong(48, 3L)           // features_count
    // name string at 56
    b.putInt(56, 5); "layer".getBytes.zipWithIndex.foreach { case (c, i) => b.put(60 + i, c) }
    // columns vector at 68: 2 entries
    b.putInt(68, 2)
    b.putInt(72, 88 - 72)       // -> column table 0
    b.putInt(76, 108 - 76)      // -> column table 1
    // column vtable at 80 (shared): name=+4, type=+8
    b.putShort(80, 8.toShort); b.putShort(82, 12.toShort)
    b.putShort(84, 4.toShort); b.putShort(86, 8.toShort)
    // column 0 "pop" type Long(7) at 88
    b.putInt(88, 88 - 80); b.putInt(92, 100 - 92); b.put(96, 7.toByte)
    b.putInt(100, 3); "pop".getBytes.zipWithIndex.foreach { case (c, i) => b.put(104 + i, c) }
    // column 1 "name" type String(11) at 108
    b.putInt(108, 108 - 80); b.putInt(112, 120 - 112); b.put(116, 11.toByte)
    b.putInt(120, 4); "name".getBytes.zipWithIndex.foreach { case (c, i) => b.put(124 + i, c) }
    b.array()
  }

  /** One size-prefixed Feature record. `geomType` per-feature (header is
    * mixed), `xy` flat pairs, `ends` ring/part bounds, `props` encoded.
    */
  private def feature(geomType: Int, xy: Seq[Double], ends: Seq[Int], props: Array[Byte]): Array[Byte] = {
    val nPairs = xy.length / 2
    val xvAt = 68
    val evAt = xvAt + 4 + 8 * xy.length
    val pvAt = evAt + 4 + 4 * ends.length
    val total = pvAt + 4 + props.length
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, total - 4)      // size prefix
    b.putInt(4, 16 - 4)         // root -> feature table at 16
    // feature vtable at 8: geometry=+4, properties=+8
    b.putShort(8, 8.toShort); b.putShort(10, 12.toShort)
    b.putShort(12, 4.toShort); b.putShort(14, 8.toShort)
    // feature table at 16
    b.putInt(16, 16 - 8)
    b.putInt(20, 52 - 20)       // geometry -> table at 52
    b.putInt(24, pvAt - 24)     // properties vector
    // geometry vtable at 32: 8 slots; ends=+4, xy=+8, type=+12
    b.putShort(32, 20.toShort); b.putShort(34, 16.toShort)
    Seq(4, 8, 0, 0, 0, 0, 0, 12).zipWithIndex.foreach { case (v, i) =>
      b.putShort(36 + i * 2, v.toShort)
    }
    // geometry table at 52
    b.putInt(52, 52 - 32)
    b.putInt(56, evAt - 56)
    b.putInt(60, xvAt - 60)
    b.put(64, geomType.toByte)
    // xy vector (doubles start at 72 — 8-aligned)
    b.putInt(xvAt, xy.length)
    xy.zipWithIndex.foreach { case (v, i) => b.putDouble(xvAt + 4 + 8 * i, v) }
    b.putInt(evAt, ends.length)
    ends.zipWithIndex.foreach { case (e, i) => b.putInt(evAt + 4 + 4 * i, e) }
    b.putInt(pvAt, props.length)
    props.zipWithIndex.foreach { case (v, i) => b.put(pvAt + 4 + i, v) }
    b.array()
  }

  private def prop(entries: (Int, Any)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    entries.foreach { case (idx, v) =>
      w.clear(); w.putShort(idx.toShort); bos.write(w.array(), 0, 2)
      v match {
        case l: Long => w.clear(); w.putLong(l); bos.write(w.array(), 0, 8)
        case s: String =>
          w.clear(); w.putInt(s.length); bos.write(w.array(), 0, 4); bos.write(s.getBytes("UTF-8"))
        case other => fail(s"unsupported fixture prop $other")
      }
    }
    bos.toByteArray
  }

  private lazy val url: String = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 0))
    val hdr = headerFb()
    val sz = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(hdr.length)
    out.write(sz.array()); out.write(hdr)
    // packed R-tree block: 3 items, node size 2 -> (3+2+1)*40 zero bytes
    out.write(new Array[Byte](FlatGeobufReader.indexSize(3, 2).toInt))
    out.write(feature(1, Seq(1.5, 2.5), Nil, prop(0 -> 100L, 1 -> "alpha")))
    out.write(feature(2, Seq(0, 0, 1, 1, 2, 0), Nil, prop(0 -> 200L)))
    out.write(feature(3, Seq(0, 0, 4, 0, 4, 4, 0, 0), Seq(4), prop()))
    val dir = Files.createTempDirectory("fgb")
    Files.write(dir.resolve("places.fgb"), out.toByteArray)
    s"file://$dir/places.fgb"
  }

  test("index size follows the packed Hilbert R-tree formula") {
    assert(FlatGeobufReader.indexSize(3, 2) == 240)
    assert(FlatGeobufReader.indexSize(4, 2) == 280)
    assert(FlatGeobufReader.indexSize(0, 16) == 0)
    assert(FlatGeobufReader.indexSize(1, 16) == 40)
  }

  test("header parses name, columns and counts") {
    val h = FlatGeobufReader.header(url, spark.sparkContext.hadoopConfiguration)
    assert(h.name == "layer" && h.geometryType == 0 && h.featuresCount == 3)
    assert(h.columns == Seq(FlatGeobufReader.FgbColumn("pop", 7), FlatGeobufReader.FgbColumn("name", 11)))
    assert(h.indexNodeSize == 2)
  }

  test("features decode geometry and typed properties past the index") {
    val df = FlatGeobufReader.read(spark, url)
    assert(df.columns.toSeq == Seq("feature_id", "geometry_type", "geometry_json", "pop", "name"))
    val rows = df.as[(Long, String, String, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0) == ((0L, "Point", """{"type":"Point","coordinates":[1.5,2.5]}""", Some(100L), Some("alpha"))))
    assert(rows(1) == ((1L, "LineString",
      """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""", Some(200L), None)))
    assert(rows(2) == ((2L, "Polygon",
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""", None, None)))
  }

  test("unsigned property types decode without sign extension") {
    import java.nio.{ByteBuffer, ByteOrder}
    val cols = Seq(
      FlatGeobufReader.FgbColumn("ub", 1),
      FlatGeobufReader.FgbColumn("us", 4),
      FlatGeobufReader.FgbColumn("ui", 6))
    val bb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0, 0.toShort); bb.put(2, 200.toByte)                 // ubyte 200
    bb.putShort(3, 1.toShort); bb.putShort(5, 40000.toShort)         // ushort 40000
    bb.putShort(7, 2.toShort); bb.putInt(9, (3000000000L).toInt)     // uint 3e9
    val out = FlatGeobufReader.properties(bb, 0, 13, cols)
    assert(out(0) == 200L && out(1) == 40000L && out(2) == 3000000000L)
  }

  test("kind detection and registry routing") {
    assert(Detect.recommend("x.fgb", head = Array[Byte]('f', 'g', 'b', 3)).head.kind.name == "flatgeobuf")
    assert(SparkReaders.reader("flatgeobuf_reader").get.read(spark, DataRef("flatgeobuf", url)).count() == 3)
  }
}
