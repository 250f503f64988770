package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.Files

/** Fixture bytes are encoded by hand straight from the published
  * msgpack spec — independent of the decoder under test.
  */
class MessagePackReaderSpec extends SparkSpec {
  import spark.implicits._

  private def fixstr(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8"); require(b.length < 32)
    (0xa0 | b.length).toByte +: b
  }
  private def fixmap(entries: (Array[Byte], Array[Byte])*): Array[Byte] = {
    require(entries.size < 16)
    val out = new ByteArrayOutputStream()
    out.write(0x80 | entries.size)
    entries.foreach { case (k, v) => out.write(k); out.write(v) }
    out.toByteArray
  }
  private def f64(d: Double): Array[Byte] =
    0xcb.toByte +: ByteBuffer.allocate(8).putDouble(d).array()
  private def u16(v: Int): Array[Byte] =
    Array(0xcd.toByte, (v >> 8).toByte, v.toByte)
  private def i8neg(v: Int): Array[Byte] = Array(0xd0.toByte, v.toByte)
  private def bin(bs: Array[Byte]): Array[Byte] =
    Array(0xc4.toByte, bs.length.toByte) ++ bs
  private def arr16(items: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xdc); out.write(items.size >> 8); out.write(items.size & 0xff)
    items.foreach(out.write)
    out.toByteArray
  }

  test("records-in-an-array file infers a schema and types") {
    val dir = Files.createTempDirectory("msgpack")
    def rec(id: Int, name: String, score: Double, ok: Boolean): Array[Byte] =
      fixmap(
        fixstr("id") -> u16(id),
        fixstr("name") -> fixstr(name),
        fixstr("score") -> f64(score),
        fixstr("ok") -> Array((if (ok) 0xc3 else 0xc2).toByte))
    // 20 records through an array16 header
    val recs = (1 to 20).map(i => rec(i, s"r$i", i / 2.0, i % 2 == 0))
    Files.write(dir.resolve("a.msgpack"), arr16(recs))

    val df = MessagePackReader.read(spark, s"file://$dir/a.msgpack")
    assert(df.count() == 20)
    assert(df.schema.fieldNames.sorted.toSeq == Seq("id", "name", "ok", "score"))
    val r = df.filter($"id" === 7).head()
    assert(r.getAs[String]("name") == "r7" && r.getAs[Double]("score") == 3.5 && !r.getAs[Boolean]("ok"))
  }

  test("nested maps, arrays, negative ints, nil, bin and ext survive") {
    val dir = Files.createTempDirectory("msgpack2")
    val doc = fixmap(
      fixstr("neg") -> i8neg(-42),
      fixstr("none") -> Array(0xc0.toByte),
      fixstr("tags") -> ((0x92.toByte +: fixstr("a")) ++ fixstr("b")), // fixarray(2)
      fixstr("blob") -> bin(Array[Byte](1, 2, 3)),
      fixstr("inner") -> fixmap(fixstr("x") -> u16(300)),
      fixstr("stamp") -> (Array(0xd6.toByte, 0xff.toByte) ++ Array[Byte](0, 0, 0, 9)) // fixext4, type -1
    )
    Files.write(dir.resolve("b.msgpack"), doc)
    val df = MessagePackReader.read(spark, s"file://$dir/b.msgpack")
    val r = df.head()
    assert(r.getAs[Long]("neg") == -42L)
    assert(r.schema("none").dataType.typeName == "string" || r.isNullAt(r.fieldIndex("none")))
    assert(r.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
    assert(r.getAs[String]("blob") == java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3)))
    assert(r.getAs[org.apache.spark.sql.Row]("inner").getAs[Long]("x") == 300L)
    val ext = r.getAs[org.apache.spark.sql.Row]("stamp")
    assert(ext.getAs[Long]("$ext") == -1L)
  }

  test("kind detection and registry routing") {
    val dir = Files.createTempDirectory("msgpack3")
    Files.write(dir.resolve("c.msgpack"), fixmap(fixstr("k") -> u16(1)))
    val rec = Detect.recommend(s"file://$dir/c.msgpack")
    assert(rec.exists(_.kind.name == "messagepack"))
    val df = SparkReaders.reader("messagepack_reader").get
      .read(spark, DataRef("messagepack", s"file://$dir/c.msgpack"))
    assert(df.head().getAs[Long]("k") == 1L)
  }
}
