package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.CRC32C

/** Fixture encoded by hand to the published TFRecord + tf.Example wire
  * specs — an independent encoder, so reader bugs can't cancel out.
  */
class TFRecordReaderSpec extends SparkSpec {

  private def varint(v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
    out.toByteArray
  }
  private def ld(field: Int, body: Array[Byte]): Array[Byte] =
    varint((field << 3) | 2) ++ varint(body.length) ++ body

  /** Encode one tf.Example. Int64 lists packed; float lists unpacked
    * (wire 5 per element) to exercise both repeated encodings.
    */
  private def exampleBytes(
      ints: Map[String, Seq[Long]],
      floats: Map[String, Seq[Float]],
      byteses: Map[String, Seq[String]]): Array[Byte] = {
    def feature(body: Array[Byte]): Array[Byte] = body
    val entries =
      ints.map { case (k, vs) =>
        val packed = vs.flatMap(varint).toArray
        k -> feature(ld(3, ld(1, packed))) // Int64List, packed
      } ++
      floats.map { case (k, vs) =>
        val unpacked = vs.flatMap { f =>
          val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(f)
          varint((1 << 3) | 5) ++ bb.array()
        }.toArray
        k -> feature(ld(2, unpacked)) // FloatList, unpacked fixed32
      } ++
      byteses.map { case (k, vs) =>
        k -> feature(ld(1, vs.flatMap(s => ld(1, s.getBytes("UTF-8"))).toArray)) // BytesList
      }
    val featuresBody = entries.toSeq.flatMap { case (k, fv) =>
      ld(1, ld(1, k.getBytes("UTF-8")) ++ ld(2, fv)).toSeq // map entry {key, Feature}
    }.toArray
    ld(1, featuresBody) // Example.features
  }

  private def masked(bytes: Array[Byte]): Int = {
    val c = new CRC32C(); c.update(bytes)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def frame(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    recs.foreach { r =>
      val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(r.length.toLong).array()
      out.write(len)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(masked(len)).array())
      out.write(r)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(masked(r)).array())
    }
    out.toByteArray
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("tfrec")
    Files.write(d.resolve("part-00000.tfrecord"), frame(Seq(
      exampleBytes(Map("label" -> Seq(3L), "ids" -> Seq(10L, 200L, 3000L)),
        Map("score" -> Seq(0.5f, 1.5f)), Map("text" -> Seq("hello", "world"))),
      exampleBytes(Map("label" -> Seq(7L)), Map.empty, Map("text" -> Seq("bye"))))))
    Files.write(d.resolve("part-00001.tfrecord"), frame(Seq(
      exampleBytes(Map.empty, Map("score" -> Seq(9.25f)), Map.empty))))
    d
  }

  test("frames + features decode across sharded files") {
    val df = TFRecordReader.read(spark, s"file://$dir/*.tfrecord")
    assert(df.count() == 3)
    import spark.implicits._
    def m[T](r: org.apache.spark.sql.Row, col: String): Map[String, Seq[T]] =
      r.getAs[Map[String, scala.collection.Seq[T]]](col).view.mapValues(_.toSeq).toMap
    val r0 = df.filter($"path".endsWith("part-00000.tfrecord") && $"idx" === 0).head()
    assert(m[Long](r0, "int64_features") == Map("label" -> Seq(3L), "ids" -> Seq(10L, 200L, 3000L)))
    assert(m[Double](r0, "float_features") == Map("score" -> Seq(0.5, 1.5)))
    assert(m[Array[Byte]](r0, "bytes_features")("text").map(new String(_, "UTF-8")) == Seq("hello", "world"))
    val r2 = df.filter($"path".endsWith("part-00001.tfrecord")).head()
    assert(m[Double](r2, "float_features") == Map("score" -> Seq(9.25)))
    assert(m[Long](r2, "int64_features").isEmpty)
  }

  test("corrupt data crc is refused") {
    val good = frame(Seq(exampleBytes(Map("a" -> Seq(1L)), Map.empty, Map.empty)))
    good(good.length - 1) = (good(good.length - 1) ^ 0x01).toByte
    val ex = intercept[org.apache.spark.SparkException] {
      val d2 = Files.createTempDirectory("tfbad")
      Files.write(d2.resolve("bad.tfrecord"), good)
      TFRecordReader.read(spark, s"file://$d2/bad.tfrecord").collect()
    }
    assert(ex.getMessage.contains("crc mismatch") || Option(ex.getCause).exists(_.getMessage.contains("crc mismatch")))
  }

  test("kind detection and registry reader round-trip") {
    val rec = Detect.recommend(s"file://$dir/part-00000.tfrecord")
    assert(rec.exists(_.kind.name == "tfrecord"))
    val df = SparkReaders.reader("tfrecord_reader").get
      .read(spark, DataRef("tfrecord", s"file://$dir/part-00000.tfrecord"))
    assert(df.count() == 2)
  }
}
