package graft.readers

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

class ZarrReaderSpec extends SparkSpec {

  /** Hand-built Zarr v2 store: 2-D f8 array 3x4, chunks 2x3, zlib. */
  private def writeZarr(dir: java.nio.file.Path): Unit = {
    Files.writeString(dir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[3,4],"chunks":[2,3],"dtype":"<f8",
        |"compressor":{"id":"zlib","level":1},"fill_value":0.0,"order":"C","filters":null}""".stripMargin)
    def chunk(vals: Seq[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vals.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      val d = new java.util.zip.Deflater(1)
      d.setInput(bb.array()); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    // global value at (i,j) = i*10 + j; chunks are C-order 2x3 blocks
    def block(offI: Int, offJ: Int): Seq[Double] =
      for (a <- 0 until 2; b <- 0 until 3) yield ((offI + a) * 10 + (offJ + b)).toDouble
    Files.write(dir.resolve("0.0"), chunk(block(0, 0)))
    Files.write(dir.resolve("0.1"), chunk(block(0, 3)))
    Files.write(dir.resolve("1.0"), chunk(block(2, 0)))
    Files.write(dir.resolve("1.1"), chunk(block(2, 3)))
  }

  test("zarr 2-D zlib store reads to long-form rows with edge trimming") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr")
    writeZarr(dir)
    val df = ZarrReader.read(spark, s"file://$dir")
    assert(df.columns.toSeq == Seq("dim0", "dim1", "value"))
    val rows = df.as[(Long, Long, Double)].collect()
    assert(rows.length == 12) // 3x4, edge chunks trimmed
    val m = rows.map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m((0L, 0L)) == 0.0)
    assert(m((1L, 3L)) == 13.0)
    assert(m((2L, 3L)) == 23.0)
    assert(!m.contains((3L, 0L)))
  }

  test("zarr v2 blosc-lz4 store reads through the pure-JVM container decode") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrb")
    Files.writeString(dir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[3,4],"chunks":[2,3],"dtype":"<f8",
        |"compressor":{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0},
        |"fill_value":0.0,"order":"C","filters":null}""".stripMargin)
    // chunk payloads as blosc containers: one lz4-split-shuffle, the
    // rest memcpy-flag (both occur in real stores; BloscSpec pins the
    // codec internals, this pins the ZarrReader wiring)
    def payload(vals: Seq[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vals.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      bb.array()
    }
    def memcpyContainer(data: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(1.toByte).put(0x02.toByte).put(8.toByte)
      bb.putInt(data.length).putInt(data.length).putInt(16 + data.length)
      bb.put(data)
      bb.array()
    }
    // hand-assembled split+shuffle lz4 container for the (0,0) chunk:
    // 6 doubles whose shuffled byte planes are RLE runs → one literal +
    // offset-1 match per 6-byte plane stream
    def lz4Container(data: Array[Byte]): Array[Byte] = {
      val typesize = 8
      val n = data.length / typesize
      val planes = (0 until typesize).map(b => Array.tabulate(n)(i => data(i * typesize + b)))
      val streams = new java.io.ByteArrayOutputStream()
      val header = 16 + 4
      val bstart = header
      planes.foreach { p =>
        if (p.forall(_ == p(0))) { // RLE plane: 1 literal + match len n-1
          require(n - 1 >= 4, "fixture plane too short for a match")
          val s = Array[Byte](((1 << 4) | (n - 1 - 4)).toByte, p(0), 1, 0)
          streams.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(s.length).array())
          streams.write(s)
        } else { // raw stream (size == neblock)
          streams.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array())
          streams.write(p)
        }
      }
      val total = header + streams.size()
      val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(1.toByte).put((0x01 | (1 << 5)).toByte).put(typesize.toByte)
      bb.putInt(data.length).putInt(data.length).putInt(total)
      bb.putInt(bstart)
      bb.put(streams.toByteArray)
      bb.array()
    }
    def block(offI: Int, offJ: Int): Seq[Double] =
      for (a <- 0 until 2; b <- 0 until 3) yield ((offI + a) * 10 + (offJ + b)).toDouble
    Files.write(dir.resolve("0.0"), lz4Container(payload(block(0, 0))))
    Files.write(dir.resolve("0.1"), memcpyContainer(payload(block(0, 3))))
    Files.write(dir.resolve("1.0"), memcpyContainer(payload(block(2, 0))))
    Files.write(dir.resolve("1.1"), memcpyContainer(payload(block(2, 3))))
    val m = ZarrReader.read(spark, s"file://$dir")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 12)
    assert(m((0L, 0L)) == 0.0 && m((0L, 2L)) == 2.0 && m((1L, 1L)) == 11.0)
    assert(m((1L, 3L)) == 13.0 && m((2L, 3L)) == 23.0)
  }

  test("scalar dtype matrix decodes: widths, unsigned, bool, big-endian") {
    import ZarrReader.decodeNumeric
    def enc(width: Int, big: Boolean)(put: ByteBuffer => Unit): Array[Byte] = {
      val bb = ByteBuffer.allocate(width).order(if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      put(bb); bb.array()
    }
    assert(decodeNumeric(enc(2, big = false)(_.putShort(-5)), "<i2").toSeq == Seq(-5.0))
    assert(decodeNumeric(enc(2, big = true)(_.putShort(-5)), ">i2").toSeq == Seq(-5.0))
    assert(decodeNumeric(enc(2, big = false)(_.putShort(0xfffe.toShort)), "<u2").toSeq == Seq(65534.0))
    assert(decodeNumeric(Array[Byte](0xff.toByte), "|u1").toSeq == Seq(255.0))
    assert(decodeNumeric(Array[Byte](0xff.toByte), "|i1").toSeq == Seq(-1.0))
    assert(decodeNumeric(Array[Byte](0, 2), "|b1").toSeq == Seq(0.0, 1.0))
    assert(decodeNumeric(enc(4, big = true)(_.putFloat(1.5f)), ">f4").toSeq == Seq(1.5))
    assert(decodeNumeric(enc(8, big = true)(_.putDouble(2.25)), ">f8").toSeq == Seq(2.25))
    assert(decodeNumeric(enc(4, big = false)(_.putInt(-1)), "<u4").toSeq == Seq(4294967295.0))
    assert(decodeNumeric(enc(8, big = false)(_.putLong(-1L)), "<u8").toSeq == Seq(Long.MaxValue.toDouble))
    intercept[UnsupportedOperationException](decodeNumeric(Array[Byte](0), "<c8"))
  }

  test("zarr v3 uint16 store decodes through the dtype map") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3u")
    Files.writeString(dir.resolve("zarr.json"),
      v3Meta(Seq(3), Seq(2), "uint16", ".", """{"name": "bytes", "configuration": {"endian": "little"}}"""))
    val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(40000.toShort); bb.putShort(7)
    Files.write(dir.resolve("c.0"), bb.array())
    val bb2 = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
    bb2.putShort(9)
    Files.write(dir.resolve("c.1"), bb2.array())
    val m = ZarrReader.read(spark, s"file://$dir").as[(Long, Double)].collect().toMap
    assert(m == Map(0L -> 40000.0, 1L -> 7.0, 2L -> 9.0))
  }

  test("zarr v2 F-order chunks transpose; filter chains refuse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrf")
    Files.writeString(dir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[2,3],"chunks":[2,3],"dtype":"<f8",
        |"compressor":null,"fill_value":0.0,"order":"F","filters":null}""".stripMargin)
    // column-major chunk bytes for [[0,1,2],[10,11,12]]
    val bb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    Seq(0.0, 10.0, 1.0, 11.0, 2.0, 12.0).foreach(bb.putDouble)
    Files.write(dir.resolve("0.0"), bb.array())
    val m = ZarrReader.read(spark, s"file://$dir")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m == Map((0L, 0L) -> 0.0, (0L, 1L) -> 1.0, (0L, 2L) -> 2.0,
      (1L, 0L) -> 10.0, (1L, 1L) -> 11.0, (1L, 2L) -> 12.0))

    val dir2 = Files.createTempDirectory("zarrfl")
    Files.writeString(dir2.resolve(".zarray"),
      """{"zarr_format":2,"shape":[2],"chunks":[2],"dtype":"<f8",
        |"compressor":null,"fill_value":0.0,"order":"C",
        |"filters":[{"id":"delta","dtype":"<f8"}]}""".stripMargin)
    val e = intercept[IllegalArgumentException](ZarrReader.read(spark, s"file://$dir2"))
    assert(e.getMessage.contains("filters"))
  }

  test("zarr v2 blosclz store refuses at metadata time") {
    val dir = Files.createTempDirectory("zarrz")
    Files.writeString(dir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[2],"chunks":[2],"dtype":"<f8",
        |"compressor":{"id":"blosc","cname":"blosclz","clevel":5,"shuffle":1},
        |"fill_value":0.0,"order":"C","filters":null}""".stripMargin)
    val e = intercept[IllegalArgumentException](ZarrReader.read(spark, s"file://$dir"))
    assert(e.getMessage.contains("blosclz"))
  }

  test("zarr write -> read round-trips a 2-D array (zlib, edge chunks)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrw")
    val src = (for (i <- 0 until 3; j <- 0 until 5) yield (i.toLong, j.toLong, (i * 100 + j).toDouble))
      .toDF("dim0", "dim1", "value")
    val ref = graft.output.ZarrWriter.write(src, s"file://$dir/arr", chunks = Seq(2, 2), zlib = true)
    assert(ref.kind == "zarr")
    val back = ZarrReader.read(spark, s"file://$dir/arr")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(back.size == 15)
    assert(back((2L, 4L)) == 204.0)
    assert(back((0L, 3L)) == 3.0)
  }

  // ---- v3 ------------------------------------------------------------

  private def v3Meta(shape: Seq[Int], chunks: Seq[Int], dtype: String, sep: String,
      codecs: String): String =
    s"""{"zarr_format": 3, "node_type": "array",
       |  "shape": [${shape.mkString(",")}],
       |  "data_type": "$dtype",
       |  "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${chunks.mkString(",")}]}},
       |  "chunk_key_encoding": {"name": "default", "configuration": {"separator": "$sep"}},
       |  "fill_value": 0.0,
       |  "codecs": [$codecs]}""".stripMargin

  private def le64(vals: Seq[Double], dtype: String): Array[Byte] = {
    val width = if (dtype.endsWith("64")) 8 else 4
    val bb = ByteBuffer.allocate(vals.size * width).order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case "float64" => vals.foreach(bb.putDouble)
      case "float32" => vals.foreach(v => bb.putFloat(v.toFloat))
      case "int64"   => vals.foreach(v => bb.putLong(v.toLong))
      case "int32"   => vals.foreach(v => bb.putInt(v.toInt))
    }
    bb.array()
  }

  test("zarr v3 store with gzip codec and nested chunk keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3")
    Files.writeString(dir.resolve("zarr.json"),
      v3Meta(Seq(3, 4), Seq(2, 3), "float64", "/",
        """{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "gzip", "configuration": {"level": 1}}"""))
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def block(offI: Int, offJ: Int): Seq[Double] =
      for (a <- 0 until 2; b <- 0 until 3) yield ((offI + a) * 10 + (offJ + b)).toDouble
    Files.createDirectories(dir.resolve("c/0")); Files.createDirectories(dir.resolve("c/1"))
    Files.write(dir.resolve("c/0/0"), gz(le64(block(0, 0), "float64")))
    Files.write(dir.resolve("c/0/1"), gz(le64(block(0, 3), "float64")))
    Files.write(dir.resolve("c/1/0"), gz(le64(block(2, 0), "float64")))
    Files.write(dir.resolve("c/1/1"), gz(le64(block(2, 3), "float64")))

    val m = ZarrReader.read(spark, s"file://$dir")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 12)
    assert(m((0L, 0L)) == 0.0 && m((1L, 3L)) == 13.0 && m((2L, 3L)) == 23.0)
  }

  test("zarr v3 blosc codec decodes through the container walk; blosclz refuses") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3b")
    Files.writeString(dir.resolve("zarr.json"),
      v3Meta(Seq(3), Seq(2), "float64", "/",
        """{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "blosc", "configuration": {"cname": "lz4", "clevel": 5, "shuffle": "noshuffle", "typesize": 8, "blocksize": 0}}"""))
    def memcpyContainer(data: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(1.toByte).put(0x02.toByte).put(8.toByte)
      bb.putInt(data.length).putInt(data.length).putInt(16 + data.length)
      bb.put(data)
      bb.array()
    }
    Files.createDirectories(dir.resolve("c"))
    Files.write(dir.resolve("c/0"), memcpyContainer(le64(Seq(1.5, 2.5), "float64")))
    Files.write(dir.resolve("c/1"), memcpyContainer(le64(Seq(3.5, 0.0), "float64")))
    val m = ZarrReader.read(spark, s"file://$dir")
      .as[(Long, Double)].collect().toMap
    assert(m == Map(0L -> 1.5, 1L -> 2.5, 2L -> 3.5))

    val dir2 = Files.createTempDirectory("zarr3bl")
    Files.writeString(dir2.resolve("zarr.json"),
      v3Meta(Seq(3), Seq(2), "float64", "/",
        """{"name": "bytes"}, {"name": "blosc", "configuration": {"cname": "blosclz"}}"""))
    val e = intercept[IllegalArgumentException](ZarrReader.read(spark, s"file://$dir2"))
    assert(e.getMessage.contains("blosclz"))

    // stacked compression codecs would decode only the outer layer and
    // reinterpret compressed bytes as values — refuse at metadata time
    val dir3 = Files.createTempDirectory("zarr3stack")
    Files.writeString(dir3.resolve("zarr.json"),
      v3Meta(Seq(3), Seq(2), "float64", "/",
        """{"name": "bytes"}, {"name": "blosc", "configuration": {"cname": "lz4"}}, {"name": "gzip"}"""))
    val e2 = intercept[IllegalArgumentException](ZarrReader.read(spark, s"file://$dir3"))
    assert(e2.getMessage.contains("stacked"))
  }

  test("zarr v3 dot-separated keys, int32, missing chunk skipped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3d")
    Files.writeString(dir.resolve("zarr.json"),
      v3Meta(Seq(5), Seq(2), "int32", ".", """{"name": "bytes", "configuration": {"endian": "little"}}"""))
    Files.write(dir.resolve("c.0"), le64(Seq(1.0, 2.0), "int32"))
    // c.1 missing -> fill-only, skipped
    Files.write(dir.resolve("c.2"), le64(Seq(5.0), "int32"))
    val m = ZarrReader.read(spark, s"file://$dir").as[(Long, Double)].collect().toMap
    assert(m == Map(0L -> 1.0, 1L -> 2.0, 4L -> 5.0))
  }

  test("zarr v3 sharding_indexed: shards decode inner chunks via the end index") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3s")
    // array 4x4, shard (outer chunk) 4x2, inner chunks 2x2 -> each shard
    // holds a 2x1 grid of inner chunks
    Files.writeString(dir.resolve("zarr.json"),
      v3Meta(Seq(4, 4), Seq(4, 2), "float64", "/",
        """{"name": "sharding_indexed", "configuration": {
          |  "chunk_shape": [2, 2],
          |  "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
          |  "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}],
          |  "index_location": "end"}}""".stripMargin))
    def inner(offI: Int, offJ: Int): Array[Byte] =
      le64(for (a <- 0 until 2; b <- 0 until 2) yield ((offI + a) * 10 + (offJ + b)).toDouble, "float64")
    def shard(chunks: Seq[Option[Array[Byte]]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val index = ByteBuffer.allocate(chunks.size * 16 + 4).order(ByteOrder.LITTLE_ENDIAN)
      chunks.foreach {
        case Some(c) => index.putLong(out.size.toLong); index.putLong(c.length.toLong); out.write(c)
        case None    => index.putLong(-1L); index.putLong(-1L)
      }
      index.putInt(0) // crc32c placeholder (reader skips it)
      out.write(index.array()); out.toByteArray
    }
    Files.createDirectories(dir.resolve("c/0"))
    // shard (0,0): rows 0-3, cols 0-1 -> inner chunks at (0,0) and (2,0)
    Files.write(dir.resolve("c/0/0"), shard(Seq(Some(inner(0, 0)), Some(inner(2, 0)))))
    // shard (0,1): rows 0-3, cols 2-3 -> inner (0,2) present, (2,2) missing
    Files.write(dir.resolve("c/0/1"), shard(Seq(Some(inner(0, 2)), None)))

    val m = ZarrReader.read(spark, s"file://$dir")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 12) // 16 cells minus the missing 2x2 inner chunk
    assert(m((0L, 0L)) == 0.0 && m((3L, 1L)) == 31.0 && m((1L, 3L)) == 13.0)
    assert(!m.contains((2L, 2L)) && !m.contains((3L, 3L)))
  }

  test("zarr v3 write -> read round-trips with gzip codec") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3w")
    val src = (for (i <- 0 until 5; j <- 0 until 3) yield (i.toLong, j.toLong, (i * 10 + j).toDouble))
      .toDF("dim0", "dim1", "value")
    val ref = graft.output.ZarrWriter.writeV3(src, s"file://$dir/v3", chunks = Seq(2, 2), gzip = true)
    assert(ref.options("zarr_format") == "3")
    val back = ZarrReader.read(spark, s"file://$dir/v3")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(back.size == 15)
    assert(back((4L, 2L)) == 42.0 && back((0L, 1L)) == 1.0)
  }

  test("zarr v3 sharded write -> read round-trips; empty inner chunks go missing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr3sw")
    // 8x4 grid, shards 4x4 of 2x2 inner chunks; leave the whole inner
    // chunk (rows 6-7, cols 2-3) empty -> marked missing in the index
    val src = (for {
      i <- 0 until 8; j <- 0 until 4
      if !(i >= 6 && j >= 2)
    } yield (i.toLong, j.toLong, (i * 100 + j).toDouble)).toDF("dim0", "dim1", "value")
    val ref = graft.output.ZarrWriter.writeV3Sharded(
      src, s"file://$dir/s", shardShape = Seq(4, 4), innerShape = Seq(2, 2),
      shape = Seq(8, 4), gzip = true)
    assert(ref.options("sharded") == "true")
    // two shard objects, not eight chunk objects
    assert(Files.list(dir.resolve("s/c")).count() == 2)
    val back = ZarrReader.read(spark, s"file://$dir/s")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(back((0L, 0L)) == 0.0 && back((5L, 3L)) == 503.0 && back((7L, 1L)) == 701.0)
    // the missing inner chunk contributes no rows
    assert(!back.contains((6L, 2L)) && !back.contains((7L, 3L)))
    assert(back.size == 28) // 32 cells minus the 4 in the missing chunk
  }

  test("zarr write -> read round-trips 1-D int data with explicit shape") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrw1")
    val src = Seq((0L, 7.0), (1L, 8.0), (3L, 9.0)).toDF("dim0", "value") // index 2 absent -> fill 0
    graft.output.ZarrWriter.write(src, s"file://$dir/v", chunks = Seq(3), shape = Seq(4), dtype = "<i4")
    val back = ZarrReader.read(spark, s"file://$dir/v")
      .as[(Long, Double)].collect().toMap
    assert(back == Map(0L -> 7.0, 1L -> 8.0, 2L -> 0.0, 3L -> 9.0))
  }

  test("group walk: a 2-variable store lists both arrays, each reads through the array path") {
    import spark.implicits._
    // the writer itself builds the member arrays — the group is just
    // the reference's ZarrGroupCatalog dispatch over them
    val dir = Files.createTempDirectory("zarrgrp")
    Files.writeString(dir.resolve(".zgroup"), """{"zarr_format":2}""")
    graft.output.ZarrWriter.write(Seq((0L, 1.0), (1L, 2.0)).toDF("dim0", "value"),
      s"file://$dir/temp", chunks = Seq(2), shape = Seq(2), dtype = "<f8")
    graft.output.ZarrWriter.write(Seq((0L, 5.0)).toDF("dim0", "value"),
      s"file://$dir/salt", chunks = Seq(1), shape = Seq(1), dtype = "<f8")
    // a nested subgroup recurses like the reference's zarr_cat entries
    val sub = dir.resolve("stats")
    Files.createDirectories(sub)
    Files.writeString(sub.resolve(".zgroup"), """{"zarr_format":2}""")
    graft.output.ZarrWriter.write(Seq((0L, 9.0)).toDF("dim0", "value"),
      s"file://$dir/stats/mean", chunks = Seq(1), shape = Seq(1), dtype = "<f8")
    val cat = ZarrReader.listArrays(s"file://$dir")
    assert(cat.aliases.keySet == Set("temp", "salt", "stats/mean"))
    assert(cat("temp").read(spark).as[(Long, Double)].collect().sorted.toSeq ==
      Seq((0L, 1.0), (1L, 2.0)))
    assert(cat("stats/mean").read(spark).as[(Long, Double)].collect().toSeq ==
      Seq((0L, 9.0)))
    // component scoping (the reference's kwarg)
    assert(ZarrReader.listArrays(s"file://$dir", component = Some("stats"))
      .aliases.keySet == Set("mean"))
    // an ARRAY node refuses by name — read it directly instead
    val e = intercept[Exception](ZarrReader.listArrays(s"file://$dir/temp"))
    assert(e.getMessage.contains("ARRAY node"))
  }

  test("group walk: consolidated .zmetadata serves the hierarchy from ONE read (no listing)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrcons")
    graft.output.ZarrWriter.write(Seq((0L, 3.0)).toDF("dim0", "value"),
      s"file://$dir/a", chunks = Seq(1), shape = Seq(1), dtype = "<f8")
    graft.output.ZarrWriter.write(Seq((0L, 4.0)).toDF("dim0", "value"),
      s"file://$dir/sub/b", chunks = Seq(1), shape = Seq(1), dtype = "<f8")
    Files.writeString(dir.resolve(".zmetadata"),
      """{"zarr_consolidated_format":1,"metadata":{
        |".zgroup":{"zarr_format":2},
        |"a/.zarray":{},"sub/.zgroup":{"zarr_format":2},"sub/b/.zarray":{},
        |"ghost/.zarray":{}}}""".stripMargin)
    // the fast path trusts the consolidated keys — including a member
    // whose directory does not even exist (proves no listing happened)
    val cat = ZarrReader.listArrays(s"file://$dir")
    assert(cat.aliases.keySet == Set("a", "sub/b", "ghost"))
    assert(cat("a").read(spark).as[(Long, Double)].collect().toSeq == Seq((0L, 3.0)))
    assert(ZarrReader.listArrays(s"file://$dir", component = Some("sub"))
      .aliases.keySet == Set("b"))
  }

  test("v3 group walk dispatches on member zarr.json node types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrv3g")
    Files.writeString(dir.resolve("zarr.json"), """{"zarr_format":3,"node_type":"group"}""")
    // one v3 member array (uint16 fixture shape from the v3 read spec)
    val a = dir.resolve("counts")
    Files.createDirectories(a)
    Files.writeString(a.resolve("zarr.json"),
      """{"zarr_format":3,"node_type":"array","shape":[2],"data_type":"uint16",
        |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2]}},
        |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
        |"codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}""".stripMargin)
    val bb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(7.toShort); bb.putShort(9.toShort)
    Files.createDirectories(a.resolve("c"))
    Files.write(a.resolve("c").resolve("0"), bb.array())
    val cat = ZarrReader.listArrays(s"file://$dir")
    assert(cat.aliases.keySet == Set("counts"))
    assert(cat("counts").read(spark).as[(Long, Double)].collect().sorted.toSeq ==
      Seq((0L, 7.0), (1L, 9.0)))
  }
}
