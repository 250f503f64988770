package graft.inspect

import java.nio.{ByteBuffer, ByteOrder}

/** Fixtures are laid out by hand at fixed offsets straight from the
  * published HDF5 file-format spec — an independent encoding, so parser
  * bugs can't cancel out.
  */
class Hdf5InspectSpec extends graft.SparkSpec {

  private val Undef = -1L

  private def sig(bb: ByteBuffer, at: Int): Unit = {
    bb.position(at)
    bb.put(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
  }

  /** v0 superblock, old-style groups: root { dset1(2x3 f8), grp1 { ids(4 i4) } }.
    * dset1 carries a contiguous layout message pointing at real doubles
    * (1..6 row-major) at 0xB00; ids at 0xB40 (10,20,30,40 int32).
    */
  private def v0File(): Array[Byte] = {
    val bb = ByteBuffer.allocate(0xC00).order(ByteOrder.LITTLE_ENDIAN)
    sig(bb, 0)
    bb.put(8, 0.toByte)  // superblock v0
    bb.put(13, 8.toByte); bb.put(14, 8.toByte) // offset/length sizes
    bb.putShort(16, 4); bb.putShort(18, 16)    // leaf/internal k
    bb.putLong(24, 0L)       // base
    bb.putLong(32, Undef)    // free space
    bb.putLong(40, 0xB00L)   // EOF
    bb.putLong(48, Undef)    // driver info
    bb.putLong(56, 0L)       // root: link name offset
    bb.putLong(64, 0x100L)   // root: object header addr

    // object header v1 helper
    def objHeaderV1(at: Int, msgs: Seq[(Int, Array[Byte])]): Unit = {
      bb.put(at, 1.toByte)
      bb.putShort(at + 2, msgs.size.toShort)
      bb.putInt(at + 4, 1)
      val total = msgs.map(m => 8 + ((m._2.length + 7) & ~7)).sum
      bb.putInt(at + 8, total)
      var p = at + 16
      msgs.foreach { case (typ, body) =>
        val padded = (body.length + 7) & ~7
        bb.putShort(p, typ.toShort)
        bb.putShort(p + 2, padded.toShort)
        bb.position(p + 8); bb.put(body)
        p += 8 + padded
      }
    }
    def symTabMsg(btree: Long, heap: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(btree); b.putLong(heap); b.array()
    }
    def dataspaceV1(dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + dims.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(dims.size.toByte); b.put(0.toByte)
      b.position(8); dims.foreach(b.putLong); b.array()
    }
    def datatype(cls: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | cls).toByte) // version 1, class
      b.position(4); b.putInt(size); b.array()
    }
    def btree(at: Int, snod: Long): Unit = {
      bb.position(at); bb.put("TREE".getBytes("ISO-8859-1"))
      bb.put(at + 4, 0.toByte); bb.put(at + 5, 0.toByte) // group node, leaf level
      bb.putShort(at + 6, 1)
      bb.putLong(at + 8, Undef); bb.putLong(at + 16, Undef)
      bb.putLong(at + 24, 0L)   // key0
      bb.putLong(at + 32, snod) // child0
      bb.putLong(at + 40, 8L)   // key1
    }
    def heap(at: Int, names: Seq[String]): Unit = {
      bb.position(at); bb.put("HEAP".getBytes("ISO-8859-1"))
      bb.put(at + 4, 0.toByte)
      bb.putLong(at + 8, 0x80L)       // data segment size
      bb.putLong(at + 16, 0L)         // free list head
      bb.putLong(at + 24, (at + 0x40).toLong) // data segment addr
      var off = at + 0x40
      names.foreach { n => // 8-byte aligned name slots
        bb.position(off); bb.put(n.getBytes("UTF-8")); bb.put(0.toByte)
        off += 8
      }
    }
    def snod(at: Int, entries: Seq[(Long, Long)]): Unit = {
      bb.position(at); bb.put("SNOD".getBytes("ISO-8859-1"))
      bb.put(at + 4, 1.toByte)
      bb.putShort(at + 6, entries.size.toShort)
      entries.zipWithIndex.foreach { case ((nameOff, hdr), i) =>
        bb.putLong(at + 8 + i * 40, nameOff)
        bb.putLong(at + 8 + i * 40 + 8, hdr)
      }
    }

    objHeaderV1(0x100, Seq(0x0011 -> symTabMsg(0x200, 0x300)))
    btree(0x200, 0x400)
    heap(0x300, Seq("dset1", "grp1"))
    snod(0x400, Seq((0L, 0x500L), (8L, 0x600L)))
    def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(1.toByte) // version 3, class contiguous
      b.putLong(addr); b.putLong(size); b.array()
    }
    objHeaderV1(0x500, Seq(0x0001 -> dataspaceV1(Seq(2L, 3L)), 0x0003 -> datatype(1, 8),
      0x0008 -> layoutContiguous(0xB00L, 48L)))
    objHeaderV1(0x600, Seq(0x0011 -> symTabMsg(0x700, 0x800)))
    btree(0x700, 0x900)
    heap(0x800, Seq("ids"))
    snod(0x900, Seq((0L, 0xA00L)))
    objHeaderV1(0xA00, Seq(0x0001 -> dataspaceV1(Seq(4L)), 0x0003 -> datatype(0, 4),
      0x0008 -> layoutContiguous(0xB40L, 16L)))
    bb.position(0xB00); Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).foreach(bb.putDouble)
    bb.position(0xB40); Seq(10, 20, 30, 40).foreach(bb.putInt)
    bb.array()
  }

  /** v2 superblock, OHDR v2 + compact link messages:
    * root { dset2(7 f4), sub { leaf(2x2 i8) } }.
    */
  private def v2File(): Array[Byte] = {
    val bb = ByteBuffer.allocate(0x500).order(ByteOrder.LITTLE_ENDIAN)
    sig(bb, 0)
    bb.put(8, 2.toByte); bb.put(9, 8.toByte); bb.put(10, 8.toByte)
    bb.putLong(12, 0L); bb.putLong(20, Undef); bb.putLong(28, 0x500L)
    bb.putLong(36, 0x100L) // root object header

    def linkMsg(name: String, target: Long): Array[Byte] = {
      val nb = name.getBytes("UTF-8")
      val b = ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(0.toByte) // version, flags: 1B name len, hard link
      b.put(nb.length.toByte); b.put(nb); b.putLong(target)
      b.array()
    }
    def dataspaceV2(dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + dims.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte); b.put(dims.size.toByte); b.put(0.toByte); b.put(1.toByte)
      dims.foreach(b.putLong); b.array()
    }
    def datatype(cls: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | cls).toByte); b.position(4); b.putInt(size); b.array()
    }
    def ohdr(at: Int, msgs: Seq[(Int, Array[Byte])]): Unit = {
      bb.position(at); bb.put("OHDR".getBytes("ISO-8859-1"))
      bb.put(at + 4, 2.toByte); bb.put(at + 5, 0.toByte) // version, flags: 1B chunk size
      val chunk0 = msgs.map(m => 4 + m._2.length).sum
      bb.put(at + 6, chunk0.toByte)
      var p = at + 7
      msgs.foreach { case (typ, body) =>
        bb.put(p, typ.toByte)
        bb.putShort(p + 1, body.length.toShort)
        bb.put(p + 3, 0.toByte)
        bb.position(p + 4); bb.put(body)
        p += 4 + body.length
      }
      bb.putInt(p, 0xdeadbeef) // checksum (not verified by the parser)
    }

    ohdr(0x100, Seq(6 -> linkMsg("dset2", 0x200L), 6 -> linkMsg("sub", 0x300L)))
    ohdr(0x200, Seq(1 -> dataspaceV2(Seq(7L)), 3 -> datatype(1, 4)))
    ohdr(0x300, Seq(6 -> linkMsg("leaf", 0x400L)))
    ohdr(0x400, Seq(1 -> dataspaceV2(Seq(2L, 2L)), 3 -> datatype(0, 8)))
    bb.array()
  }

  test("v0 superblock: symbol-table groups, heap names, dataspace + dtype") {
    val nodes = Hdf5Inspect.listing(v0File())
    assert(nodes.map(n => (n.path, n.kind)) == Seq(
      ("/", "group"), ("/dset1", "dataset"), ("/grp1", "group"), ("/grp1/ids", "dataset")))
    val d1 = nodes.find(_.path == "/dset1").get
    assert(d1.dims == Seq(2L, 3L) && d1.dtypeClass == "float" && d1.dtypeSize == 8)
    val ids = nodes.find(_.path == "/grp1/ids").get
    assert(ids.dims == Seq(4L) && ids.dtypeClass == "fixed" && ids.dtypeSize == 4)
  }

  test("v2 superblock: OHDR headers with compact link messages") {
    val nodes = Hdf5Inspect.listing(v2File())
    assert(nodes.map(n => (n.path, n.kind)) == Seq(
      ("/", "group"), ("/dset2", "dataset"), ("/sub", "group"), ("/sub/leaf", "dataset")))
    val d2 = nodes.find(_.path == "/dset2").get
    assert(d2.dims == Seq(7L) && d2.dtypeClass == "float" && d2.dtypeSize == 4)
    assert(nodes.find(_.path == "/sub/leaf").get.dims == Seq(2L, 2L))
  }

  test("summary map aggregates counts and dataset shapes") {
    val m = Hdf5Inspect.summary(v0File())
    assert(m("superblock_version") == 0)
    assert(m("n_groups") == 2 && m("n_datasets") == 2)
    assert(m("datasets").asInstanceOf[Seq[String]].contains("/dset1: float64 2x3"))
  }

  test("contiguous datasets surface with data addresses and read through Spark") {
    val ds = Hdf5Inspect.datasets(v0File())
    assert(ds.map(_.path) == Seq("/dset1", "/grp1/ids"))
    val d1 = ds.find(_.path == "/dset1").get
    assert(d1.dataAddr == 0xB00L && d1.dataSize == 48L && d1.littleEndian)

    val dir = java.nio.file.Files.createTempDirectory("h5read")
    java.nio.file.Files.write(dir.resolve("f.h5"), v0File())
    import spark.implicits._
    val m = graft.readers.Hdf5Reader.read(spark, s"file://$dir/f.h5", Some("/dset1"))
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 6 && m((0L, 0L)) == 1.0 && m((1L, 2L)) == 6.0)
    val ids = graft.readers.Hdf5Reader.read(spark, s"file://$dir/f.h5", Some("/grp1/ids"))
      .as[(Long, Double)].collect().toMap
    assert(ids == Map(0L -> 10.0, 1L -> 20.0, 2L -> 30.0, 3L -> 40.0))
  }

  test("chunked + gzip dataset reads through the chunk b-tree") {
    // v0 file: root { cd(3x4 f8, chunks 2x3, deflate) }
    val bb = ByteBuffer.allocate(0x1000).order(ByteOrder.LITTLE_ENDIAN)
    sig(bb, 0)
    bb.put(8, 0.toByte); bb.put(13, 8.toByte); bb.put(14, 8.toByte)
    bb.putShort(16, 4); bb.putShort(18, 16)
    bb.putLong(24, 0L); bb.putLong(32, Undef); bb.putLong(40, 0x1000L); bb.putLong(48, Undef)
    bb.putLong(56, 0L); bb.putLong(64, 0x100L)

    def objHeaderV1(at: Int, msgs: Seq[(Int, Array[Byte])]): Unit = {
      bb.put(at, 1.toByte); bb.putShort(at + 2, msgs.size.toShort); bb.putInt(at + 4, 1)
      bb.putInt(at + 8, msgs.map(m => 8 + ((m._2.length + 7) & ~7)).sum)
      var p = at + 16
      msgs.foreach { case (typ, body) =>
        val padded = (body.length + 7) & ~7
        bb.putShort(p, typ.toShort); bb.putShort(p + 2, padded.toShort)
        bb.position(p + 8); bb.put(body)
        p += 8 + padded
      }
    }
    def symTab(btree: Long, heap: Long) = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN); b.putLong(btree); b.putLong(heap); b.array()
    }
    // root group -> one SNOD entry "cd" -> header at 0x500
    objHeaderV1(0x100, Seq(0x0011 -> symTab(0x200, 0x300)))
    bb.position(0x200); bb.put("TREE".getBytes); bb.put(0.toByte); bb.put(0.toByte); bb.putShort(1)
    bb.putLong(0x208, Undef); bb.putLong(0x210, Undef); bb.putLong(0x218, 0L); bb.putLong(0x220, 0x400L)
    bb.position(0x300); bb.put("HEAP".getBytes); bb.putLong(0x308, 0x80L); bb.putLong(0x310, 0L); bb.putLong(0x318, 0x340L)
    bb.position(0x340); bb.put("cd".getBytes); bb.put(0.toByte)
    bb.position(0x400); bb.put("SNOD".getBytes); bb.put(0x404, 1.toByte); bb.putShort(0x406, 1)
    bb.putLong(0x408, 0L); bb.putLong(0x410, 0x500L)

    val dataspace = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(2.toByte); b.position(8); b.putLong(3L); b.putLong(4L); b.array()
    }
    val dtype = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | 1).toByte); b.position(4); b.putInt(8); b.array()
    }
    val layoutChunked = {
      val b = ByteBuffer.allocate(23).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(2.toByte); b.put(3.toByte) // v3, chunked, dimensionality rank+1
      b.putLong(0x600L)                                  // chunk b-tree
      b.putInt(2); b.putInt(3); b.putInt(8)              // chunk dims + element size
      b.array()
    }
    val filterPipeline = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(1.toByte) // v1, one filter
      b.position(8)
      b.putShort(1); b.putShort(0); b.putShort(1); b.putShort(1) // deflate, no name, flags, 1 value
      // client value (level) would follow; length covers header only here
      b.array()
    }
    objHeaderV1(0x500, Seq(0x0001 -> dataspace, 0x0003 -> dtype,
      0x000B -> filterPipeline, 0x0008 -> layoutChunked))

    // chunk data: global value(i,j) = i*10 + j; chunks of 2x3
    def gz(vals: Seq[Double]): Array[Byte] = {
      val raw = ByteBuffer.allocate(vals.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(raw.putDouble)
      val d = new java.util.zip.Deflater(); d.setInput(raw.array()); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](512)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    def block(oi: Int, oj: Int): Seq[Double] =
      for (a <- 0 until 2; b <- 0 until 3) yield ((oi + a) * 10 + (oj + b)).toDouble
    val c00 = gz(block(0, 0)); val c03 = gz(block(0, 3)); val c20 = gz(block(2, 0)); val c23 = gz(block(2, 3))
    bb.position(0x800); bb.put(c00)
    bb.position(0x900); bb.put(c03)
    bb.position(0xA00); bb.put(c20)
    bb.position(0xB00); bb.put(c23)

    // chunk b-tree: node type 1, leaf, 4 entries; key = (size, mask, off0, off1, 0)
    bb.position(0x600); bb.put("TREE".getBytes); bb.put(1.toByte); bb.put(0.toByte); bb.putShort(4)
    bb.putLong(0x608, Undef); bb.putLong(0x610, Undef)
    val entries = Seq((c00, 0L, 0L, 0x800L), (c03, 0L, 3L, 0x900L), (c20, 2L, 0L, 0xA00L), (c23, 2L, 3L, 0xB00L))
    var p = 0x618
    entries.foreach { case (chunk, oi, oj, addr) =>
      bb.putInt(p, chunk.length); bb.putInt(p + 4, 0)
      bb.putLong(p + 8, oi); bb.putLong(p + 16, oj); bb.putLong(p + 24, 0L)
      bb.putLong(p + 32, addr)
      p += 40
    }

    val dir = java.nio.file.Files.createTempDirectory("h5chunk")
    java.nio.file.Files.write(dir.resolve("c.h5"), bb.array())
    val ds = Hdf5Inspect.datasets(bb.array())
    assert(ds.head.isChunked && ds.head.filters == Seq(1) && ds.head.chunkDims == Seq(2, 3))

    import spark.implicits._
    val m = graft.readers.Hdf5Reader.read(spark, s"file://$dir/c.h5")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 12) // 3x4; edge chunk rows trimmed
    assert(m((0L, 0L)) == 0.0 && m((1L, 3L)) == 13.0 && m((2L, 3L)) == 23.0)
    assert(!m.contains((3L, 0L)) && !m.contains((0L, 6L)))
  }

  test("shuffle+deflate pipeline inverts in order; unknown filters refuse") {
    // h5py's shuffle=True, compression='gzip' default combo: write-side
    // pipeline is shuffle(2) then deflate(1); reading only the deflate
    // would decode byte-plane soup — silently wrong values
    def mkFile(filterMsg: Array[Byte], enc: Seq[Double] => Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(0x1000).order(ByteOrder.LITTLE_ENDIAN)
      sig(bb, 0)
      bb.put(8, 0.toByte); bb.put(13, 8.toByte); bb.put(14, 8.toByte)
      bb.putShort(16, 4); bb.putShort(18, 16)
      bb.putLong(24, 0L); bb.putLong(32, Undef); bb.putLong(40, 0x1000L); bb.putLong(48, Undef)
      bb.putLong(56, 0L); bb.putLong(64, 0x100L)
      def objHeaderV1(at: Int, msgs: Seq[(Int, Array[Byte])]): Unit = {
        bb.put(at, 1.toByte); bb.putShort(at + 2, msgs.size.toShort); bb.putInt(at + 4, 1)
        bb.putInt(at + 8, msgs.map(m => 8 + ((m._2.length + 7) & ~7)).sum)
        var p = at + 16
        msgs.foreach { case (typ, body) =>
          val padded = (body.length + 7) & ~7
          bb.putShort(p, typ.toShort); bb.putShort(p + 2, padded.toShort)
          bb.position(p + 8); bb.put(body)
          p += 8 + padded
        }
      }
      val symTab = { val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN); b.putLong(0x200L); b.putLong(0x300L); b.array() }
      objHeaderV1(0x100, Seq(0x0011 -> symTab))
      bb.position(0x200); bb.put("TREE".getBytes); bb.put(0.toByte); bb.put(0.toByte); bb.putShort(1)
      bb.putLong(0x208, Undef); bb.putLong(0x210, Undef); bb.putLong(0x218, 0L); bb.putLong(0x220, 0x400L)
      bb.position(0x300); bb.put("HEAP".getBytes); bb.putLong(0x308, 0x80L); bb.putLong(0x310, 0L); bb.putLong(0x318, 0x340L)
      bb.position(0x340); bb.put("sd".getBytes); bb.put(0.toByte)
      bb.position(0x400); bb.put("SNOD".getBytes); bb.put(0x404, 1.toByte); bb.putShort(0x406, 1)
      bb.putLong(0x408, 0L); bb.putLong(0x410, 0x500L)
      val dataspace = {
        val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte); b.put(1.toByte); b.position(8); b.putLong(4L); b.array()
      }
      val dtype = {
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        b.put(((1 << 4) | 1).toByte); b.position(4); b.putInt(8); b.array()
      }
      val layoutChunked = {
        val b = ByteBuffer.allocate(19).order(ByteOrder.LITTLE_ENDIAN)
        b.put(3.toByte); b.put(2.toByte); b.put(2.toByte) // v3, chunked, rank+1
        b.putLong(0x600L); b.putInt(2); b.putInt(8)
        b.array()
      }
      objHeaderV1(0x500, Seq(0x0001 -> dataspace, 0x0003 -> dtype,
        0x000B -> filterMsg, 0x0008 -> layoutChunked))
      val c0 = enc(Seq(1.5, 2.5)); val c1 = enc(Seq(3.5, 4.5))
      bb.position(0x800); bb.put(c0)
      bb.position(0x900); bb.put(c1)
      bb.position(0x600); bb.put("TREE".getBytes); bb.put(1.toByte); bb.put(0.toByte); bb.putShort(2)
      bb.putLong(0x608, Undef); bb.putLong(0x610, Undef)
      var p = 0x618
      Seq((c0, 0L, 0x800L), (c1, 2L, 0x900L)).foreach { case (chunk, oi, addr) =>
        bb.putInt(p, chunk.length); bb.putInt(p + 4, 0)
        bb.putLong(p + 8, oi); bb.putLong(p + 16, 0L)
        bb.putLong(p + 24, addr)
        p += 32
      }
      bb.array()
    }
    def filterMsg(ids: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + ids.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(ids.size.toByte)
      ids.zipWithIndex.foreach { case (id, k) =>
        b.position(8 + k * 8); b.putShort(id.toShort); b.putShort(0); b.putShort(0); b.putShort(0)
      }
      b.array()
    }
    def le(vals: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(vals.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(b.putDouble); b.array()
    }
    def shuf(raw: Array[Byte], esz: Int): Array[Byte] = {
      val n = raw.length / esz
      val out = new Array[Byte](raw.length)
      for (i <- 0 until n; bix <- 0 until esz) out(bix * n + i) = raw(i * esz + bix)
      out
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](512)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }

    val dir = java.nio.file.Files.createTempDirectory("h5shuf")
    java.nio.file.Files.write(dir.resolve("s.h5"),
      mkFile(filterMsg(Seq(2, 1)), vals => gz(shuf(le(vals), 8))))
    val ds = Hdf5Inspect.datasets(java.nio.file.Files.readAllBytes(dir.resolve("s.h5")))
    assert(ds.head.filters == Seq(2, 1))
    import spark.implicits._
    val got = graft.readers.Hdf5Reader.read(spark, s"file://$dir/s.h5")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 1.5, 1L -> 2.5, 2L -> 3.5, 3L -> 4.5))

    java.nio.file.Files.write(dir.resolve("bad.h5"),
      mkFile(filterMsg(Seq(42)), le))
    val e = intercept[IllegalArgumentException](
      graft.readers.Hdf5Reader.read(spark, s"file://$dir/bad.h5").count())
    assert(e.getMessage.contains("filter id 42"))

    // v2 filter pipeline message (libver='latest'): entries at body+2,
    // NO name-length field for ids < 256, no padding
    def filterMsgV2(ids: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(2 + ids.size * 6).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte); b.put(ids.size.toByte)
      ids.foreach { id => b.putShort(id.toShort); b.putShort(0); b.putShort(0) }
      b.array()
    }
    java.nio.file.Files.write(dir.resolve("v2.h5"),
      mkFile(filterMsgV2(Seq(2, 1)), vals => gz(shuf(le(vals), 8))))
    assert(Hdf5Inspect.datasets(java.nio.file.Files.readAllBytes(dir.resolve("v2.h5"))).head.filters == Seq(2, 1))
    val gotV2 = graft.readers.Hdf5Reader.read(spark, s"file://$dir/v2.h5")
      .as[(Long, Double)].collect().toMap
    assert(gotV2 == Map(0L -> 1.5, 1L -> 2.5, 2L -> 3.5, 3L -> 4.5))
  }

  test("layout v4 fixed-array chunk index reads (libver=latest shape)") {
    // v0 superblock + v1 object headers, but the dataset carries a
    // VERSION 4 data layout message with a fixed-array chunk index —
    // the combination modern writers emit for chunked data
    val bb = ByteBuffer.allocate(0x1000).order(ByteOrder.LITTLE_ENDIAN)
    sig(bb, 0)
    bb.put(8, 0.toByte); bb.put(13, 8.toByte); bb.put(14, 8.toByte)
    bb.putShort(16, 4); bb.putShort(18, 16)
    bb.putLong(24, 0L); bb.putLong(32, Undef); bb.putLong(40, 0x1000L); bb.putLong(48, Undef)
    bb.putLong(56, 0L); bb.putLong(64, 0x100L)
    def objHeaderV1(at: Int, msgs: Seq[(Int, Array[Byte])]): Unit = {
      bb.put(at, 1.toByte); bb.putShort(at + 2, msgs.size.toShort); bb.putInt(at + 4, 1)
      bb.putInt(at + 8, msgs.map(m => 8 + ((m._2.length + 7) & ~7)).sum)
      var p = at + 16
      msgs.foreach { case (typ, body) =>
        val padded = (body.length + 7) & ~7
        bb.putShort(p, typ.toShort); bb.putShort(p + 2, padded.toShort)
        bb.position(p + 8); bb.put(body)
        p += 8 + padded
      }
    }
    def symTab(btree: Long, heap: Long) = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN); b.putLong(btree); b.putLong(heap); b.array()
    }
    objHeaderV1(0x100, Seq(0x0011 -> symTab(0x200, 0x300)))
    bb.position(0x200); bb.put("TREE".getBytes); bb.put(0.toByte); bb.put(0.toByte); bb.putShort(1)
    bb.putLong(0x208, Undef); bb.putLong(0x210, Undef); bb.putLong(0x218, 0L); bb.putLong(0x220, 0x400L)
    bb.position(0x300); bb.put("HEAP".getBytes); bb.putLong(0x308, 0x80L); bb.putLong(0x310, 0L); bb.putLong(0x318, 0x340L)
    bb.position(0x340); bb.put("fa".getBytes); bb.put(0.toByte)
    bb.position(0x400); bb.put("SNOD".getBytes); bb.put(0x404, 1.toByte); bb.putShort(0x406, 1)
    bb.putLong(0x408, 0L); bb.putLong(0x410, 0x500L)

    val dataspace = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(2.toByte); b.position(8); b.putLong(3L); b.putLong(4L); b.array()
    }
    val dtype = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | 1).toByte); b.position(4); b.putInt(8); b.array()
    }
    val layoutV4 = {
      // v4, chunked, flags 0, dimensionality 3 (2 chunk dims + element
      // size), 4-byte dim encoding, indexing type 3 (fixed array)
      val b = ByteBuffer.allocate(27).order(ByteOrder.LITTLE_ENDIAN)
      b.put(4.toByte); b.put(2.toByte); b.put(0.toByte); b.put(3.toByte); b.put(4.toByte)
      b.putInt(2); b.putInt(3); b.putInt(8)
      b.put(3.toByte)      // fixed array
      b.put(10.toByte)     // page bits
      b.putLong(0x600L)    // index (FAHD) address
      b.array()
    }
    objHeaderV1(0x500, Seq(0x0001 -> dataspace, 0x0003 -> dtype, 0x0008 -> layoutV4))

    // chunk data, unfiltered: 2x3 doubles each; chunk (2,3) missing
    def block(oi: Int, oj: Int): Unit = {
      val vals = for (a <- 0 until 2; b <- 0 until 3) yield ((oi + a) * 10 + (oj + b)).toDouble
      vals.foreach(bb.putDouble)
    }
    bb.position(0x800); block(0, 0)
    bb.position(0x880); block(0, 3)
    bb.position(0x900); block(2, 0)

    // FAHD at 0x600: sig, version, client 0 (unfiltered), entry size 8,
    // page bits 10, max entries 4, data block at 0x680
    bb.position(0x600); bb.put("FAHD".getBytes)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(8.toByte); bb.put(10.toByte)
    bb.putLong(0x608, 4L); bb.putLong(0x610, 0x680L)
    // FADB at 0x680: sig, version, client, header addr, then 4 addresses
    // in C order (grid 2x2) with the last marked missing
    bb.position(0x680); bb.put("FADB".getBytes); bb.put(0.toByte); bb.put(0.toByte)
    bb.putLong(0x686, 0x600L)
    bb.putLong(0x68E, 0x800L); bb.putLong(0x696, 0x880L)
    bb.putLong(0x69E, 0x900L); bb.putLong(0x6A6, Undef)

    val ds = Hdf5Inspect.datasets(bb.array())
    assert(ds.head.isChunked && ds.head.indexKind == "fixedarray" && ds.head.chunkDims == Seq(2, 3))
    val chunks = Hdf5Inspect.modernChunks(bb.array(), "fixedarray", 0x600L, Seq(3L, 4L), Seq(2, 3), 8)
    assert(chunks.map(_._1) == Seq(Seq(0L, 0L), Seq(0L, 3L), Seq(2L, 0L)))

    val dir = java.nio.file.Files.createTempDirectory("h5fa")
    java.nio.file.Files.write(dir.resolve("fa.h5"), bb.array())
    import spark.implicits._
    val m = graft.readers.Hdf5Reader.read(spark, s"file://$dir/fa.h5")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 11) // 3x4 minus the missing chunk's single in-bounds cell (2,3)
    assert(m((0L, 0L)) == 0.0 && m((1L, 3L)) == 13.0 && m((2L, 2L)) == 22.0)
    assert(!m.contains((2L, 3L)))

    // implicit index: same grid laid contiguously from a base address
    val imp = Hdf5Inspect.modernChunks(bb.array(), "implicit", 0x800L, Seq(4L, 6L), Seq(2, 3), 8)
    assert(imp.map(c => (c._1, c._2)) == Seq(
      (Seq(0L, 0L), 0x800L), (Seq(0L, 3L), 0x830L), (Seq(2L, 0L), 0x860L), (Seq(2L, 3L), 0x890L)))
    // single chunk: the whole dataset at one address
    val single = Hdf5Inspect.modernChunks(bb.array(), "single", 0x800L, Seq(2L, 3L), Seq(2, 3), 8)
    assert(single == Seq((Seq(0L, 0L), 0x800L, 48)))
    // filtered single chunk: "single:<storedSize>" carries the
    // COMPRESSED byte count — readers must fetch that, not the logical
    // 48 bytes
    val filtered = Hdf5Inspect.modernChunks(bb.array(), "single:29", 0x800L, Seq(2L, 3L), Seq(2, 3), 8)
    assert(filtered == Seq((Seq(0L, 0L), 0x800L, 29)))
  }

  test("rejects non-hdf5 bytes and unknown superblocks") {
    intercept[IllegalArgumentException](Hdf5Inspect.listing("nope".getBytes ++ new Array[Byte](60)))
    val bad = v0File(); bad(8) = 9.toByte
    intercept[UnsupportedOperationException](Hdf5Inspect.listing(bad))
  }
}
