package graft.readers

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Spec for the PMTiles v3 data reader over a synthetic archive built
  * to the published spec: gzip-compressed directories, a root with both
  * direct tile entries and a leaf-directory pointer, delta-encoded tile
  * ids, run-length entries, and the offset-0 "continues previous"
  * convention.
  */
object PMTilesFixture {

  private def varint(out: ByteArrayOutputStream, v: Long): Unit = {
    var x = v
    do { val b = (x & 0x7f).toInt; x = x >>> 7; out.write(if (x != 0) b | 0x80 else b) } while (x != 0)
  }

  /** Serialize (tileId, runLength, offset, length) entries; entries with
    * offset == -1 use the spec's 0="previous offset+length" encoding.
    */
  def directory(entries: Seq[(Long, Long, Long, Long)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    varint(out, entries.size)
    var prev = 0L
    entries.foreach { case (id, _, _, _) => varint(out, id - prev); prev = id }
    entries.foreach { case (_, run, _, _) => varint(out, run) }
    entries.foreach { case (_, _, _, len) => varint(out, len) }
    entries.foreach { case (_, _, off, _) => varint(out, if (off < 0) 0 else off + 1) }
    out.toByteArray
  }

  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** Assemble a v3 archive: header | root dir | metadata | leaf dirs | tiles. */
  def write(file: File, rootDir: Array[Byte], metadata: Array[Byte],
      leafDirs: Array[Byte], tileData: Array[Byte], nAddressed: Long): Unit = {
    val headerLen = 127L
    val rootOff = headerLen
    val metaOff = rootOff + rootDir.length
    val leafOff = metaOff + metadata.length
    val tileOff = leafOff + leafDirs.length
    val h = ByteBuffer.allocate(127).order(ByteOrder.LITTLE_ENDIAN)
    h.put("PMTiles".getBytes(StandardCharsets.US_ASCII)).put(3.toByte)
    h.putLong(rootOff).putLong(rootDir.length)
    h.putLong(metaOff).putLong(metadata.length)
    h.putLong(leafOff).putLong(leafDirs.length)
    h.putLong(tileOff).putLong(tileData.length)
    h.putLong(nAddressed).putLong(0L).putLong(0L) // addressed/entries/contents
    h.put(1.toByte)           // clustered
    h.put(2.toByte)           // internal_compression = gzip
    h.put(1.toByte)           // tile_compression = none
    h.put(1.toByte)           // tile_type = mvt
    h.put(0.toByte).put(2.toByte) // min/max zoom
    val out = new FileOutputStream(file)
    try {
      out.write(h.array())
      out.write(rootDir); out.write(metadata); out.write(leafDirs); out.write(tileData)
    } finally out.close()
  }
}

class PMTilesReaderSpec extends SparkSpec {
  import PMTilesFixture._

  test("tile id Hilbert addressing matches the published mapping") {
    assert(PMTilesReader.tileIdToZxy(0L) == (0, 0L, 0L))
    assert(PMTilesReader.tileIdToZxy(1L) == (1, 0L, 0L))
    assert(PMTilesReader.tileIdToZxy(2L) == (1, 0L, 1L))
    assert(PMTilesReader.tileIdToZxy(3L) == (1, 1L, 1L))
    assert(PMTilesReader.tileIdToZxy(4L) == (1, 1L, 0L))
    assert(PMTilesReader.tileIdToZxy(5L) == (2, 0L, 0L))
  }

  private def fixture(): File = {
    val tiles = Array("t0".getBytes, "t1".getBytes, "big-shared-tile".getBytes)
    val tileBlob = tiles.flatten.toArray
    val off = tiles.scanLeft(0L)(_ + _.length)
    // leaf directory: ids 5,6 share one tile (offset-0 continuation NOT
    // used here — id 6 repeats tile 2's extent); id 7 run_length=2.
    val leaf = gzip(directory(Seq(
      (5L, 1L, off(2), tiles(2).length.toLong),
      (6L, 1L, off(2), tiles(2).length.toLong),
      (7L, 2L, off(0), tiles(0).length.toLong))))
    // root: two direct tile entries (0 and 1; entry 1 uses the offset-0
    // continuation) then a leaf pointer (run_length=0).
    val root = gzip(directory(Seq(
      (0L, 1L, off(0), tiles(0).length.toLong),
      (1L, 1L, -1L, tiles(1).length.toLong), // offset 0 → continues previous
      (5L, 0L, 0L, leaf.length.toLong))))
    val meta = gzip("""{"name":"fixture"}""".getBytes(StandardCharsets.UTF_8))
    val f = File.createTempFile("fixture", ".pmtiles")
    write(f, root, meta, leaf, tileBlob, nAddressed = 6)
    f
  }

  test("reads root entries, leaf directories, run-lengths, and shared tiles") {
    import spark.implicits._
    val f = fixture()
    val df = PMTilesReader.read(spark, f.getAbsolutePath)
    val rows = df.select($"tile_id", $"zoom", $"x", $"y", $"tile_data")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), new String(r.getAs[Array[Byte]](4))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 5L, 6L, 7L, 8L))
    assert(rows.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0, 0L, 0L), (1, 0L, 0L), (2, 0L, 0L), (2, 1L, 0L), (2, 1L, 1L), (2, 0L, 1L)))
    val byId = rows.map(t => t._1 -> t._5).toMap
    assert(byId(0L) == "t0")
    assert(byId(1L) == "t1") // offset-0 continuation resolved
    assert(byId(5L) == "big-shared-tile" && byId(6L) == "big-shared-tile")
    assert(byId(7L) == "t0" && byId(8L) == "t0") // run expansion
  }

  test("metadata blob decompresses") {
    val f = fixture()
    assert(PMTilesReader.metadataJson(spark, f.getAbsolutePath) == """{"name":"fixture"}""")
  }

  test("registered reader routes the pmtiles kind") {
    val f = fixture()
    val ref = graft.datatypes.DataRef("pmtiles", f.getAbsolutePath)
    val reader = SparkReaders.all.find(_.isOk(ref))
    assert(reader.exists(_.name == "pmtiles_reader"))
    assert(reader.get.read(spark, ref).count() == 6)
  }

  test("brotli/zstd internal compression is refused clearly") {
    val f = File.createTempFile("bad", ".pmtiles")
    val root = directory(Seq((0L, 1L, 0L, 2L)))
    val h = ByteBuffer.allocate(127).order(ByteOrder.LITTLE_ENDIAN)
    h.put("PMTiles".getBytes(StandardCharsets.US_ASCII)).put(3.toByte)
    h.putLong(127L).putLong(root.length)
    h.putLong(127L + root.length).putLong(0L)
    h.putLong(127L + root.length).putLong(0L)
    h.putLong(127L + root.length).putLong(2L)
    h.putLong(1L).putLong(0L).putLong(0L)
    h.put(1.toByte).put(4.toByte) // zstd
    h.put(1.toByte).put(1.toByte).put(0.toByte).put(0.toByte)
    val out = new FileOutputStream(f)
    try { out.write(h.array()); out.write(root); out.write("t0".getBytes) } finally out.close()
    val e = intercept[UnsupportedOperationException] {
      PMTilesReader.read(spark, f.getAbsolutePath)
    }
    assert(e.getMessage.contains("internal_compression"))
  }
}
