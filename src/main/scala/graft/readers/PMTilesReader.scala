package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** PMTiles v3 data reader (published PMTiles v3 spec; reference
  * `datatypes.py:260` PMTilesFile — the reference only type-detects it,
  * and `readers.py:2731` reads the header; this adds the tile DATA
  * walk, the same depth [[MBTilesReader]] gives the sqlite tile layout).
  *
  * Layout: 127-byte header (parsed by
  * [[graft.inspect.HeaderParsers.pmtiles]]), then directories — varint
  * blocks holding delta-encoded Hilbert tile ids, run lengths, byte
  * lengths, and offsets — optionally gzip-compressed
  * (`internal_compression`: 1=none, 2=gzip; brotli/zstd refused
  * clearly). A directory entry with `run_length == 0` points at a LEAF
  * directory; others address `run_length` consecutive tile ids of
  * shared tile bytes. Tile ids map to (z, x, y) by cumulative 4^z
  * offset + Hilbert d2xy within the zoom level (the published
  * spec's addressing).
  *
  * Scale shape: the driver reads only the header + ROOT directory
  * (spec-bounded at ~16 KB); leaf-directory pointers ship to executors,
  * each of which parses its leaf and positioned-reads just its tiles'
  * extents — a planet-scale archive (hundreds of millions of addressed
  * tiles) never materializes its directory tree on the driver.
  *
  * Output: (zoom, x, y, tile_id, tile_data) with tile bytes exactly as
  * stored (`tile_compression` says how to interpret them, as in the
  * MBTiles raw layout).
  */
object PMTilesReader {

  private final class VarintReader(bytes: Array[Byte]) {
    var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def varint(): Long = {
      var shift = 0; var out = 0L; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        out |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0 && shift < 64)
      out
    }
  }

  /** One directory entry: tileId run of `runLength` (0 = leaf pointer),
    * extent (offset, length) relative to the tile-data (or leaf) section.
    */
  case class Entry(tileId: Long, runLength: Long, offset: Long, length: Long)

  /** Decode a (decompressed) directory block. */
  def parseDirectory(bytes: Array[Byte]): Seq[Entry] = {
    val r = new VarintReader(bytes)
    val n = r.varint().toInt
    val ids = new Array[Long](n)
    var acc = 0L
    var i = 0
    while (i < n) { acc += r.varint(); ids(i) = acc; i += 1 }
    val runs = Array.fill(n)(r.varint())
    val lens = Array.fill(n)(r.varint())
    val offs = new Array[Long](n)
    i = 0
    while (i < n) {
      val v = r.varint()
      offs(i) = if (v == 0 && i > 0) offs(i - 1) + lens(i - 1) else v - 1
      i += 1
    }
    (0 until n).map(i => Entry(ids(i), runs(i), offs(i), lens(i)))
  }

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  /** Decompress a directory per `internal_compression` (1=none, 2=gzip). */
  def decodeDir(raw: Array[Byte], internalCompression: Int): Seq[Entry] =
    internalCompression match {
      case 1 => parseDirectory(raw)
      case 2 => parseDirectory(gunzip(raw))
      case c => throw new UnsupportedOperationException(
        s"pmtiles internal_compression=$c (brotli/zstd) unsupported — re-encode with gzip or none")
    }

  /** Hilbert tile id → (z, x, y) per the PMTiles v3 addressing. */
  def tileIdToZxy(id: Long): (Int, Long, Long) = {
    var acc = 0L
    var z = 0
    while (acc + (1L << (2 * z)) <= id) { acc += 1L << (2 * z); z += 1 }
    var t = id - acc
    var x = 0L; var y = 0L
    var s = 1L
    while (s < (1L << z)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4
      s *= 2
    }
    (z, x, y)
  }

  private def readRange(fs: FileSystem, path: Path, at: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    val in = fs.open(path)
    try in.readFully(at, b) finally in.close()
    b
  }

  val schema: StructType = StructType(Seq(
    StructField("zoom", IntegerType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("tile_id", LongType, nullable = false),
    StructField("tile_data", BinaryType, nullable = false)))

  private def tileRows(
      url: String, conf: Configuration,
      tileDataOffset: Long, entries: Seq[Entry]): Iterator[Row] = {
    val path = new Path(url)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    val it = entries.iterator.flatMap { e =>
      val bytes = new Array[Byte](e.length.toInt)
      in.readFully(tileDataOffset + e.offset, bytes)
      (0L until math.max(1L, e.runLength)).iterator.map { k =>
        val id = e.tileId + k
        val (z, x, y) = tileIdToZxy(id)
        Row(z, x, y, id, bytes)
      }
    }
    // Hand the caller an iterator that closes the stream on exhaustion.
    new Iterator[Row] {
      def hasNext: Boolean = { val h = it.hasNext; if (!h) in.close(); h }
      def next(): Row = it.next()
    }
  }

  /** The archive's JSON metadata blob (driver-side; spec-bounded small). */
  def metadataJson(spark: SparkSession, url: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new Path(url)
    val fs = path.getFileSystem(conf)
    val hdr = graft.inspect.HeaderParsers.pmtiles(readRange(fs, path, 0, 127))
    val raw = readRange(fs, path, hdr("metadata_offset").asInstanceOf[Long],
      hdr("metadata_length").asInstanceOf[Long].toInt)
    val bytes = hdr("internal_compression").asInstanceOf[Int] match {
      case 2 => gunzip(raw)
      case _ => raw
    }
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Read all tiles as (zoom, x, y, tile_id, tile_data). */
  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new Path(url)
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val hdr = graft.inspect.HeaderParsers.pmtiles(readRange(fs, path, 0, 127))
    require(hdr("version").asInstanceOf[Int] == 3, s"pmtiles v${hdr("version")} unsupported (v3 only)")
    val comp = hdr("internal_compression").asInstanceOf[Int]
    val rootOff = hdr("root_dir_offset").asInstanceOf[Long]
    val rootLen = hdr("root_dir_length").asInstanceOf[Long]
    val leafOff = hdr("leaf_dirs_offset").asInstanceOf[Long]
    val tileOff = hdr("tile_data_offset").asInstanceOf[Long]

    val root = decodeDir(readRange(fs, path, rootOff, rootLen.toInt), comp)
    val (leafPtrs, rootTiles) = root.partition(_.runLength == 0L)

    val sconf = graft.core.SerializableHadoopConf(conf)
    val sc = spark.sparkContext
    // Root-level tile entries (small archives, or the spec's root spill):
    // chunk them so one giant root doesn't serialize as one task.
    val rootChunks = rootTiles.grouped(512).toSeq
    val rootRdd = sc.parallelize(rootChunks, math.max(1, math.min(rootChunks.size, sc.defaultParallelism)))
      .flatMap(chunk => tileRows(url, sconf.value, tileOff, chunk))
    // Leaf directories: one task unit per leaf — parse + read executor-side.
    val leafRdd = sc.parallelize(leafPtrs, math.max(1, math.min(leafPtrs.size, sc.defaultParallelism)))
      .flatMap { ptr =>
        val p = new Path(url)
        val lfs = p.getFileSystem(sconf.value)
        val raw = {
          val b = new Array[Byte](ptr.length.toInt)
          val in = lfs.open(p)
          try in.readFully(leafOff + ptr.offset, b) finally in.close()
          b
        }
        val entries = decodeDir(raw, comp)
        require(entries.forall(_.runLength > 0), "nested leaf directories not allowed by the v3 spec")
        tileRows(url, sconf.value, tileOff, entries)
      }
    spark.createDataFrame(rootRdd.union(leafRdd), schema)
  }
}

class PMTilesReaderImpl extends Reader {
  val name = "pmtiles_reader"
  val implementsKinds = Set("pmtiles")
  def read(spark: SparkSession, ref: DataRef): DataFrame = PMTilesReader.read(spark, ref.url)
}
