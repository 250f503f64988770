package graft.readers

import com.fasterxml.jackson.databind.ObjectMapper
import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Zarr array reader, v2 and v3 (public Zarr specs).
  *
  * v2: `.zarray` metadata (shape, chunks, dtype, compressor, order)
  * parsed on the driver; chunk objects decoded on the executors into
  * the long-form layout SURVEY §1.2 assigns to chunked arrays: one row
  * per element, `(dim0, dim1, ..., value)`. Scalar numpy dtypes
  * (f8/f4, i1-i8, u1-u8, bool, either endianness) in C-order chunks,
  * raw, zlib, or blosc-compressed — blosc-lz4 with
  * byte-shuffle is zarr-python's *default* v2 compressor and decodes
  * through the pure-JVM [[Blosc]] container walk; zstd/snappy-blosc
  * decode via the codec libraries Spark bundles (blosclz refuses at
  * metadata time).
  *
  * v3: `zarr.json` node metadata — regular chunk grid, default chunk
  * key encoding (`c` prefix, "/" or "." separator), `bytes` codec
  * (little endian) with optional `gzip`/`blosc`, and the `sharding_indexed`
  * codec: a shard object packs a grid of inner chunks with an
  * (offset, nbytes) u64-pair index at its end (index_location "end";
  * 2^64-1 offsets mark missing inner chunks), so one shard fetch
  * decodes many chunks — executors read whole shards, never the
  * driver.
  *
  * Scale shape: chunk/shard keys are enumerated on the driver (cheap —
  * pure arithmetic on the grid), each executor task fetches and decodes
  * its own objects, and elements never funnel through the driver.
  */
object ZarrReader {

  private case class Meta(shape: Seq[Int], chunks: Seq[Int], dtype: String, comp: String, fortran: Boolean)

  private case class MetaV3(
      shape: Seq[Int],
      chunks: Seq[Int],          // outer chunk (= shard when sharded)
      dtype: String,             // float64/float32/int64/int32
      sep: String,               // chunk key separator
      comp: String,              // none/gzip/blosc codec on the (inner) chunk bytes
      innerChunks: Option[Seq[Int]]) // sharding_indexed inner chunk shape

  private def readMeta(url: String, conf: Configuration): Meta = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url.stripSuffix("/") + "/.zarray"))
    val node = try new ObjectMapper().readTree(in) finally in.close()
    val shape = (0 until node.get("shape").size()).map(node.get("shape").get(_).asInt())
    val chunks = (0 until node.get("chunks").size()).map(node.get("chunks").get(_).asInt())
    val comp = Option(node.get("compressor")).filterNot(_.isNull)
    val id = comp.map(c => Option(c.get("id")).map(_.asText()).getOrElse("?")).getOrElse("none")
    id match {
      case "none" | "zlib" => ()
      case "blosc" =>
        // the container is self-describing; vet the cname up front so a
        // blosclz store refuses at metadata time, not mid-chunk
        val cname = comp.flatMap(c => Option(c.get("cname"))).map(_.asText()).getOrElse("lz4")
        require(Set("lz4", "lz4hc", "zlib", "zstd", "snappy").contains(cname),
          s"unsupported zarr blosc cname: $cname (lz4/lz4hc/zlib/zstd/snappy only)")
      case other => throw new IllegalArgumentException(s"unsupported zarr compressor: $other")
    }
    // numcodecs filter chains (Delta, FixedScaleOffset, …) transform the
    // bytes before compression — ignoring one would decode garbage
    val filters = Option(node.get("filters")).filterNot(_.isNull)
    require(filters.forall(f => f.isArray && f.size() == 0),
      s"zarr v2 filters unsupported: ${filters.map(_.toString).getOrElse("")}")
    val order = Option(node.get("order")).map(_.asText()).getOrElse("C")
    require(order == "C" || order == "F", s"zarr v2 order '$order' unsupported")
    Meta(shape, chunks, node.get("dtype").asText(), id, order == "F")
  }

  private def decodeChunk(bytes: Array[Byte], dtype: String, comp: String): Array[Double] = {
    val raw = comp match {
      case "none" => bytes
      case "blosc" => Blosc.decompress(bytes) // self-describing container (lz4/zlib inside)
      case "zlib" =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) throw new IllegalStateException("truncated zlib chunk")
          out.write(buf, 0, n)
        }
        inf.end()
        out.toByteArray
      case other => throw new IllegalArgumentException(s"unsupported zarr compressor: $other")
    }
    decodeNumeric(raw, dtype)
  }

  /** Numpy-style dtype string → doubles: `(<|>|\|)(f|i|u|b)(1|2|4|8)`,
    * covering the scalar dtypes zarr-python emits (u8 saturates at
    * 2^63-1 — the lossless long range — rather than misreading sign). */
  private[readers] def decodeNumeric(raw: Array[Byte], dtype: String): Array[Double] = {
    require(dtype.length >= 2, s"zarr dtype $dtype")
    val (endianChar, rest) =
      if ("<>|".contains(dtype.head)) (dtype.head, dtype.tail) else ('<', dtype)
    val kind = rest.head
    val size = rest.tail.toIntOption.getOrElse(
      throw new UnsupportedOperationException(s"zarr dtype $dtype"))
    val bb = ByteBuffer.wrap(raw).order(
      if (endianChar == '>') ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val n = raw.length / size
    (kind, size) match {
      case ('f', 8) => Array.tabulate(n)(i => bb.getDouble(i * 8))
      case ('f', 4) => Array.tabulate(n)(i => bb.getFloat(i * 4).toDouble)
      case ('i', 8) => Array.tabulate(n)(i => bb.getLong(i * 8).toDouble)
      case ('i', 4) => Array.tabulate(n)(i => bb.getInt(i * 4).toDouble)
      case ('i', 2) => Array.tabulate(n)(i => bb.getShort(i * 2).toDouble)
      case ('i', 1) => Array.tabulate(n)(i => raw(i).toDouble)
      case ('u', 8) => Array.tabulate(n) { i =>
        val v = bb.getLong(i * 8); (if (v < 0) Long.MaxValue else v).toDouble
      }
      case ('u', 4) => Array.tabulate(n)(i => (bb.getInt(i * 4).toLong & 0xffffffffL).toDouble)
      case ('u', 2) => Array.tabulate(n)(i => (bb.getShort(i * 2) & 0xffff).toDouble)
      case ('u', 1) => Array.tabulate(n)(i => (raw(i) & 0xff).toDouble)
      case ('b', 1) => Array.tabulate(n)(i => if (raw(i) != 0) 1.0 else 0.0)
      case _ => throw new UnsupportedOperationException(s"zarr dtype $dtype")
    }
  }

  // ---- v3 ------------------------------------------------------------

  private def readMetaV3(node: com.fasterxml.jackson.databind.JsonNode): MetaV3 = {
    import scala.jdk.CollectionConverters._
    require(Option(node.get("node_type")).forall(_.asText() == "array"), "zarr v3: not an array node")
    val shape = (0 until node.get("shape").size()).map(node.get("shape").get(_).asInt())
    val grid = node.get("chunk_grid")
    require(grid.get("name").asText() == "regular", "zarr v3: only regular chunk grids")
    val cs = grid.get("configuration").get("chunk_shape")
    val chunks = (0 until cs.size()).map(cs.get(_).asInt())
    val sep = Option(node.get("chunk_key_encoding"))
      .flatMap(e => Option(e.get("configuration")).flatMap(c => Option(c.get("separator"))))
      .map(_.asText()).getOrElse("/")
    val codecs = Option(node.get("codecs")).toSeq.flatMap(_.elements().asScala.toSeq)

    def scanCodecs(cs: Seq[com.fasterxml.jackson.databind.JsonNode]): (String, Option[(Seq[Int], String)]) = {
      var comp = "none"
      var shard: Option[(Seq[Int], String)] = None
      cs.foreach { c =>
        c.get("name").asText() match {
          case "bytes" =>
            val endian = Option(c.get("configuration")).flatMap(cf => Option(cf.get("endian"))).map(_.asText())
            require(endian.forall(_ == "little"), "zarr v3: only little-endian bytes codec")
          case "gzip" =>
            require(comp == "none", s"zarr v3: stacked compression codecs ($comp + gzip) unsupported")
            comp = "gzip"
          case "blosc" =>
            // self-describing container; vet the cname up front so a
            // blosclz store refuses at metadata time (the v2 rule)
            val cname = Option(c.get("configuration")).flatMap(cf => Option(cf.get("cname")))
              .map(_.asText()).getOrElse("lz4")
            require(Set("lz4", "lz4hc", "zlib", "zstd", "snappy").contains(cname),
              s"unsupported zarr v3 blosc cname: $cname (lz4/lz4hc/zlib/zstd/snappy only)")
            require(comp == "none", s"zarr v3: stacked compression codecs ($comp + blosc) unsupported")
            comp = "blosc"
          case "sharding_indexed" =>
            val cfg = c.get("configuration")
            val ics = cfg.get("chunk_shape")
            val inner = (0 until ics.size()).map(ics.get(_).asInt())
            require(Option(cfg.get("index_location")).forall(_.asText() == "end"),
              "zarr v3: only end-located shard indexes")
            val innerCodecs = Option(cfg.get("codecs")).toSeq.flatMap(_.elements().asScala.toSeq)
            val (innerComp, innerShard) = scanCodecs(innerCodecs)
            require(innerShard.isEmpty, "zarr v3: nested sharding unsupported")
            shard = Some((inner, innerComp))
          case "crc32c" => () // trailing checksum codec — bytes pass through with a suffix we ignore
          case other => throw new UnsupportedOperationException(s"zarr v3 codec $other")
        }
      }
      (comp, shard)
    }
    val (comp, shard) = scanCodecs(codecs)
    MetaV3(shape, chunks, node.get("data_type").asText(), sep,
      shard.map(_._2).getOrElse(comp), shard.map(_._1))
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** v3 data_type names → numpy-style codes (bytes codec is pinned
    * little-endian in readMetaV3). */
  private val v3Dtypes = Map(
    "float64" -> "<f8", "float32" -> "<f4",
    "int64" -> "<i8", "int32" -> "<i4", "int16" -> "<i2", "int8" -> "<i1",
    "uint64" -> "<u8", "uint32" -> "<u4", "uint16" -> "<u2", "uint8" -> "<u1",
    "bool" -> "<b1")

  private def decodeV3(bytes: Array[Byte], dtype: String, comp: String): Array[Double] = {
    val raw = comp match {
      case "gzip" => gunzip(bytes)
      case "blosc" => Blosc.decompress(bytes)
      case _ => bytes
    }
    val code = v3Dtypes.getOrElse(dtype,
      throw new UnsupportedOperationException(s"zarr v3 data_type $dtype"))
    decodeNumeric(raw, code)
  }

  /** Emit (flatIdxWithinGrid → value) rows for one decoded chunk. */
  private def chunkRows(
      vals: Array[Double], origin: Seq[Int], chunkShape: Seq[Int], shape: Seq[Int]): Iterator[Row] =
    if (shape.length == 1)
      vals.iterator.zipWithIndex
        .filter { case (_, i) => origin(0) + i < shape(0) }
        .map { case (v, i) => Row((origin(0) + i).toLong, v) }
    else {
      val cw = chunkShape(1)
      vals.iterator.zipWithIndex
        .map { case (v, idx) => (origin(0) + idx / cw, origin(1) + idx % cw, v) }
        .filter { case (i, j, _) => i < shape(0) && j < shape(1) }
        .map { case (i, j, v) => Row(i.toLong, j.toLong, v) }
    }

  private def readV3(spark: SparkSession, base: String, meta: MetaV3): DataFrame = {
    require(meta.shape.nonEmpty && meta.shape.length <= 2, s"supported ranks: 1, 2; got ${meta.shape.length}")
    val dims = meta.shape.length
    val grid: Seq[Seq[Int]] =
      if (dims == 1) (0 until math.ceil(meta.shape(0).toDouble / meta.chunks(0)).toInt).map(Seq(_))
      else for {
        i <- 0 until math.ceil(meta.shape(0).toDouble / meta.chunks(0)).toInt
        j <- 0 until math.ceil(meta.shape(1).toDouble / meta.chunks(1)).toInt
      } yield Seq(i, j)

    val m = meta
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(grid, math.max(1, math.min(grid.size, spark.sparkContext.defaultParallelism)))
      .flatMap { key =>
        val fs = FileSystem.get(new URI(base).resolve("/"), sconf.value)
        val p = new Path(base + "/c" + m.sep + key.mkString(m.sep))
        if (!fs.exists(p)) Iterator.empty // missing chunk = fill-value-only, skip
        else {
          val in = fs.open(p)
          val bytes = try in.readAllBytes() finally in.close()
          val origin = key.zip(m.chunks).map { case (k, c) => k * c }
          m.innerChunks match {
            case None => chunkRows(decodeV3(bytes, m.dtype, m.comp), origin, m.chunks, m.shape)
            case Some(inner) =>
              // shard: inner-chunk grid in C order, (offset, nbytes)
              // u64le pairs indexed from the end of the object
              val innerGrid: Seq[Seq[Int]] =
                if (dims == 1) (0 until m.chunks(0) / inner(0)).map(Seq(_))
                else for {
                  i <- 0 until m.chunks(0) / inner(0)
                  j <- 0 until m.chunks(1) / inner(1)
                } yield Seq(i, j)
              val idxStart = bytes.length - 4 - innerGrid.size * 16 // crc32c suffix
              val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
              innerGrid.iterator.zipWithIndex.flatMap { case (ik, n) =>
                val off = bb.getLong(idxStart + n * 16)
                val len = bb.getLong(idxStart + n * 16 + 8)
                if (off == -1L) Iterator.empty // missing inner chunk
                else {
                  val chunk = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
                  val innerOrigin = origin.zip(ik.zip(inner)).map { case (o, (k, c)) => o + k * c }
                  chunkRows(decodeV3(chunk, m.dtype, m.comp), innerOrigin, inner, m.shape)
                }
              }
          }
        }
      }
    val schema = StructType(
      (0 until dims).map(d => StructField(s"dim$d", LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    spark.createDataFrame(rowsRdd, schema)
  }

  /** Walk a Zarr GROUP as a catalog of its member arrays — the
    * reference's `ZarrGroupCatalog` (intake/catalog/zarr.py:5): every
    * array node becomes a `zarr`-kind entry reading through [[read]],
    * subgroups recurse (nested groups as catalogs, the reference's
    * `zarr_cat` dispatch). A consolidated v2 store serves the WHOLE
    * hierarchy from one `.zmetadata` read — no directory listing, the
    * object-store fast path. v3 groups walk member `zarr.json` node
    * types. `component` scopes to a subgroup (reference's kwarg). */
  def listArrays(url: String, conf: Configuration =
        graft.core.SerializableHadoopConf.sessionConf(),
      component: Option[String] = None, maxDepth: Int = 8): graft.catalog.Catalog = {
    import scala.jdk.CollectionConverters._
    val root = url.stripSuffix("/")
    val comp = component.map(_.stripPrefix("/").stripSuffix("/")).filter(_.nonEmpty)
    val base = root + comp.map("/" + _).getOrElse("")
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val om = new ObjectMapper()
    def readAll(p: Path): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    var cat = graft.catalog.Catalog(metadata = Map("zarr_root" -> base))
    def add(name: String, aurl: String): Unit =
      cat = cat.add(name, graft.datatypes.DataRef("zarr", aurl), "zarr_reader")
    val zmetaP = new Path(root + "/.zmetadata")
    if (fs.exists(zmetaP)) {
      // consolidated metadata: keys are node paths ("a/.zarray",
      // "sub/b/.zgroup") — one read names every member
      val md = Option(om.readTree(readAll(zmetaP)).get("metadata")).getOrElse(
        throw new IllegalArgumentException(s"zarr: $root/.zmetadata has no 'metadata' object"))
      val prefix = comp.map(_ + "/").getOrElse("")
      md.properties().asScala.map(_.getKey).toSeq.sorted
        .filter(k => k.endsWith("/.zarray") && k.startsWith(prefix))
        .foreach { k =>
          val path = k.stripSuffix("/.zarray")
          add(path.stripPrefix(prefix), s"$root/$path")
        }
    } else {
      def v3NodeType(p: Path): Option[String] =
        if (!fs.exists(p)) None
        else Option(om.readTree(readAll(p)).get("node_type")).map(_.asText())
      val isGroup = fs.exists(new Path(base + "/.zgroup")) ||
        v3NodeType(new Path(base + "/zarr.json")).contains("group")
      require(isGroup, s"zarr: $base is not a zarr group (no .zgroup / group zarr.json)" +
        (if (fs.exists(new Path(base + "/.zarray")) ||
            v3NodeType(new Path(base + "/zarr.json")).contains("array"))
          " — it is an ARRAY node; read it directly" else ""))
      def walk(dir: String, rel: String, depth: Int): Unit = {
        if (depth > maxDepth) return
        fs.listStatus(new Path(dir)).filter(_.isDirectory)
          .sortBy(_.getPath.getName).foreach { st =>
            val name = st.getPath.getName
            val childRel = if (rel.isEmpty) name else s"$rel/$name"
            val child = s"$dir/$name"
            if (fs.exists(new Path(child + "/.zarray"))) add(childRel, child)
            else if (fs.exists(new Path(child + "/.zgroup"))) walk(child, childRel, depth + 1)
            else v3NodeType(new Path(child + "/zarr.json")) match {
              case Some("array") => add(childRel, child)
              case Some("group") => walk(child, childRel, depth + 1)
              case _             => () // not a zarr node — skip
            }
          }
      }
      walk(base, "", 0)
    }
    cat
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base0 = url.stripSuffix("/")
    val fsDriver = FileSystem.get(new URI(url).resolve("/"), conf)
    val v3Path = new Path(base0 + "/zarr.json")
    if (fsDriver.exists(v3Path)) {
      val in = fsDriver.open(v3Path)
      val node = try new ObjectMapper().readTree(in) finally in.close()
      return readV3(spark, base0, readMetaV3(node))
    }
    val meta = readMeta(url, conf)
    require(meta.shape.nonEmpty && meta.shape.length <= 2, s"supported ranks: 1, 2; got ${meta.shape.length}")
    val dims = meta.shape.length
    val base = url.stripSuffix("/")

    // enumerate chunk grid on the driver; fetch+decode on executors
    val grid: Seq[Seq[Int]] =
      if (dims == 1) (0 until math.ceil(meta.shape(0).toDouble / meta.chunks(0)).toInt).map(Seq(_))
      else for {
        i <- 0 until math.ceil(meta.shape(0).toDouble / meta.chunks(0)).toInt
        j <- 0 until math.ceil(meta.shape(1).toDouble / meta.chunks(1)).toInt
      } yield Seq(i, j)

    val m = meta
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(grid, math.min(grid.size, spark.sparkContext.defaultParallelism))
      .flatMap { key =>
        val fs = FileSystem.get(new URI(base).resolve("/"), sconf.value)
        val p = new Path(base + "/" + key.mkString("."))
        if (!fs.exists(p)) Iterator.empty // missing chunk = fill-value-only, skip
        else {
          val in = fs.open(p)
          val bytes = try in.readAllBytes() finally in.close()
          val vals = decodeChunk(bytes, m.dtype, m.comp)
          if (m.shape.length == 1) {
            val off = key(0) * m.chunks(0)
            vals.iterator.zipWithIndex
              .filter { case (_, i) => off + i < m.shape(0) }
              .map { case (v, i) => Row((off + i).toLong, v) }
          } else {
            val (offI, offJ) = (key(0) * m.chunks(0), key(1) * m.chunks(1))
            val (ch, cw) = (m.chunks(0), m.chunks(1))
            vals.iterator.zipWithIndex
              .map { case (v, idx) =>
                // chunk-local layout: C-order rows-major, F-order column-major
                if (m.fortran) (offI + idx % ch, offJ + idx / ch, v)
                else (offI + idx / cw, offJ + idx % cw, v)
              }
              .filter { case (i, j, _) => i < m.shape(0) && j < m.shape(1) }
              .map { case (i, j, v) => Row(i.toLong, j.toLong, v) }
          }
        }
      }
    val schema = StructType(
      (0 until dims).map(d => StructField(s"dim$d", LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    spark.createDataFrame(rowsRdd, schema)
  }
}

class ZarrReaderImpl extends Reader {
  val name = "zarr_reader"
  val implementsKinds = Set("zarr")
  def read(spark: SparkSession, ref: DataRef): DataFrame = ZarrReader.read(spark, ref.url)
}
