package graft.inspect

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM binary header parsers for model/tile artifacts — the
  * metadata-level support the reference implements with stdlib-only byte
  * parsing (reference intake/readers/readers.py:2643 GGUFMetadataReader,
  * :2731 PMTilesMetadataReader). Formats follow the published specs
  * (ggml GGUF spec; PMTiles v3 spec).
  */
object HeaderParsers {

  /** HDF5 group/dataset structure summary — see [[Hdf5Inspect]]. */
  def hdf5(bytes: Array[Byte]): Map[String, Any] = Hdf5Inspect.summary(bytes)

  /** DICOM identification/geometry tags — see [[DicomParser]]. */
  def dicom(bytes: Array[Byte]): Map[String, Any] = DicomParser.parse(bytes)

  /** ASDF versions, tree keys and block stats — see [[AsdfParser]]. */
  def asdf(bytes: Array[Byte]): Map[String, Any] = AsdfParser.parse(bytes)

  /** WebP canvas dimensions: lossy VP8 frame header, lossless VP8L
    * 14-bit packed dims, or the VP8X extended canvas.
    */
  def webpDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 25 || new String(bytes, 0, 4, "ISO-8859-1") != "RIFF" ||
        new String(bytes, 8, 4, "ISO-8859-1") != "WEBP") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    new String(bytes, 12, 4, "ISO-8859-1") match {
      case "VP8 " if bytes.length >= 30 => // key frame: 3-byte frame tag, sync 9D 01 2A, u16 dims
        val p = 20
        if ((bytes(p + 3) & 0xff) != 0x9d || (bytes(p + 4) & 0xff) != 0x01 || (bytes(p + 5) & 0xff) != 0x2a) None
        else Some(((bb.getShort(p + 6) & 0x3fff), (bb.getShort(p + 8) & 0x3fff)))
      case "VP8L" => // signature 0x2f then 14+14 bits (width-1, height-1)
        if ((bytes(20) & 0xff) != 0x2f) None
        else {
          val v = bb.getInt(21)
          Some(((v & 0x3fff) + 1, ((v >> 14) & 0x3fff) + 1))
        }
      case "VP8X" if bytes.length >= 30 => // flags(4B incl. reserved) then u24 width-1, u24 height-1
        def u24(p: Int) = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) | ((bytes(p + 2) & 0xff) << 16)
        Some((u24(24) + 1, u24(27) + 1))
      case _ => None
    }
  }

  /** Parse the GGUF header + metadata KV section from the first bytes of
    * a .gguf file. Returns version/tensor count and the metadata map
    * (scalar and string values; arrays summarised as "array[n]").
    */
  def gguf(bytes: Array[Byte]): Map[String, Any] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining >= 4 && buf.getInt(0) == 0x46554747, "not GGUF") // "GGUF" LE
    buf.position(4)
    val version = buf.getInt()
    val tensorCount = buf.getLong()
    val kvCount = buf.getLong()

    def readString(): String = {
      val len = buf.getLong().toInt
      val arr = new Array[Byte](len)
      buf.get(arr)
      new String(arr, "UTF-8")
    }
    def readValue(tpe: Int): Any = tpe match {
      case 0  => buf.get() & 0xff          // u8
      case 1  => buf.get()                 // i8
      case 2  => buf.getShort() & 0xffff   // u16
      case 3  => buf.getShort()            // i16
      case 4  => buf.getInt() & 0xffffffffL // u32
      case 5  => buf.getInt()              // i32
      case 6  => buf.getFloat()            // f32
      case 7  => buf.get() != 0            // bool
      case 8  => readString()
      case 9 =>                            // array: elem type + count
        val et = buf.getInt()
        val n = buf.getLong()
        var i = 0L
        while (i < n) { readValue(et); i += 1 }
        s"array[$n]"
      case 10 => buf.getLong()             // u64 (kept signed)
      case 11 => buf.getLong()             // i64
      case 12 => buf.getDouble()           // f64
      case other => throw new IllegalArgumentException(s"bad GGUF value type $other")
    }

    val kvs = (0L until math.min(kvCount, 256L)).flatMap { _ =>
      if (buf.remaining() < 12) None
      else {
        val key = readString()
        val tpe = buf.getInt()
        Some(key -> readValue(tpe))
      }
    }
    Map("version" -> version, "tensor_count" -> tensorCount, "kv_count" -> kvCount) ++ kvs
  }

  /** Parse the 127-byte PMTiles v3 header. */
  def pmtiles(bytes: Array[Byte]): Map[String, Any] = {
    require(bytes.length >= 127, "PMTiles header needs 127 bytes")
    require(new String(bytes, 0, 7, "ISO-8859-1") == "PMTiles", "not PMTiles")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = bytes(7) & 0xff
    def u64(off: Int): Long = buf.getLong(off)
    Map(
      "version" -> version,
      "root_dir_offset" -> u64(8),
      "root_dir_length" -> u64(16),
      "metadata_offset" -> u64(24),
      "metadata_length" -> u64(32),
      "leaf_dirs_offset" -> u64(40),
      "leaf_dirs_length" -> u64(48),
      "tile_data_offset" -> u64(56),
      "tile_data_length" -> u64(64),
      "n_addressed_tiles" -> u64(72),
      "n_tile_entries" -> u64(80),
      "n_tile_contents" -> u64(88),
      "clustered" -> (bytes(96) == 1),
      "internal_compression" -> (bytes(97) & 0xff),
      "tile_compression" -> (bytes(98) & 0xff),
      "tile_type" -> (bytes(99) & 0xff),
      "min_zoom" -> (bytes(100) & 0xff),
      "max_zoom" -> (bytes(101) & 0xff)
    )
  }

  /** SafeTensors header (published safetensors format): 8-byte LE header
    * length, then a JSON object mapping tensor name -> {dtype, shape,
    * data_offsets}, plus optional `__metadata__`. Returns tensor count,
    * total parameter count, dtype histogram, and the metadata map —
    * the same summary the reference exposes for model artifacts.
    */
  def safetensors(bytes: Array[Byte]): Map[String, Any] = {
    require(bytes.length >= 8, "safetensors needs at least the length prefix")
    val hlen = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong(0)
    require(hlen > 0 && hlen <= bytes.length - 8, s"bad safetensors header length $hlen")
    val json = new String(bytes, 8, hlen.toInt, "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    import scala.jdk.CollectionConverters._
    val fields = node.properties().asScala.toSeq
    val meta = fields.find(_.getKey == "__metadata__").map { e =>
      e.getValue.properties().asScala.map(kv => kv.getKey -> kv.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    val tensors = fields.filterNot(_.getKey == "__metadata__")
    val dtypes = tensors.groupBy(_.getValue.get("dtype").asText()).map { case (k, v) => k -> v.size }
    val params = tensors.map { e =>
      val shape = e.getValue.get("shape")
      (0 until shape.size()).map(shape.get(_).asLong()).product max 1L
    }.sum
    Map(
      "tensor_count" -> tensors.size,
      "total_params" -> params,
      "dtypes" -> dtypes,
      "tensor_names" -> tensors.map(_.getKey).take(16),
      "metadata" -> meta
    )
  }

  /** Torch .pt/.pth archive listing (the format is a zip; reference
    * readers.py:3052 TorchDict lists it the same way): entry names +
    * sizes, whether a pickled `data.pkl` module record is present, and
    * the total tensor-storage payload bytes.
    */
  def torchZip(bytes: Array[Byte]): Map[String, Any] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val entries = scala.collection.mutable.ListBuffer[(String, Long)]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) entries += ((e.getName, math.max(e.getSize, zin.readAllBytes().length.toLong)))
      zin.closeEntry()
      e = zin.getNextEntry
    }
    val names = entries.map(_._1).toSeq
    Map(
      "entries" -> names.take(32),
      "entry_count" -> names.size,
      "has_pickle" -> names.exists(_.endsWith("data.pkl")),
      "byteorder" -> names.find(_.endsWith("byteorder")).isDefined,
      "storage_bytes" -> entries.collect { case (n, s) if n.contains("/data/") => s }.sum
    )
  }

  // ---- minimal protobuf walker for OSM PBF (published osmformat spec) ----

  private final class PbReader(bytes: Array[Byte], from: Int, until: Int) {
    private var pos = from
    def hasNext: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var out = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        out |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    /** next (fieldNumber, wireType); len-delimited payload via chunk() */
    def tag(): (Int, Int) = { val t = varint(); ((t >> 3).toInt, (t & 7).toInt) }
    def chunk(): (Int, Int) = { val n = varint().toInt; val r = (pos, pos + n); pos += n; r }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire $w")
    }
    def str(range: (Int, Int)): String = new String(bytes, range._1, range._2 - range._1, "UTF-8")
  }

  /** OSM PBF file-level summary (reference readers.py:2813 OSMPBF):
    * walks the blob framing (4-byte BE length + BlobHeader) and decodes
    * the OSMHeader block's features/writing program; OSMData blocks are
    * counted, not decoded.
    */
  def osmpbf(bytes: Array[Byte]): Map[String, Any] = {
    val buf = ByteBuffer.wrap(bytes) // OSM blob length prefix is big-endian
    var pos = 0
    var dataBlocks = 0
    var required = Seq.empty[String]
    var optional = Seq.empty[String]
    var program = ""
    var source = ""
    var headerSeen = false
    while (pos + 4 <= bytes.length) {
      val hlen = buf.getInt(pos)
      if (hlen <= 0 || pos + 4 + hlen > bytes.length) return result()
      // BlobHeader { 1: type, 3: datasize }
      val hr = new PbReader(bytes, pos + 4, pos + 4 + hlen)
      var btype = ""
      var datasize = 0
      while (hr.hasNext) {
        val (f, w) = hr.tag()
        (f, w) match {
          case (1, 2) => btype = hr.str(hr.chunk())
          case (3, 0) => datasize = hr.varint().toInt
          case _      => hr.skip(w)
        }
      }
      val blobStart = pos + 4 + hlen
      if (btype == "OSMHeader" && blobStart + datasize <= bytes.length) {
        headerSeen = true
        // Blob { 1: raw, 3: zlib_data } -> HeaderBlock { 4: required*, 5: optional*, 16: writingprogram, 17: source }
        val br = new PbReader(bytes, blobStart, blobStart + datasize)
        var payload: Array[Byte] = Array.empty
        while (br.hasNext) {
          val (f, w) = br.tag()
          (f, w) match {
            case (1, 2) =>
              val (s, e) = br.chunk(); payload = java.util.Arrays.copyOfRange(bytes, s, e)
            case (3, 2) =>
              val (s, e) = br.chunk()
              val inf = new java.util.zip.Inflater()
              inf.setInput(bytes, s, e - s)
              val out = new java.io.ByteArrayOutputStream()
              val tmp = new Array[Byte](4096)
              while (!inf.finished() && !inf.needsInput()) out.write(tmp, 0, inf.inflate(tmp))
              inf.end()
              payload = out.toByteArray
            case _ => br.skip(w)
          }
        }
        val pr = new PbReader(payload, 0, payload.length)
        while (pr.hasNext) {
          val (f, w) = pr.tag()
          (f, w) match {
            case (4, 2)  => required = required :+ pr.str(pr.chunk())
            case (5, 2)  => optional = optional :+ pr.str(pr.chunk())
            case (16, 2) => program = pr.str(pr.chunk())
            case (17, 2) => source = pr.str(pr.chunk())
            case _       => pr.skip(w)
          }
        }
      } else if (btype == "OSMData") dataBlocks += 1
      pos = blobStart + datasize
    }
    def result(): Map[String, Any] = Map(
      "header_seen" -> headerSeen,
      "required_features" -> required,
      "optional_features" -> optional,
      "writing_program" -> program,
      "source" -> source,
      "data_blocks" -> dataBlocks
    )
    result()
  }

  /** PNG IHDR: width/height from the fixed-position first chunk. */
  def pngDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') {
      val buf = ByteBuffer.wrap(bytes) // PNG ints are big-endian
      Some((buf.getInt(16), buf.getInt(20)))
    } else None

  /** JPEG dims: scan markers for SOF0/1/2 frames. */
  def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 9 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff) {
        val marker = bytes(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return Some((w, h))
        }
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        i += 2 + len
      } else i += 1
    }
    None
  }

  /** WAV fmt chunk: (channels, sample rate, bits/sample, ~duration secs). */
  def wavInfo(bytes: Array[Byte]): Option[Map[String, Any]] = {
    if (bytes.length < 44 || new String(bytes, 0, 4, "ISO-8859-1") != "RIFF" ||
      new String(bytes, 8, 4, "ISO-8859-1") != "WAVE") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataLen: Long = -1
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val id = new String(bytes, i, 4, "ISO-8859-1")
      val size = buf.getInt(i + 4)
      if (id == "fmt " && i + 24 <= bytes.length)
        fmt = Some((buf.getShort(i + 10).toInt, buf.getInt(i + 12), buf.getShort(i + 22).toInt))
      if (id == "data") dataLen = size.toLong & 0xffffffffL
      i += 8 + size + (size % 2)
    }
    fmt.map { case (ch, rate, bits) =>
      val bytesPerSec = rate.toLong * ch * (bits / 8)
      Map(
        "channels" -> ch, "sample_rate" -> rate, "bits_per_sample" -> bits,
        "duration_sec" -> (if (dataLen > 0 && bytesPerSec > 0) dataLen.toDouble / bytesPerSec else -1.0)
      )
    }
  }
}
