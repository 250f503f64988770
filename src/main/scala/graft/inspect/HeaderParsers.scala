package graft.inspect

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM binary header parsers for model/tile artifacts — the
  * metadata-level support the reference implements with stdlib-only byte
  * parsing (reference intake/readers/readers.py:2643 GGUFMetadataReader,
  * :2731 PMTilesMetadataReader). Formats follow the published specs
  * (ggml GGUF spec; PMTiles v3 spec).
  */
object HeaderParsers {

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
