package graft.readers

/** Iceberg partition-transform value computation (table spec "Partition
  * Transforms" + Appendix B "32-bit Hash Requirements"), used to prune
  * files of bucket[N]/truncate[W]-partitioned tables from equality
  * filters: `bucket(v)` must equal the file's stored partition value or
  * the file cannot contain `col = v` rows.
  *
  * The hash is Murmur3 x86 32-bit, seed 0, over the type's hash
  * encoding: int/long/date/time/timestamp hash as the 8-byte
  * LITTLE-endian long; strings hash their UTF-8 bytes. The spec pins
  * exact vectors (34 → 2017239379, "iceberg" → 1210000089, …) which the
  * spec suite asserts, alongside a cross-check against Guava's
  * independent implementation.
  */
object IcebergTransforms {

  /** The spec's bucket transform grammar, shared by reader and writer
    * so the two cannot drift. */
  val BucketRe = "bucket\\[(\\d+)\\]".r

  /** Murmur3 x86 32-bit (public algorithm; spec Appendix B). */
  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n = data.length & ~3
    var i = 0
    while (i < n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (data.length & 3) match {
      case 3 => k = ((data(n + 2) & 0xff) << 16) | ((data(n + 1) & 0xff) << 8) | (data(n) & 0xff)
      case 2 => k = ((data(n + 1) & 0xff) << 8) | (data(n) & 0xff)
      case 1 => k = data(n) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) { k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  private def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = x.toByte; x >>>= 8; i += 1 } // little-endian
    murmur3(b)
  }

  /** bucket[n] of a comparison-domain value ([[FileSkipping.literalValue]]
    * output: Long for int/long/date, String for strings). None = type
    * outside the bucketable profile (fail open). */
  def bucketOf(value: Any, n: Int): Option[Int] = {
    val h = value match {
      case v: Long   => Some(hashLong(v))
      case s: String => Some(murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case _         => None // double (fractional literals), boolean: not bucketed in practice
    }
    h.map(x => (x & Int.MaxValue) % n)
  }

  /** truncate[w] of a comparison-domain value: integers truncate to the
    * floor multiple of w; strings truncate to w UNICODE CODE POINTS. */
  def truncateOf(value: Any, w: Int): Option[Any] = value match {
    case v: Long   => Some(v - (((v % w) + w) % w))
    case s: String =>
      val cps = s.codePointCount(0, s.length)
      Some(if (cps <= w) s else s.substring(0, s.offsetByCodePoints(0, w)))
    case _ => None
  }

  /** year/month/day/hour transform of a typed temporal literal. The
    * Catalyst comparison domain collapses DateType to days and
    * Timestamp(Ntz)Type to UTC micros (both Long), so `srcType` — the
    * partition field's SOURCE column type from the table schema —
    * disambiguates. Spec ordinals: years/months since 1970(-01),
    * days/hours since the epoch. String literals can't be transformed
    * (return None → fail open; typed `DATE '...'` literals prune). */
  def temporalOf(value: Any, srcType: String, kind: String): Option[Long] = value match {
    case v: Long =>
      val days: Option[Long] = srcType match {
        case "date"                        => Some(v)
        case "timestamp" | "timestamptz"   => Some(Math.floorDiv(v, 86400000000L))
        case _                             => None
      }
      kind match {
        case "day"  => days
        case "year" => days.map(d => (java.time.LocalDate.ofEpochDay(d).getYear - 1970).toLong)
        case "month" =>
          days.map { d =>
            val ld = java.time.LocalDate.ofEpochDay(d)
            (ld.getYear - 1970).toLong * 12 + (ld.getMonthValue - 1)
          }
        case "hour" if srcType != "date" => Some(Math.floorDiv(v, 3600000000L))
        case _                           => None
      }
    case _ => None
  }

}
