package graft.readers

import graft.datatypes.DataRef
import java.io.{ByteArrayInputStream, InputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Archive-member reader: expands zip and tar archives into one row per
  * member — `(archive, member, size, content)` — consuming the chained
  * container URLs detection emits (`zip://<pattern>::<outer>`, the
  * reference's fsspec chained-filesystem form, readers.py storage
  * chaining / datatypes.py:2009 container rewrap). Members then flow
  * through the byte-level parse ops the engine already has
  * (`TextExtract`, `ExcelReader.parse`, …) or back through
  * `Detect.recommend` on their head bytes.
  *
  * tar streams unwrap one outer compression layer first (gzip via the
  * JDK, bzip2/xz/zstd via the commons-compress + zstd-jni libraries
  * Spark bundles), detected by magic rather than extension. Member
  * patterns are fsspec-style globs (`*`/`?`); a `maxMemberBytes` option
  * (default 256 MiB) guards against archive bombs — oversized members
  * fail loudly rather than silently truncate.
  *
  * Scale shape: archives distribute via binaryFile (one task per
  * archive, many archives in a glob); member extraction happens
  * executor-side and the driver never sees content bytes.
  */
object ArchiveReader {

  val schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** `zip://pat::outer` → (outer, kind, Some(pat)); plain url → (url, kind, None). */
  private[readers] def parseChained(url: String, kind: String): (String, String, Option[String]) = {
    val chained = "^(zip|tar)://(.*?)::(.*)$".r
    url match {
      case chained(k, pat, outer) => (outer, k, Some(pat).filter(p => p.nonEmpty && p != "*"))
      case _ => (url, kind, None)
    }
  }

  private def globToRegex(glob: String): String =
    "^" + java.util.regex.Pattern.quote(glob)
      .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q") + "$"

  /** One outer compression layer by magic (tar.gz / .tbz2 / .txz / .tzst). */
  private def unwrap(bytes: Array[Byte]): InputStream = {
    val in = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      new java.util.zip.GZIPInputStream(in)
    else if (bytes.length >= 3 && bytes(0) == 'B' && bytes(1) == 'Z' && bytes(2) == 'h')
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(in)
    else if (bytes.length >= 6 && (bytes(0) & 0xff) == 0xfd && bytes(1) == '7' && bytes(2) == 'z')
      new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(in)
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
             (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd)
      new com.github.luben.zstd.ZstdInputStream(in)
    else in
  }

  private def readBounded(in: InputStream, name: String, cap: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      require(out.size() <= cap, s"archive member $name exceeds maxMemberBytes=$cap")
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Iterate members of one archive payload. */
  private[readers] def members(kind: String, bytes: Array[Byte], pattern: Option[String],
      cap: Long): Iterator[(String, Array[Byte])] = {
    val re = pattern.map(p => java.util.regex.Pattern.compile(globToRegex(p)))
    def keep(name: String) = re.forall(_.matcher(name).matches())
    kind match {
      case "zip" =>
        val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
          .filter(e => !e.isDirectory && keep(e.getName))
          .map(e => e.getName -> readBounded(zin, e.getName, cap))
      case "tar" =>
        val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(unwrap(bytes))
        Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
          .filter(e => e.isFile && keep(e.getName))
          .map(e => e.getName -> readBounded(tin, e.getName, cap))
      case other => throw new IllegalArgumentException(s"unsupported archive kind: $other")
    }
  }

  def read(spark: SparkSession, ref: DataRef): DataFrame = {
    val (outer, kind, pattern) = parseChained(ref.url, ref.kind)
    val cap = ref.options.get("maxMemberBytes").map(_.toLong).getOrElse(256L * 1024 * 1024)
    val files = spark.read.format("binaryFile").load(outer).select("path", "content")
    val rdd = files.rdd.flatMap { r =>
      val archive = r.getString(0)
      members(kind, r.getAs[Array[Byte]](1), pattern, cap).map { case (name, content) =>
        Row(archive, name, content.length.toLong, content)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}

/** Registry wrapper: claims the zip/tar container kinds ahead of the
  * generic binaryFile fallback and accepts chained `zip://pat::outer`
  * urls. */
class ArchiveReaderImpl extends Reader {
  val name = "archive_members"
  val implementsKinds = Set("zip", "tar")
  override def isOk(ref: DataRef): Boolean =
    implementsKinds.contains(ref.kind) || ref.url.startsWith("zip://") || ref.url.startsWith("tar://")
  def read(spark: SparkSession, ref: DataRef): DataFrame = ArchiveReader.read(spark, ref)
}
