package graft.datatypes

import java.io.InputStream
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Datatype detection: URL/MIME/head-bytes/listing → ranked [[DataKind]]s.
  * Pure function mirroring the reference's weighted-score voting
  * (reference intake/readers/datatypes.py:1886-2045): magic 1.5,
  * filepattern 1.1, MIME 1.0 (:1954-1956), positional tiebreak, per-kind
  * head vetoes, compression sniff + retry, archive-container rewrap, and
  * directory `contains` match.
  */
object Detect {

  val ScoreMagic = 1.5
  val ScorePattern = 1.1
  val ScoreMime = 1.0
  val ScoreContains = 1.5
  val HeadBytes: Int = 1 << 20 // ≤1 MiB head fetch, like datatypes.py:1932

  /** (compression name, magic) — sniffed before kind scoring; on match the
    * kind search retries against the inner name with a compression option
    * (mirrors comp_magic, datatypes.py:1872 + :2028-2035).
    */
  private val compressionMagic: Seq[(String, Array[Byte])] = Seq(
    "gzip" -> Array(0x1f.toByte, 0x8b.toByte),
    "bzip2" -> "BZh".getBytes("ISO-8859-1"),
    "zstd" -> Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte),
    "xz" -> Array(0xfd.toByte, '7'.toByte, 'z'.toByte, 'X'.toByte, 'Z'.toByte)
  )

  /** Archive containers that re-wrap as "scheme://STAR::url" (mirrors
    * container_magic, datatypes.py:1879 + :2036-2043).
    */
  private val containerMagic: Seq[(String, Array[Byte])] = Seq(
    "zip" -> "PK\u0003\u0004".getBytes("ISO-8859-1"),
    "tar" -> "ustar".getBytes("ISO-8859-1") // at offset 257
  )

  final case class Scored(kind: DataKind, score: Double, url: String, options: Map[String, String])

  /** Rank candidate kinds for a URL. `head` and `listing` default to
    * empty (pure offline scoring); [[recommendPath]] fetches them.
    */
  def recommend(
      url: String,
      mime: String = "",
      head: Array[Byte] = Array.empty,
      listing: Seq[String] = Nil
  ): Seq[Scored] = {
    // Compression sniff: strip one compression suffix and score the inner
    // URL with a compression option.
    val comp = compressionMagic.find { case (_, sig) =>
      head.length >= sig.length && sig.indices.forall(i => head(i) == sig(i))
    }
    val (effUrl, baseOpts) = comp match {
      case Some((name, _)) =>
        (url.replaceAll("\\.(gz|bz2|zst|xz)$", ""), Map("compression" -> name))
      case None => (url, Map.empty[String, String])
    }
    val effHead = if (comp.isDefined) Array.empty[Byte] else head

    val scored = Registry.kinds.zipWithIndex.flatMap { case (k, idx) =>
      var s = 0.0
      if (k.matchesMagic(effHead)) s += ScoreMagic
      if (k.matchesPattern(effUrl)) s += ScorePattern
      if (k.matchesMime(mime)) s += ScoreMime
      if (k.matchesContains(listing)) s += ScoreContains
      // Registration-order tiebreak bonus (mirrors datatypes.py:2009)
      val tiebreak = (Registry.kinds.size - idx) * 1e-6
      if (s > 0 && (effHead.isEmpty || k.headOk(effHead, effUrl))) Some(Scored(k, s + tiebreak, effUrl, baseOpts))
      else None
    }

    // Archive rewrap: a zip/tar that matched nothing better re-enters as a
    // container path (e.g. "zip://*::file.zip").
    val container = containerMagic.collectFirst {
      case (name, sig)
          if (name != "tar" && head.length >= sig.length && sig.indices.forall(i => head(i) == sig(i))) ||
            (name == "tar" && head.length >= 257 + sig.length && sig.indices.forall(i => head(257 + i) == sig(i))) =>
        Scored(Registry.byName.getOrElse(name, Registry.byName("zip")), ScoreMagic, s"$name://*::$url", Map.empty)
    }

    // Offer the rewrap unless a non-archive kind already matched by magic
    // (e.g. xlsx is a zip, but the excel kind should win on extension).
    val archiveKinds = Set("zip", "npz", "excel")
    val keepContainer = container.filter(_ =>
      scored.forall(s => archiveKinds.contains(s.kind.name) || s.score < ScoreMagic))
    (scored ++ keepContainer).sortBy(-_.score)
  }

  /** Detection with I/O: fetch the head (≤1 MiB) and, for directories, the
    * listing, through Hadoop FS (so s3a://, hdfs://, file:// all work on a
    * cluster). Returns ranked candidates.
    */
  def recommendPath(url: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Seq[Scored] = {
    val path = new Path(url)
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    if (fs.getFileStatus(path).isDirectory) {
      val listing = fs.listStatus(path).map(_.getPath.getName).toSeq
      recommend(url, listing = listing)
    } else {
      val head = new Array[Byte](HeadBytes)
      var n = 0
      var in: InputStream = null
      try {
        in = fs.open(path)
        var r = in.read(head, n, head.length - n)
        while (r > 0 && n < head.length) { n += r; r = in.read(head, n, head.length - n) }
      } finally if (in != null) in.close()
      recommend(url, mime = guessMime(url), head = head.take(math.max(n, 0)))
    }
  }

  def guessMime(url: String): String =
    Option(java.net.URLConnection.guessContentTypeFromName(url.stripSuffix("/"))).getOrElse("")
}
