package graft.readers

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** One canonical key form for joining driver-side file lists against a
  * scan's `_metadata.file_path`: filesystem-QUALIFIED (so a bare
  * `/warehouse/t` keys identically to `hdfs://nn:8020/warehouse/t` when
  * that's the default FS), percent-ENCODED via `Path.toUri` (matching
  * Spark's metadata column, where a space is `%20`), and scheme-stripped
  * for scheme-spelling insensitivity (`file:/` vs `file:///`). Delta DV
  * joins, partition-value joins, and every Iceberg sequence/delete map
  * key MUST go through this pair — six hand-rolled copies of this logic
  * drifted apart twice in round 7, each time silently resurrecting
  * deleted rows in paths that needed quoting or qualification.
  */
private[readers] object PathKeys {

  private val SchemePrefix = "^[a-zA-Z0-9+.-]+:/+"

  /** Scan-side key: `_metadata.file_path` (already encoded + qualified)
    * minus the scheme. */
  def scanKey(c: Column): Column = regexp_replace(c, SchemePrefix, "/")

  /** Scan-side key for an already-encoded path STRING (e.g. the
    * `__manifest` column collected from a scan) — strip only, the value
    * is already in the metadata column's encoded form. */
  def scanKeyStr(p: String): String = p.replaceFirst(SchemePrefix, "/")

  /** Driver-side key for a raw (decoded) path: qualify against the
    * filesystem, encode through Path.toUri, strip the scheme. */
  def driverKey(p: String, fs: FileSystem): String =
    fs.makeQualified(new Path(p)).toUri.toString.replaceFirst(SchemePrefix, "/")

  /** Percent-decode a URL-encoded log path WITHOUT form semantics: a
    * literal '+' stays '+' (URLDecoder would turn it into a space and
    * point at a nonexistent file). */
  def percentDecode(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  /** Shared `timestampAsOf` option parse: epoch millis, ISO instant,
    * local date-time, or bare date (UTC). */
  def parseTimestampMs(ts: String): Long =
    scala.util.Try(ts.toLong).getOrElse {
      scala.util.Try(java.time.Instant.parse(ts).toEpochMilli).getOrElse {
        scala.util.Try(java.time.LocalDateTime.parse(ts)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli).getOrElse(
          java.time.LocalDate.parse(ts).atStartOfDay
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      }
    }
}
