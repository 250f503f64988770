package graft.readers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native Apache Iceberg table reader (published Iceberg table spec;
  * reference datatypes.py:861 IcebergDataset / readers.py:1139
  * PolarsIceberg `scan_iceberg`). Reads a warehouse directory WITHOUT
  * the iceberg-spark connector jar by walking the table's own metadata:
  *
  *  1. `metadata/` — highest-version `*.metadata.json` (honouring
  *     `version-hint.text` when present) → current snapshot;
  *  2. the snapshot's manifest list (Avro, read through Spark's bundled
  *     avro source) → manifest file paths;
  *  3. each manifest (Avro) → live data-file entries (`status != 2`);
  *  4. `spark.read.parquet(files…)` over the surviving data files —
  *     Iceberg data files carry all columns including identity
  *     partition values, so the parquet scan is the full table.
  *
  * Stated profile: format-version 1 and 2 tables of parquet data files.
  * v2 POSITION deletes apply as a distributed anti-join of the scan's
  * `(_metadata.file_path, _metadata.row_index)` against the delete
  * files' `(file_path, pos)` — path-keyed, so correct without sequence
  * numbers (data file paths are immutable). EQUALITY deletes refuse
  * loudly (correct application needs sequence-number ordering);
  * ORC/Avro data files refuse (parquet is the overwhelming default).
  * Time travel: `snapshotId` pins any snapshot the metadata still
  * references. When the real connector jar IS on the classpath the
  * gated `spark_iceberg` FormatReader outranks this one in the
  * registry, so the native path is the fallback, not a replacement.
  *
  * Scale shape: the driver touches only metadata JSON (KBs) and the
  * manifest Avro files (read as one small Spark job, collected — they
  * list file paths, not rows); the data scan is a plain distributed
  * parquet read with pushdown/pruning intact.
  */
object IcebergReader {

  private def fs(url: String, conf: Configuration): FileSystem =
    FileSystem.get(new URI(url).resolve("/"), conf)

  private def readText(url: String, conf: Configuration): String = {
    val in = fs(url, conf).open(new Path(url))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
  }

  /** Highest-version metadata JSON under `{table}/metadata`. */
  private[readers] def currentMetadataPath(table: String, conf: Configuration): String = {
    val metaDir = table.stripSuffix("/") + "/metadata"
    val hint = metaDir + "/version-hint.text"
    val f = fs(table, conf)
    if (f.exists(new Path(hint))) {
      val v = readText(hint, conf).trim
      val candidates = Seq(s"$metaDir/v$v.metadata.json", s"$metaDir/$v.metadata.json")
      candidates.find(p => f.exists(new Path(p))).getOrElse {
        // hashed layout: 00003-<uuid>.metadata.json
        listMetadata(metaDir, f).find(_.getName.startsWith(f"${v.toInt}%05d-"))
          .map(_.toString).getOrElse(throw new IllegalArgumentException(
            s"iceberg: version-hint $v has no matching metadata file in $metaDir"))
      }
    } else {
      val all = listMetadata(metaDir, f)
      require(all.nonEmpty, s"not an iceberg table (no *.metadata.json under $metaDir)")
      // version prefix: v3.metadata.json or 00003-<uuid>.metadata.json
      def version(p: Path): Long = {
        val n = p.getName.stripSuffix(".metadata.json")
        val digits = (if (n.startsWith("v")) n.drop(1) else n.takeWhile(_.isDigit))
        digits.takeWhile(_.isDigit) match { case "" => -1L; case d => d.toLong }
      }
      all.maxBy(version).toString
    }
  }

  private def listMetadata(metaDir: String, f: FileSystem): Seq[Path] =
    f.listStatus(new Path(metaDir)).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))

  /** Resolve a path from the metadata against the table location (paths
    * in real tables are absolute URIs; relative ones resolve here). */
  private def resolve(p: String, table: String): String =
    if (p.contains("://") || p.startsWith("/")) p
    else table.stripSuffix("/") + "/" + p

  /** Read the current snapshot, or a pinned one (`snapshotId` — time
    * travel over snapshots still referenced by the metadata). */
  def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val metaPath = currentMetadataPath(table, conf)
    val meta: JsonNode = new ObjectMapper().readTree(readText(metaPath, conf))
    val formatVersion = Option(meta.get("format-version")).map(_.asInt()).getOrElse(1)
    require(formatVersion == 1 || formatVersion == 2,
      s"iceberg format-version $formatVersion outside the supported profile (1 or 2)")
    val currentId = snapshotId.getOrElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong())
        .filter(_ != -1L)
        .getOrElse(throw new IllegalArgumentException("iceberg: table has no current snapshot (empty table)")))
    import scala.jdk.CollectionConverters._
    val snapshots = Option(meta.get("snapshots")).toSeq.flatMap(_.elements().asScala)
    val snap = snapshots.find(s => s.get("snapshot-id").asLong() == currentId)
      .getOrElse(throw new IllegalArgumentException(s"iceberg: snapshot $currentId not in metadata"))

    val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
    // v2 (and most v1) snapshots point at a manifest list; early v1 may
    // inline the manifest paths directly
    val manifestPaths: Seq[String] = Option(snap.get("manifest-list")) match {
      case Some(ml) =>
        spark.read.format(avroFmt).load(resolve(ml.asText(), table))
          .select("manifest_path").collect().map(_.getString(0)).toSeq
      case None =>
        Option(snap.get("manifests")).toSeq.flatMap(_.elements().asScala).map(_.asText())
    }
    require(manifestPaths.nonEmpty, s"iceberg: snapshot $currentId lists no manifests")

    val manifests = spark.read.format(avroFmt).load(manifestPaths.map(p => resolve(p, table)): _*)
    val hasContent = manifests.select("data_file.*").columns.contains("content")
    val entries = manifests
      .selectExpr("status", "data_file.file_path as file_path",
        "lower(data_file.file_format) as file_format",
        if (hasContent) "data_file.content as content" else "0 as content")
      .collect()
    val live = entries.filter(_.getAs[Int]("status") != 2) // 2 = DELETED entry
    // content: 0 data, 1 position deletes, 2 equality deletes
    val eqDeletes = live.count(r => r.getAs[Number]("content").intValue() == 2)
    require(eqDeletes == 0,
      s"iceberg: $eqDeletes equality delete file(s) present — correct application needs sequence-number ordering, outside the supported profile")
    val (dataFiles, posDeleteFiles) =
      live.partition(r => r.getAs[Number]("content").intValue() == 0)
    val (parquetFiles, others) = dataFiles.partition(_.getAs[String]("file_format") == "parquet")
    require(others.isEmpty,
      s"iceberg: non-parquet data files (${others.map(_.getAs[String]("file_format")).distinct.mkString(",")}) outside the supported profile")
    val paths = parquetFiles.map(r => resolve(r.getAs[String]("file_path"), table)).distinct.toSeq
    require(paths.nonEmpty, s"iceberg: snapshot $currentId has no live data files")
    // mergeSchema survives column add/rename evolution across files
    val data = spark.read.option("mergeSchema", "true").parquet(paths: _*)

    if (posDeleteFiles.isEmpty) data
    else {
      // Position deletes: parquet files of (file_path, pos) — applied as
      // a distributed anti-join against the scan's (_metadata.file_path,
      // _metadata.row_index). Path+pos keying is safe without sequence
      // numbers because data file paths are immutable (a rewritten file
      // gets a new path, stale deletes match nothing). The delete side
      // is usually tiny → AQE broadcasts it.
      import org.apache.spark.sql.functions.{col, expr, regexp_replace}
      def norm(c: org.apache.spark.sql.Column) =
        regexp_replace(c, "^[a-zA-Z0-9+.-]+:/+", "/") // scheme-insensitive path compare
      val delPaths = posDeleteFiles.map(r => resolve(r.getAs[String]("file_path"), table)).distinct.toSeq
      val deletes = spark.read.parquet(delPaths: _*)
        .select(norm(col("file_path")).as("__del_file"), col("pos").as("__del_pos"))
      val dataCols = data.columns.toSeq
      data
        .withColumn("__file", norm(expr("_metadata.file_path")))
        .withColumn("__pos", expr("_metadata.row_index"))
        .join(deletes, col("__file") === col("__del_file") && col("__pos") === col("__del_pos"), "left_anti")
        .select(dataCols.map(col): _*)
    }
  }
}

/** Registry wrapper: the connector-gated `spark_iceberg` FormatReader
  * precedes this in `SparkReaders.all`, so with the iceberg-spark jar
  * present the real connector wins; this native walk is the
  * always-importable fallback. */
class IcebergReaderImpl extends Reader {
  val name = "iceberg_native"
  val implementsKinds = Set("iceberg")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    IcebergReader.read(spark, ref.url, ref.options.get("snapshotId").map(_.toLong))
}
