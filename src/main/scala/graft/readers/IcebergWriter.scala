package graft.readers

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Native Iceberg WRITER — the Delta writer's format twin, with a
  * deliberately narrower, loudly-gated profile:
  *
  *  - UNPARTITIONED tables of top-level primitive columns (field ids
  *    assigned at create; partitioned/nested writes name the
  *    iceberg-spark connector);
  *  - `append` / `overwrite` / `errorifexists`; each commit writes the
  *    data parquet (field ids in the footers, so the reader's by-id
  *    resolution works), ONE manifest Avro, a manifest-list Avro
  *    listing retained + new manifests with their sequence numbers,
  *    and the next `v{N}.metadata.json` published with atomic
  *    create-no-overwrite (the HadoopTables commit primitive) —
  *    version races retry against the re-read head;
  *  - the metadata file is REGENERATED from this writer's own model
  *    each commit, so appending to an EXTERNALLY-written table would
  *    silently drop metadata this model does not carry (sort orders,
  *    properties, branches): tables are stamped with a
  *    `graft.writer=true` property at create and appends to tables
  *    without the stamp refuse, naming the connector;
  *  - snapshots carry `summary.operation` append/overwrite, a parent
  *    chain and sequence numbers — so `readChangesSince`, the
  *    `graft-iceberg` streaming source and snapshot time travel work
  *    on written tables immediately.
  */
object IcebergWriter {

  private val mapper = new ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Path string for the metadata/manifests: local `file:` URIs render
    * single-slash (`file:/tmp/…`), which the reader's resolve treats
    * as relative — store the bare absolute path for the file scheme
    * and the full URI otherwise. */
  private def storedPath(p: Path): String = {
    val u = p.toUri
    if (u.getScheme == null || u.getScheme == "file") u.getPath else u.toString
  }

  private def icebergType(dt: DataType): String = dt match {
    case BooleanType      => "boolean"
    case IntegerType      => "int"
    case LongType         => "long"
    case FloatType        => "float"
    case DoubleType       => "double"
    case DateType         => "date"
    case StringType       => "string"
    case BinaryType       => "binary"
    case TimestampType    => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType   => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"iceberg writer: column type ${other.simpleString} outside the supported profile " +
        "(top-level primitives only); write the table with the iceberg-spark connector")
  }

  /** Highest `graft.txn.version` recorded in a snapshot summary for
    * `appId` along the CURRENT ancestry chain, or -1 — the streaming
    * sink's idempotence probe (Iceberg has no app-transaction action;
    * the connector's sink stores its state in snapshot summaries the
    * same way). Rolled-back snapshots drop off the ancestry and their
    * batch ids correctly become re-committable. */
  def lastTxnVersion(spark: SparkSession, table: String, appId: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (scala.util.Try(IcebergReader.currentMetadataPath(table, conf)).isFailure) return -1L
    val meta = mapper.readTree(IcebergReader.metadataText(table, conf))
    import scala.jdk.CollectionConverters._
    val snapsById = Option(meta.get("snapshots")).toSeq.flatMap(_.elements().asScala)
      .map(s => s.get("snapshot-id").asLong() -> s).toMap
    var cursor = Option(meta.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L)
    var last = -1L
    while (cursor.isDefined) {
      val s = snapsById.get(cursor.get).getOrElse(return last) // expired tail
      Option(s.get("summary")).foreach { su =>
        if (Option(su.get("graft.txn.app-id")).exists(_.asText() == appId))
          Option(su.get("graft.txn.version")).foreach(v =>
            last = math.max(last, v.asText().toLong))
      }
      cursor = Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong())
    }
    last
  }

  def write(spark: SparkSession, df: DataFrame, table: String,
      mode: String = "append", maxRetries: Int = 10,
      txn: Option[(String, Long)] = None): Unit = {
    require(Set("append", "overwrite", "errorifexists").contains(mode),
      s"iceberg writer: unknown mode '$mode' (append | overwrite | errorifexists)")
    val conf = spark.sparkContext.hadoopConfiguration
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    val metaDir = new Path(table.stripSuffix("/") + "/metadata")
    val exists = f.exists(metaDir) &&
      scala.util.Try(IcebergReader.currentMetadataPath(table, conf)).isSuccess
    require(!(exists && mode == "errorifexists"),
      s"iceberg writer: table already exists at $table (mode errorifexists)")
    df.schema.fields.foreach(fl => icebergType(fl.dataType)) // gate up front

    val prior = if (exists) Some(mapper.readTree(IcebergReader.metadataText(table, conf))) else None
    prior.foreach { meta =>
      require(Option(meta.get("properties")).exists(p =>
          Option(p.get("graft.writer")).exists(_.asText() == "true")),
        s"iceberg writer: $table was not written by this writer — regenerating its " +
          "metadata would drop state this model does not carry (sort orders, branches, " +
          "properties); write it with the iceberg-spark connector")
      val fields = Option(meta.get("schemas")).toSeq.flatMap { ss =>
        import scala.jdk.CollectionConverters._
        val cur = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
        ss.elements().asScala.find(s => s.get("schema-id").asInt() == cur).toSeq
          .flatMap(_.get("fields").elements().asScala)
      }
      val expected = fields.map(fl => (fl.get("name").asText(), fl.get("type").asText()))
      val got = df.schema.fields.toSeq.map(fl => (fl.name, icebergType(fl.dataType)))
      require(expected == got,
        s"iceberg writer: schema mismatch — table has ${expected.mkString(",")}, " +
          s"frame has ${got.mkString(",")}; schema evolution stays with the connector")
      require(Option(meta.get("partition-specs")).forall { specs =>
        import scala.jdk.CollectionConverters._
        specs.elements().asScala.forall(sp =>
          !sp.get("fields").elements().hasNext)
      }, s"iceberg writer: $table is partitioned — outside this writer's profile")
    }

    // 1. stage data files with field ids in the parquet footers
    val withIds = df.select(df.schema.fields.zipWithIndex.map { case (fl, i) =>
      df(fl.name).as(fl.name,
        new MetadataBuilder().putLong("parquet.field.id", (i + 1).toLong).build())
    }.toSeq: _*)
    val staging = new Path(table.stripSuffix("/") + s"/_staging_${java.util.UUID.randomUUID()}")
    withIds.write.mode("overwrite").parquet(staging.toString)
    try {
      val stagedFiles = {
        val it = f.listFiles(staging, false)
        val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet")) out += st
        }
        out.result()
      }
      val dataDir = new Path(table.stripSuffix("/") + "/data")
      f.mkdirs(dataDir)
      val moved = stagedFiles.map { st =>
        val dest = new Path(dataDir, st.getPath.getName)
        require(f.rename(st.getPath, dest), s"iceberg writer: rename to $dest failed")
        val d = f.getFileStatus(dest)
        (storedPath(d.getPath), d.getLen, rowCount(f, d.getPath))
      }

      // 2-4. manifest + manifest list + metadata, optimistic loop
      var attempt = 0
      var committed = false
      while (!committed) {
        val head = if (!exists) None
          else Some(mapper.readTree(IcebergReader.metadataText(table, conf)))
        val lastSeq = head.flatMap(m => Option(m.get("last-sequence-number")).map(_.asLong()))
          .getOrElse(0L)
        val seq = lastSeq + 1
        val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
        val parentId = head.flatMap(m => Option(m.get("current-snapshot-id"))
          .map(_.asLong()).filter(_ != -1L))
        val uuid = java.util.UUID.randomUUID()
        import spark.implicits._
        val manifest = {
          val dir = s"${table.stripSuffix("/")}/metadata/m-$uuid"
          moved.toDF("p", "sz", "rc").selectExpr("1 as status",
            s"cast($snapshotId as bigint) as snapshot_id",
            "cast(null as bigint) as sequence_number",
            """named_struct('file_path', p, 'file_format', 'PARQUET', 'content', 0,
              |'record_count', rc, 'file_size_in_bytes', sz) as data_file""".stripMargin)
            .coalesce(1).write.format(AvroFmt).save(dir)
          val part = f.listStatus(new Path(dir)).find(_.getPath.getName.endsWith(".avro")).get
          (storedPath(part.getPath), part.getLen)
        }
        // retained manifests: append keeps the current snapshot's list
        // (with each manifest's ORIGINAL sequence number); overwrite
        // starts fresh
        val retained: Seq[(String, Long, Long, Int, Boolean)] =
          if (mode != "append") Nil
          else head.toSeq.flatMap { m =>
            import scala.jdk.CollectionConverters._
            val curId = Option(m.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L)
            val snaps = Option(m.get("snapshots")).toSeq.flatMap(_.elements().asScala)
            curId.flatMap(id => snaps.find(_.get("snapshot-id").asLong() == id)).toSeq
              .flatMap { snap =>
                IcebergReader.manifestListRowsOf(spark,
                  snap.get("manifest-list").asText(), table)
                  .map { case (p, sq, specId, isDel) => (p, 0L, sq, specId, isDel) }
              }
          }
        val listPath = {
          val dir = s"${table.stripSuffix("/")}/metadata/snap-$snapshotId-$uuid"
          val rows = ((manifest._1, manifest._2, seq, 0, false) +: retained)
          rows.toDF("manifest_path", "manifest_length", "sequence_number", "partition_spec_id", "is_delete")
            .selectExpr("manifest_path", "manifest_length", "sequence_number",
              "partition_spec_id", "if(is_delete, 1, 0) as content",
              s"cast($snapshotId as bigint) as added_snapshot_id")
            .coalesce(1).write.format(AvroFmt).save(dir)
          storedPath(f.listStatus(new Path(dir))
            .find(_.getPath.getName.endsWith(".avro")).get.getPath)
        }
        val version = head.map(_ => currentVersionOf(table, conf) + 1).getOrElse(1L)
        val tableUuid = head.flatMap(m => Option(m.get("table-uuid")).map(_.asText()))
          .getOrElse(java.util.UUID.randomUUID().toString)
        val now = System.currentTimeMillis()
        val schemaFields = df.schema.fields.zipWithIndex.map { case (fl, i) =>
          s"""{"id": ${i + 1}, "name": ${js(fl.name)}, "required": false, "type": ${js(icebergType(fl.dataType))}}"""
        }.mkString(", ")
        import scala.jdk.CollectionConverters._
        val priorSnaps: Seq[String] = head.toSeq.flatMap(m =>
          Option(m.get("snapshots")).toSeq.flatMap(_.elements().asScala).map(_.toString))
        val txnProps = txn.map { case (appId, v) =>
          s""", "graft.txn.app-id": ${js(appId)}, "graft.txn.version": ${js(v.toString)}"""
        }.getOrElse("")
        val newSnap =
          s"""{"snapshot-id": $snapshotId, ${parentId.map(p => s""""parent-snapshot-id": $p, """).getOrElse("")}""" +
            s""""sequence-number": $seq, "timestamp-ms": $now, "schema-id": 0, """ +
            s""""summary": {"operation": ${js(if (mode == "overwrite" && exists) "overwrite" else "append")}$txnProps}, """ +
            s""""manifest-list": ${js(listPath)}}"""
        val priorLog: Seq[String] = head.toSeq.flatMap(m =>
          Option(m.get("snapshot-log")).toSeq.flatMap(_.elements().asScala).map(_.toString))
        val metaJson =
          s"""{
             |  "format-version": 2,
             |  "table-uuid": ${js(tableUuid)},
             |  "location": ${js(table.stripSuffix("/"))},
             |  "last-sequence-number": $seq,
             |  "last-updated-ms": $now,
             |  "last-column-id": ${df.schema.fields.length},
             |  "current-schema-id": 0,
             |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [$schemaFields]}],
             |  "default-spec-id": 0,
             |  "partition-specs": [{"spec-id": 0, "fields": []}],
             |  "last-partition-id": 999,
             |  "default-sort-order-id": 0,
             |  "sort-orders": [{"order-id": 0, "fields": []}],
             |  "properties": {"graft.writer": "true"},
             |  "current-snapshot-id": $snapshotId,
             |  "snapshots": [${(priorSnaps :+ newSnap).mkString(",\n    ")}],
             |  "snapshot-log": [${(priorLog :+ s"""{"snapshot-id": $snapshotId, "timestamp-ms": $now}""").mkString(",\n    ")}]
             |}""".stripMargin
        val metaPath = new Path(metaDir, s"v$version.metadata.json")
        f.mkdirs(metaDir)
        val ok = scala.util.Try {
          val out = f.create(metaPath, /* overwrite = */ false)
          try out.write(metaJson.getBytes(StandardCharsets.UTF_8)) finally out.close()
        }
        if (ok.isSuccess) committed = true
        else {
          attempt += 1
          require(attempt <= maxRetries,
            s"iceberg writer: lost the commit race $maxRetries times at $table — " +
              s"giving up (${ok.failed.get.getMessage})")
        }
      }
    } finally scala.util.Try(f.delete(staging, true))
  }

  private def rowCount(f: FileSystem, p: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, f.getConf))
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    } finally r.close()
  }

  private def currentVersionOf(table: String, conf: org.apache.hadoop.conf.Configuration): Long = {
    val name = new Path(IcebergReader.currentMetadataPath(table, conf)).getName
    val n = name.stripSuffix(".metadata.json")
    (if (n.startsWith("v")) n.drop(1) else n.takeWhile(_.isDigit)) match {
      case "" => 0L
      case d  => d.takeWhile(_.isDigit).toLong
    }
  }
}
