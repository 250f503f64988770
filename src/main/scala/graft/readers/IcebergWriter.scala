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
  *  - tables of top-level primitive columns, UNPARTITIONED or
  *    IDENTITY-partitioned on dir-text-round-trip columns
  *    (int/long/string/date — the same text-exactness stance the
  *    reader's pruning takes; other transforms and partition types
  *    name the iceberg-spark connector). Partitioned data stages
  *    through Spark's distributed `partitionBy` over DUPLICATED
  *    columns, so the data files keep every column (the spec's rule
  *    for identity sources) while the directory layout yields one
  *    partition tuple per file; manifests carry the typed
  *    `data_file.partition` struct, so written tables prune under the
  *    reader's per-file partition skipping immediately;
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
      txn: Option[(String, Long)] = None,
      partitionBy: Seq[String] = Nil): Unit = {
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
    }
    // partitioning: an existing table's DEFAULT spec governs (the Delta
    // writer's stance — an empty partitionBy adopts it, an explicit one
    // must match exactly; partition-spec evolution stays with the
    // connector). Writer-owned tables only ever carry identity fields,
    // but the transform is re-checked defensively.
    val tableSpec: Option[Seq[(String, String, Int)]] = prior.map { meta =>
      import scala.jdk.CollectionConverters._
      val cur = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
      Option(meta.get("partition-specs")).toSeq.flatMap(_.elements().asScala)
        .find(sp => Option(sp.get("spec-id")).map(_.asInt()).getOrElse(0) == cur)
        .toSeq.flatMap(_.get("fields").elements().asScala)
        .map(pf => (pf.get("name").asText(), pf.get("transform").asText(),
          pf.get("source-id").asInt()))
    }
    tableSpec.foreach { flds =>
      require(flds.forall(_._2 == "identity"),
        s"iceberg writer: $table has non-identity partition transforms " +
          s"(${flds.map(_._2).mkString(",")}) — outside this writer's profile; " +
          "write it with the iceberg-spark connector")
      require(partitionBy.isEmpty || partitionBy == flds.map(_._1),
        s"iceberg writer: partitioning mismatch — table is partitioned by " +
          s"[${flds.map(_._1).mkString(",")}], write requested [${partitionBy.mkString(",")}]; " +
          "partition-spec evolution stays with the connector")
    }
    val partCols: Seq[String] = tableSpec.map(_.map(_._1)).getOrElse(partitionBy)
    val partFields: Seq[StructField] = partCols.map { c =>
      val i = df.schema.fieldNames.indexOf(c)
      require(i >= 0, s"iceberg writer: partition column '$c' not in the frame " +
        s"(${df.schema.fieldNames.mkString(",")})")
      val fl = df.schema.fields(i)
      require(Set[DataType](IntegerType, LongType, StringType, DateType)
          .contains(fl.dataType),
        s"iceberg writer: partition column '$c' of type ${fl.dataType.simpleString} — " +
          "identity partitioning is limited to the dir-text-round-trip types " +
          "(int/long/string/date); write the table with the iceberg-spark connector")
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"iceberg writer: partition column name '$c' outside [A-Za-z0-9_] — " +
          "write the table with the iceberg-spark connector")
      fl
    }

    // 1. stage data files with field ids in the parquet footers.
    // Partition columns are DUPLICATED under a staging-only prefix so
    // Spark's partitionBy yields the one-tuple-per-file layout while
    // the data files keep every real column (the spec's rule for
    // identity sources — the reader scans data files as the full table).
    val withIds = df.select(df.schema.fields.zipWithIndex.map { case (fl, i) =>
      df(fl.name).as(fl.name,
        new MetadataBuilder().putLong("parquet.field.id", (i + 1).toLong).build())
    }.toSeq: _*)
    val stagedDf = partCols.foldLeft(withIds)((d, c) => d.withColumn(DupPrefix + c, d(c)))
    val staging = new Path(table.stripSuffix("/") + s"/_staging_${java.util.UUID.randomUUID()}")
    val stWriter = stagedDf.write.mode("overwrite")
    (if (partCols.nonEmpty) stWriter.partitionBy(partCols.map(DupPrefix + _): _*)
     else stWriter).parquet(staging.toString)
    try {
      val stagingQ = f.makeQualified(staging).toString
      val stagedFiles: Seq[(org.apache.hadoop.fs.FileStatus, String)] = {
        val it = f.listFiles(staging, true)
        val out = Seq.newBuilder[(org.apache.hadoop.fs.FileStatus, String)]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            out += ((st, f.makeQualified(st.getPath).toString.stripPrefix(stagingQ + "/")))
        }
        out.result()
      }
      val dataDir = new Path(table.stripSuffix("/") + "/data")
      f.mkdirs(dataDir)
      val moved: Seq[(String, Long, Long, Map[String, String])] = stagedFiles.map { case (st, rel) =>
        val tuple = partitionDirValues(rel)
        require(partCols.forall(tuple.contains),
          s"iceberg writer: staged file $rel missing partition segments for " +
            s"[${partCols.filterNot(tuple.contains).mkString(",")}]")
        // hive-style layout under data/ (strictly cosmetic — manifests
        // carry absolute paths; the dirs keep same-named task files from
        // different partitions apart and the table browsable)
        val destDir = partCols.foldLeft(dataDir)((d, c) => new Path(d,
          s"$c=${rel.split("/").find(_.startsWith(s"$DupPrefix$c=")).get.drop(DupPrefix.length + c.length + 1)}"))
        f.mkdirs(destDir)
        val dest = new Path(destDir, st.getPath.getName)
        require(f.rename(st.getPath, dest), s"iceberg writer: rename to $dest failed")
        val d = f.getFileStatus(dest)
        (storedPath(d.getPath), d.getLen, rowCount(f, d.getPath), tuple)
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
          // typed rows (partition values parsed back from the staged
          // dir text — int/long/string/date round-trip exactly, the
          // profile gate above), so the Avro `data_file.partition`
          // struct carries real logical types for the reader's
          // per-file pruning
          val rowSchema = StructType(
            Seq(StructField("p", StringType), StructField("sz", LongType),
              StructField("rc", LongType)) ++
            partFields.map(pf => StructField(s"_pv_${pf.name}", pf.dataType)))
          val rows = moved.map { case (p, sz, rc, tuple) =>
            org.apache.spark.sql.Row.fromSeq(Seq[Any](p, sz, rc) ++
              partFields.map(pf => typedPartitionValue(tuple(pf.name), pf.dataType)))
          }
          val partExpr =
            if (partFields.isEmpty) ""
            else ", 'partition', named_struct(" +
              partFields.map(pf => s"'${pf.name}', `_pv_${pf.name}`").mkString(", ") + ")"
          spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), rowSchema)
            .selectExpr("1 as status",
              s"cast($snapshotId as bigint) as snapshot_id",
              "cast(null as bigint) as sequence_number",
              s"""named_struct('file_path', p, 'file_format', 'PARQUET', 'content', 0,
                |'record_count', rc, 'file_size_in_bytes', sz$partExpr) as data_file""".stripMargin)
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
             |  "partition-specs": [{"spec-id": 0, "fields": [${
                  partCols.zipWithIndex.map { case (c, i) =>
                    s"""{"name": ${js(c)}, "transform": "identity", """ +
                      s""""source-id": ${df.schema.fieldNames.indexOf(c) + 1}, "field-id": ${1000 + i}}"""
                  }.mkString(", ")}]}],
             |  "last-partition-id": ${999 + partCols.size},
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

  /** Staging-only duplicate-column prefix: `partitionBy` consumes the
    * duplicates (directory layout), the real columns stay in the data
    * files. */
  private val DupPrefix = "__graft_p_"

  /** `__graft_p_c=7/part-….parquet` → Map(c -> "7") with Spark's
    * directory escaping decoded (a __HIVE_DEFAULT_PARTITION__ segment
    * is a null value). */
  private def partitionDirValues(rel: String): Map[String, String] =
    rel.split("/").dropRight(1).filter(_.contains("=")).map { seg =>
      val k = seg.takeWhile(_ != '=')
      val raw = seg.drop(k.length + 1)
      val v = PathKeys.percentDecode(raw)
      (if (k.startsWith(DupPrefix)) k.drop(DupPrefix.length) else k) ->
        (if (v == "__HIVE_DEFAULT_PARTITION__") null else v)
    }.toMap

  private def typedPartitionValue(text: String, dt: DataType): Any =
    if (text == null) null
    else dt match {
      case IntegerType => text.toInt
      case LongType    => text.toLong
      case DateType    => java.sql.Date.valueOf(text)
      case _           => text
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
