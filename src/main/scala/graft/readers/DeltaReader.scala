package graft.readers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Native Delta Lake table reader (published Delta transaction-log
  * protocol; reference readers.py:1108 `scan_delta` / the delta-rs
  * family). Reads a table directory WITHOUT the delta-spark connector
  * jar by replaying `_delta_log`:
  *
  *  1. `_last_checkpoint` (when present) → checkpoint parquet(s) whose
  *     `add` records are the live files at that version;
  *  2. the ordered JSON commits after the checkpoint — `add` actions
  *     insert files, `remove` actions tombstone them, the last
  *     `metaData`/`protocol` actions win;
  *  3. partition values come from each file's `add.partitionValues`
  *     (Delta data files do NOT store partition columns), attached as
  *     literal columns cast to the schema's types, one read per
  *     distinct partition tuple, unioned by name;
  *  4. the final scan is a plain distributed parquet read.
  *
  * Stated profile: parquet tables with `minReaderVersion` 1, or 2/3
  * with reader features limited to timestampNtz/v2Checkpoint/
  * deletionVectors/columnMapping — anything else refuses loudly
  * (misreading an unknown gating feature silently corrupts results).
  * Column mapping ('name'/'id'): data files carry physical column
  * names (logical names live in the schema's
  * `delta.columnMapping.physicalName` field metadata), so the scan
  * uses the physical schema and renames back, nested fields via a
  * positional struct cast; `add.partitionValues` keys are physical.
  * Deletion vectors (PROTOCOL.md "Deletion Vectors") are applied: each
  * descriptor's roaring64 bitmap is decoded ON EXECUTORS (z85 inline,
  * or a `u`/`p` file blob with magic + CRC-32 + cardinality checks) into
  * `(file, row_index)` pairs that anti-join the scan's
  * `_metadata.file_path/row_index` — the Iceberg position-delete mold.
  * Time travel: `versionAsOf` replays the log only
  * through the pinned commit (and skips a later checkpoint — checkpoint
  * state can't be rolled back). With the connector jar present the
  * gated `spark_delta` FormatReader outranks this reader in the
  * registry.
  *
  * Scale shape: the driver replays only log metadata (JSON lines and a
  * checkpoint read that projects just `add`/`remove`/`metaData`); data
  * files never pass through the driver and the parquet scan keeps
  * pushdown/pruning. Driver state is O(live files) — a LinkedHashMap
  * of ~200-byte entries, i.e. ~200 MB at 1M files, the same bound
  * delta-rs carries — and is EXPLICITLY capped at [[DefaultMaxLiveFiles]]
  * (default 4M ≈ 1 GB peak): the replay refuses loudly past the cap
  * instead of exhausting driver heap, naming the delta-spark connector
  * as the path for bigger tables.
  */
object DeltaReader {

  /** Default hard cap on replayed live-file entries (see scale shape
    * above). A `read(maxLiveFiles = ...)` parameter rather than mutable
    * global state: specs exercising the refusal pass a small value, and
    * concurrent reads in one JVM can't race each other's caps. */
  val DefaultMaxLiveFiles: Int = 4_000_000

  // private[readers]: IcebergReader reuses the descriptor + decode for
  // v3 puffin deletion vectors (the serializations are identical by
  // design of the Iceberg v3 spec)
  private[readers] case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      offset: Int, sizeInBytes: Int, cardinality: Long)
  private case class FileEntry(path: String, partitionValues: Map[String, Option[String]],
      dv: Option[DvDescriptor], stats: Option[String])

  // ---- deletion vectors (delta PROTOCOL.md "Deletion Vectors") --------

  private[readers] val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** ZeroMQ Z85 decode (5 chars → 4 bytes, big-endian base 85). */
  private[readers] def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85: length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var k = 0
      while (k < 5) {
        val c = s.charAt(i + k).toInt
        val d = if (c < 128) z85Rev(c) else -1
        require(d >= 0, s"z85: invalid character '${s.charAt(i + k)}'")
        v = v * 85 + d
        k += 1
      }
      val o = i / 5 * 4
      out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** DV file path for a "u" descriptor: `[<prefix>]<z85 uuid (20 ch)>` →
    * `<table>/[<prefix>/]deletion_vector_<uuid>.bin`. */
  private[readers] def dvPath(table: String, pathOrInlineDv: String): String = {
    val prefix = pathOrInlineDv.dropRight(20)
    val uuidBytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = java.nio.ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val dir = if (prefix.isEmpty) table.stripSuffix("/") else s"${table.stripSuffix("/")}/$prefix"
    s"$dir/deletion_vector_$uuid.bin"
  }

  /** Decode one DV blob into deleted row indexes. Three independent
    * integrity gates — the 1681511377 magic, the trailing CRC-32 of the
    * data, and the descriptor's cardinality — make a misparse refuse
    * loudly instead of silently resurrecting or over-deleting rows. */
  private[readers] def decodeDvData(data: Array[Byte], cardinality: Long): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt(0)
    require(magic == 1681511377, s"delta dv: bad magic $magic")
    val nBitmaps = bb.getLong(4)
    require(nBitmaps >= 0 && nBitmaps < Int.MaxValue, s"delta dv: implausible bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var pos = 12
    var i = 0L
    while (i < nBitmaps) {
      val key = bb.getInt(pos); pos += 4 // bitmap index = high 32 bits
      // one walker both decodes and sizes the bitmap — no second
      // re-implementation of the container layout to drift from
      val (values, consumed) = LanceReader.parseRoaringSized(data, pos)
      pos += consumed
      values.foreach(v => out += ((key.toLong << 32) | (v.toLong & 0xffffffffL)))
      i += 1
    }
    val result = out.result()
    require(result.length.toLong == cardinality,
      s"delta dv: decoded ${result.length} rows, descriptor says $cardinality — refusing a misparsed vector")
    result
  }

  /** Resolve a descriptor to its deleted row indexes (executor-side). */
  private[readers] def dvRows(table: String, d: DvDescriptor, conf: Configuration): Array[Long] = d.storageType match {
    case "i" => // inline: z85 payload IS the data (magic + bitmaps)
      decodeDvData(z85Decode(d.pathOrInlineDv), d.cardinality)
    case "u" | "p" =>
      val path = if (d.storageType == "p") d.pathOrInlineDv else dvPath(table, d.pathOrInlineDv)
      val f = FileSystem.get(new URI(path).resolve("/"), conf)
      val in = f.open(new Path(path))
      try {
        val szBuf = new Array[Byte](4)
        in.readFully(d.offset.toLong, szBuf)
        val size = java.nio.ByteBuffer.wrap(szBuf).getInt // big-endian
        require(size > 0 && size <= d.sizeInBytes + 8,
          s"delta dv: blob size $size inconsistent with descriptor ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(d.offset.toLong + 4, data)
        val crcBuf = new Array[Byte](4)
        in.readFully(d.offset.toLong + 4 + size, crcBuf)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        val expected = java.nio.ByteBuffer.wrap(crcBuf).getInt.toLong & 0xffffffffL
        require(crc.getValue == expected,
          f"delta dv: CRC mismatch (computed ${crc.getValue}%08x, stored $expected%08x)")
        decodeDvData(data, d.cardinality)
      } finally in.close()
    case other => throw new UnsupportedOperationException(s"delta dv storage type '$other'")
  }

  /** Read the latest version, or a pinned one (time travel — the
    * reference's `scan_delta(version=N)`).
    *
    * `maxPartitionScans` bounds the one-scan-per-partition-tuple plan:
    * below it, each distinct tuple gets its own scan with partition
    * values as literals (Catalyst constant-folds partition filters into
    * whole-scan pruning — spec-pinned); above it, ONE scan covers every
    * file and partition values attach via a broadcast (file → values)
    * join keyed on `_metadata.file_path`, keeping plan size O(1) at any
    * partition cardinality.
    *
    * `filter` (optional ANSI SQL boolean over the table's columns) is
    * the 100 TB lever: the live-file list is pruned BEFORE any data
    * file is opened — exactly on `add.partitionValues` (both partition
    * paths, including >`maxPartitionScans` where Catalyst can no longer
    * see per-scan literals) and conservatively on `add.stats` min/max —
    * and the full filter is re-applied to the returned DataFrame, so
    * the result always equals `read(...).where(filter)`. */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Long] = None,
      maxPartitionScans: Int = 64, filter: Option[String] = None,
      maxLiveFiles: Int = DefaultMaxLiveFiles): DataFrame = {
    readImpl(spark, table, versionAsOf, maxPartitionScans, filter, maxLiveFiles)
  }

  /** Deferred-scan frame over the table: file skipping fires
    * automatically from whatever filters the QUERY puts above it — a
    * `.where()`, `spark.sql` over a temp view, `Catalog.sql` — with no
    * filter string threaded by hand (reference convert.py:390-399
    * semantics; see [[graft.plans.DeferredScan]] for the mechanism and
    * the correctness stance). The table is validated eagerly; each
    * query then plans against the CURRENT snapshot unless pinned. */
  def table(spark: SparkSession, table: String, versionAsOf: Option[Long] = None,
      timestampMs: Option[Long] = None, maxPartitionScans: Int = 64,
      maxLiveFiles: Int = DefaultMaxLiveFiles): DataFrame = {
    def run(filterSql: Option[String], schemaOnly: Boolean): DataFrame = timestampMs match {
      case Some(ts) => readAsOfTimestamp(spark, table, ts, maxPartitionScans, filterSql,
        maxLiveFiles, schemaOnly)
      case None => readImpl(spark, table, versionAsOf, maxPartitionScans, filterSql,
        maxLiveFiles, schemaOnly)
    }
    graft.plans.DeferredScan.frame(spark, s"delta $table",
      () => run(None, schemaOnly = true), fs => run(fs, schemaOnly = false))
  }

  /** Incremental batch read (adds-only CDF-lite; VERDICT r10 #2): the
    * rows of every data file ADDED in commits (sinceVersion, head] that
    * is STILL LIVE at head, each tagged `_commit_version` (the commit
    * that last added its file) and `_commit_timestamp` (that commit's
    * `commitInfo.timestamp`, falling back to the commit file's
    * modification time — the same clock `timestampAsOf` reads). This
    * serves incremental ETL — "give me what arrived since my last run's
    * version" — without a streaming source and without the connector's
    * CDF feature (which needs writer-side change files this reader
    * could not conjure):
    *
    *  - a file added then REMOVED inside the window never surfaces
    *    (its rows were never visible to any at-or-after-head read);
    *  - a file added BEFORE the window stays out, even if untouched;
    *  - row-level deletes are NOT represented (adds-only): a remove of
    *    an old file emits nothing, matching an append-driven pipeline;
    *  - the window's commit jsons must all be present — a cleaned log
    *    refuses loudly rather than silently skipping arrivals;
    *  - `sinceVersion = -1` means "from the beginning" (every live
    *    file whose add is visible in the log window 0..head).
    *
    * Scale shape: the head state comes from the same snapshot cache /
    * incremental replay as every other read; the window walk reads
    * only the window's commit jsons on the driver; the data scan is
    * the ordinary pruned parquet scan restricted to the new files,
    * with the (file → version) map attached via a broadcast join on
    * `_metadata.file_path` — O(new files) driver state, no shuffle. */
  def readChangesSince(spark: SparkSession, table: String, sinceVersion: Long,
      maxPartitionScans: Int = 64, filter: Option[String] = None,
      maxLiveFiles: Int = DefaultMaxLiveFiles): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = table.stripSuffix("/") + "/_delta_log"
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
    val commitStatuses = f.listStatus(new Path(logDir)).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .map(st => st.getPath.getName.stripSuffix(".json").toLong -> st)
      .sortBy(_._1)
    val mapper = new ObjectMapper()
    val lastCp = new Path(logDir, "_last_checkpoint")
    val cpV =
      if (!f.exists(lastCp)) -1L
      else { val in = f.open(lastCp); try mapper.readTree(in).get("version").asLong() finally in.close() }
    val head = math.max(cpV, commitStatuses.map(_._1).maxOption.getOrElse(-1L))
    require(head >= 0, s"delta: empty _delta_log at $logDir")
    require(sinceVersion <= head,
      s"delta: changes since version $sinceVersion requested but table head is $head")
    if (sinceVersion == head)
      return emptyChangesFrame(spark, table, maxPartitionScans, maxLiveFiles)
    val window = commitStatuses.filter { case (v, _) => v > sinceVersion && v <= head }
    val missing = ((math.max(sinceVersion, -1L) + 1) to head).toSet -- window.map(_._1).toSet
    require(missing.isEmpty,
      s"delta: cannot serve changes since $sinceVersion — commit json(s) " +
        s"${missing.toSeq.sorted.mkString(", ")} missing from _delta_log (expired/cleaned log); " +
        "re-baseline with a full read")
    // last add version per path across the window, + per-commit timestamp
    val addVersion = scala.collection.mutable.HashMap[String, (Long, Long)]()
    window.foreach { case (v, st) =>
      var commitTs = st.getModificationTime
      val in = f.open(st.getPath)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(mapper.readTree).toSeq
      lines.foreach(a => Option(a.get("commitInfo")).flatMap(ci => Option(ci.get("timestamp")))
        .filterNot(_.isNull).foreach(ts => commitTs = ts.asLong()))
      // dataChange=false adds are rearrangements (OPTIMIZE/compaction):
      // their rows are OLD rows in new files — surfacing them would
      // duplicate data for an incremental consumer, so they are skipped
      // exactly as the connector's CDF skips dataChange=false commits
      lines.foreach(a => Option(a.get("add")).filterNot(_.isNull)
        .filter(add => Option(add.get("dataChange")).forall(n => n.isNull || n.asBoolean()))
        .foreach(add => addVersion(add.get("path").asText()) = (v, commitTs)))
      lines.foreach(a => Option(a.get("remove")).filterNot(_.isNull).foreach { rm =>
        val p = rm.get("path").asText()
        if (addVersion.contains(p)) {
          val realDelete = Option(rm.get("dataChange")).forall(n => n.isNull || n.asBoolean())
          // a compaction remove of an IN-WINDOW add moves those arrivals
          // into dataChange=false files this adds-only reader skips —
          // serving the window would silently lose them; refuse loudly
          require(realDelete,
            s"delta: changes since $sinceVersion unservable — file '$p' (added at version " +
              s"${addVersion(p)._1}) was compacted away inside the window (dataChange=false " +
              "remove); its rows moved to files an adds-only read cannot attribute. " +
              "Re-baseline with a full read.")
          addVersion.remove(p) // a real delete: the rows were retracted before head
        }
      })
    }
    if (addVersion.isEmpty)
      return emptyChangesFrame(spark, table, maxPartitionScans, maxLiveFiles)
    readImpl(spark, table, None, maxPartitionScans, filter, maxLiveFiles,
      changes = Some(addVersion.toMap))
  }

  /** Column-mapping helpers (PROTOCOL.md "Column Mapping"): parquet
    * files of a mapped table carry PHYSICAL names recorded in the
    * logical schema's field metadata; nested renames ride the struct
    * shape. Shared by the main scan and the change-feed scan. */
  private def physNameOf(fl: StructField, mapped: Boolean): String =
    if (mapped && fl.metadata.contains("delta.columnMapping.physicalName"))
      fl.metadata.getString("delta.columnMapping.physicalName") else fl.name
  private def toPhysicalType(dt: DataType, mapped: Boolean): DataType = dt match {
    case st: StructType => StructType(st.fields.map(fl =>
      StructField(physNameOf(fl, mapped), toPhysicalType(fl.dataType, mapped), fl.nullable)))
    case ArrayType(et, n) => ArrayType(toPhysicalType(et, mapped), n)
    case MapType(k, v, n) => MapType(toPhysicalType(k, mapped), toPhysicalType(v, mapped), n)
    case other => other
  }
  private def stripMetaType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(fl =>
      StructField(fl.name, stripMetaType(fl.dataType), fl.nullable)))
    case ArrayType(et, n) => ArrayType(stripMetaType(et), n)
    case MapType(k, v, n) => MapType(stripMetaType(k), stripMetaType(v), n)
    case other => other
  }

  /** Row-level CHANGE FEED for the window (sinceVersion, head] — the
    * delta-spark `table_changes` surface (PROTOCOL.md "Add CDC File"),
    * output = table columns + `_change_type` + `_commit_version` +
    * `_commit_timestamp`. Per-commit reconstruction, the protocol's
    * rule:
    *
    *  - a commit carrying `cdc` actions serves THOSE FILES ALONE — its
    *    add/remove actions are main-snapshot bookkeeping, not feed
    *    content (cdc rows carry their own `_change_type`:
    *    insert/delete/update_preimage/update_postimage, preserved
    *    verbatim);
    *  - a cdc-less commit DERIVES: dataChange=true adds contribute
    *    their full rows as `insert`; dataChange=true removes contribute
    *    the removed file's rows as `delete`, read from the
    *    still-present file (a vacuumed one refuses naming a
    *    re-baseline). A rewrite (UPDATE/MERGE without
    *    delta.enableChangeDataFeed) thus surfaces as delete+insert
    *    pairs — the exact row-multiset effect without intent labels;
    *    the connector refuses this case outright, so serving the
    *    file-level truth is strictly more, never differently, useful;
    *  - dataChange=false actions (OPTIMIZE rearrangements) contribute
    *    nothing — compaction inside the window is INVISIBLE here, where
    *    the adds-only [[readChangesSince]] must refuse it;
    *  - deletion vectors on a cdc-less commit's actions refuse (the
    *    row-subset diff is information an add/remove derivation cannot
    *    see); a remove of a partitioned file that omits partitionValues
    *    refuses too (data files do not store partition columns, so the
    *    tuple is unrecoverable);
    *  - a metaData action inside the window refuses unless it states
    *    exactly what the head states (the creation commit of a
    *    `since = -1` window) — schema evolution under a feed is a
    *    re-baseline.
    *
    * Scale shape: the driver reads only the window's commit jsons; each
    * distinct (change kind, partition tuple) group is one pruned
    * parquet scan over exactly its files, partition columns attached as
    * typed literals; no shuffle, no driver row funnel. */
  def readChangeFeed(spark: SparkSession, table: String, sinceVersion: Long,
      filter: Option[String] = None,
      maxLiveFiles: Int = DefaultMaxLiveFiles,
      endVersion: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_millis}
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = table.stripSuffix("/") + "/_delta_log"
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
    val state = cachedState(spark, table, logDir, f, None, maxLiveFiles)
    val schema = DataType.fromJson(state.schemaJson).asInstanceOf[StructType]
    val partitionCols = state.partitionCols
    val mapped = state.configuration.getOrElse("delta.columnMapping.mode", "none") != "none"
    val mapper = new ObjectMapper()
    val commitStatuses = f.listStatus(new Path(logDir)).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .map(st => st.getPath.getName.stripSuffix(".json").toLong -> st)
      .sortBy(_._1)
    val lastCp = new Path(logDir, "_last_checkpoint")
    val cpV =
      if (!f.exists(lastCp)) -1L
      else { val in = f.open(lastCp); try mapper.readTree(in).get("version").asLong() finally in.close() }
    val tableHead = math.max(cpV, commitStatuses.map(_._1).maxOption.getOrElse(-1L))
    require(tableHead >= 0, s"delta: empty _delta_log at $logDir")
    // an explicit end bounds the window (the table_changes
    // (start, end) form); the head STATE still governs the serving
    // schema, and the post-end gate below keeps that sound
    endVersion.foreach(e => require(e >= 0 && e <= tableHead,
      s"delta: change feed endVersion $e outside the log (head $tableHead)"))
    val head = endVersion.getOrElse(tableHead)
    require(sinceVersion <= head,
      s"delta: change feed since version $sinceVersion requested but window end is $head")
    def resolve(p: String): String = {
      val decoded = PathKeys.percentDecode(p)
      if (decoded.contains("://") || decoded.startsWith("/")) decoded
      else table.stripSuffix("/") + "/" + decoded
    }
    // evolution identity for the additive-prefix gates: under column
    // mapping a field's identity is its PHYSICAL name (id-stable), so
    // a pure logical RENAME serves — old rows read by physical name
    // and label under the head's logical names, delta's own CDF
    // semantics; drops/retypes/layout changes still refuse. Unmapped
    // tables keep the case-insensitive logical-name identity.
    def evoKey(fl: StructField): (String, DataType) =
      (physNameOf(fl, mapped).toLowerCase, stripMetaType(fl.dataType))
    def emptyFeed(): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          stripMetaType(schema).asInstanceOf[StructType])
        .withColumn("_change_type", lit(null).cast(org.apache.spark.sql.types.StringType))
        .withColumn("_commit_version", lit(null).cast(org.apache.spark.sql.types.LongType))
        .withColumn("_commit_timestamp", lit(null).cast(org.apache.spark.sql.types.TimestampType))
        .where(lit(false))
    if (sinceVersion == head) return emptyFeed()
    val window = commitStatuses.filter { case (v, _) => v > sinceVersion && v <= head }
    val missing = ((math.max(sinceVersion, -1L) + 1) to head).toSet -- window.map(_._1).toSet
    require(missing.isEmpty,
      s"delta: cannot serve the change feed since $sinceVersion — commit json(s) " +
        s"${missing.toSeq.sorted.mkString(", ")} missing from _delta_log (expired/cleaned log); " +
        "re-baseline with a full read")

    // With an explicit end, the in-window metadata gate alone is not
    // enough: a NON-ADDITIVE evolution committed AFTER endVersion
    // (overwriteSchema, a rename under column mapping) lives outside
    // the window, yet the feed serves under the HEAD schema — old
    // files would read back with dropped/renamed columns nulled
    // instead of refusing. Resolve the state AS OF endVersion and
    // require the end→head evolution itself to be additive (appended
    // nullable columns, same partitioning, same mapping mode); then
    // head-schema serving nulls the appended columns exactly like
    // delta's own old-file semantics, and anything else refuses.
    endVersion.filter(_ < tableHead).foreach { e =>
      val endState = cachedState(spark, table, logDir, f, Some(e), maxLiveFiles)
      val endSchema = DataType.fromJson(endState.schemaJson).asInstanceOf[StructType]
      val additive = endSchema.fields.length <= schema.fields.length &&
        endSchema.fields.zip(schema.fields).forall { case (a, b) => evoKey(a) == evoKey(b) }
      val samePc = endState.partitionCols == partitionCols
      val sameMapping =
        endState.configuration.getOrElse("delta.columnMapping.mode", "none") ==
          state.configuration.getOrElse("delta.columnMapping.mode", "none")
      require(additive && samePc && sameMapping,
        s"delta: change feed window ($sinceVersion, $e] unservable — the table metadata " +
          "changed after the window end beyond additive column evolution, so window rows " +
          "cannot be labelled under the current schema; re-baseline with a full read")
    }

    // None changeType = a cdc file (rows carry their own _change_type)
    case class FileChange(path: String, pv: Map[String, Option[String]], changeType: Option[String])
    case class CommitChanges(version: Long, tsMs: Long, files: Seq[FileChange])
    val perCommit: Seq[CommitChanges] = window.map { case (v, st) =>
      val in = f.open(st.getPath)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(mapper.readTree).toSeq
      var commitTs = st.getModificationTime
      lines.foreach(a => Option(a.get("commitInfo")).flatMap(ci => Option(ci.get("timestamp")))
        .filterNot(_.isNull).foreach(ts => commitTs = ts.asLong()))
      lines.flatMap(a => Option(a.get("metaData")).filterNot(_.isNull)).foreach { md =>
        // additive evolution is servable: a window metaData whose schema
        // is a PREFIX of the head's (same identities+types in order;
        // head may append nullable columns) reads old rows under the
        // head schema with the added columns nulled — delta's own
        // semantics for old files. Under column mapping the identity is
        // the physical name, so logical renames serve too (evoKey);
        // drops/type changes/layout changes refuse.
        val okSchema = Option(md.get("schemaString")).exists { sj =>
          scala.util.Try {
            val mdFields = DataType.fromJson(sj.asText()).asInstanceOf[StructType].fields
            mdFields.length <= schema.fields.length &&
              mdFields.zip(schema.fields).forall { case (a, b) => evoKey(a) == evoKey(b) }
          }.getOrElse(false)
        }
        val samePc = Option(md.get("partitionColumns")).map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Nil) == partitionCols
        val sameMapping = Option(md.get("configuration")).flatMap(c =>
          Option(c.get("delta.columnMapping.mode")).map(_.asText())).getOrElse("none") ==
          state.configuration.getOrElse("delta.columnMapping.mode", "none")
        require(okSchema && samePc && sameMapping,
          s"delta: change feed since $sinceVersion unservable — version $v changes the table " +
            "metadata (schema/partitioning/column mapping) beyond additive column evolution; " +
            "re-baseline with a full read")
      }
      def pvOfNode(n: JsonNode): Map[String, Option[String]] =
        Option(n.get("partitionValues")).filterNot(_.isNull).map(_.fields().asScala.map(e =>
          e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))).toMap)
          .getOrElse(Map.empty)
      // a usable remove tuple must COVER every partition column (keys
      // may map to null — a null partition value — but an absent key
      // means the tuple is unrecoverable and deriving would emit rows
      // into the wrong (null) partition)
      def coversPartitions(n: JsonNode): Boolean = {
        val pvm = pvOfNode(n)
        partitionCols.forall(pc =>
          pvm.contains(physNameOf(schema(pc), mapped)) || pvm.contains(pc))
      }
      def isDataChange(n: JsonNode): Boolean =
        Option(n.get("dataChange")).forall(x => x.isNull || x.asBoolean())
      val cdcs = lines.flatMap(a => Option(a.get("cdc")).filterNot(_.isNull))
        .map(c => FileChange(c.get("path").asText(), pvOfNode(c), None))
      if (cdcs.nonEmpty) CommitChanges(v, commitTs, cdcs)
      else {
        val adds = lines.flatMap(a => Option(a.get("add")).filterNot(_.isNull)).filter(isDataChange)
        val removes = lines.flatMap(a => Option(a.get("remove")).filterNot(_.isNull)).filter(isDataChange)
        (adds ++ removes).foreach { n =>
          require(Option(n.get("deletionVector")).forall(_.isNull),
            s"delta: change feed since $sinceVersion unservable — version $v changes rows " +
              "through a deletion vector without cdc files; enable delta.enableChangeDataFeed " +
              "on the writer or re-baseline with a full read")
        }
        removes.foreach { rm =>
          require(partitionCols.isEmpty || coversPartitions(rm),
            s"delta: change feed since $sinceVersion unservable — version $v removes " +
              s"'${rm.get("path").asText()}' without a full partitionValues tuple (data files " +
              "do not store partition columns, so the tuple is unrecoverable); re-baseline " +
              "with a full read")
          val p = resolve(rm.get("path").asText())
          require(f.exists(new Path(p)),
            s"delta: change feed since $sinceVersion unservable — version $v removed '$p' " +
              "and the file is gone (vacuumed); re-baseline with a full read")
        }
        CommitChanges(v, commitTs,
          adds.map(n => FileChange(n.get("path").asText(), pvOfNode(n), Some("insert"))) ++
            removes.map(n => FileChange(n.get("path").asText(), pvOfNode(n), Some("delete"))))
      }
    }

    val dataFields = schema.fields.filterNot(fl => partitionCols.contains(fl.name)).toSeq
    val dataSchema = toPhysicalType(StructType(dataFields), mapped).asInstanceOf[StructType]
    def pvLookup(pv: Map[String, Option[String]], pc: String): Option[String] =
      pv.get(physNameOf(schema(pc), mapped)).orElse(pv.get(pc)).flatten
    // one scan per (change kind, partition tuple) group; cdc files
    // physically carry `_change_type` (it is NOT a table column, so it
    // is never column-mapped), derived groups get it as a literal
    def scanGroup(files: Seq[FileChange], cdcFile: Boolean): DataFrame = {
      val readSchema =
        if (cdcFile) StructType(dataSchema.fields :+
          StructField("_change_type", org.apache.spark.sql.types.StringType))
        else dataSchema
      val base = spark.read.schema(readSchema).parquet(files.map(fc => resolve(fc.path)): _*)
      val logical =
        if (!mapped) base
        else base.select(dataFields.map(fl =>
          col(physNameOf(fl, mapped)).cast(stripMetaType(fl.dataType)).as(fl.name)) ++
          (if (cdcFile) Seq(col("_change_type")) else Nil): _*)
      partitionCols.foldLeft(logical) { (df, pc) =>
        df.withColumn(pc, pvLookup(files.head.pv, pc) match {
          case Some(s) => lit(s).cast(schema(pc).dataType)
          case None    => lit(null).cast(schema(pc).dataType)
        })
      }
    }
    val frames = perCommit.flatMap { cc =>
      cc.files.groupBy(fc => (fc.changeType, fc.pv)).toSeq.map { case ((ct, _), group) =>
        val scanned = scanGroup(group, cdcFile = ct.isEmpty)
        val typed = ct.fold(scanned)(t => scanned.withColumn("_change_type", lit(t)))
        typed.withColumn("_commit_version", lit(cc.version))
          .withColumn("_commit_timestamp", timestamp_millis(lit(cc.tsMs)))
      }
    }
    if (frames.isEmpty) return emptyFeed()
    val ordered = schema.fieldNames.toSeq ++ Seq("_change_type", "_commit_version", "_commit_timestamp")
    val out = frames.map(_.select(ordered.map(col): _*)).reduce(_ unionByName _)
    filter.map(fs => out.where(expr(fs))).getOrElse(out)
  }

  private def emptyChangesFrame(spark: SparkSession, table: String,
      maxPartitionScans: Int, maxLiveFiles: Int): DataFrame = {
    val base = readImpl(spark, table, None, maxPartitionScans, None, maxLiveFiles,
      schemaOnly = true)
    import org.apache.spark.sql.functions.lit
    base.withColumn("_commit_version", lit(null).cast(org.apache.spark.sql.types.LongType))
      .withColumn("_commit_timestamp", lit(null).cast(org.apache.spark.sql.types.TimestampType))
      .where(lit(false))
  }

  /** The table's current version: max(checkpoint version, newest
    * commit json). The streaming source's `getOffset` probe. */
  private[readers] def currentVersion(spark: SparkSession, table: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = table.stripSuffix("/") + "/_delta_log"
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
    val maxCommit = f.listStatus(new Path(logDir)).toSeq
      .map(_.getPath.getName).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).maxOption.getOrElse(-1L)
    val lastCp = new Path(logDir, "_last_checkpoint")
    val cpV =
      if (!f.exists(lastCp)) -1L
      else {
        val in = f.open(lastCp)
        try new ObjectMapper().readTree(in).get("version").asLong() finally in.close()
      }
    val v = math.max(maxCommit, cpV)
    require(v >= 0, s"delta: empty _delta_log at $logDir")
    v
  }

  /** Schema without touching any data file (the deferred/streaming
    * registration probe). */
  private[readers] def schemaOf(spark: SparkSession, table: String): org.apache.spark.sql.types.StructType =
    readImpl(spark, table, None, 64, None, DefaultMaxLiveFiles, schemaOnly = true).schema

  /** Scan exactly `paths` as of `version` (the streaming source's
    * per-version batch): the ordinary pinned read restricted to the
    * subset, with the changes tag columns dropped back to the table
    * schema (a stream's schema must be constant). */
  private[readers] def readSubsetAt(spark: SparkSession, table: String, version: Long,
      paths: Set[String]): DataFrame = {
    val df = readImpl(spark, table, Some(version), 64, None, DefaultMaxLiveFiles,
      changes = Some(paths.map(_ -> (version, 0L)).toMap))
    df.drop("_commit_version", "_commit_timestamp")
  }

  /** DESCRIBE HISTORY (delta-spark `DeltaTable.history()`): one row
    * per commit json still in the log, newest first — version,
    * timestamp (commitInfo's if present, else the commit file's
    * mtime, the same clock timestampAsOf reads), operation, add/remove
    * counts and whether any action changed data. Driver-metadata only
    * (the log is metadata-scale by design); versions aged out below a
    * checkpoint are simply absent, like delta-spark after log cleanup. */
  def history(spark: SparkSession, table: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = new Path(table.stripSuffix("/") + "/_delta_log")
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(logDir), s"not a delta table (no _delta_log): $table")
    val mapper = new ObjectMapper()
    val rows = f.listStatus(logDir).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .sortBy(-_.getPath.getName.stripSuffix(".json").toLong)
      .map { st =>
        val version = st.getPath.getName.stripSuffix(".json").toLong
        val in = f.open(st.getPath)
        val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        var ts: Long = st.getModificationTime
        var op: String = null
        var adds = 0L; var removes = 0L; var dataChange = false
        text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
          val a = mapper.readTree(line)
          Option(a.get("commitInfo")).filterNot(_.isNull).foreach { ci =>
            Option(ci.get("timestamp")).filterNot(_.isNull).foreach(t => ts = t.asLong())
            Option(ci.get("operation")).filterNot(_.isNull).foreach(o => op = o.asText())
          }
          Option(a.get("add")).filterNot(_.isNull).foreach { ad =>
            adds += 1
            if (Option(ad.get("dataChange")).forall(_.asBoolean())) dataChange = true
          }
          Option(a.get("remove")).filterNot(_.isNull).foreach { rm =>
            removes += 1
            if (Option(rm.get("dataChange")).forall(_.asBoolean())) dataChange = true
          }
        }
        Row(version, new java.sql.Timestamp(ts), op, adds, removes, dataChange)
      }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("version", LongType),
      StructField("timestamp", TimestampType),
      StructField("operation", StringType),
      StructField("num_added_files", LongType),
      StructField("num_removed_files", LongType),
      StructField("data_change", BooleanType))))
  }

  /** DESCRIBE DETAIL (delta-spark's `DeltaTable.detail`): ONE row of
    * table-level facts — format, id, location, partitioning, live
    * file count/bytes, configuration, protocol — from the same state
    * replay every read performs (no data IO). */
  def detail(spark: SparkSession, table: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = table.stripSuffix("/") + "/_delta_log"
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
    val state = DeltaWriter.currentState(spark, table)
    val mapper = new ObjectMapper()
    val (id, createdAt) = scala.util.Try {
      val md = mapper.readTree(state.metaJson)
      (Option(md.get("id")).map(_.asText()).orNull,
        Option(md.get("createdTime")).filterNot(_.isNull).map(_.asLong()))
    }.getOrElse((null, None))
    val configuration: Map[String, String] = scala.util.Try {
      import scala.jdk.CollectionConverters._
      Option(mapper.readTree(state.metaJson).get("configuration"))
        .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty[String, String])
    }.getOrElse(Map.empty)
    // protocol: last action wins, replayed from the same log walk
    val commits = f.listStatus(new Path(logDir)).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json")).sortBy(_.getPath.getName)
    val proto = commits.reverseIterator.flatMap { st =>
      val in = f.open(st.getPath)
      val t = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      t.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(mapper.readTree)
        .flatMap(a => Option(a.get("protocol")).filterNot(_.isNull)).toSeq.lastOption
    }.toSeq.headOption
    val (rv, wv) = proto.map(p => (
      Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1),
      Option(p.get("minWriterVersion")).map(_.asInt()).getOrElse(2))).getOrElse((1, 2))
    val row = Row("delta", id, table.stripSuffix("/"),
      createdAt.map(new java.sql.Timestamp(_)).orNull,
      state.partitionCols.toList, state.liveFiles.size.toLong,
      state.liveFiles.map(_.size).sum, configuration, rv, wv)
    spark.createDataFrame(Seq(row).asJava, StructType(Seq(
      StructField("format", StringType),
      StructField("id", StringType),
      StructField("location", StringType),
      StructField("createdAt", TimestampType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("numFiles", LongType),
      StructField("sizeInBytes", LongType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType))))
  }

  /** Time travel by timestamp (the delta-rs `load_with_datetime` /
    * Spark `timestampAsOf` semantics): the last commit whose file
    * modification time is <= the given epoch-millis instant. */
  def readAsOfTimestamp(spark: SparkSession, table: String, timestampMs: Long,
      maxPartitionScans: Int = 64, filter: Option[String] = None,
      maxLiveFiles: Int = DefaultMaxLiveFiles, schemaOnly: Boolean = false): DataFrame = {
    // version resolution pinned per planning pass: a PAST timestamp
    // resolves identically on every probe, but a still-open bound (a
    // timestamp at-or-after now) tracks the live tail, and self-join
    // legs of one query must not watch it move mid-planning
    val version = graft.plans.SnapshotPin.pin(s"delta-asof:$table:$timestampMs") {
      val conf = spark.sparkContext.hadoopConfiguration
      val logDir = table.stripSuffix("/") + "/_delta_log"
      val f = FileSystem.get(new URI(table).resolve("/"), conf)
      require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
      val commits = f.listStatus(new Path(logDir)).toSeq
        .filter(_.getPath.getName.matches("\\d{20}\\.json"))
        .map(st => st.getPath.getName.stripSuffix(".json").toLong -> st.getModificationTime)
        .sortBy(_._1)
      val eligible = commits.filter(_._2 <= timestampMs)
      require(eligible.nonEmpty,
        s"delta: no commit at or before timestamp $timestampMs (earliest is ${commits.headOption.map(_._2).getOrElse(-1L)})")
      eligible.last._1
    }
    readImpl(spark, table, Some(version), maxPartitionScans, filter, maxLiveFiles, schemaOnly)
  }

  /** Fully-replayed snapshot state for one (table, pin): everything the
    * scan build needs that is filter-INDEPENDENT. Immutable once built;
    * safe to share across queries. */
  private case class DeltaState(
      live: Vector[FileEntry], schemaJson: String, partitionCols: Seq[String],
      configuration: Map[String, String])

  // Snapshot cache (repeated queries over a deferred view must not pay
  // the full O(files) checkpoint + commit replay at every plan). Keyed
  // by (table, version pin, cap); an UNPINNED entry is validated by a
  // cheap log-tail probe — one listStatus of _delta_log plus the tiny
  // _last_checkpoint read — so live-snapshot semantics is preserved: a
  // new commit bumps the tail version and forces a fresh replay, while
  // an unchanged table replays nothing (commit bodies and checkpoint
  // parquet are immutable once written, so re-parsing them could only
  // reproduce the cached state). Bounded by TOTAL cached live-file
  // entries (the same order of driver state as ONE maximal read — a
  // per-table-count bound would multiply the documented maxLiveFiles
  // residency by the table count), LRU eviction.
  /** Cache-validation token. Version numbers alone are NOT identity:
    * Delta commit filenames are pure version counters, so a table
    * deleted and regenerated at the same path with the same commit
    * count reproduces (cpVersion, tailVersion) exactly — the ADVICE
    * r10 staleness hole. The ANCHOR file's modificationTime + length
    * (the tail commit json, or `_last_checkpoint` for a commit-free
    * log) come from the listStatus the probe already runs — zero extra
    * IO — and a regenerated log rewrites that file, so the token
    * changes. Pinned (versionAsOf) entries carry the same anchor
    * (cpVersion slot = -2): their replayed state is immutable only
    * while the TABLE is the same table, so a hit now validates the
    * pinned commit file's current status too. */
  private case class ProbeToken(cpVersion: Long, tailVersion: Long,
      anchorMtime: Long, anchorLen: Long)

  private val StateCacheMaxEntries: Long = DefaultMaxLiveFiles.toLong
  private val stateCache = new java.util.LinkedHashMap[
      (String, Option[Long], Int), (ProbeToken, DeltaState)](16, 0.75f, true)
  private var stateCacheEntries = 0L // guarded by stateCache's lock
  private def stateCacheGet(key: (String, Option[Long], Int)): Option[(ProbeToken, DeltaState)] =
    stateCache.synchronized(Option(stateCache.get(key)))
  private def stateCachePut(key: (String, Option[Long], Int),
      value: (ProbeToken, DeltaState)): Unit = stateCache.synchronized {
    if (value._2.live.length <= StateCacheMaxEntries) {
      Option(stateCache.put(key, value)).foreach(old => stateCacheEntries -= old._2.live.length)
      stateCacheEntries += value._2.live.length
      val it = stateCache.entrySet().iterator()
      while (stateCacheEntries > StateCacheMaxEntries && it.hasNext) {
        val e = it.next(); stateCacheEntries -= e.getValue._2.live.length; it.remove()
      }
    }
  }

  /** (mtime, length) of the file that anchors a token's identity, or
    * (-1, -1) when it does not exist. */
  private def anchorStatus(f: FileSystem, p: Path): (Long, Long) =
    scala.util.Try {
      val st = f.getFileStatus(p); (st.getModificationTime, st.getLen)
    }.getOrElse((-1L, -1L))

  private def cachedState(spark: SparkSession, table: String, logDir: String,
      f: FileSystem, versionAsOf: Option[Long], maxLiveFiles: Int): DeltaState = {
    val probe: ProbeToken = versionAsOf match {
      // a pinned version's replayed state is immutable, but only while
      // the table IS that table — anchor on the pinned commit file (or
      // `_last_checkpoint` when the json was vacuumed into a
      // checkpoint) so a regenerate-in-place at the same path misses
      case Some(v) => graft.plans.SnapshotPin.pin(s"delta-pin:$table:$v") {
        val commitP = new Path(logDir, f"$v%020d.json")
        val (m, l) =
          if (f.exists(commitP)) anchorStatus(f, commitP)
          else anchorStatus(f, new Path(logDir, "_last_checkpoint"))
        ProbeToken(-2L, v, m, l)
      }
      // pinned per planning pass: sibling legs of one query resolve the
      // same tail token, so they share one cache entry (one snapshot)
      // even if a writer commits mid-planning
      case None => graft.plans.SnapshotPin.pin(s"delta:$table") {
        val mapper = new ObjectMapper()
        val lastCp = new Path(logDir, "_last_checkpoint")
        val cpV =
          if (!f.exists(lastCp)) -1L
          else {
            val in = f.open(lastCp)
            try mapper.readTree(in).get("version").asLong() finally in.close()
          }
        val commitStatuses = f.listStatus(new Path(logDir)).toSeq
          .filter(_.getPath.getName.matches("\\d{20}\\.json"))
          .map(st => st.getPath.getName.stripSuffix(".json").toLong -> st)
        val (anchorM, anchorL) = commitStatuses.maxByOption(_._1) match {
          case Some((_, st)) => (st.getModificationTime, st.getLen)
          case None          => anchorStatus(f, lastCp) // commit-free log
        }
        ProbeToken(cpV, commitStatuses.map(_._1).maxOption.getOrElse(-1L), anchorM, anchorL)
      }
    }
    val key = (table, versionAsOf, maxLiveFiles)
    stateCacheGet(key) match {
      case Some((tok, st)) if tok == probe => st
      case cached =>
        // a stale UNPINNED entry first tries INCREMENTAL replay: apply
        // only the commits past the cached tail instead of re-reading
        // the checkpoint parquet (a Spark job at large file counts) and
        // the whole commit chain per new commit
        val st = cached
          .filter(_ => versionAsOf.isEmpty)
          .flatMap { case (cachedTok, old) =>
            // a checkpoint-only state (no commit jsons at read time) has
            // tail -1 but IS the state at the checkpoint version — later
            // commits chain from max(checkpoint, tail), not from 0
            incrementalState(logDir, f, old, cachedTok,
              math.max(cachedTok.cpVersion, cachedTok.tailVersion),
              probe.tailVersion, maxLiveFiles)
          }
          .getOrElse(replayState(spark, table, logDir, f, versionAsOf, maxLiveFiles))
        stateCachePut(key, (probe, st))
        st
    }
  }

  /** One add action → [[FileEntry]], shared by the full and incremental
    * replay paths so their parse semantics cannot drift. */
  private def parseFileEntry(node: JsonNode): FileEntry = {
    import scala.jdk.CollectionConverters._
    val pv = Option(node.get("partitionValues")).map(_.properties().asScala.map(e =>
      e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))).toMap)
      .getOrElse(Map.empty[String, Option[String]])
    val dv = Option(node.get("deletionVector")).filterNot(_.isNull).map { d =>
      DvDescriptor(d.get("storageType").asText(), d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()).getOrElse(0),
        d.get("sizeInBytes").asInt(), d.get("cardinality").asLong())
    }
    val stats = Option(node.get("stats")).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    FileEntry(node.get("path").asText(), pv, dv, stats)
  }

  /** Incremental replay: apply commits (cachedTail, newTail] on top of
    * a cached state. ONLY add/remove actions apply incrementally — a
    * commit carrying metaData or protocol changes the schema/profile
    * surface the full replay gates, so it returns None and the caller
    * falls back to the full path (rare events: schema evolution,
    * feature enablement). None likewise on any missing commit in the
    * window or other surprise — fail open to the full replay, never
    * guess.
    *
    * Prefix guard: chaining is sound only if the cached state's OWN
    * history is still the table's history. A table regenerated in
    * place with MORE commits than the cached tail would otherwise
    * chain the new tail onto a dead table's state — so the cached
    * token's anchor file (tail commit json, or `_last_checkpoint` for
    * a checkpoint-only state) must still exist with the same
    * mtime+length, else fall back to the full replay. */
  private def incrementalState(logDir: String, f: FileSystem, cached: DeltaState,
      cachedTok: ProbeToken, cachedTail: Long, newTail: Long,
      maxLiveFiles: Int): Option[DeltaState] = scala.util.Try {
    if (newTail <= cachedTail) return None
    val anchorP =
      if (cachedTok.tailVersion >= 0) new Path(logDir, f"${cachedTok.tailVersion}%020d.json")
      else new Path(logDir, "_last_checkpoint")
    if (anchorStatus(f, anchorP) != ((cachedTok.anchorMtime, cachedTok.anchorLen))) return None
    val mapper = new ObjectMapper()
    val live = scala.collection.mutable.LinkedHashMap[String, FileEntry]() ++=
      cached.live.map(e => e.path -> e)
    for (v <- (cachedTail + 1) to newTail) {
      val p = new Path(logDir, f"$v%020d.json")
      if (!f.exists(p)) return None // gap: let the full replay diagnose
      val in = f.open(p)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val action = mapper.readTree(line)
        if (action.has("metaData") || action.has("protocol")) return None
        Option(action.get("add")).filterNot(_.isNull).foreach { add =>
          val e = parseFileEntry(add)
          live(e.path) = e
          require(live.size <= maxLiveFiles,
            s"delta: table has more than $maxLiveFiles live files — beyond this native reader's " +
              "driver-state bound; read it with the delta-spark connector jar on the classpath")
        }
        Option(action.get("remove")).filterNot(_.isNull)
          .foreach(rm => live.remove(rm.get("path").asText()))
      }
    }
    require(live.nonEmpty, s"delta: table has no live data files")
    Some(cached.copy(live = live.values.toVector))
  }.toOption.flatten

  /** Full log replay to the pinned (or latest) version: checkpoint
    * state + ordered JSON commits → live-file set, schema, partition
    * columns, table configuration — with the profile gates applied, so
    * a cached state is always a readable one. */
  private def replayState(spark: SparkSession, table: String, logDir: String,
      f: FileSystem, versionAsOf: Option[Long], maxLiveFiles: Int): DeltaState = {
    val mapper = new ObjectMapper()

    // checkpoint hint (skipped when pinned before the checkpoint —
    // a checkpoint state can't be rolled back)
    val lastCp = new Path(logDir, "_last_checkpoint")
    val (cpVersion, cpFiles): (Long, Seq[String]) =
      if (f.exists(lastCp)) {
        val in = f.open(lastCp)
        val node = try mapper.readTree(in) finally in.close()
        val v = node.get("version").asLong()
        val parts = Option(node.get("parts")).map(_.asInt())
        if (versionAsOf.exists(_ < v)) (-1L, Nil) // pinned before the checkpoint: replay commits only
        else parts match {
          case Some(n) =>
            // multipart classic: EVERY part or refuse — replaying a
            // subset silently truncates the live-file set
            val all = (1 to n).map(i => f"$logDir/$v%020d.checkpoint.$i%010d.$n%010d.parquet")
            val missing = all.filterNot(p => f.exists(new Path(p)))
            require(missing.isEmpty,
              s"delta: multipart checkpoint $v incomplete — missing ${missing.mkString(", ")}")
            (v, all)
          case None =>
            val classic = f"$logDir/$v%020d.checkpoint.parquet"
            if (f.exists(new Path(classic))) (v, Seq(classic))
            else {
              // v2 checkpoints (PROTOCOL.md "V2 Checkpoint Table Feature")
              // are UUID-named — <version>.checkpoint.<uuid>.{json,parquet}
              // — and may park their file actions in _sidecars. Match the
              // uuid shape ONLY, so a stray multipart part can't be
              // mistaken for a complete checkpoint.
              val uuidName = (f"$v%020d" + "\\.checkpoint\\.[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\.(parquet|json)").r
              val v2 = f.listStatus(new Path(logDir)).toSeq.map(_.getPath)
                .filter(p => uuidName.matches(p.getName)).map(_.toString)
              require(v2.nonEmpty,
                s"delta: _last_checkpoint names version $v but no classic or v2 checkpoint file matches in $logDir")
              (v, v2.take(1))
            }
        }
      } else (-1L, Nil)

    val allCommits = f.listStatus(new Path(logDir)).toSeq.map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(p => p.getName.stripSuffix(".json").toLong -> p)
    versionAsOf.foreach { v =>
      require(cpVersion == v || allCommits.exists(_._1 == v),
        s"delta: version $v not present in _delta_log (vacuumed or never written)")
    }
    val commits = allCommits
      .filter(_._1 > cpVersion)
      .filter(c => versionAsOf.forall(c._1 <= _))
      .sortBy(_._1)
    require(cpVersion >= 0 || commits.nonEmpty, s"delta: empty _delta_log at $logDir")
    // the replayed chain must be gap-free from the checkpoint (or 0) to
    // the target — a vacuumed or partially-listed log otherwise yields a
    // silently incomplete live-file set
    val versionsSeen = commits.map(_._1)
    val replayTarget = versionAsOf.getOrElse(versionsSeen.lastOption.getOrElse(cpVersion))
    val expectedVersions = ((cpVersion + 1) to replayTarget).toSeq
    require(versionsSeen == expectedVersions,
      s"delta: commit chain incomplete — have [${versionsSeen.mkString(",")}], need [${expectedVersions.mkString(",")}] (expired log or partial listing)")

    val live = scala.collection.mutable.LinkedHashMap[String, FileEntry]()
    var schemaJson: String = null
    var partitionCols: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty
    var provider: String = "parquet"
    var minReader = 1
    var readerFeatures: Seq[String] = Nil

    def applyMeta(m: JsonNode): Unit = {
      schemaJson = Option(m.get("schemaString")).map(_.asText()).getOrElse(schemaJson)
      import scala.jdk.CollectionConverters._
      partitionCols = Option(m.get("partitionColumns")).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(partitionCols)
      configuration = Option(m.get("configuration")).map(c =>
        c.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(configuration)
      provider = Option(m.get("format")).flatMap(fm => Option(fm.get("provider"))).map(_.asText()).getOrElse(provider)
    }
    def applyProtocol(p: JsonNode): Unit = {
      import scala.jdk.CollectionConverters._
      minReader = Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(minReader)
      readerFeatures = Option(p.get("readerFeatures")).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(readerFeatures)
    }
    // 1. checkpoint state (adds are the live set at cpVersion). Removes
    // in a checkpoint are retention tombstones, never live state.
    def applyAdd(node: JsonNode): Unit = {
      val e = parseFileEntry(node)
      live(e.path) = e
      // checked on insert so peak driver memory is bounded by the cap,
      // not by however many adds a hostile/huge log contains
      require(live.size <= maxLiveFiles,
        s"delta: table has more than $maxLiveFiles live files — beyond this native reader's " +
          "driver-state bound; read it with the delta-spark connector jar on the classpath")
    }
    val sidecarPaths = Seq.newBuilder[String]
    def applySidecar(node: JsonNode): Unit = {
      val p = node.get("path").asText()
      sidecarPaths += (if (p.contains("://") || p.startsWith("/")) p else s"$logDir/_sidecars/$p")
    }
    if (cpFiles.nonEmpty) {
      if (cpFiles.forall(_.endsWith(".json"))) {
        // v2 json manifest: one action per line, like a commit file
        cpFiles.foreach { p =>
          val in = f.open(new Path(p))
          val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
          text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
            val action = mapper.readTree(line)
            Option(action.get("metaData")).foreach(applyMeta)
            Option(action.get("protocol")).foreach(applyProtocol)
            Option(action.get("add")).filterNot(_.isNull).foreach(applyAdd)
            Option(action.get("sidecar")).filterNot(_.isNull).foreach(applySidecar)
          }
        }
      } else {
        val cp = spark.read.parquet(cpFiles: _*)
        val cols = cp.columns.toSet
        // count BEFORE collect: the cap must bound peak driver memory,
        // not fire after a 50M-add checkpoint has already materialized
        def checkAddCap(df: org.apache.spark.sql.DataFrame): Unit = {
          val n = df.where(col("add").isNotNull).count()
          require(n <= maxLiveFiles,
            s"delta: checkpoint lists $n add actions, more than $maxLiveFiles — beyond this " +
              "native reader's driver-state bound; read it with the delta-spark connector jar on the classpath")
        }
        def jsonRows(c: String): Seq[JsonNode] =
          cp.where(col(c).isNotNull)
            .select(org.apache.spark.sql.functions.to_json(col(c)))
            .collect().toSeq.map(r => mapper.readTree(r.getString(0)))
        if (cols.contains("metaData")) jsonRows("metaData").foreach(applyMeta)
        if (cols.contains("protocol")) jsonRows("protocol").foreach(applyProtocol)
        if (cols.contains("add")) { checkAddCap(cp); jsonRows("add").foreach(applyAdd) }
        if (cols.contains("sidecar")) jsonRows("sidecar").foreach(applySidecar)
      }
      // v2 sidecar parquets hold the checkpoint's file actions
      val sidecars = sidecarPaths.result()
      if (sidecars.nonEmpty) {
        val sc = spark.read.parquet(sidecars: _*)
        if (sc.columns.contains("add")) {
          val n = sc.where(col("add").isNotNull).count()
          require(n <= maxLiveFiles,
            s"delta: checkpoint sidecars list $n add actions, more than $maxLiveFiles — beyond this " +
              "native reader's driver-state bound; read it with the delta-spark connector jar on the classpath")
          sc.where(col("add").isNotNull)
            .select(org.apache.spark.sql.functions.to_json(col("add")))
            .collect().toSeq.map(r => mapper.readTree(r.getString(0)))
            .foreach(applyAdd)
        }
      }
    }

    // 2. replay JSON commits in order
    commits.foreach { case (_, p) =>
      val in = f.open(p)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val action = mapper.readTree(line)
        Option(action.get("metaData")).foreach(applyMeta)
        Option(action.get("protocol")).foreach(applyProtocol)
        Option(action.get("add")).foreach(applyAdd)
        Option(action.get("remove")).foreach(rm => live.remove(rm.get("path").asText()))
      }
    }

    // 3. profile gates
    require(provider == "parquet", s"delta: format provider '$provider' outside the supported profile")
    require(minReader <= 3, s"delta: minReaderVersion $minReader outside the supported profile")
    val gating = readerFeatures.filterNot(
      Set("timestampNtz", "v2Checkpoint", "deletionVectors", "columnMapping").contains)
    require(minReader < 3 || gating.isEmpty,
      s"delta: reader features ${gating.mkString(",")} outside the supported profile")
    require(Set("none", "name", "id").contains(
        configuration.getOrElse("delta.columnMapping.mode", "none")),
      s"delta: column mapping mode '${configuration("delta.columnMapping.mode")}' outside the supported profile")
    require(live.nonEmpty, s"delta: table has no live data files")
    require(schemaJson != null, s"delta: no metaData action found in the log")
    DeltaState(live.values.toVector, schemaJson, partitionCols, configuration)
  }

  private def readImpl(spark: SparkSession, table: String, versionAsOf: Option[Long],
      maxPartitionScans: Int, filterSql: Option[String], maxLiveFiles: Int,
      schemaOnly: Boolean = false,
      changes: Option[Map[String, (Long, Long)]] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = table.stripSuffix("/") + "/_delta_log"
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
    val state = cachedState(spark, table, logDir, f, versionAsOf, maxLiveFiles)
    val schemaJson = state.schemaJson
    val partitionCols = state.partitionCols
    val configuration = state.configuration
    val mapped = configuration.getOrElse("delta.columnMapping.mode", "none") != "none"

    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    def resolve(p: String): String = {
      val decoded = PathKeys.percentDecode(p) // URL-encoded in the log; '+' stays literal
      if (decoded.contains("://") || decoded.startsWith("/")) decoded
      else table.stripSuffix("/") + "/" + decoded
    }

    // Column mapping ('name'/'id'): parquet files carry PHYSICAL column
    // names; the logical schema's field metadata maps them back. 'id'
    // tables also always write physical names, so name-keyed reads
    // cover both modes. Nested renames ride a positional struct cast.
    def physName(fl: StructField): String = physNameOf(fl, mapped)
    def toPhysical(dt: DataType): DataType = toPhysicalType(dt, mapped)
    def stripMeta(dt: DataType): DataType = stripMetaType(dt)

    // deferred registration probe: the log replay above already
    // validated the table and its profile gates; stop BEFORE any data
    // file is touched — the first query's filter decides which files
    // may be opened at all
    if (schemaOnly)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        stripMeta(schema).asInstanceOf[StructType])

    // ---- file-level predicate skipping (the 100 TB lever) ------------
    // Prune the live-file list from the filter BEFORE any data file is
    // opened: exact partition-tuple evaluation (both partition paths —
    // crucially the >maxPartitionScans broadcast path, where Catalyst
    // sees no per-scan literals to constant-fold), then conservative
    // add.stats min/max ranges. The full filter re-applies to the
    // result below, so skipping is correctness-neutral by construction.
    def pvOf(e: FileEntry, pc: String): Option[String] = {
      val fl = schema(pc)
      e.partitionValues.get(physName(fl)).orElse(e.partitionValues.get(pc)).flatten
    }
    val filterConjs = filterSql.toSeq.flatMap(FileSkipping.conjuncts)
    // Generated partition columns (delta-spark's "generated column
    // partition filter" derivation): a partition column whose
    // delta.generationExpression is a function of ONE data column lets
    // conjuncts on that column derive partition conjuncts — the
    // generation expression is evaluated ON THE LITERAL by Spark itself
    // (same engine, same session timezone as the scan-time residual, so
    // semantics match by construction). Equality derives through any
    // deterministic expression; ranges only through the MONOTONE
    // whitelist (cast-to-date, date_trunc, trunc, year — `ts > v`
    // implies `g(ts) >= g(v)` only when g is non-decreasing).
    val derivedConjs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      if (filterConjs.isEmpty || partitionCols.isEmpty) Nil
      else scala.util.Try {
        import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
        import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
        def isMonotone(e: Expression): Boolean = e match {
          case c: Cast => c.dataType == org.apache.spark.sql.types.DateType &&
            c.child.isInstanceOf[UnresolvedAttribute]
          case f: UnresolvedFunction =>
            Set("date_trunc", "trunc", "year").contains(f.nameParts.last.toLowerCase) ||
              // date_format is monotone when the pattern renders
              // zero-padded fields most-significant-first with fixed
              // separators — then lexicographic string order equals time
              // order. DATE granularity only ('yyyy', 'yyyy-MM',
              // 'yyyy-MM-dd' and / variants): time-of-day components
              // (HH/mm/ss) render the session zone's LOCAL clock, which
              // runs BACKWARD across a DST fall-back — deriving a range
              // through them could prune a file whose rows match.
              // (Date-granularity shares the cast-to-date whitelist's
              // exposure to the exotic midnight-transition zones, and no
              // more.) Anything else ('MM', 'dd', locale names) fails open.
              (f.nameParts.last.toLowerCase == "date_format" && f.arguments.lift(1).exists {
                case org.apache.spark.sql.catalyst.expressions.Literal(
                    v: org.apache.spark.unsafe.types.UTF8String, _) =>
                  v.toString.matches("yyyy([-/]MM([-/]dd)?)?")
                case _ => false
              })
          case _ => false
        }
        // the literal's TEXT must come from CAST(.. AS STRING) inside the
        // same query — a collected java.sql.Timestamp renders toString in
        // the JVM default zone, which silently shifts the instant when it
        // differs from spark.sql.session.timeZone; the string cast both
        // renders AND later re-parses in the session zone, so the
        // roundtrip is exact by construction
        def renderTyped(typeName: String, text: String): Option[String] =
          typeName.toLowerCase match {
            case t if t == "date"                           => Some(s"DATE '$text'")
            case t if t.startsWith("timestamp")             => Some(s"TIMESTAMP '$text'")
            case "tinyint" | "smallint" | "int" | "bigint"  => Some(text)
            case t if t.startsWith("decimal")               => Some(text)
            case "string"                                   => Some("'" + text.replace("'", "''") + "'")
            case _                                          => None
          }
        partitionCols.flatMap { pc =>
          val fl = schema(pc)
          if (!fl.metadata.contains("delta.generationExpression")) Nil
          else {
            val genSql = fl.metadata.getString("delta.generationExpression")
            val genExpr = FileSkipping.conjuncts(genSql).head // parse (single expression)
            FileSkipping.usableRefs(genExpr).filter(_.size == 1).toSeq.flatMap { refs =>
              val src = refs.head
              val monotone = isMonotone(genExpr)
              filterConjs.flatMap(FileSkipping.simpleShape).collect {
                case c @ FileSkipping.Cmp(n, op, _) if n.equalsIgnoreCase(src) &&
                    (op == "=" || monotone) => c
              }.flatMap { c =>
                // evaluate g(literal) with Spark: SELECT g FROM (SELECT lit AS src)
                val evaluated: Seq[Option[String]] = c.values.map { l =>
                  scala.util.Try {
                    val row = spark.sql(
                      s"SELECT typeof(($genSql)), CAST(($genSql) AS STRING) FROM (SELECT ${l.sql} AS `$src`)")
                      .collect().head
                    if (row.isNullAt(1)) None else renderTyped(row.getString(0), row.getString(1))
                  }.toOption.flatten
                }
                if (evaluated.exists(_.isEmpty)) Nil
                else {
                  val vs = evaluated.flatten
                  val op = c.op match { case ">" => ">="; case "<" => "<="; case o => o }
                  val sql =
                    if (vs.size == 1) s"`$pc` $op ${vs.head}"
                    else s"`$pc` IN (${vs.mkString(", ")})"
                  FileSkipping.conjuncts(sql)
                }
              }
            }
          }
        }
      }.getOrElse(Nil)
    def emptyTyped(): DataFrame = {
      val base = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        stripMeta(schema).asInstanceOf[StructType])
      changes.fold(base)(_ => base
        .withColumn("_commit_version", lit(null).cast(org.apache.spark.sql.types.LongType))
        .withColumn("_commit_timestamp", lit(null).cast(org.apache.spark.sql.types.TimestampType)))
    }
    // changes read: restrict the scan to the window's surviving adds
    var liveEntries: Seq[FileEntry] =
      changes.fold(state.live: Seq[FileEntry])(m => state.live.filter(e => m.contains(e.path)))
    if (changes.isDefined && liveEntries.isEmpty) return emptyTyped()
    if (filterConjs.nonEmpty) {
      if (partitionCols.nonEmpty) {
        val partFields = partitionCols.map(pc => StructField(pc, schema(pc).dataType))
        val tuples = liveEntries.map(e => e.path -> partitionCols.map(pc => pvOf(e, pc).orNull))
        FileSkipping.partitionPrune(spark, partFields, tuples, filterConjs ++ derivedConjs)
          .foreach(kept => liveEntries = liveEntries.filter(e => kept.contains(e.path)))
      }
      // stats JSON keys are PHYSICAL names under column mapping — the
      // statsKey map routes each logical column to its stats entry
      if (liveEntries.nonEmpty) {
        val statsKeys =
          if (!mapped) Map.empty[String, String]
          else schema.fields.map(fl => fl.name -> physName(fl)).toMap
        FileSkipping.statsPrune(spark, schema,
          liveEntries.map(e => e.path -> e.stats.orNull), filterConjs, statsKeys)
          .foreach(kept => liveEntries = liveEntries.filter(e => kept.contains(e.path)))
      }
      if (liveEntries.isEmpty) // every file skipped: the empty result, typed
        return emptyTyped()
    }

    val hasDv = liveEntries.exists(_.dv.isDefined)
    val needTag = hasDv || changes.isDefined
    import org.apache.spark.sql.functions.{expr, regexp_replace}
    def norm(c: Column): Column = PathKeys.scanKey(c)
    // `_metadata` is only resolvable on a direct file scan, so the
    // file/row tags must attach at each scan base, not after the union
    def tag(df: DataFrame): DataFrame =
      if (!needTag) df
      else df.withColumn("__file", norm(expr("_metadata.file_path")))
        .withColumn("__pos", expr("_metadata.row_index"))
    val extraCols = if (needTag) Seq("__file", "__pos") else Nil
    def renameToLogical(df: DataFrame, fields: Seq[StructField]): DataFrame =
      if (!mapped) df
      else df.select(fields.map(fl =>
        col(physName(fl)).cast(stripMeta(fl.dataType)).as(fl.name)) ++ extraCols.map(col): _*)

    val scanned =
      if (partitionCols.isEmpty) {
        val phys = toPhysical(schema).asInstanceOf[StructType]
        renameToLogical(
          tag(spark.read.schema(phys).parquet(liveEntries.map(e => resolve(e.path)): _*)),
          schema.fields.toSeq)
      } else {
        val dataFields = schema.fields.filterNot(fl => partitionCols.contains(fl.name)).toSeq
        val dataSchema = toPhysical(StructType(dataFields)).asInstanceOf[StructType]
        val groups = liveEntries.groupBy(_.partitionValues)
        if (groups.size <= maxPartitionScans) {
          // one read per distinct partition tuple, partition values
          // attached as typed literal columns (Delta data files omit
          // them; the log keys partitionValues by PHYSICAL name under
          // column mapping)
          val frames = groups.toSeq.map { case (_, entries) =>
            val base = renameToLogical(
              tag(spark.read.schema(dataSchema).parquet(entries.map(e => resolve(e.path)): _*)), dataFields)
            partitionCols.foldLeft(base) { (df, pc) =>
              val value: Column = pvOf(entries.head, pc) match {
                case Some(s) => lit(s).cast(schema(pc).dataType)
                case None    => lit(null).cast(schema(pc).dataType)
              }
              df.withColumn(pc, value)
            }
          }
          frames.reduce(_ unionByName _).select((schema.fieldNames.toSeq ++ extraCols).map(col): _*)
        } else {
          // high-cardinality partitioning: ONE scan + broadcast
          // (file → partition values) join — plan stays O(1) instead of
          // O(partitions) FileScan nodes union-reduced together
          val base0 = tag(spark.read.schema(dataSchema).parquet(liveEntries.map(e => resolve(e.path)): _*))
            .withColumn("__pfile", norm(expr("_metadata.file_path")))
          val renamed =
            if (!mapped) base0
            else base0.select(dataFields.map(fl =>
              col(physName(fl)).cast(stripMeta(fl.dataType)).as(fl.name)) ++
              (extraCols :+ "__pfile").map(col): _*)
          val pvSchema = StructType(StructField("__pv_file", org.apache.spark.sql.types.StringType) +:
            partitionCols.map(pc => StructField(s"__pv_$pc", org.apache.spark.sql.types.StringType)).toArray.toSeq)
          val pvRows = liveEntries.map { e =>
            org.apache.spark.sql.Row.fromSeq(
              PathKeys.driverKey(resolve(e.path), f) +:
                partitionCols.map(pc => pvOf(e, pc).orNull))
          }
          val pvDf = org.apache.spark.sql.functions.broadcast(
            spark.createDataFrame(spark.sparkContext.parallelize(pvRows, 1), pvSchema))
          val joined = renamed.join(pvDf, col("__pfile") === col("__pv_file"), "left")
          partitionCols.foldLeft(joined) { (df, pc) =>
            df.withColumn(pc, col(s"__pv_$pc").cast(schema(pc).dataType))
          }.select((schema.fieldNames.toSeq ++ extraCols).map(col): _*)
        }
      }

    val result =
    if (!hasDv) scanned
    else {
      // DV bitmaps decode ON EXECUTORS (one task per descriptor batch —
      // the driver ships only the ~100-byte descriptors), producing a
      // (file, row_index) delete set that anti-joins the scan; the
      // delete side is tiny relative to the data → AQE broadcasts it.
      val sconf = new graft.core.SerializableHadoopConf(conf)
      val tbl = table
      // `_metadata.file_path` is the scan path's URI form (percent-
      // encoded — spaces become %20); resolve() yields the DECODED path,
      // so re-encode through Path.toUri before keying or rows in files
      // with quotable characters would silently resurrect
      val descs: Seq[(String, String, String, Int, Int, Long)] =
        liveEntries.flatMap(e => e.dv.map(d =>
          (PathKeys.driverKey(resolve(e.path), f),
            d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes, d.cardinality)))
      import spark.implicits._
      val deletes = spark.createDataset(descs)
        .repartition(math.max(1, math.min(descs.size, spark.sparkContext.defaultParallelism)))
        .flatMap { case (fp, st, pid, off, sz, card) =>
          dvRows(tbl, DvDescriptor(st, pid, off, sz, card), sconf.value).map(pos => (fp, pos))
        }.toDF("__del_file", "__del_pos")
      scanned.join(deletes,
        col("__file") === col("__del_file") && col("__pos") === col("__del_pos"), "left_anti")
        .select((schema.fieldNames.toSeq ++
          (if (changes.isDefined) Seq("__file") else Nil)).map(col): _*)
    }
    // changes read: attach (_commit_version, _commit_timestamp) via a
    // broadcast (file → version) join keyed on the scan's own
    // `_metadata.file_path` — uniform across partition layouts, column
    // mapping and DVs, O(new files) driver state
    val withChanges = changes match {
      case None => result
      case Some(m) =>
        val rows = liveEntries.map { e =>
          val (v, ts) = m(e.path)
          org.apache.spark.sql.Row(PathKeys.driverKey(resolve(e.path), f), v,
            new java.sql.Timestamp(ts))
        }
        val chSchema = StructType(Seq(
          StructField("__ch_file", org.apache.spark.sql.types.StringType),
          StructField("__ch_version", org.apache.spark.sql.types.LongType),
          StructField("__ch_ts", org.apache.spark.sql.types.TimestampType)))
        val chDf = org.apache.spark.sql.functions.broadcast(
          spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), chSchema))
        result.join(chDf, col("__file") === col("__ch_file"))
          .select((schema.fieldNames.toSeq.map(col) :+
            col("__ch_version").as("_commit_version") :+
            col("__ch_ts").as("_commit_timestamp")): _*)
    }
    // residual filter: file skipping is a superset guarantee; applying
    // the whole predicate here makes the result exactly where(filter)
    filterSql.map(fs => withChanges.where(expr(fs))).getOrElse(withChanges)
  }
}

/** Registry wrapper: the connector-gated `spark_delta` FormatReader
  * precedes this in `SparkReaders.all`, so the real connector wins when
  * its jar is present; this native log replay is the always-importable
  * fallback. */
class DeltaReaderImpl extends Reader {
  val name = "delta_native"
  val implementsKinds = Set("delta")
  // an explicit `filter` option keeps the eager pruned read; otherwise
  // the deferred frame lets the QUERY's own filters drive file skipping
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    if (ref.options.get("history").exists(_.equalsIgnoreCase("true")))
      // DESCRIBE HISTORY through the catalog route
      DeltaReader.history(spark, ref.url)
    else if (ref.options.contains("changeFeedSince"))
      // row-level change feed (cdc actions + add/remove derivation),
      // tagged _change_type/_commit_version/_commit_timestamp
      DeltaReader.readChangeFeed(spark, ref.url, ref.options("changeFeedSince").toLong,
        filter = ref.options.get("filter"),
        endVersion = ref.options.get("changeFeedEnd").map(_.toLong))
    else if (ref.options.contains("changesSince"))
      // incremental batch read: rows added after the given version,
      // tagged _commit_version/_commit_timestamp (always eager — the
      // window is resolved at read time, like versionAsOf)
      DeltaReader.readChangesSince(spark, ref.url, ref.options("changesSince").toLong,
        filter = ref.options.get("filter"))
    else (ref.options.get("filter"), ref.options.get("timestampAsOf")) match {
      case (Some(_), Some(ts)) =>
        DeltaReader.readAsOfTimestamp(spark, ref.url, PathKeys.parseTimestampMs(ts),
          filter = ref.options.get("filter"))
      case (Some(_), None) =>
        DeltaReader.read(spark, ref.url, ref.options.get("versionAsOf").map(_.toLong),
          filter = ref.options.get("filter"))
      case (None, ts) =>
        DeltaReader.table(spark, ref.url,
          versionAsOf = ref.options.get("versionAsOf").map(_.toLong),
          timestampMs = ts.map(PathKeys.parseTimestampMs))
    }
}
