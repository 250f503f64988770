package graft.readers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Native Iceberg micro-batch STREAMING source —
  * `spark.readStream.format("graft-iceberg").load(path)` with NO
  * connector jar: the `graft-delta` source's twin over the snapshot
  * ancestry (the connector's incremental-append streaming read).
  *
  *  - the offset is the SNAPSHOT ID (checkpointed as its decimal
  *    string); each micro-batch emits the data files that became live
  *    in the ancestry window `(start, end]` — live-set differences
  *    between consecutive ancestors, served from the immutable
  *    manifest caches;
  *  - the first batch is the full current snapshot
  *    (`starting_snapshot_id`: a snapshot id starts tailing AFTER that
  *    ancestor instead; `latest` emits nothing old and tails);
  *  - `summary.operation` gates each window snapshot: `append`
  *    contributes its adds; `replace` (compaction) contributes nothing
  *    — its files carry rows the stream already emitted; `delete`
  *    and `overwrite` refuse loudly (an append stream cannot retract
  *    or attribute rewritten rows), each optionally skipped wholesale
  *    with `skip_delete_snapshots=true` /
  *    `skip_overwrite_snapshots=true` (round 12 — skipped upserts do
  *    NOT emit; `readChangeFeed` carries the row-level diffs);
  *  - a start snapshot that is no longer an ancestor of head (rolled
  *    back / expired) refuses naming a re-baseline.
  *
  * With deletes refused or skipped, every windowed add is live at the
  * window's END snapshot, so a multi-snapshot catch-up plans ONE
  * pinned scan — read with `snapshotSchema = false`: a stream's schema
  * is FIXED at start, so pinned batches must not adopt a window
  * snapshot's own (possibly older) schema; an evolution mid-stream
  * still surfaces loudly as a batch-arity mismatch, restart to adopt.
  */
class IcebergStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg: a table path is required — readStream.format(\"graft-iceberg\").load(<path>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = IcebergReader.read(sqlContext.sparkSession, pathOf(parameters),
      schemaOnly = true).schema
    val cdf = parameters.get("read_change_feed")
      .orElse(parameters.get("readChangeFeed")).exists(_.toBoolean)
    ("graft-iceberg", if (!cdf) base else IcebergStreamSource.withCdfColumns(base))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters), parameters, metadataPath)

  /** Streaming SINK (the graft-delta sink's twin): exactly-once via
    * `graft.txn.*` snapshot-summary markers — a batch id at or below
    * the ancestry's committed version for this query's app id is a
    * replay and commits nothing. Append appends, Complete overwrites
    * per batch, Update (round 12) UPSERTS by key through the native
    * MERGE (option `merge_keys`; first batch creates the table; a
    * no-op batch still publishes its marker). `partitionBy` threads
    * through to the writer's partitioning profile. */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    val appId = parameters.get("txn_app_id")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-iceberg sink: exactly-once needs a stable transaction id — set " +
          "option(\"txn_app_id\", ...) (or a checkpointLocation, which doubles as one)"))
    val mergeKeys: Seq[String] = parameters.get("merge_keys")
      .orElse(parameters.get("mergeKeys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    if (outputMode == OutputMode.Update())
      require(mergeKeys.nonEmpty,
        "graft-iceberg sink: Update output mode upserts by key — set " +
          "option(\"merge_keys\", \"k1,k2\") (rows whose key exists update in place, " +
          "new keys insert)")
    else require(mergeKeys.isEmpty,
      "graft-iceberg sink: merge_keys only applies to Update output mode")
    new IcebergStreamSink(sqlContext.sparkSession, path, outputMode, appId,
      partitionColumns, mergeKeys)
  }
}

private[readers] class IcebergStreamSink(spark: SparkSession, table: String,
    outputMode: OutputMode, appId: String, partitionBy: Seq[String],
    mergeKeys: Seq[String] = Nil) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (batchId <= IcebergWriter.lastTxnVersion(spark, table, appId)) return // replay
    val frame = org.apache.spark.sql.graft.bridge.batchFrame(data)
    if (outputMode == OutputMode.Update()) {
      val conf = spark.sparkContext.hadoopConfiguration
      val exists = scala.util.Try(
        IcebergReader.currentMetadataPath(table, conf)).isSuccess
      if (!exists)
        IcebergWriter.write(spark, frame, table, mode = "append",
          txn = Some(appId -> batchId), partitionBy = partitionBy)
      else
        IcebergWriter.merge(spark, frame, table, on = mergeKeys,
          txn = Some(appId -> batchId))
    } else {
      val mode = if (outputMode == OutputMode.Complete()) "overwrite" else "append"
      IcebergWriter.write(spark, frame, table,
        mode = mode, txn = Some(appId -> batchId), partitionBy = partitionBy)
    }
  }
  override def toString: String = s"IcebergStreamSink[$table]"
}

/** Stream offset: a fully-emitted SNAPSHOT, or — under
  * `max_files_per_trigger` / `max_bytes_per_trigger` — a PARTIAL one
  * (`part` = how many of the snapshot's path-sorted adds are emitted),
  * serialized `id` / `id:part` so pre-existing checkpoints parse
  * unchanged. */
private[readers] case class IcebergSnapshotOffset(snapshotId: Long,
    part: Option[Long] = None) extends V1Offset {
  override def json(): String = part.fold(snapshotId.toString)(k => s"$snapshotId:$k")
}

private[readers] object IcebergStreamSource {
  /** The change feed's serving columns appended to a table schema. */
  def withCdfColumns(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_snapshot_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_committed_at",
        org.apache.spark.sql.types.TimestampType)))
}

private[readers] class IcebergStreamSource(spark: SparkSession, table: String,
    options: Map[String, String], metadataPath: String = "") extends Source {

  // CDF streaming (the graft-delta source's twin): batches serve
  // row-level changes through the bounded-window change feed, so
  // delete and overwrite snapshots flow as retraction rows instead of
  // refusing the stream
  private val readCdf = options.get("read_change_feed")
    .orElse(options.get("readChangeFeed")).exists(_.toBoolean)
  private val schema0 = {
    val base = IcebergReader.read(spark, table, schemaOnly = true).schema
    if (!readCdf) base else IcebergStreamSource.withCdfColumns(base)
  }
  private val skipDeleteSnapshots =
    options.get("skip_delete_snapshots").exists(_.toBoolean)
  private val skipOverwriteSnapshots =
    options.get("skip_overwrite_snapshots").exists(_.toBoolean)
  private val startingSnapshot = options.get("starting_snapshot_id")
  // follow a BRANCH ref instead of main (the write-audit-publish
  // pattern's audit tail): offsets resolve from the ref's head, so the
  // stream sees branch commits the moment they land while main-only
  // readers see nothing until fastForward
  private val branch = options.get("branch")
  // admission control (the graft-delta source's twin): at most N
  // ancestry snapshots per micro-batch — a long catch-up lands in
  // bounded chunks
  private val maxSnapshots = options.get("max_snapshots_per_trigger").map(_.toInt)
  maxSnapshots.foreach(n => require(n >= 1,
    s"graft-iceberg: max_snapshots_per_trigger must be >= 1 (got $n)"))
  // finer admission (the graft-delta source's file/byte twins): at most
  // N FILES per micro-batch — an oversized snapshot splits across
  // triggers via partial offsets over its PATH-SORTED adds, so the
  // slicing is deterministic across restarts. Composes with the
  // snapshot cap. Bytes are a SOFT cap — files admit while the running
  // total is under it, so every batch takes at least one file.
  private val maxFiles = options.get("max_files_per_trigger")
    .orElse(options.get("maxFilesPerTrigger")).map(_.toLong)
  maxFiles.foreach(n => require(n >= 1,
    s"graft-iceberg: max_files_per_trigger must be >= 1 (got $n)"))
  private val maxBytes = options.get("max_bytes_per_trigger")
    .orElse(options.get("maxBytesPerTrigger")).map(_.toLong)
  maxBytes.foreach(n => require(n >= 1,
    s"graft-iceberg: max_bytes_per_trigger must be >= 1 (got $n)"))
  require(!(readCdf && (skipDeleteSnapshots || skipOverwriteSnapshots)),
    "graft-iceberg: read_change_feed serves delete/overwrite snapshots as change rows — " +
      "skip_delete_snapshots/skip_overwrite_snapshots contradict it")
  require(!(readCdf && (maxFiles.isDefined || maxBytes.isDefined)),
    "graft-iceberg: read_change_feed windows are whole snapshots — file/byte caps " +
      "cannot split change rows; pace with max_snapshots_per_trigger")
  private var lastEndSeen: Option[(Long, Option[Long])] = None

  private def op(s: JsonNode): String = Option(s.get("summary"))
    .flatMap(su => Option(su.get("operation"))).map(_.asText()).getOrElse("append")

  // per-snapshot PATH-SORTED adds with sizes (live-set diff vs parent),
  // shared by the admission walk and getBatch so both slice the same
  // order; snapshots/manifests are immutable so entries never go stale.
  // Non-append snapshots contribute no adds (replace = already-emitted
  // rows; delete/overwrite gate loudly in the batch walk).
  private val snapAddsCache =
    scala.collection.mutable.LongMap.empty[Seq[(String, Long)]]
  private def addsOf(snapsById: Map[Long, JsonNode], sid: Long): Seq[(String, Long)] =
    snapAddsCache.getOrElseUpdate(sid, {
      val s = snapsById.getOrElse(sid, throw new IllegalArgumentException(
        s"graft-iceberg: snapshot $sid on the ancestry chain is no longer in the " +
          "metadata (expired) — cannot stream the window; re-baseline by restarting " +
          "without a checkpoint"))
      if (op(s) != "append") Nil
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        val tableFs = IcebergReader.tableFileSystem(table, conf)
        val cur = IcebergReader.liveDataFilesOf(spark, table, tableFs, s)
        val parent = Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong())
        val prevPaths = parent.map(p => IcebergReader.liveDataPathsOf(spark, table, tableFs,
          snapsById.getOrElse(p, throw new IllegalArgumentException(
            s"graft-iceberg: parent snapshot $p of $sid is no longer in the metadata " +
              "(expired) — cannot stream the window; re-baseline by restarting without " +
              "a checkpoint")))).getOrElse(Set.empty[String])
        cur.filterNot { case (p, _) => prevPaths(p) }.toSeq.sortBy(_._1)
      }
    })

  // see [[StreamAnchors.freshQuery]]: a starting anchor may seed the
  // cap only before the first offset is logged, or a restart could
  // offer an offset behind the checkpoint
  private lazy val freshQuery: Boolean = StreamAnchors.freshQuery(spark, metadataPath)

  override def schema: StructType = schema0

  private def meta(): JsonNode = {
    val conf = spark.sparkContext.hadoopConfiguration
    new ObjectMapper().readTree(graft.readers.IcebergReader.metadataText(table, conf))
  }

  override def getOffset: Option[V1Offset] = {
    val m = meta()
    val cur = branch match {
      case Some(b) =>
        val r = Option(m.get("refs")).flatMap(rs => Option(rs.get(b))).getOrElse(
          throw new IllegalArgumentException(
            s"graft-iceberg: no branch '$b' at $table — createBranch first " +
              "(a silently-empty stream would hide the typo)"))
        require(Option(r.get("type")).forall(_.asText() == "branch"),
          s"graft-iceberg: ref '$b' at $table is a tag, not a branch")
        Some(r.get("snapshot-id").asLong())
      case None =>
        Option(m.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L)
    }
    val anyCap = maxSnapshots.isDefined || maxFiles.isDefined || maxBytes.isDefined
    val offered: Option[(Long, Option[Long])] = cur match {
      case None => None
      case Some(c) if !anyCap => Some((c, None))
      case Some(c) =>
        val anchor: Option[(Long, Option[Long])] = lastEndSeen.orElse(
          if (freshQuery) startingSnapshot.filter(_ != "latest").map(v => (v.toLong, None))
          else None)
        anchor match {
          case None => Some((c, None)) // fresh full-snapshot batch: a single quantum
          case Some((aId, None)) if aId == c => Some((c, None)) // caught up
          case Some((aId, aPart)) =>
            // ancestry from the head back to the anchor; the offered end
            // walks FORWARD of the anchor along that chain spending the
            // snapshot/file/byte budgets. A non-ancestor anchor offers
            // the head and lets getBatch refuse with its re-baseline
            // error.
            import scala.jdk.CollectionConverters._
            val snapsById = Option(m.get("snapshots")).toSeq.flatMap(_.elements().asScala)
              .map(s => s.get("snapshot-id").asLong() -> s).toMap
            val chain = scala.collection.mutable.ArrayBuffer[Long]()
            var cursor: Option[Long] = Some(c)
            var found = false
            while (cursor.isDefined && !found) {
              val id = cursor.get
              if (id == aId) found = true
              else {
                chain += id
                cursor = snapsById.get(id).flatMap(s =>
                  Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong()))
              }
            }
            if (!found) Some((c, None))
            else {
              val forward = maxSnapshots.fold(chain.reverse.toSeq)(n =>
                chain.reverse.take(n).toSeq)
              if (maxFiles.isEmpty && maxBytes.isEmpty)
                // snapshot cap only: finish a partial anchor's snapshot
                // plus up to n full snapshots forward of it
                Some((forward.lastOption.getOrElse(aId), None))
              else {
                // walk forward spending the file/byte budgets; an
                // oversized snapshot ends the offer PARTIAL over its
                // sorted adds. A partial anchor resumes inside its own
                // snapshot first.
                snapAddsCache.filterInPlace((k, _) =>
                  k == aId || chain.contains(k)) // bound the cache
                val fileCap = maxFiles.getOrElse(Long.MaxValue)
                val byteCap = maxBytes.getOrElse(Long.MaxValue)
                var files = 0L
                var bytes = 0L
                var res: (Long, Option[Long]) = (aId, aPart)
                var full = false
                val toWalk = (if (aPart.isDefined) Seq(aId) else Nil) ++ forward
                toWalk.foreach { sid =>
                  if (!full) {
                    val eff = addsOf(snapsById, sid)
                    var i = if (sid == aId) aPart.getOrElse(0L).toInt else 0
                    while (i < eff.size && !full) {
                      if (files >= fileCap || bytes >= byteCap) full = true
                      else { files += 1; bytes += eff(i)._2; i += 1 }
                    }
                    if (i >= eff.size) res = (sid, None)
                    else res = (sid, Some(i.toLong))
                  }
                }
                Some(res)
              }
            }
        }
    }
    offered.foreach(o => lastEndSeen = Some(o))
    offered.map { case (id, p) => IcebergSnapshotOffset(id, p) }
  }

  private[readers] def ver(o: V1Offset): (Long, Option[Long]) = o match {
    case IcebergSnapshotOffset(v, p) => (v, p)
    case other => other.json.trim.split(":") match { // SerializedOffset on restart
      case Array(v)    => (v.toLong, None)
      case Array(v, k) => (v.toLong, Some(k.toLong))
      case _ => throw new IllegalArgumentException(
        s"graft-iceberg: bad offset '${other.json}'")
    }
  }

  private def emptyBatch(): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema0)

  /** (snapshot, part) progress ordering WITHIN one snapshot — ids are
    * not ordered across snapshots (ancestry is), so this only decides
    * whether an end offset makes progress over a same-id anchor. */
  private def samePartLe(a: (Long, Option[Long]), b: (Long, Option[Long])): Boolean =
    a._1 == b._1 && ((a._2, b._2) match {
      case (Some(x), Some(y)) => x <= y
      case (Some(_), None)    => true
      case (None, None)       => true
      case (None, Some(_))    => false
    })

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endO = ver(end)
    // keep a further-along same-snapshot anchor (a replayed partial
    // batch must not rewind the admission walk); across different ids
    // the freshest getBatch end wins — v1 replays arrive in order
    lastEndSeen = Some(lastEndSeen.filter(a => samePartLe(endO, a)).getOrElse(endO))
    val batch = if (readCdf) {
      import org.apache.spark.sql.functions.{lit, timestamp_millis}
      start match {
        case Some(s) if ver(s)._1 == endO._1 => emptyBatch()
        case Some(s) =>
          IcebergReader.readChangeFeed(spark, table, ver(s)._1,
            endSnapshotId = Some(endO._1))
        case None => startingSnapshot match {
          case Some("latest") => emptyBatch()
          case Some(v) =>
            IcebergReader.readChangeFeed(spark, table, v.toLong,
              endSnapshotId = Some(endO._1))
          case None =>
            // initial snapshot serves as `insert` rows at the anchor
            val ts = {
              import scala.jdk.CollectionConverters._
              Option(meta().get("snapshots")).toSeq.flatMap(_.elements().asScala)
                .find(_.get("snapshot-id").asLong() == endO._1)
                .flatMap(s => Option(s.get("timestamp-ms")).map(_.asLong()))
                .getOrElse(System.currentTimeMillis())
            }
            IcebergReader.read(spark, table, snapshotId = Some(endO._1),
              snapshotSchema = false)
              .withColumn("_change_type", lit("insert"))
              .withColumn("_snapshot_id", lit(endO._1))
              .withColumn("_committed_at", timestamp_millis(lit(ts)))
        }
      }
    } else start match {
      case Some(s) => changesBatch(ver(s), endO)
      case None => startingSnapshot match {
        case Some("latest") => emptyBatch()
        case Some(v)        => changesBatch((v.toLong, None), endO) // changes AFTER that ancestor
        case None           => IcebergReader.read(spark, table, snapshotId = Some(endO._1),
          snapshotSchema = false) // a stream's schema is FIXED at start
      }
    }
    org.apache.spark.sql.graft.bridge.streamingFrame(batch)
  }

  /** Adds of ancestry snapshots (since, end], one pinned scan. Partial
    * bounds slice a snapshot's PATH-SORTED adds, so a split snapshot
    * re-assembles exactly across triggers and restarts. */
  private def changesBatch(since: (Long, Option[Long]), end: (Long, Option[Long])): DataFrame = {
    if (since == end) return emptyBatch()
    val (sId, sPart) = since
    val (eId, ePart) = end
    val m = meta()
    import scala.jdk.CollectionConverters._
    val snapsById: Map[Long, JsonNode] =
      Option(m.get("snapshots")).toSeq.flatMap(_.elements().asScala)
        .map(s => s.get("snapshot-id").asLong() -> s).toMap
    // ancestry end → since (the same walk as readChangesSince, but the
    // baseline must be a true ancestor — a stream cannot rewind)
    var chain: List[Long] = Nil
    var cursor: Option[Long] = Some(eId)
    while (cursor.isDefined && !cursor.contains(sId)) {
      val s = snapsById.getOrElse(cursor.get, throw new IllegalArgumentException(
        s"graft-iceberg: snapshot ${cursor.get} on the ancestry chain is no longer in " +
          s"the metadata (expired) — cannot stream the window; re-baseline by " +
          "restarting without a checkpoint"))
      chain ::= cursor.get
      cursor = Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong())
    }
    require(cursor.contains(sId),
      s"graft-iceberg: committed snapshot $sId is not an ancestor of the current " +
        s"snapshot $eId (rolled back or branched) — re-baseline by restarting " +
        "without a checkpoint")
    val conf = spark.sparkContext.hadoopConfiguration
    val tableFs = IcebergReader.tableFileSystem(table, conf)
    // a partially-emitted anchor snapshot contributes its REMAINING
    // adds before the chain proper
    val ordered: Seq[Long] = (if (sPart.isDefined) Seq(sId) else Nil) ++ chain
    val adds = scala.collection.mutable.LinkedHashSet[String]()
    ordered.foreach { sid =>
      val s = snapsById(sid)
      op(s) match {
        case "append" =>
          val all = addsOf(snapsById, sid)
          val from = if (sid == sId && sPart.isDefined) sPart.get.toInt else 0
          val until = if (sid == eId && ePart.isDefined) ePart.get.toInt else all.size
          adds ++= all.slice(from, until).map(_._1)
        case "replace" => () // compaction: old rows in new files — already emitted
        case "delete" =>
          require(skipDeleteSnapshots,
            s"graft-iceberg: snapshot $sid deletes data — an append stream cannot " +
              "retract emitted rows. Set skip_delete_snapshots=true to skip such " +
              "snapshots, or re-baseline with a batch read")
          // skipped wholesale; rows it removed were already emitted and
          // stay emitted (append-stream semantics)
        case "overwrite" if skipOverwriteSnapshots => ()
          // skipped wholesale (round 12, the delete-skip's rewrite
          // twin): a merge/delete-where/replaceWhere snapshot's rows
          // are unattributable to an append stream, so NONE of them
          // emit — consume row-level diffs with readChangeFeed instead
        case "overwrite" => throw new IllegalArgumentException(
          s"graft-iceberg: snapshot $sid rewrites rows (overwrite — merge/delete-where/" +
            "replaceWhere) — an append stream cannot attribute them. Set " +
            "skip_overwrite_snapshots=true to skip such snapshots wholesale (their " +
            "upserts will NOT be emitted), consume readChangeFeed for row-level diffs, " +
            "or re-baseline with a batch read")
        case other => throw new IllegalArgumentException(
          s"graft-iceberg: snapshot $sid has operation '$other' — an append stream " +
            "cannot attribute its rows; re-baseline with a batch read")
      }
    }
    // files an in-window snapshot REMOVED again cannot be scanned at
    // endId — under 'replace' their rows were already emitted via the
    // original adds; under a skipped 'delete' the add must still be
    // emitted even though the file is gone from head, so scan only
    // what survives and refuse if an add vanished (data loss)
    val live = IcebergReader.liveDataPathsOf(spark, table, tableFs, snapsById(eId))
    val vanished = adds.toSet -- live
    require(vanished.isEmpty,
      s"graft-iceberg: ${vanished.size} file(s) added in the window were removed again " +
        s"before the batch was read (e.g. '${vanished.head}') — the stream cannot emit " +
        "them exactly-once; re-baseline with a batch read")
    if (adds.isEmpty) emptyBatch()
    else IcebergReader.read(spark, table, snapshotId = Some(eId), snapshotSchema = false,
      changes = Some(adds.map(_ -> (eId, 0L)).toMap))
      .drop("_snapshot_id", "_committed_at")
  }

  override def stop(): Unit = ()
}
