package graft.readers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

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
  * only when no reader-gating feature is active — deletion vectors,
  * column mapping, and `readerFeatures` beyond timestampNtz refuse
  * loudly (misreading any of them silently resurrects deleted rows or
  * misnames columns). Time travel: `versionAsOf` replays the log only
  * through the pinned commit (and skips a later checkpoint — checkpoint
  * state can't be rolled back). With the connector jar present the
  * gated `spark_delta` FormatReader outranks this reader in the
  * registry.
  *
  * Scale shape: the driver replays only log metadata (JSON lines and a
  * checkpoint read that projects just `add`/`remove`/`metaData`); data
  * files never pass through the driver and the parquet scan keeps
  * pushdown/pruning.
  */
object DeltaReader {

  private case class FileEntry(path: String, partitionValues: Map[String, Option[String]])

  /** Read the latest version, or a pinned one (time travel — the
    * reference's `scan_delta(version=N)`). */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Long] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = table.stripSuffix("/") + "/_delta_log"
    val f = FileSystem.get(new URI(table).resolve("/"), conf)
    require(f.exists(new Path(logDir)), s"not a delta table (no _delta_log): $table")
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
        val files = parts match {
          case None => Seq(f"$logDir/$v%020d.checkpoint.parquet")
          case Some(n) => (1 to n).map(i => f"$logDir/$v%020d.checkpoint.$i%010d.$n%010d.parquet")
        }
        if (versionAsOf.exists(_ < v)) (-1L, Nil) else (v, files)
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
    def partMap(n: JsonNode): Map[String, Option[String]] = {
      import scala.jdk.CollectionConverters._
      Option(n).map(_.properties().asScala.map(e =>
        e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))).toMap)
        .getOrElse(Map.empty)
    }
    def requireNoDv(add: JsonNode, where: String): Unit =
      require(Option(add.get("deletionVector")).forall(_.isNull),
        s"delta: deletion vectors present ($where) — outside the supported profile")

    // 1. checkpoint state (adds are the live set at cpVersion)
    if (cpFiles.nonEmpty) {
      val cp = spark.read.parquet(cpFiles: _*)
      val cols = cp.columns.toSet
      def jsonRows(c: String): Seq[JsonNode] =
        cp.where(col(c).isNotNull)
          .select(org.apache.spark.sql.functions.to_json(col(c)))
          .collect().toSeq.map(r => mapper.readTree(r.getString(0)))
      if (cols.contains("metaData")) jsonRows("metaData").foreach(applyMeta)
      if (cols.contains("protocol")) jsonRows("protocol").foreach(applyProtocol)
      jsonRows("add").foreach { node =>
        requireNoDv(node, "checkpoint")
        val p = node.get("path").asText()
        live(p) = FileEntry(p, partMap(node.get("partitionValues")))
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
        Option(action.get("add")).foreach { add =>
          requireNoDv(add, "commit")
          val path = add.get("path").asText()
          live(path) = FileEntry(path, partMap(add.get("partitionValues")))
        }
        Option(action.get("remove")).foreach(rm => live.remove(rm.get("path").asText()))
      }
    }

    // 3. profile gates
    require(provider == "parquet", s"delta: format provider '$provider' outside the supported profile")
    require(minReader <= 3, s"delta: minReaderVersion $minReader outside the supported profile")
    val gating = readerFeatures.filterNot(Set("timestampNtz", "v2Checkpoint").contains)
    require(minReader < 3 || gating.isEmpty,
      s"delta: reader features ${gating.mkString(",")} outside the supported profile")
    val colMapping = configuration.getOrElse("delta.columnMapping.mode", "none")
    require(colMapping == "none", s"delta: column mapping mode '$colMapping' outside the supported profile")
    require(live.nonEmpty, s"delta: table has no live data files")
    require(schemaJson != null, s"delta: no metaData action found in the log")

    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    def resolve(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8") // paths are URL-encoded in the log
      if (decoded.contains("://") || decoded.startsWith("/")) decoded
      else table.stripSuffix("/") + "/" + decoded
    }

    if (partitionCols.isEmpty)
      spark.read.schema(StructType(schema.fields)).parquet(live.values.map(e => resolve(e.path)).toSeq: _*)
    else {
      // one read per distinct partition tuple, partition values attached
      // as typed literal columns (Delta data files omit them)
      val dataSchema = StructType(schema.fields.filterNot(fl => partitionCols.contains(fl.name)))
      val groups = live.values.toSeq.groupBy(_.partitionValues)
      val frames = groups.toSeq.map { case (pv, entries) =>
        val base = spark.read.schema(dataSchema).parquet(entries.map(e => resolve(e.path)): _*)
        partitionCols.foldLeft(base) { (df, pc) =>
          val dt = schema(pc).dataType
          val value: Column = pv.get(pc).flatten match {
            case Some(s) => lit(s).cast(dt)
            case None    => lit(null).cast(dt)
          }
          df.withColumn(pc, value)
        }
      }
      frames.reduce(_ unionByName _).select(schema.fieldNames.map(col).toSeq: _*)
    }
  }
}

/** Registry wrapper: the connector-gated `spark_delta` FormatReader
  * precedes this in `SparkReaders.all`, so the real connector wins when
  * its jar is present; this native log replay is the always-importable
  * fallback. */
class DeltaReaderImpl extends Reader {
  val name = "delta_native"
  val implementsKinds = Set("delta")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    DeltaReader.read(spark, ref.url, ref.options.get("versionAsOf").map(_.toLong))
}
