package graft.output

import graft.datatypes.DataRef
import org.apache.spark.sql.DataFrame

/** Output sinks. Every writer returns a [[DataRef]] descriptor so results
  * re-enter the catalog (the reference's defining output convention —
  * reference intake/readers/output.py:36-118: each sink returns a
  * datatype instance).
  */
object Writers {

  final case class WriteSpec(
      mode: String = "overwrite",
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty
  )

  private def write(df: DataFrame, fmt: String, url: String, kind: String, spec: WriteSpec): DataRef = {
    var w = df.write.format(fmt).mode(spec.mode).options(spec.options)
    if (spec.partitionBy.nonEmpty) w = w.partitionBy(spec.partitionBy: _*)
    w.save(url)
    DataRef(kind, url, spec.options)
  }

  def parquet(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "parquet", url, "parquet", spec)

  def csv(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "csv", url, "csv", spec.copy(options = Map("header" -> "true") ++ spec.options))

  def json(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "json", url, "json", spec)

  def orc(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "orc", url, "orc", spec)

  def avro(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "org.apache.spark.sql.avro.AvroFileFormat", url, "avro", spec)

  def text(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "text", url, "text", spec)

  def xml(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef =
    write(df, "xml", url, "xml", spec.copy(options = Map("rowTag" -> "row") ++ spec.options))

  /** Native Delta table sink (round 11, [[graft.readers.DeltaWriter]]):
    * append/overwrite with atomic commit publishing, partitionValues
    * and footer stats in the log — the written table prunes under the
    * native reader immediately and serves the `graft-delta` streaming
    * source. Returns the `delta` DataRef so results re-enter the
    * catalog through the native Delta read path. */
  def delta(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef = {
    val mode = spec.mode match {
      case "error" | "errorIfExists" => "errorifexists"
      case m => m
    }
    graft.readers.DeltaWriter.write(df.sparkSession, df, url,
      mode = mode, partitionBy = spec.partitionBy,
      mergeSchema = spec.options.get("mergeSchema").exists(_.equalsIgnoreCase("true")),
      replaceWhere = spec.options.get("replaceWhere"),
      overwriteSchema = spec.options.get("overwriteSchema").exists(_.equalsIgnoreCase("true")))
    DataRef("delta", url, spec.options)
  }

  /** Native Iceberg table sink ([[graft.readers.IcebergWriter]] —
    * append/overwrite, unpartitioned or identity-partitioned on
    * int/long/string/date columns; other transforms/types refuse
    * naming the connector). Returns the `iceberg` DataRef. */
  def iceberg(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef = {
    val mode = spec.mode match {
      case "error" | "errorIfExists" => "errorifexists"
      case m => m
    }
    graft.readers.IcebergWriter.write(df.sparkSession, df, url, mode = mode,
      partitionBy = spec.partitionBy,
      mergeSchema = spec.options.get("mergeSchema").exists(_.equalsIgnoreCase("true")),
      replaceWhere = spec.options.get("replaceWhere"))
    DataRef("iceberg", url, spec.options)
  }

  /** Native Kafka topic sink (round 12, [[graft.readers.KafkaWriter]] —
    * Produce v3 over the wire client, NO connector jar): `value`
    * required, `key`/`partition`/`headers`/`timestamp` optional,
    * at-least-once with acks=all. Options pass through
    * (`compression`, `acks`, `batch_max_records`, `security_protocol`/
    * `sasl_*`). Returns the `kafka_topic` DataRef so the produced topic
    * re-enters the catalog through the native Kafka read path. */
  def kafka(df: DataFrame, url: String, spec: WriteSpec = WriteSpec()): DataRef = {
    graft.readers.KafkaWriter.writeWithOptions(df.sparkSession, df,
      spec.options + ("url" -> url))
    DataRef("kafka_topic", url, spec.options)
  }

  /** Save as a managed table; descriptor url is the table identifier. */
  def table(df: DataFrame, name: String, spec: WriteSpec = WriteSpec()): DataRef = {
    var w = df.write.mode(spec.mode).options(spec.options)
    if (spec.partitionBy.nonEmpty) w = w.partitionBy(spec.partitionBy: _*)
    w.saveAsTable(name)
    DataRef("table", name, spec.options)
  }

  /** Bucketed managed table: co-locates both sides of future equi-joins
    * on the bucket key, so repeated joins on that key skip the shuffle
    * entirely (bucket pruning + sorted merge within buckets). The
    * pre-partitioning half of the reference's missing scale story.
    */
  /** Newline-delimited GeoJSON features (the GeoJSONSeq layout fiona
    * writes; reference output.py:163 GeopandasToFile). Input is the
    * shared feature frame — a `geometry_json` column plus property
    * columns — and each task writes its own partition's lines, so the
    * sink scales with the data.
    */
  def geojsonSeq(
      df: DataFrame,
      url: String,
      geometryCol: String = "geometry_json",
      spec: WriteSpec = WriteSpec()
  ): DataRef = {
    import org.apache.spark.sql.functions._
    val props = df.columns.filterNot(c => c == geometryCol || c == "geometry_type").toSeq
    val feature = concat(
      lit("""{"type":"Feature","geometry":"""),
      col(geometryCol),
      lit(""","properties":"""),
      if (props.isEmpty) lit("{}") else to_json(struct(props.map(col): _*)),
      lit("}"))
    df.select(feature.as("value")).write.mode(spec.mode).options(spec.options).text(url)
    DataRef("geojsonseq", url, spec.options)
  }

  def bucketedTable(
      df: DataFrame,
      name: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil,
      spec: WriteSpec = WriteSpec()
  ): DataRef = {
    var w = df.write.mode(spec.mode).options(spec.options)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(name)
    DataRef("table", name, spec.options ++ Map("buckets" -> nBuckets.toString, "bucket_cols" -> bucketCols.mkString(",")))
  }
}
