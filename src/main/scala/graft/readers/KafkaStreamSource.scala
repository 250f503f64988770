package graft.readers

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Native Kafka MICRO-BATCH streaming source over the round-9 wire
  * client — `spark.readStream.format("graft-kafka").option("url",
  * "kafka://broker:port/topic")` with NO connector jar (the
  * classpath-gated spark-sql-kafka source still wins when its jar is
  * present; this closes the "streaming side is connector-only" gap the
  * batch reader left). DataSource V2 `MicroBatchStream` with
  * `SupportsAdmissionControl`:
  *
  *  - offsets are per-partition next-fetch positions, serialized as a
  *    plain JSON object (`{"0": 5, "1": 3}`) in the checkpoint — a
  *    restarted query resumes exactly where it committed;
  *  - `initialOffset` resolves the `start_offset` option per partition
  *    on the partition LEADERS (earliest | latest | ts:<epoch-millis>,
  *    the batch reader's grammar); `latestOffset` reads each log end;
  *  - `max_offsets_per_trigger` rates micro-batches: the backlog is
  *    allocated proportionally across lagging partitions (every
  *    lagging partition advances by at least one offset, so progress
  *    is monotone even with many partitions) — a soft total cap, the
  *    same contract as the connector's maxOffsetsPerTrigger;
  *  - each planned partition slice fetches ON ITS EXECUTOR from its
  *    own leader through [[KafkaReader.recordIterator]] — the shared
  *    lazy fetch loop, so CRC/stall/err semantics cannot drift from
  *    the batch path; TLS/SASL (`security_protocol`/`sasl_*` options,
  *    PLAIN/SCRAM/OAUTHBEARER) authenticate every connection;
  *  - a topic GROWING partitions under a running query reassigns at
  *    the next trigger: the new partitions join at their EARLIEST
  *    offset (the connector's stance — records written since creation
  *    are never skipped) and the committed offset map simply carries
  *    the extra keys; a topic LOSING partitions (deleted/recreated)
  *    refuses loudly;
  *  - expired data under the reader (OFFSET_OUT_OF_RANGE) fails the
  *    batch loudly — the failOnDataLoss=true stance, the only honest
  *    one for an engine that cannot know what vanished.
  */
class KafkaStreamProvider extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KafkaReader.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaStreamTable(new CaseInsensitiveStringMap(properties))

  /** Streaming SINK over the native producer ([[KafkaWriter]]) — the
    * table above carries no STREAMING_WRITE capability, so Spark falls
    * back to this v1 sink for `writeStream.format("graft-kafka")`.
    * AT-LEAST-ONCE like the connector's sink (a retried micro-batch
    * re-produces; Kafka-side dedup needs broker transactions, which
    * stay with the connector jar). All output modes are accepted — the
    * rows handed to addBatch are produced as-is, the connector's own
    * stance. */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink =
    new KafkaStreamSink(sqlContext.sparkSession, parameters)

  /** Batch `df.write.format("graft-kafka").option("url", ...).save()`.
    * A topic only appends: Overwrite/Ignore modes refuse loudly. */
  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode, parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    require(mode == SaveMode.Append || mode == SaveMode.ErrorIfExists,
      s"graft-kafka: save mode $mode is meaningless for a topic (records only append); " +
        "use Append")
    KafkaWriter.writeWithOptions(sqlContext.sparkSession, data, parameters)
    val ctx = sqlContext
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }
}

private[readers] class KafkaStreamSink(spark: org.apache.spark.sql.SparkSession,
    parameters: Map[String, String]) extends Sink {
  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit =
    KafkaWriter.writeWithOptions(spark,
      org.apache.spark.sql.graft.bridge.batchFrame(data), parameters)
  override def toString: String = s"KafkaStreamSink[${parameters.getOrElse("url", "?")}]"
}

private class KafkaStreamTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-kafka:${options.get("url")}"
  override def schema(): StructType = KafkaReader.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = KafkaReader.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KafkaMicroBatchStream(opts)
    }
  }
}

private[readers] case class KafkaSourceOffset(partitionOffsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    partitionOffsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[readers] class KafkaMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val url = Option(options.get("url")).getOrElse(
    throw new IllegalArgumentException("graft-kafka: option 'url' (kafka://broker:port/topic) is required"))
  private val uri = new URI(url)
  require(uri.getScheme == "kafka", s"not a kafka url: $url")
  private val host = uri.getHost
  private val port = if (uri.getPort > 0) uri.getPort else 9092
  private val topic = Option(uri.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
    .getOrElse(throw new IllegalArgumentException(s"no topic in kafka url $url"))
  private val startSpec = Option(options.get("start_offset")).getOrElse("earliest")
  private val maxPerTrigger = Option(options.get("max_offsets_per_trigger")).map(_.toLong)
  private val timeoutMs = Option(options.get("timeout_ms")).map(_.toInt).getOrElse(15000)
  private val clientId = Option(options.get("client_id")).getOrElse("graft-kafka-stream")
  private val security = KafkaReader.Security(
    protocol = Option(options.get("security_protocol")).getOrElse("PLAINTEXT"),
    mechanism = Option(options.get("sasl_mechanism")).getOrElse("PLAIN"),
    username = options.get("sasl_username"),
    password = options.get("sasl_password"),
    token = options.get("sasl_token"))

  private def withLeaders[T](f: (Map[Int, KafkaReader.BrokerNode], Seq[KafkaReader.PartMeta]) => T): T = {
    val boot = KafkaReader.connect(host, port, timeoutMs, clientId, security)
    try {
      val versions = KafkaReader.apiVersions(boot)
      def supported(key: Short, v: Short): Boolean =
        versions.get(key).exists { case (lo, hi) => lo <= v && v <= hi }
      require(supported(1, 4) && supported(2, 1) && (supported(3, 1) || supported(3, 4)),
        s"kafka: broker at $host:$port does not serve Fetch v4 / ListOffsets v1 / " +
          "Metadata v1-v4 — outside this native reader's profile; use the " +
          "spark-sql-kafka connector jar")
      val mdV: Short = if (supported(3, 4)) 4 else 1
      val (brokers, parts) = KafkaReader.metadata(boot, topic, mdV)
      require(parts.nonEmpty, s"kafka: topic '$topic' has no partitions")
      f(brokers, parts)
    } finally boot.close()
  }

  /** One value per partition via its LEADER (ListOffsets must be served
    * by the leader): earliest | latest | ts:<epoch-millis> | numeric. */
  private def offsetsAt(spec: String): Map[Int, Long] =
    withLeaders { (brokers, parts) =>
      parts.groupBy(_.leader).toSeq.flatMap { case (leaderId, ps) =>
        val node = brokers.getOrElse(leaderId, throw new IllegalArgumentException(
          s"kafka: leader $leaderId not in broker metadata"))
        val c = KafkaReader.connect(node.host, node.port, timeoutMs, clientId, security)
        try ps.map { pm =>
          val got = spec match {
            case "earliest" => KafkaReader.listOffset(c, topic, pm.partition, -2L)
            case "latest"   => KafkaReader.listOffset(c, topic, pm.partition, -1L)
            case ts if ts.startsWith("ts:") =>
              val v = KafkaReader.listOffset(c, topic, pm.partition, ts.stripPrefix("ts:").toLong)
              if (v < 0) KafkaReader.listOffset(c, topic, pm.partition, -1L) else v
            case n => n.toLong
          }
          pm.partition -> got
        } finally c.close()
      }.toMap
    }

  // Trigger.AvailableNow: Spark only honors admission control across
  // the catch-up when the source DECLARES available-now support — the
  // fallback wrapper captures one end offset and serves it in a single
  // unbounded batch. We capture the bound here and cap every
  // latestOffset() against it, so the catch-up rates into
  // max_offsets_per_trigger-sized micro-batches and stops exactly at
  // the captured log ends.
  private var availableNowBound: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(offsetsAt("latest"))

  override def initialOffset(): Offset = KafkaSourceOffset(offsetsAt(startSpec))

  override def deserializeOffset(json: String): Offset = {
    val node = new ObjectMapper().readTree(json)
    KafkaSourceOffset(node.properties().asScala
      .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = KafkaSourceOffset(offsetsAt("latest"))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[KafkaSourceOffset].partitionOffsets
    val endsNow = offsetsAt("latest")
    val ends = availableNowBound.fold(endsNow)(b =>
      endsNow.map { case (p, e) => p -> math.min(e, b.getOrElse(p, e)) })
    // partition SHRINK means the topic was deleted/recreated — offsets
    // are meaningless against the new incarnation, refuse. GROWTH
    // (repartitioned topic): the new partitions must join at their
    // EARLIEST offset (records written since creation must not be
    // skipped) — and that start must be CHECKPOINTED, not re-resolved:
    // the discovery batch REGISTERS each new partition by ending it at
    // the earliest offset resolved HERE (consuming nothing from it),
    // so the next batch's committed start map carries exactly that
    // value. A replayed or retention-raced batch then delivers the
    // identical slice, and a start the broker has since expired fails
    // loudly in the fetch (OFFSET_OUT_OF_RANGE) — the
    // failOnDataLoss=true stance. Re-resolving earliest at plan time
    // instead could silently skip records the first resolution saw.
    val removed = startMap.keySet -- ends.keySet
    require(removed.isEmpty,
      s"kafka: topic '$topic' lost partition(s) ${removed.toSeq.sorted.mkString(",")} " +
        "under the stream (deleted/recreated topic) — restart the query to re-baseline")
    val added = ends.keySet -- startMap.keySet
    val registered: Map[Int, Long] =
      if (added.isEmpty) Map.empty
      else {
        val earliest = offsetsAt("earliest")
        added.map(p => p -> earliest.getOrElse(p, 0L)).toMap
      }
    val startAll = startMap ++ registered
    val endsR = ends ++ registered // new partitions: register-only this batch
    limit match {
      case mr: ReadMaxRows =>
        val backlog = endsR.map { case (p, e) => p -> math.max(0L, e - startAll(p)) }
        val total = backlog.values.sum
        if (total <= mr.maxRows) KafkaSourceOffset(endsR)
        else {
          // proportional soft cap: every lagging partition advances by
          // at least one offset, so the stream cannot starve a
          // partition however skewed the backlog
          val capped = backlog.map { case (p, b) =>
            val alloc = if (b == 0) 0L else math.max(1L, mr.maxRows * b / total)
            p -> (startAll(p) + math.min(b, alloc))
          }
          KafkaSourceOffset(capped)
        }
      case _ => KafkaSourceOffset(endsR)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaSourceOffset].partitionOffsets
    val e = end.asInstanceOf[KafkaSourceOffset].partitionOffsets
    withLeaders { (brokers, parts) =>
      parts.flatMap { pm =>
        def nodeOf = brokers.getOrElse(pm.leader, throw new IllegalArgumentException(
          s"kafka: leader ${pm.leader} not in broker metadata"))
        (s.get(pm.partition), e.get(pm.partition)) match {
          case (Some(lo), Some(hi)) if hi > lo =>
            Some(KafkaStreamPartition(topic, pm.partition, nodeOf.host, nodeOf.port, lo, hi))
          case (None, Some(hi)) =>
            // a partition absent from the committed start map: in the
            // current protocol latestOffset registers new partitions
            // end=earliest, so this resolves to an empty slice in the
            // discovery batch; a non-empty slice here only replays a
            // checkpoint from before the register-only protocol, where
            // best-effort earliest is all the log ever recorded
            val node = nodeOf
            val c = KafkaReader.connect(node.host, node.port, timeoutMs, clientId, security)
            val lo = try KafkaReader.listOffset(c, topic, pm.partition, -2L) finally c.close()
            if (hi > lo) Some(KafkaStreamPartition(topic, pm.partition, node.host, node.port, lo, hi))
            else None
          case _ => None
        }
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaStreamReaderFactory(timeoutMs, clientId, security)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[readers] case class KafkaStreamPartition(topic: String, partition: Int,
    host: String, port: Int, start: Long, end: Long) extends InputPartition

private[readers] class KafkaStreamReaderFactory(timeoutMs: Int, clientId: String,
    security: KafkaReader.Security) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaStreamPartition]
    new PartitionReader[InternalRow] {
      private val conn = KafkaReader.connect(p.host, p.port, timeoutMs, clientId, security)
      private val it = KafkaReader.recordIterator(conn, p.topic, p.partition, p.start, p.end)
      private var cur: KafkaReader.KRecord = _
      private val topicUtf8 = UTF8String.fromString(p.topic)
      override def next(): Boolean = it.hasNext && { cur = it.next(); true }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur.key, cur.value, topicUtf8, p.partition, cur.offset,
        cur.timestamp * 1000L, // TimestampType carries micros
        cur.timestampType,
        new GenericArrayData(cur.headers.map { case (k, v) =>
          InternalRow(UTF8String.fromString(k), v) }.toArray[Any])))
      override def close(): Unit = scala.util.Try(conn.close())
    }
  }
}
