package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream equivalence: the same StreamOps plan over a MemoryStream
  * must produce the same rows as over a static frame with the same data,
  * and the watermark must actually drop late rows (SURVEY §5 item 5).
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 10:01:00"), 1L, 2.0),
    (ts("2024-01-01 10:04:00"), 1L, 3.0),
    (ts("2024-01-01 10:11:00"), 1L, 5.0),
    (ts("2024-01-01 10:02:00"), 2L, 7.0)
  )

  test("tumbling window agg: streaming result equals batch result") {
    val batch = StreamOps.windowedAgg(
      rows.toDF("ts", "user_id", "value"),
      "ts", "10 minutes",
      aggs = Seq(count(lit(1)).as("n"), sum("value").as("sv")),
      keys = Seq("user_id")
    ).select("user_id", "window_start", "n", "sv")

    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    ms.addData(rows: _*)
    val q = StreamOps.windowedAgg(
      ms.toDF().toDF("ts", "user_id", "value"),
      "ts", "10 minutes",
      aggs = Seq(count(lit(1)).as("n"), sum("value").as("sv")),
      keys = Seq("user_id")
    ).select("user_id", "window_start", "n", "sv")
      .writeStream.format("memory").queryName("tumbling_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val b = batch.collect().map(_.toSeq).toSet
    val s = spark.table("tumbling_out").collect().map(_.toSeq).toSet
    assert(b == s)
    assert(b.nonEmpty)
  }

  test("corpus-hygiene projections (PII scrub, token stats, simhash) run on a stream") {
    // The hygiene ops are stateless Column projections, so they compose
    // into streaming pipelines unchanged — the property a 100 TB ingest
    // path relies on (scrub-on-arrival instead of scrub-after-landing).
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    ms.addData(
      (1L, "mail me at a@b.co about the quick brown fox"),
      (2L, "no pii here just words"))
    val q = graft.ops.TextOps.redactPii(col("text"))
    val out = ms.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), q.as("clean"),
        graft.ops.TextOps.tokenCount(col("text")).as("n_tok"),
        graft.ops.Dedup.simhashPortable(col("text")).as("sh"))
      .writeStream.format("memory").queryName("hygiene_out").outputMode("append").start()
    out.processAllAvailable()
    out.stop()
    val rows = spark.table("hygiene_out").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(rows(1L)._1 == "mail me at [PII] about the quick brown fox")
    assert(rows(2L)._1 == "no pii here just words")
    assert(rows(1L)._2 == 9 && rows(2L)._2 == 5)
  }

  test("session window agg groups by gap on stream as in batch") {
    val batch = StreamOps.sessionAgg(
      rows.toDF("ts", "user_id", "value"),
      "ts", "5 minutes",
      aggs = Seq(count(lit(1)).as("n")),
      keys = Seq("user_id")
    ).select("user_id", "n")
    // user 1: events at 10:01/10:04 chain one session; 10:11 starts a new
    // one (gap > 5 min from 10:04+5). user 2: single session.
    val b = batch.as[(Long, Long)].collect().toSeq.sorted
    assert(b == Seq((1L, 1L), (1L, 2L), (2L, 1L)))

    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    ms.addData(rows: _*)
    val q = StreamOps.sessionAgg(
      StreamOps.withWatermark(ms.toDF().toDF("ts", "user_id", "value"), "ts", "1 minute"),
      "ts", "5 minutes",
      aggs = Seq(count(lit(1)).as("n")),
      keys = Seq("user_id")
    ).select("user_id", "n")
      .writeStream.format("memory").queryName("session_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val s = spark.table("session_out").as[(Long, Long)].collect().toSeq.sorted
    assert(s == b)
  }

  test("watermark drops rows later than the horizon") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val agg = StreamOps.windowedAgg(
      StreamOps.withWatermark(ms.toDF().toDF("ts", "user_id", "value"), "ts", "10 minutes"),
      "ts", "10 minutes",
      aggs = Seq(count(lit(1)).as("n")),
      keys = Seq("user_id")
    ).select("user_id", "window_start", "n")
    val q = agg.writeStream.format("memory").queryName("wm_out").outputMode("append").start()

    ms.addData((ts("2024-01-01 10:05:00"), 1L, 1.0))
    q.processAllAvailable()
    // advance event time far enough that the 10:00 window closes
    ms.addData((ts("2024-01-01 11:00:00"), 1L, 1.0))
    q.processAllAvailable()
    // this event is an hour late — behind the watermark — must be dropped
    ms.addData((ts("2024-01-01 10:06:00"), 1L, 99.0))
    q.processAllAvailable()
    // close remaining windows so append emits them
    ms.addData((ts("2024-01-01 12:00:00"), 1L, 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm_out")
      .select(col("window_start").cast("string"), col("n")).as[(String, Long)].collect().toMap
    assert(out("2024-01-01 10:00:00") == 1L) // late row did NOT bump the count
  }

  test("file-source stream over the events parquet matches the batch plan") {
    // copy events.parquet into its own dir (readStream consumes a directory)
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.queries.table(spark, "/root/testdata/sf0.001", "events")
    // mirror graft.queries.table: a NANOS-era events file reads as Long
    // (legacy conf) and converts; a MICROS-era file reads as
    // TIMESTAMP_NTZ and casts to TIMESTAMP — the stream must surface
    // the SAME type as the batch side or the window_start comparison
    // below compares Timestamp against LocalDateTime
    val schema = spark.read.parquet(dir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val streamed =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw.withColumn("ts", col("ts").cast("timestamp"))
    val agg = StreamOps.windowedAgg(streamed, "ts", "1 hour",
      aggs = Seq(count(lit(1)).as("n")), keys = Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("filestream_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val batchAgg = StreamOps.windowedAgg(batch, "ts", "1 hour",
      aggs = Seq(count(lit(1)).as("n")), keys = Seq("event_type"))
      .select("event_type", "window_start", "n").collect().map(_.toSeq).toSet
    val streamAgg = spark.table("filestream_out")
      .select("event_type", "window_start", "n").collect().map(_.toSeq).toSet
    assert(streamAgg == batchAgg)
    assert(streamAgg.nonEmpty)
  }

  test("statefulRunningTotals accumulates per-key state across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val df = ms.toDF().toDF("user_id", "value")
    val q = StreamOps.statefulRunningTotals(df, "user_id", "value")
      .toDF("user_id", "n", "sum")
      .writeStream.format("memory").queryName("state_out").outputMode("update").start()
    ms.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
    q.processAllAvailable()
    ms.addData((1L, 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("state_out").as[(Long, Long, Double)].collect()
    // second batch emits the UPDATED total for key 1: count 3, sum 10
    assert(rows.contains((1L, 3L, 10.0)))
    assert(rows.contains((2L, 1L, 10.0)))
  }

  test("statefulThresholdAlerts emits zero-or-more rows per key (flatMapGroupsWithState)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val df = ms.toDF().toDF("user_id", "value")
    val q = StreamOps.statefulThresholdAlerts(df, "user_id", "value", threshold = 10.0)
      .toDF("user_id", "multiple", "sum_at_crossing")
      .writeStream.format("memory").queryName("alert_out").outputMode("append").start()
    ms.addData((1L, 4.0), (1L, 3.0), (2L, 25.0)) // key 1 at 7 (no alert); key 2 crosses 10 and 20
    q.processAllAvailable()
    ms.addData((1L, 18.0)) // key 1: 7 → 25, crosses 10 and 20
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("alert_out").as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(
      (1L, 1L, 25.0), (1L, 2L, 25.0), (2L, 1L, 25.0), (2L, 2L, 25.0)))
  }

  test("parquet streaming sink with checkpoint is exactly-once across restarts") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val ms = MemoryStream[(Long, Double)]
    ms.addData((1L, 1.0), (2L, 2.0))
    val q1 = StreamOps.toParquetStream(ms.toDF().toDF("id", "v"), out, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // restart from the same checkpoint: previously committed batches are
    // not re-emitted, new data appends
    ms.addData((3L, 3.0))
    val q2 = StreamOps.toParquetStream(ms.toDF().toDF("id", "v"), out, ckpt)
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(out).as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("streaming dedup with watermark removes re-deliveries") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val q = StreamOps.dedupStream(ms.toDF().toDF("ts", "event_id"), "ts", "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    ms.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 2L))
    q.processAllAvailable()
    ms.addData((ts("2024-01-01 10:00:00"), 1L)) // re-delivery in a later batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("dedupWithinWatermark drops a duplicate key even at a different timestamp") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val q = StreamOps.dedupWithinWatermark(ms.toDF().toDF("ts", "doc_hash"), "ts", "10 minutes", Seq("doc_hash"))
      .writeStream.format("memory").queryName("dedup_wm_out").outputMode("append").start()
    // same doc_hash re-arrives one minute later: dedupStream would keep
    // it (different ts); content-keyed dedup must drop it
    ms.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 1L), (ts("2024-01-01 10:01:00"), 2L))
    q.processAllAvailable()
    ms.addData((ts("2024-01-01 10:02:00"), 1L)) // later batch, still within horizon
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_wm_out").count() == 2)
    // static degenerate: plain dropDuplicates on the keys
    import spark.implicits._
    val statics = StreamOps.dedupWithinWatermark(
      Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:05:00"), 1L)).toDF("ts", "doc_hash"),
      "ts", "10 minutes", Seq("doc_hash"))
    assert(statics.count() == 1)
  }

  test("kafka source AND sink fall back to the native wire client (no connector jar)") {
    // this distribution ships without the sql-kafka jar: the SOURCE
    // routes through the native graft-kafka MicroBatchStream (round 11)
    // and the SINK through the native producer (round 12) — both proven
    // E2E against the loopback broker
    assert(!StreamOps.kafkaAvailable)
    import graft.readers.KafkaFake._
    val k = (s: String) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val broker = new FakeBroker("events", Map(
      0 -> Seq((0L, 1L, encodeBatch(0L, 1000L, Seq(
        (k("k0"), k("v0"), Nil), (k("k1"), k("v1"), Nil)))))))
    try {
      val df = StreamOps.kafkaSource(spark, s"127.0.0.1:${broker.port}", "events")
      assert(df.isStreaming)
      val q = df.writeStream.format("memory").queryName("so_kafka_native").start()
      try {
        q.processAllAvailable()
        val rows = spark.table("so_kafka_native").select("key", "value")
          .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
        assert(rows.toSeq == Seq(("k0", "v0"), ("k1", "v1")))
      } finally q.stop()
      // the SINK routes through the native producer: stream a memory
      // source back into the same topic and re-read it off the broker
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String)](spark)
      src.addData(("k9", "v9"))
      val ckpt = java.nio.file.Files.createTempDirectory("sosinkckpt").toString
      val sq = StreamOps.kafkaSink(src.toDF().toDF("key", "value"),
          s"127.0.0.1:${broker.port}", "events", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      sq.awaitTermination()
      val all = graft.readers.KafkaReader.read(spark,
          s"kafka://127.0.0.1:${broker.port}/events")
        .selectExpr("cast(value as string) v").collect().map(_.getString(0)).toSet
      assert(all == Set("v0", "v1", "v9"))
    } finally broker.close()
  }
}
