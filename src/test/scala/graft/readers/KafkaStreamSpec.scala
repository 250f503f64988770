package graft.readers

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** E2E spec for the native Kafka MICRO-BATCH streaming source against
  * the shared loopback fake broker: offsets checkpoint and resume,
  * appended batches arrive in later triggers, admission control rates
  * micro-batches, SASL authenticates stream connections, and partition
  * growth reassigns new partitions from earliest (lost partitions
  * refuse).
  */
class KafkaStreamSpec extends SparkSpec {

  import KafkaFake._

  private def k(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def twoPartLogs: Map[Int, Seq[(Long, Long, Array[Byte])]] = Map(
    0 -> Seq(
      (0L, 2L, encodeBatch(0L, 1000L, Seq(
        (k("k0"), k("v0"), Nil), (k("k1"), k("v1"), Nil), (k("k2"), k("v2"), Nil))))),
    1 -> Seq(
      (0L, 1L, encodeBatch(0L, 3000L, Seq(
        (k("a0"), k("b0"), Nil), (k("a1"), k("b1"), Nil)), codec = 3))))

  test("micro-batches stream the topic; appended batches arrive in later triggers") {
    val broker = new FakeBroker("events", twoPartLogs)
    try {
      val stream = spark.readStream.format("graft-kafka")
        .option("url", s"kafka://127.0.0.1:${broker.port}/events")
        .load()
      assert(stream.isStreaming)
      assert(stream.schema == KafkaReader.schema)
      val q = stream.writeStream.format("memory").queryName("ks_mem")
        .trigger(Trigger.ProcessingTime(50)).start()
      try {
        q.processAllAvailable()
        def got(): Seq[(Int, Long, String)] =
          spark.sql("SELECT partition, offset, cast(value as string) FROM ks_mem")
            .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
            .sortBy(t => (t._1, t._2)).toSeq
        assert(got() == Seq((0, 0L, "v0"), (0, 1L, "v1"), (0, 2L, "v2"),
          (1, 0L, "b0"), (1, 1L, "b1")))
        // header/timestamp columns ride through the streaming decode too
        val ts = spark.sql("SELECT timestamp FROM ks_mem WHERE partition = 0 AND offset = 1")
          .collect().head.getTimestamp(0)
        assert(ts.getTime == 1001L)
        // a batch landing AFTER the stream started arrives incrementally
        broker.append(0, (3L, 4L, encodeBatch(3L, 2000L, Seq(
          (k("k3"), k("v3"), Nil), (k("k4"), k("v4"), Nil)))))
        q.processAllAvailable()
        assert(got().size == 7)
        assert(got().filter(_._1 == 0).map(_._3) == Seq("v0", "v1", "v2", "v3", "v4"))
      } finally q.stop()
    } finally broker.close()
  }

  test("a checkpointed query restarts from its committed offsets, not from the beginning") {
    val broker = new FakeBroker("events", twoPartLogs)
    val ckpt = Files.createTempDirectory("ksckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]() // (batchId, partition, offset)
    def run(): Unit = {
      val q = spark.readStream.format("graft-kafka")
        .option("url", s"kafka://127.0.0.1:${broker.port}/events")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.select("partition", "offset").collect()
            .foreach(r => seen.synchronized { seen += ((id, r.getInt(0), r.getLong(1))) })
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      run()
      val first = seen.toSeq
      assert(first.map(t => (t._2, t._3)).sorted ==
        Seq((0, 0L), (0, 1L), (0, 2L), (1, 0L), (1, 1L)))
      // new data lands while the query is DOWN; the restart must
      // deliver exactly the new offsets (the checkpoint carries the
      // committed per-partition positions through deserializeOffset)
      broker.append(1, (2L, 3L, encodeBatch(2L, 4000L, Seq(
        (k("a2"), k("b2"), Nil), (k("a3"), k("b3"), Nil)))))
      seen.clear()
      run()
      assert(seen.toSeq.map(t => (t._2, t._3)).sorted == Seq((1, 2L), (1, 3L)))
    } finally broker.close()
  }

  test("max_offsets_per_trigger rates the stream into multiple micro-batches without losing rows") {
    val broker = new FakeBroker("events", twoPartLogs) // 5 records, 2 partitions
    try {
      val batches = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.format("graft-kafka")
        .option("url", s"kafka://127.0.0.1:${broker.port}/events")
        .option("max_offsets_per_trigger", "2")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized { batches += df.count() }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // soft proportional cap: every batch is bounded (≥1 per lagging
      // partition, so ≤ partitions at minimum), totals add up exactly
      assert(batches.sum == 5L, batches.toSeq.toString)
      assert(batches.count(_ > 0) >= 2, s"admission control must split: $batches")
      assert(batches.forall(_ <= 3L), s"batches exceed the soft cap: $batches")
    } finally broker.close()
  }

  test("SASL SCRAM authenticates stream connections; partition growth reassigns from earliest") {
    val broker = new FakeBroker("events", twoPartLogs,
      saslMechanisms = Seq("SCRAM-SHA-256"), users = Map("alice" -> "pw1"))
    try {
      val q = spark.readStream.format("graft-kafka")
        .option("url", s"kafka://127.0.0.1:${broker.port}/events")
        .option("security_protocol", "SASL_PLAINTEXT")
        .option("sasl_mechanism", "SCRAM-SHA-256")
        .option("sasl_username", "alice").option("sasl_password", "pw1")
        .load()
        .writeStream.format("memory").queryName("ks_sasl").start()
      try {
        q.processAllAvailable()
        assert(spark.table("ks_sasl").count() == 5L)
        // a NEW partition appearing under the running stream joins at
        // its earliest offset on the next trigger — its records arrive
        // alongside the continuing partitions' (round 12; previously a
        // loud refusal)
        broker.append(2, (0L, 0L, encodeBatch(0L, 5000L, Seq((k("x"), k("y"), Nil)))))
        broker.append(0, (3L, 3L, encodeBatch(3L, 2000L, Seq((k("k3"), k("v3"), Nil)))))
        q.processAllAvailable()
        val got = spark.sql("SELECT partition, offset, cast(value as string) FROM ks_sasl")
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
        assert(got.contains((2, 0L, "y")), s"new partition's record missing: $got")
        assert(got.contains((0, 3L, "v3")))
        assert(got.size == 7)
      } finally q.stop()
    } finally broker.close()
  }

  test("growth REGISTERS the new partition's earliest in the committed offsets — never re-resolved at plan") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val broker = new FakeBroker("reg", Map(
      0 -> Seq((0L, 0L, encodeBatch(0L, 1000L, Seq((k("k0"), k("v0"), Nil)))))))
    try {
      val src = new KafkaMicroBatchStream(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("url" -> s"kafka://127.0.0.1:${broker.port}/reg").asJava))
      // partition 1 appears with its log already starting at offset 2
      // (batches below it expired before discovery)
      broker.append(1, (2L, 2L, encodeBatch(2L, 2000L, Seq((k("a2"), k("b2"), Nil)))))
      broker.append(1, (3L, 3L, encodeBatch(3L, 2100L, Seq((k("a3"), k("b3"), Nil)))))
      val start = KafkaSourceOffset(Map(0 -> 1L))
      val end = src.latestOffset(start, ReadLimit.allAvailable())
        .asInstanceOf[KafkaSourceOffset].partitionOffsets
      // the discovery batch registers p1 at its resolved EARLIEST (2),
      // consuming nothing — the start lands in the committed offset map
      assert(end == Map(0 -> 1L, 1 -> 2L), s"register-only discovery, got $end")
      assert(src.planInputPartitions(start, KafkaSourceOffset(end)).isEmpty,
        "the discovery batch must deliver nothing from the new partition")
      // the next batch consumes exactly [registered, latest)
      val end2 = src.latestOffset(KafkaSourceOffset(end), ReadLimit.allAvailable())
        .asInstanceOf[KafkaSourceOffset].partitionOffsets
      assert(end2 == Map(0 -> 1L, 1 -> 4L))
      val slices = src.planInputPartitions(KafkaSourceOffset(end), KafkaSourceOffset(end2))
        .map(_.asInstanceOf[KafkaStreamPartition])
      assert(slices.toSeq.map(p => (p.partition, p.start, p.end)) == Seq((1, 2L, 4L)))
      // retention advancing past the REGISTERED start refuses loudly at
      // fetch (OFFSET_OUT_OF_RANGE) instead of silently re-resolving a
      // later start and skipping records — the failOnDataLoss stance
      broker.trim(1, 3L)
      val c = KafkaReader.connect("127.0.0.1", broker.port, 15000, "spec", KafkaReader.Security())
      val e = intercept[Exception] {
        try KafkaReader.recordIterator(c, "reg", 1, 2L, 4L).toList finally c.close()
      }
      assert(e.getMessage.contains("OFFSET_OUT_OF_RANGE"), e.getMessage)
    } finally broker.close()
  }

  test("partition growth across a RESTART stays checkpoint-compatible; lost partitions refuse") {
    val broker = new FakeBroker("grow", Map(
      0 -> Seq((0L, 1L, encodeBatch(0L, 1000L, Seq((k("k0"), k("v0"), Nil), (k("k1"), k("v1"), Nil)))))))
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("ksgrow").toString
      val seen = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
      def run(): Unit = {
        val q = spark.readStream.format("graft-kafka")
          .option("url", s"kafka://127.0.0.1:${broker.port}/grow")
          .load()
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.selectExpr("partition", "offset", "cast(value as string)").collect()
              .foreach(r => seen.synchronized {
                seen += ((r.getInt(0), r.getLong(1), r.getString(2))) })
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      assert(seen.sortBy(t => (t._1, t._2)).toSeq ==
        Seq((0, 0L, "v0"), (0, 1L, "v1")))
      // the topic grows between runs: the restarted query's committed
      // offset map lacks partition 1 — it must join at earliest, and
      // already-committed partition-0 rows must not re-emit
      broker.append(1, (0L, 1L, encodeBatch(0L, 2000L, Seq((k("a0"), k("b0"), Nil), (k("a1"), k("b1"), Nil)))))
      seen.clear()
      run()
      assert(seen.sortBy(t => (t._1, t._2)).toSeq ==
        Seq((1, 0L, "b0"), (1, 1L, "b1")))
      // no duplicates on a further no-op run
      seen.clear()
      run()
      assert(seen.isEmpty)
    } finally broker.close()
  }
}
