package graft.readers

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Native Kafka PRODUCE: record-batch v2 encode + Produce v3 over the
  * wire client, against the fake broker whose server side validates
  * magic/CRC and assigns offsets independently. Round-trips through
  * BOTH the broker's independent decoder and the native batch read;
  * covers partitioner routing (explicit > murmur2(key) > sticky),
  * compression codecs, headers/timestamps, the refusal gates, the
  * v1 batch save path, and the reverse no-connector chain
  * graft-delta stream → graft-kafka sink.
  */
class KafkaWriterSpec extends SparkSpec {
  import KafkaFake._

  private def s2b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def b2s(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)

  test("produce round-trips: broker-side independent decode AND the native read agree; routing matches the contract") {
    import spark.implicits._
    val broker = new FakeBroker("sink", Map(0 -> Nil, 1 -> Nil, 2 -> Nil))
    try {
      val url = s"kafka://127.0.0.1:${broker.port}/sink"
      val df = Seq(
        ("k1", "v-explicit", Some(2)),  // explicit partition wins
        ("k1", "v-keyed-1", None),      // murmur2(k1) % 3
        ("k1", "v-keyed-2", None),      // same partition as above
        (null.asInstanceOf[String], "v-sticky", None) // per-task sticky
      ).toDF("key", "value", "partition")
        .selectExpr("key", "value", "partition")
      KafkaWriter.write(spark, df.coalesce(1), url)
      // the native read sees every record with broker-assigned offsets
      val back = KafkaReader.read(spark, url)
        .selectExpr("cast(value as string) as v", "partition", "offset")
        .as[(String, Int, Long)].collect()
      assert(back.map(_._1).toSet ==
        Set("v-explicit", "v-keyed-1", "v-keyed-2", "v-sticky"))
      val byValue = back.map(r => r._1 -> r._2).toMap
      assert(byValue("v-explicit") == 2)
      val expectKeyed = (KafkaWriter.murmur2(s2b("k1")) & 0x7fffffff) % 3
      assert(byValue("v-keyed-1") == expectKeyed && byValue("v-keyed-2") == expectKeyed)
      // keyed records preserve order within their partition
      val keyed = back.filter(_._1.startsWith("v-keyed")).sortBy(_._3).map(_._1)
      assert(keyed.toSeq == Seq("v-keyed-1", "v-keyed-2"))
      // server-side INDEPENDENT decode (not the reader's decoder)
      val decoded = broker.producedBatches.flatMap { case (p, batch) =>
        decodeBatchIndependent(batch).map(r => (p, b2s(r.value), Option(r.key).map(b2s)))
      }
      assert(decoded.map(_._2).toSet ==
        Set("v-explicit", "v-keyed-1", "v-keyed-2", "v-sticky"))
      assert(decoded.collect { case (_, "v-keyed-1", k) => k }.head.contains("k1"))
      assert(decoded.collect { case (_, "v-sticky", k) => k }.head.isEmpty)
    } finally broker.close()
  }

  test("compression codecs, headers and timestamps survive the wire both ways") {
    import spark.implicits._
    for (codec <- Seq("gzip", "snappy", "lz4", "zstd")) {
      val broker = new FakeBroker(s"c$codec", Map(0 -> Nil))
      try {
        val url = s"kafka://127.0.0.1:${broker.port}/c$codec"
        val ts = new java.sql.Timestamp(1700000123456L)
        val df = Seq(("a", "pay-1"), ("b", "pay-2")).toDF("key", "value")
          .withColumn("headers", org.apache.spark.sql.functions.expr(
            "array(named_struct('key', 'h1', 'value', cast('hv' as binary)))"))
          .withColumn("timestamp", org.apache.spark.sql.functions.lit(ts))
        KafkaWriter.write(spark, df.coalesce(1), url, compression = codec)
        val back = KafkaReader.read(spark, url)
          .selectExpr("cast(key as string) k", "cast(value as string) v",
            "timestamp", "headers")
          .collect()
        assert(back.map(_.getString(1)).toSet == Set("pay-1", "pay-2"), codec)
        assert(back.forall(_.getTimestamp(2).getTime == 1700000123456L), codec)
        val hs = back.head.getSeq[org.apache.spark.sql.Row](3)
        assert(hs.map(h => h.getString(0) -> b2s(h.getAs[Array[Byte]](1))).toSeq ==
          Seq("h1" -> "hv"), codec)
        // the broker's independent decoder agrees after decompressing
        val dec = broker.producedBatches.flatMap(b => decodeBatchIndependent(b._2))
        assert(dec.map(r => b2s(r.value)).toSet == Set("pay-1", "pay-2"), codec)
        assert(dec.forall(_.tsMs == 1700000123456L), codec)
      } finally broker.close()
    }
  }

  test("timestamp column survives spark.sql.datetime.java8API.enabled=true (epoch-millis projection)") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    val broker = new FakeBroker("j8", Map(0 -> Nil))
    try {
      val url = s"kafka://127.0.0.1:${broker.port}/j8"
      val df = Seq(("a", "pay-1")).toDF("key", "value")
        .withColumn("timestamp",
          org.apache.spark.sql.functions.timestamp_millis(
            org.apache.spark.sql.functions.lit(1700000123456L)))
      // pre-fix this threw: java.time.Instant is not java.sql.Timestamp
      KafkaWriter.write(spark, df.coalesce(1), url)
      val dec = broker.producedBatches.flatMap(b => decodeBatchIndependent(b._2))
      assert(dec.map(_.tsMs).toSeq == Seq(1700000123456L))
    } finally {
      broker.close()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.datetime.java8API.enabled", v)
        case None    => spark.conf.unset("spark.sql.datetime.java8API.enabled")
      }
    }
  }

  test("batchMaxRecords bounds each produce request; offsets stay contiguous across batches") {
    import spark.implicits._
    val broker = new FakeBroker("many", Map(0 -> Nil))
    try {
      val url = s"kafka://127.0.0.1:${broker.port}/many"
      val df = (0 until 7).map(i => (s"k$i", s"v$i", 0)).toDF("key", "value", "partition")
      KafkaWriter.write(spark, df.coalesce(1), url, batchMaxRecords = 2)
      assert(broker.producedBatches.size == 4) // 2+2+2+1
      val back = KafkaReader.read(spark, url)
        .selectExpr("offset", "cast(value as string) v")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(back.map(_._1).toSeq == (0L until 7L))
      assert(back.map(_._2).toSet == (0 until 7).map(i => s"v$i").toSet)
    } finally broker.close()
  }

  test("gates: acks=0, missing value, extra columns, unknown partition, overwrite save mode") {
    import spark.implicits._
    val broker = new FakeBroker("gate", Map(0 -> Nil))
    try {
      val url = s"kafka://127.0.0.1:${broker.port}/gate"
      val ok = Seq(("k", "v")).toDF("key", "value")
      val e1 = intercept[Exception](KafkaWriter.write(spark, ok, url, acks = 0))
      assert(e1.getMessage.contains("fire-and-forget"))
      val e2 = intercept[Exception](KafkaWriter.write(spark,
        Seq(("k", "v")).toDF("key", "not_value"), url))
      assert(e2.getMessage.contains("unsupported column"))
      val e3 = intercept[Exception](KafkaWriter.write(spark,
        Seq("k").toDF("key"), url))
      assert(e3.getMessage.contains("'value' column is required"))
      val e4 = intercept[Exception](KafkaWriter.write(spark,
        Seq(("k", "v", 9)).toDF("key", "value", "partition"), url))
      assert(e4.getMessage.contains("targets partition 9") ||
        Option(e4.getCause).exists(_.getMessage.contains("targets partition 9")))
      val e5 = intercept[Exception](ok.write.format("graft-kafka")
        .option("url", url).mode("overwrite").save())
      assert(e5.getMessage.contains("only append"))
    } finally broker.close()
  }

  test("v1 batch save and the reverse no-connector chain: delta table -> graft-delta stream -> graft-kafka sink") {
    import spark.implicits._
    val broker = new FakeBroker("rev", Map(0 -> Nil))
    try {
      val url = s"kafka://127.0.0.1:${broker.port}/rev"
      // batch save path (CreatableRelationProvider fallback)
      Seq(("seed", "batch-saved")).toDF("key", "value")
        .write.format("graft-kafka").option("url", url).mode("append").save()
      assert(KafkaReader.read(spark, url).count() == 1L)
      // the reverse chain: rows written to a Delta table stream out to
      // Kafka with zero connector jars end to end
      val t = Files.createTempDirectory("kwrev").toString
      val ckpt = Files.createTempDirectory("kwrevckpt").toString
      DeltaWriter.write(spark, Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name"), t)
      def pump(): Unit = {
        val q = spark.readStream.format("graft-delta").load(t)
          .selectExpr("cast(id as string) as key", "name as value")
          .writeStream.format("graft-kafka")
          .option("url", url).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      pump()
      DeltaWriter.write(spark, Seq((3L, "gamma")).toDF("id", "name"), t)
      pump()
      val vals = KafkaReader.read(spark, url)
        .selectExpr("cast(value as string) v").as[String].collect().toSet
      assert(vals == Set("batch-saved", "alpha", "beta", "gamma"))
      // the checkpoint resumed: nothing re-produced on the second pump
      assert(KafkaReader.read(spark, url).count() == 4L)
    } finally broker.close()
  }
}
