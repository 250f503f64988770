package graft.streaming

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.readers.{DeltaReader, DeltaWriter, KafkaFake}
import org.apache.spark.sql.functions._

/** The documented end-to-end DAY-2 pipeline (round 20 handoff): a
  * Kafka topic of documents → the native `graft-kafka` micro-batch
  * source → exactly-once incremental dedup against a persisted Delta
  * signature index ([[StreamOps.incrementalDedupStreamDelta]]) → both
  * outputs read back through the native Delta reader. Every piece is
  * zero-connector: the wire-protocol Kafka client, the foreachBatch
  * probe, the from-scratch Delta writer with txn markers, the
  * from-scratch Delta log reader. This is QuickStart §"day-2
  * ingestion" as a running spec.
  */
class DayTwoPipelineSpec extends SparkSpec {
  import spark.implicits._
  import KafkaFake._

  private def rec(id: Long, text: String): (Array[Byte], Array[Byte], Seq[(String, Array[Byte])]) =
    (id.toString.getBytes(StandardCharsets.UTF_8),
      text.getBytes(StandardCharsets.UTF_8), Nil)

  test("Kafka topic -> incremental dedup -> Delta with txn -> native read, exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_day2").toFile
    val idxPath = new java.io.File(dir, "idx").getAbsolutePath
    val outPath = new java.io.File(dir, "out").getAbsolutePath
    val ckPath = new java.io.File(dir, "ck").getAbsolutePath
    // day 1: the historical corpus's signature index, as a Delta table
    // with an adopted recipe
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    DeltaWriter.write(spark,
      graft.ops.Dedup.withMinhashSignature(history, "text", "sig", shingleN = 3, k = 64)
        .select(col("doc_id"), col("sig")),
      idxPath)
    graft.ops.Dedup.adoptSignatureIndexRecipe(idxPath,
      graft.ops.Dedup.SignatureIndexRecipe("doc_id", 3, 64, 42L))

    // day 2: documents arrive on a Kafka topic (loopback fake broker,
    // served over the real wire protocol)
    val batch1 = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa", // dup of history
      11L -> "unique content about lakehouse table formats and manifests",
      12L -> "shared boilerplate sentence repeated across this increment x",
      13L -> "shared boilerplate sentence repeated across this increment x") // in-batch dup
    val broker = new FakeBroker("docs", Map(
      0 -> Seq((0L, batch1.size - 1L,
        encodeBatch(0L, 1000L, batch1.map { case (i, t) => rec(i, t) })))))
    try {
      def runStream(): Unit = {
        val docs = StreamOps.kafkaSource(spark, s"127.0.0.1:${broker.port}", "docs")
          .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
        val q = StreamOps.incrementalDedupStreamDelta(docs, "doc_id", "text",
          idxPath, outPath, ckPath, shingleN = 3, k = 64, bands = 16, threshold = 0.8)
        q.processAllAvailable()
        q.stop()
      }
      runStream()
      def ids(path: String): Set[Long] =
        DeltaReader.read(spark, path).select("doc_id").as[Long].collect().toSet
      assert(ids(outPath) == Set(11L, 12L),
        "history dup 10 and in-batch dup 13 must drop; survivors land in Delta")
      assert(ids(idxPath) == Set(1L, 11L, 12L, 13L),
        "the index advances with every history-probe survivor")

      // more records land on the topic; the RESUMED stream (same
      // checkpoint) dedupes against the advanced index
      broker.append(0, (4L, 5L, encodeBatch(4L, 2000L, Seq(
        rec(20L, "unique content about lakehouse table formats and manifests"), // dup of survivor 11
        rec(21L, "fresh material never seen in any earlier batch of the stream")))))
      runStream()
      assert(ids(outPath) == Set(11L, 12L, 21L))
      assert(ids(idxPath) == Set(1L, 11L, 12L, 13L, 21L))

      // exactly-once: re-running the whole topic under a FRESH
      // checkpoint (new appId) replays every record — all of it
      // self-matches the advanced index, and the output is bit-stable
      val outRows = DeltaReader.read(spark, outPath).count()
      val ck2 = new java.io.File(dir, "ck_replay").getAbsolutePath
      val docs2 = StreamOps.kafkaSource(spark, s"127.0.0.1:${broker.port}", "docs")
        .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
      val q2 = StreamOps.incrementalDedupStreamDelta(docs2, "doc_id", "text",
        idxPath, outPath, ck2, shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      q2.processAllAvailable()
      q2.stop()
      assert(DeltaReader.read(spark, outPath).count() == outRows,
        "a full-topic replay against the advanced index lands ZERO new output rows")
    } finally {
      broker.close()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
