package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2b Streaming row): windowed
  * aggregations, session windows, watermarked dedup. Every transform here
  * works identically on a static DataFrame and a streaming one — that
  * batch/stream equivalence is the test strategy (SURVEY §5 item 5): the
  * same plan runs over the static events table and over a MemoryStream
  * fed the same rows.
  *
  * The reference only *describes* stream sources (KafkaTopic datatype,
  * reference intake/readers/datatypes.py:1639; batch Kafka consumer
  * readers.py:3192) and delegates processing; here the processing surface
  * is native.
  */
object StreamOps {

  /** Tumbling (or, with `slide`, sliding/hopping) window aggregation.
    * On a stream, prepend [[withWatermark]] so state can be evicted —
    * unbounded window state is the classic 100 TB streaming failure.
    */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      aggs: Seq[Column],
      keys: Seq[String] = Nil,
      slide: Option[String] = None
  ): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None    => window(col(tsCol), windowLen)
    }
    df.groupBy(win +: keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Gap-based session window aggregation (native `session_window`).
    * Batch equivalent of [[graft.ops.Relational.sessionize]] follow-up
    * aggregation, but with streaming state + watermark support.
    */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      gap: String,
      aggs: Seq[Column],
      keys: Seq[String]
  ): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Watermarked streaming dedup: drop re-deliveries of the same key
    * within the watermark horizon. On a static frame `withWatermark` is a
    * no-op and this degenerates to dropDuplicates.
    */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String, keyCols: Seq[String]): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    wm.dropDuplicates(keyCols :+ tsCol)
  }

  def withWatermark(df: DataFrame, tsCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df
}
