package graft.ops

import graft.inspect.HeaderParsers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns
  * with typed, executor-side metadata extraction.
  *
  * Ingestion is `binaryFile` (path, modificationTime, length, content) —
  * the binary payload stays distributed; nothing is collected to the
  * driver. Header-level metadata (dimensions, sample rate, duration) is
  * parsed with real pure-JVM parsers ([[graft.inspect.HeaderParsers]]);
  * full pixel/sample DECODE is deliberately stubbed (no codec libraries
  * in this environment) behind [[decodeImageStub]] with the real schema,
  * partitioning and batch shape in place — swap the stub body for an
  * actual codec (or a Pandas-UDF equivalent) to productionize.
  */
object Multimodal {

  /** Read a directory/glob of binary files as (path, length, content). */
  def readBinary(spark: SparkSession, url: String, globFilter: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .load(url)
      .select(col("path"), col("length"), col("content"))

  private val imageMetaUdf = udf { (content: Array[Byte]) =>
    if (content == null) None
    else
      HeaderParsers.pngDims(content).map { case (w, h) => ("png", w, h) }
        .orElse(HeaderParsers.jpegDims(content).map { case (w, h) => ("jpeg", w, h) })
  }

  /** Attach (format, width, height) parsed from image headers. */
  def withImageMeta(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("image_meta", imageMetaUdf(col(contentCol)))
      .withColumn("img_format", col("image_meta._1"))
      .withColumn("width", col("image_meta._2"))
      .withColumn("height", col("image_meta._3"))
      .drop("image_meta")

  private val wavMetaUdf = udf { (content: Array[Byte]) =>
    if (content == null) None
    else HeaderParsers.wavInfo(content).map { m =>
      (m("channels").asInstanceOf[Int], m("sample_rate").asInstanceOf[Int],
        m("duration_sec").asInstanceOf[Double])
    }
  }

  /** Attach (channels, sample_rate, duration_sec) parsed from WAV headers. */
  def withAudioMeta(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("audio_meta", wavMetaUdf(col(contentCol)))
      .withColumn("channels", col("audio_meta._1"))
      .withColumn("sample_rate", col("audio_meta._2"))
      .withColumn("duration_sec", col("audio_meta._3"))
      .drop("audio_meta")

  /** STUB pixel decode: deterministic fake features standing in for a real
    * codec — content-hash-seeded so results are stable for tests. The
    * Spark plumbing (schema `array<float>`, per-row UDF over the binary
    * column, no driver materialisation) is the real production shape.
    */
  private val decodeStub = udf { (content: Array[Byte], dim: Int) =>
    if (content == null) null
    else {
      // ??? real codec goes here; deterministic fake keeps plumbing testable
      val seed = java.util.Arrays.hashCode(content).toLong
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat())
    }
  }

  /** Decode + "feature-extract" images into fixed-size float vectors
    * (stubbed decode, see [[decodeStub]]). Output schema matches the
    * embeddings table (`array<float>`), so downstream similarity ops
    * compose directly.
    */
  def imageFeatures(df: DataFrame, dim: Int = 64, contentCol: String = "content"): DataFrame =
    df.withColumn("features", decodeStub(col(contentCol), lit(dim)))

  /** Frame-sample stub: emit `n` (frame_index, features) rows per video
    * binary — the explode pattern a real frame sampler would use.
    */
  def sampleFrames(df: DataFrame, n: Int, dim: Int = 64, contentCol: String = "content"): DataFrame =
    df.withColumn("frame_index", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("features", decodeStub(concat(col(contentCol), col("frame_index").cast("string").cast("binary")), lit(dim)))
}
