package graft.readers

import graft.datatypes.DataRef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-oriented scientific/config formats as native Spark reads —
  * the reference's bio readers (readers.py:2455 BioPythonFASTA, :2485
  * PySAMVCF) and config readers (:2011 TOMLReader, :2058 INIReader)
  * re-expressed without external parsers.
  */
object SeqFormatReaders {

  /** FASTA: multi-line records delimited by '>' headers. Reading with
    * lineSep=">" makes each record one row (distributed record split —
    * no driver-side regrouping), then header/sequence split.
    */
  def fasta(spark: SparkSession, url: String): DataFrame = {
    spark.read.option("lineSep", ">").text(url)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "^([^\\n]*)", 1).as("header"),
        regexp_replace(regexp_replace(col("value"), "^[^\\n]*\\n", ""), "\\s+", "").as("sequence")
      )
      .withColumn("seq_id", split(col("header"), "\\s+").getItem(0))
      .withColumn("length", length(col("sequence")))
      .select("seq_id", "header", "sequence", "length")
  }

  /** VCF: tab-separated data lines after '##' meta and one '#CHROM'
    * header; the fixed 8 core columns parsed, the rest kept raw.
    */
  def vcf(spark: SparkSession, url: String): DataFrame = {
    val lines = spark.read.text(url).filter(!col("value").startsWith("#"))
    val parts = split(col("value"), "\\t")
    lines.select(
      parts.getItem(0).as("chrom"),
      parts.getItem(1).cast("long").as("pos"),
      parts.getItem(2).as("id"),
      parts.getItem(3).as("ref"),
      parts.getItem(4).as("alt"),
      when(parts.getItem(5) === ".", null).otherwise(parts.getItem(5)).cast("double").as("qual"),
      parts.getItem(6).as("filter"),
      parts.getItem(7).as("info")
    )
  }

  /** INI: (section, key, value) rows; comments and blanks dropped.
    * Section state needs cross-row order, so each FILE is one record
    * (wholetext) parsed executor-side — config files are small; many
    * files still parallelize per-file.
    */
  def ini(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(url)
      .as[String]
      .flatMap { content =>
        var section = ""
        content.linesIterator.flatMap { raw =>
          val line = raw.trim
          if (line.isEmpty || line.startsWith(";") || line.startsWith("#")) None
          else if (line.startsWith("[") && line.endsWith("]")) {
            section = line.substring(1, line.length - 1).trim
            None
          } else {
            val i = line.indexWhere(c => c == '=' || c == ':')
            if (i > 0) Some((section, line.take(i).trim, line.drop(i + 1).trim)) else None
          }
        }
      }
      .toDF("section", "key", "value")
  }

  /** TOML (flat subset): [table] headers + `key = value` pairs; values
    * keep their literal form (quotes stripped for plain strings).
    */
  def toml(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(url)
      .as[String]
      .flatMap { content =>
        var table = ""
        content.linesIterator.flatMap { raw =>
          val line = raw.trim
          if (line.isEmpty || line.startsWith("#")) None
          else if (line.startsWith("[") && line.endsWith("]")) {
            table = line.substring(1, line.length - 1).trim
            None
          } else {
            val i = line.indexOf('=')
            if (i > 0) {
              val v = line.drop(i + 1).trim.takeWhile(_ != '#').trim
              val clean = if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\"")) v.substring(1, v.length - 1) else v
              Some((table, line.take(i).trim, clean))
            } else None
          }
        }
      }
      .toDF("table", "key", "value")
  }

  /** FASTQ: strict 4-line records (reference readers.py:2476 FASTQ via
    * BioPython). '@' can open a quality line, so records can't split on
    * a delimiter; instead lines get global indices (zipWithIndex — order
    * preserved across partitions) and group by `index / 4`. One shuffle,
    * but the grouping key is the record id so it scales with the file.
    */
  def fastq(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    spark.read.text(url).select(col("value")).as[String].rdd
      .zipWithIndex()
      .map { case (line, idx) => (idx / 4, (idx % 4, line)) }
      .groupByKey()
      .map { case (rec, parts) =>
        val m = parts.toMap
        val header = m.getOrElse(0L, "")
        require(header.startsWith("@"), s"malformed FASTQ record $rec: '$header'")
        val id = header.drop(1).split("\\s+").headOption.getOrElse("")
        (rec, id, m.getOrElse(1L, ""), m.getOrElse(3L, ""))
      }
      .toDF("record", "seq_id", "sequence", "quality")
      .withColumn("length", length(col("sequence")))
  }
}

class FastaReaderImpl extends Reader {
  val name = "fasta_reader"
  val implementsKinds = Set("fasta")
  def read(spark: SparkSession, ref: DataRef): DataFrame = SeqFormatReaders.fasta(spark, ref.url)
}
class FastqReaderImpl extends Reader {
  val name = "fastq_reader"
  val implementsKinds = Set("fastq")
  def read(spark: SparkSession, ref: DataRef): DataFrame = SeqFormatReaders.fastq(spark, ref.url)
}
class VcfReaderImpl extends Reader {
  val name = "vcf_reader"
  val implementsKinds = Set("vcf")
  def read(spark: SparkSession, ref: DataRef): DataFrame = SeqFormatReaders.vcf(spark, ref.url)
}
class IniReaderImpl extends Reader {
  val name = "ini_reader"
  val implementsKinds = Set("ini")
  def read(spark: SparkSession, ref: DataRef): DataFrame = SeqFormatReaders.ini(spark, ref.url)
}
class TomlReaderImpl extends Reader {
  val name = "toml_reader"
  val implementsKinds = Set("toml")
  def read(spark: SparkSession, ref: DataRef): DataFrame = SeqFormatReaders.toml(spark, ref.url)
}
