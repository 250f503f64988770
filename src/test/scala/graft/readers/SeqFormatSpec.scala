package graft.readers

import graft.SparkSpec
import java.nio.file.Files

class SeqFormatSpec extends SparkSpec {
  import spark.implicits._

  test("FASTA multi-line records split distributed") {
    val dir = Files.createTempDirectory("fa")
    Files.writeString(dir.resolve("s.fasta"),
      ">seq1 first sequence\nACGT\nACGT\n>seq2 second\nTTTT\n")
    val df = SeqFormatReaders.fasta(spark, s"file://$dir/s.fasta")
    val rows = df.select("seq_id", "sequence", "length").as[(String, String, Int)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("seq1", "ACGTACGT", 8), ("seq2", "TTTT", 4)))
  }

  test("VCF data lines parse core columns, headers skipped") {
    val dir = Files.createTempDirectory("vcf")
    Files.writeString(dir.resolve("v.vcf"),
      "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n" +
      "chr1\t100\trs1\tA\tG\t50.0\tPASS\tDP=10\n" +
      "chr2\t200\t.\tC\tT\t.\tq10\tDP=3\n")
    val df = SeqFormatReaders.vcf(spark, s"file://$dir/v.vcf")
    val rows = df.as[(String, Long, String, String, String, Option[Double], String, String)].collect().sortBy(_._2)
    assert(rows(0) == ("chr1", 100L, "rs1", "A", "G", Some(50.0), "PASS", "DP=10"))
    assert(rows(1)._6.isEmpty) // '.' qual -> null
  }

  test("FASTQ groups strict 4-line records, '@' quality lines included") {
    val dir = Files.createTempDirectory("fastq")
    // second record's quality line STARTS with '@' — the classic trap for
    // delimiter-split readers
    Files.writeString(dir.resolve("r.fastq"),
      "@r1 lane=1\nACGT\n+\nFFFF\n" +
      "@r2\nGGCCA\n+\n@@;;F\n")
    val df = SeqFormatReaders.fastq(spark, s"file://$dir/r.fastq")
    assert(df.columns.toSeq == Seq("record", "seq_id", "sequence", "quality", "length"))
    val rows = df.as[(Long, String, String, String, Int)].collect().sortBy(_._1)
    assert(rows(0) == ((0L, "r1", "ACGT", "FFFF", 4)))
    assert(rows(1) == ((1L, "r2", "GGCCA", "@@;;F", 5)))
  }

  test("INI and TOML parse to key-value rows with section tracking") {
    val dir = Files.createTempDirectory("cfg")
    Files.writeString(dir.resolve("c.ini"),
      "; comment\nglobal_key = 1\n[db]\nhost = localhost\nport: 5432\n[web]\nhost = 0.0.0.0\n")
    val ini = SeqFormatReaders.ini(spark, s"file://$dir/c.ini")
      .as[(String, String, String)].collect().toSet
    assert(ini == Set(("", "global_key", "1"), ("db", "host", "localhost"),
      ("db", "port", "5432"), ("web", "host", "0.0.0.0")))

    Files.writeString(dir.resolve("t.toml"),
      "# top\ntitle = \"demo\"\n[owner]\nname = \"ada\"  # inline comment\nage = 36\n")
    val toml = SeqFormatReaders.toml(spark, s"file://$dir/t.toml")
      .as[(String, String, String)].collect().toSet
    assert(toml == Set(("", "title", "demo"), ("owner", "name", "ada"), ("owner", "age", "36")))
  }
}
