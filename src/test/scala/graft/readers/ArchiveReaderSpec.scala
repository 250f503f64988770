package graft.readers

import graft.SparkSpec
import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}

class ArchiveReaderSpec extends SparkSpec {

  private def writeZip(path: String, entries: (String, String)*): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, body) =>
      z.putNextEntry(new ZipEntry(name)); z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
  }

  private def writeTarGz(path: String, gz: Boolean, entries: (String, String)*): Unit = {
    val fos = new FileOutputStream(path)
    val out = if (gz) new java.util.zip.GZIPOutputStream(fos) else fos
    val t = new TarArchiveOutputStream(out)
    entries.foreach { case (name, body) =>
      val e = new TarArchiveEntry(name)
      val b = body.getBytes("UTF-8")
      e.setSize(b.length)
      t.putArchiveEntry(e); t.write(b); t.closeArchiveEntry()
    }
    t.close()
  }

  test("zip members become rows; glob pattern filters; chained url form") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arch").toString
    writeZip(s"$dir/a.zip", "data/one.csv" -> "x,y\n1,2\n", "notes.txt" -> "hello", "data/two.csv" -> "x,y\n3,4\n")
    val all = ArchiveReader.read(spark, graft.datatypes.DataRef("zip", s"file://$dir/a.zip"))
    assert(all.count() == 3)
    assert(all.schema.fieldNames.toSeq == Seq("archive", "member", "size", "content"))
    val chained = ArchiveReader.read(spark,
      graft.datatypes.DataRef("zip", s"zip://data/*.csv::file://$dir/a.zip"))
    val rows = chained.select("member", "content").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(rows.keySet == Set("data/one.csv", "data/two.csv"))
    assert(rows("data/two.csv") == "x,y\n3,4\n")
  }

  test("tar and tar.gz unwrap by magic; zstd-wrapped tar too") {
    val dir = Files.createTempDirectory("archt").toString
    writeTarGz(s"$dir/p.tar", gz = false, "m1.txt" -> "alpha", "sub/m2.txt" -> "beta")
    writeTarGz(s"$dir/p.tgz", gz = true, "m3.txt" -> "gamma")
    // zstd outer layer via the bundled zstd-jni stream
    val raw = java.io.File.createTempFile("inner", ".tar")
    writeTarGz(raw.getAbsolutePath, gz = false, "m4.txt" -> "delta")
    val zo = new com.github.luben.zstd.ZstdOutputStream(new FileOutputStream(s"$dir/p.tar.zst"))
    zo.write(Files.readAllBytes(raw.toPath)); zo.close()

    def names(url: String): Set[String] =
      ArchiveReader.read(spark, graft.datatypes.DataRef("tar", url))
        .select("member").collect().map(_.getString(0)).toSet
    assert(names(s"file://$dir/p.tar") == Set("m1.txt", "sub/m2.txt"))
    assert(names(s"file://$dir/p.tgz") == Set("m3.txt"))
    assert(names(s"file://$dir/p.tar.zst") == Set("m4.txt"))
  }

  test("maxMemberBytes refuses archive bombs loudly") {
    val dir = Files.createTempDirectory("archb").toString
    writeZip(s"$dir/big.zip", "big.bin" -> "x" * 10000)
    val e = intercept[org.apache.spark.SparkException] {
      ArchiveReader.read(spark,
        graft.datatypes.DataRef("zip", s"file://$dir/big.zip", options = Map("maxMemberBytes" -> "1024")))
        .count()
    }
    assert(e.getMessage.contains("maxMemberBytes") || e.getCause.getMessage.contains("maxMemberBytes"))
  }

  test("detection rewraps unknown zips to the chained form and routes here") {
    val dir = Files.createTempDirectory("archd").toString
    writeZip(s"$dir/bundle.bin", "inner.txt" -> "payload")
    val scored = graft.datatypes.Detect.recommendPath(s"file://$dir/bundle.bin")
    val container = scored.find(_.url.startsWith("zip://"))
    assert(container.isDefined)
    val ref = graft.datatypes.DataRef(container.get.kind.name, container.get.url)
    val reader = SparkReaders.recommend(ref)._1.headOption
    assert(reader.exists(_.name == "archive_members"))
    assert(reader.get.read(spark, ref).count() == 1)
    // tar kind detects by ustar magic and routes here too
    val dirT = Files.createTempDirectory("archdt").toString
    writeTarGz(s"$dirT/x.tar", gz = false, "a.txt" -> "hi")
    val t = graft.datatypes.Detect.recommendPath(s"file://$dirT/x.tar")
    assert(t.head.kind.name == "tar")
  }
}
