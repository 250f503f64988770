package graft.catalog

import graft.SparkSpec
import graft.readers.SparkReaders
import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.Files

class ExampleCatalogsSpec extends SparkSpec {

  /** Minimal NetCDF3 granule: one fixed var `precip(x)` with 3 doubles. */
  private def granule(values: Seq[Double]): Array[Byte] = {
    def build(begin: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      def name(s: String): Unit = {
        out.writeInt(s.length); out.write(s.getBytes("UTF-8"))
        (s.length until ((s.length + 3) & ~3)).foreach(_ => out.writeByte(0))
      }
      out.write("CDF".getBytes("UTF-8")); out.writeByte(1)
      out.writeInt(0) // numrecs
      out.writeInt(0x0A); out.writeInt(1); name("x"); out.writeInt(values.length)
      out.writeInt(0); out.writeInt(0) // no global atts
      out.writeInt(0x0B); out.writeInt(1)
      name("precip"); out.writeInt(1); out.writeInt(0)
      out.writeInt(0); out.writeInt(0)
      out.writeInt(6); out.writeInt(values.length * 8); out.writeInt(begin)
      out.flush(); bos.toByteArray
    }
    val header = build(0)
    val bos = new ByteArrayOutputStream()
    bos.write(build(header.length))
    val out = new DataOutputStream(bos)
    values.foreach(out.writeDouble); out.flush()
    bos.toByteArray
  }

  test("Earthdata catalog walks CMR collections and reads granules as netCDF") {
    val dir = Files.createTempDirectory("cmr")
    Files.writeString(dir.resolve("collections.json"),
      """{"feed": {"entry": [
        |  {"id": "C100-GES_DISC", "title": "precip daily", "time_start": "2002-01-01T00:00:00Z"},
        |  {"id": "C200-PODAAC", "title": "sst monthly"}
        |]}}""".stripMargin)
    Files.write(dir.resolve("g1.nc"), granule(Seq(1.0, 2.0, 3.0)))
    Files.write(dir.resolve("g2.nc"), granule(Seq(4.0, 5.0, 6.0)))
    Files.writeString(dir.resolve("granules.json"),
      s"""{"feed": {"entry": [
         |  {"id": "G1", "links": [
         |    {"rel": "http://esipfed.org/ns/fedsearch/1.1/data#", "href": "file://$dir/g1.nc"},
         |    {"rel": "http://esipfed.org/ns/fedsearch/1.1/metadata#", "href": "file://$dir/ignored.xml"}]},
         |  {"id": "G2", "links": [
         |    {"rel": "http://esipfed.org/ns/fedsearch/1.1/data#", "href": "file://$dir/g2.nc"}]}
         |]}}""".stripMargin)

    val cat = EarthdataCatalog.fromUrl(s"file://$dir/collections.json")
    assert(cat.names.toSet == Set("C100-GES_DISC", "C200-PODAAC"))
    assert(cat("C100-GES_DISC").ref.metadata("title") == "precip daily")
    // live urls address CMR's granule search for the concept-id
    assert(cat("C200-PODAAC").ref.url.endsWith("granules.json?concept_id=C200-PODAAC"))

    // rehydrate against the fixture granule listing (pattern as in the HF spec)
    val ref = cat("C100-GES_DISC").ref.copy(url = s"file://$dir/granules.json")
    val df = SparkReaders.reader("earthdata_granules").get.read(spark, ref)
    assert(df.columns.toSeq == Seq("x", "value", "granule"))
    import spark.implicits._
    val byGranule = df.select("granule", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byGranule == Map(
      s"file://$dir/g1.nc" -> Seq(1.0, 2.0, 3.0),
      s"file://$dir/g2.nc" -> Seq(4.0, 5.0, 6.0)))
  }

  test("sklearn examples registry lists loaders with fetch flag") {
    val cat = ExampleCatalogs.sklearnExamples()
    assert(cat.names.contains("iris") && cat.names.contains("olivetti_faces"))
    assert(cat("iris").ref.metadata("loader") == "load_iris")
    assert(cat("iris").ref.metadata("fetched") == "false")
    assert(cat("california_housing").ref.metadata("fetched") == "true")
    assert(cat.search(TextExpr("20newsgroups")).names.size == 2)
  }

  test("torch registry carries sections and the rootdir kwarg") {
    val cat = ExampleCatalogs.torchDatasets(rootdir = "/tmp/torch-cache")
    assert(cat("MNIST").ref.metadata("section") == "vision")
    assert(cat("LIBRISPEECH").ref.metadata("section") == "audio")
    assert(cat("AG_NEWS").ref.metadata("section") == "text")
    assert(cat("RTE").ref.options("rootdir") == "/tmp/torch-cache")
    assert(cat.names.size == ExampleCatalogs.torchSections.values.map(_.size).sum)
  }

  test("tfds registry lists public dataset names") {
    val cat = ExampleCatalogs.tensorflowDatasets()
    assert(cat.names.contains("c4") && cat.names.contains("wikipedia"))
    assert(cat("xnli").ref.kind == "tfds")
  }
}
