package graft.output

import graft.SparkSpec
import graft.inspect.Hdf5Inspect
import graft.readers.Hdf5Reader

/** Write→read round-trip through the in-repo HDF5 stack: the writer
  * emits superblock v2 + OHDR v2 + contiguous datasets, the inspect
  * walker lists them, the reader decodes the numeric data distributed.
  * Checksums are verified against the published lookup3 test vectors.
  */
class Hdf5WriterSpec extends SparkSpec {

  test("lookup3 matches the published lookup3.c test vectors") {
    def h(s: String, init: Int) = Hdf5Writer.lookup3(s.getBytes("ISO-8859-1"), init)
    assert(h("", 0) == 0xdeadbeef)
    assert(h("", 0xdeadbeef) == 0xbd5b7dde)
    assert(h("Four score and seven years ago", 0) == 0x17770551)
    assert(h("Four score and seven years ago", 1) == 0xcd628161)
  }

  test("write → inspect: groups, datasets, dtypes, dims") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.5, "alpha", 10, true),
      (2L, -2.25, "bb", 20, false),
      (3L, 0.0, "gamma!", 30, true)
    ).toDF("id", "score", "tag", "rank", "flag")
    val bytes = Hdf5Writer.serialize(df, "table")

    val nodes = Hdf5Inspect.listing(bytes)
    assert(nodes.exists(n => n.path == "/" && n.kind == "group"))
    assert(nodes.exists(n => n.path == "/table" && n.kind == "group"))
    val byPath = nodes.map(n => n.path -> n).toMap
    assert(byPath("/table/id").dtypeClass == "fixed" && byPath("/table/id").dtypeSize == 8)
    assert(byPath("/table/score").dtypeClass == "float" && byPath("/table/score").dtypeSize == 8)
    assert(byPath("/table/tag").dtypeClass == "string" && byPath("/table/tag").dtypeSize == 6) // max utf8 len
    assert(byPath("/table/rank").dtypeClass == "fixed" && byPath("/table/rank").dtypeSize == 4)
    assert(byPath("/table/flag").dtypeClass == "fixed" && byPath("/table/flag").dtypeSize == 1)
    nodes.filter(_.kind == "dataset").foreach(n => assert(n.dims == Seq(3L)))
  }

  test("write → read round-trips numeric columns distributed") {
    import spark.implicits._
    val df = Seq.tabulate(500)(i => (i.toLong, i * 0.5 - 100.0)).toDF("id", "score")
    val dir = java.nio.file.Files.createTempDirectory("h5w").toFile
    val url = s"file://$dir/out.h5"
    val ref = Hdf5Writer.write(df, url, key = "data")
    assert(ref.kind == "hdf5" && ref.options("key") == "data")

    val ids = Hdf5Reader.read(spark, url, Some("/data/id"))
      .orderBy("dim0").as[(Long, Double)].collect()
    assert(ids.length == 500)
    assert(ids.take(3).toSeq == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0)))
    val scores = Hdf5Reader.read(spark, url, Some("/data/score"))
      .orderBy("dim0").as[(Long, Double)].collect()
    assert(scores(0)._2 == -100.0 && scores(499)._2 == 499 * 0.5 - 100.0)
  }

  test("maxRows bound rejects oversized frames; empty frame still writes") {
    import spark.implicits._
    val big = Seq.tabulate(100)(i => (i, i)).toDF("a", "b")
    intercept[IllegalArgumentException] { Hdf5Writer.serialize(big, "t", maxRows = 10) }
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    val bytes = Hdf5Writer.serialize(empty, "t")
    val nodes = Hdf5Inspect.listing(bytes)
    assert(nodes.exists(_.path == "/t/a"))
    assert(nodes.filter(_.kind == "dataset").forall(_.dims == Seq(0L)))
  }
}
