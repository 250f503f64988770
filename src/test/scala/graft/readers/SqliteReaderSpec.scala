package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef

/** Fixture `fixtures/sample.db` was written by the real SQLite engine
  * (python stdlib sqlite3) — independent of this parser: people (3 rows
  * incl. an overflow-length text, a blob, NULLs, INTEGER PRIMARY KEY
  * rowid alias) and nums (2000 rows — interior b-tree pages).
  */
class SqliteReaderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val res = getClass.getResource("/fixtures/sample.db")
    assert(res != null, "missing fixtures/sample.db")
    res.toString
  }

  test("sqlite_master lists rowid tables with parsed columns") {
    val ts = SqliteReader.tables(url)
    assert(ts.map(_.name).toSet == Set("people", "nums"))
    val cols = SqliteReader.columns(ts.find(_.name == "people").get.sql)
    assert(cols.map(_._1) == Seq("id", "name", "score", "data", "note"))
  }

  test("people table: serial types, NULLs, blob, rowid alias, overflow text") {
    val df = SqliteReader.read(spark, url, "people")
    assert(df.columns.toSeq == Seq("id", "name", "score", "data", "note"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "alice" && r1.getDouble(2) == 9.5)
    assert(r1.getAs[Array[Byte]]("data").toSeq == Seq(0xde, 0xad, 0xbe, 0xef).map(_.toByte))
    assert(r1.isNullAt(4))
    val r2 = rows(1)
    assert(r2.getLong(0) == 2L && r2.getDouble(2) == -3.25 && r2.isNullAt(3) && r2.getString(4) == "plain")
    // 9000-char text spilled to overflow pages
    val r3 = rows(2)
    assert(r3.getString(1) == "x" * 9000 && r3.getString(4) == "ovf")
  }

  test("nums table: 2000 rows through interior b-tree pages, distributed") {
    val df = SqliteReader.read(spark, url, "nums")
    assert(df.count() == 2000)
    assert(df.rdd.getNumPartitions > 1) // leaf pages split across tasks
    val sums = df.agg(org.apache.spark.sql.functions.sum("n"),
      org.apache.spark.sql.functions.sum("sq")).head()
    assert(sums.getLong(0) == (0 until 2000).map(_.toLong).sum)
    assert(sums.getLong(1) == (0 until 2000).map(i => i.toLong * i).sum)
    assert(df.filter($"label" === "row-1234").select("n").as[Long].head() == 1234L)
  }

  test("registry: sqlite kind resolves to the native reader for files") {
    val ref = DataRef("sqlite", url, options = Map("table" -> "nums"))
    val (importable, _) = SparkReaders.recommend(ref)
    assert(importable.head.name == "sqlite_native")
    assert(importable.head.read(spark, ref).count() == 2000)
    // jdbc stays available for real jdbc urls only
    assert(!SparkReaders.jdbc.isOk(ref))
    assert(SparkReaders.jdbc.isOk(DataRef("sqlite", "jdbc:sqlite:/tmp/x.db")))
  }
}
