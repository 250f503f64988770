package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef

/** Fixture `fixtures/sample.dta` was written by pandas `to_stata`
  * (release 118) — an independent writer: 200 rows of int32 `id`,
  * double `weight` (one NaN→Stata missing), int8 `grade`, fixed-str
  * `city`.
  */
class StataReaderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = getClass.getResource("/fixtures/sample.dta").toString

  test("header, types and names parse; rows decode distributed") {
    val df = StataReader.read(spark, url)
    assert(df.columns.toSeq == Seq("id", "weight", "grade", "city"))
    assert(df.count() == 200)
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.schema("weight").dataType.typeName == "double")
    assert(df.schema("city").dataType.typeName == "string")

    val r10 = df.filter($"id" === 10).head()
    assert(r10.getDouble(1) == 15.0) // 10 * 1.5
    assert(r10.getInt(2) == (((-128 + 9) % 100) + 100) % 100) // python % is non-negative
    assert(r10.getString(3) == s"city${9 % 7}")
  }

  test("Stata missing sentinels decode as nulls") {
    val df = StataReader.read(spark, url)
    // pandas wrote NaN for id 4 (index 3) → Stata '.' missing
    assert(df.filter($"id" === 4).head().isNullAt(1))
    assert(df.filter($"weight".isNull).count() == 1)
  }

  test("registry routes the stata kind") {
    val df = SparkReaders.reader("stata_reader").get.read(spark, DataRef("stata", url))
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) == (1 to 200).sum.toLong)
  }
}
