package graft.model

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("typed Dataset views load with case-class encoders") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val long = docs.filter(_.n_chars > 300).count()
    assert(long > 0 && long < 500)
    val byLang = docs.groupByKey(_.lang).count().collect().toMap
    assert(byLang.values.sum == 500)

    val emb = Tables.embeddings(spark, sf)
    assert(emb.head().embedding.length == 64)

    val c = Tables.customers(spark, sf)
    val n = Tables.nations(spark, sf)
    val joined = c.joinWith(n, c("c_nationkey") === n("n_nationkey"))
    assert(joined.head()._2.n_name.nonEmpty)
  }
}
