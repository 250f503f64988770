package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("SQL surface exposes cosine_sim / dot_product / l2_norm") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       l2_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n
        |""".stripMargin).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - 11.0) < 1e-9)
    assert(math.abs(row.getDouble(2) - 5.0) < 1e-9)
    // embeddings table end-to-end through pure SQL
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView("emb")
    val knn = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_sim(a.embedding, b.embedding) AS sim
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).collect()
    assert(knn.length == 1 && math.abs(knn.head.getDouble(2)) <= 1.0)
  }
}
