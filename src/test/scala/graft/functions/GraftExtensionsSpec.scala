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

  test("SQL surface exposes the fused text expressions, matching the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT whitespace_tokens('  the quick\tbrown  ') AS toks,
        |       span_grams(whitespace_tokens('a b c d'), 2) AS grams,
        |       gram_hashes(whitespace_tokens('a b c d'), 2) AS gh,
        |       minhash_sig(whitespace_tokens('the quick brown fox'), 3, 4) AS mh,
        |       simhash64(whitespace_tokens('the quick brown fox')) AS sh,
        |       non_blank_lines('one\n  \ntwo') AS lines,
        |       count_ascii_punct('a,b.c!') AS np,
        |       sum_char_lengths(array('ab', 'cde')) AS sl,
        |       count_in_set(array('the', 'fox', 'zzz'), array('the', 'fox')) AS cs
        |""".stripMargin).collect().head
    assert(row.getSeq[String](0) == Seq("the", "quick", "brown"))
    assert(row.getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(row.getSeq[Long](2).length == 3)
    assert(row.getSeq[String](5) == Seq("one", "two"))
    assert(row.getInt(6) == 3)
    assert(row.getLong(7) == 5L)
    assert(row.getInt(8) == 2)
    // SQL form == Column API form on real text (minhash + simhash)
    val (sqlMh, sqlSh) = (row.getSeq[Long](3), row.getLong(4))
    val (colMh, colSh) = Seq("the quick brown fox").toDF("t")
      .select(TextFunctions.minhashSig(graft.ops.TextOps.tokens(col("t")), 3, 4, 42L).as("m"),
        graft.ops.Dedup.simhash(col("t")).as("s"))
      .as[(Seq[Long], Long)].head()
    assert(sqlMh == colMh, s"sql=$sqlMh col=$colMh")
    assert(sqlSh == colSh, s"sql=$sqlSh col=$colSh")
    // non-literal scalar params refuse loudly
    val err = intercept[Exception] {
      spark.sql("SELECT count_in_set(array('a'), array(lower('B')))").collect()
    }
    assert(err.getMessage.contains("string literals"), err.getMessage)
    // out-of-Int-range shape params refuse instead of truncating
    // (4294967297L.toInt is 1 — silent truncation would reshape the expression)
    val overflow = intercept[Exception] {
      spark.sql("SELECT span_grams(array('a','b'), 4294967297)").collect()
    }
    assert(overflow.getMessage.contains("must fit in an Int"), overflow.getMessage)
    // non_empty_strings registers alongside its siblings
    val nes = spark.sql("SELECT non_empty_strings(array('a', '', NULL, 'b'))").collect().head
    assert(nes.getSeq[String](0) == Seq("a", "b"))
  }
}
