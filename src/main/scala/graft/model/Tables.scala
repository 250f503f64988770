package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views of the testdata star schema — `Dataset[T]` with case-class
  * Encoders where type safety helps (joins/aggregations keep the untyped
  * Column API for Catalyst visibility; the typed layer is for user code
  * that pattern-matches rows).
  */
final case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
final case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)
final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double, c_mktsegment: String)
final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String, o_totalprice: Double,
    o_orderdate: java.sql.Timestamp, o_orderpriority: String)
final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)

object Tables {
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    graft.queries.table(spark, dir, "documents").as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    graft.queries.table(spark, dir, "embeddings").as[Embedding]
  }
  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    graft.queries.table(spark, dir, "customer").as[Customer]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    graft.queries.table(spark, dir, "orders").as[Order]
  }
  def nations(spark: SparkSession, dir: String): Dataset[Nation] = {
    import spark.implicits._
    graft.queries.table(spark, dir, "nation").as[Nation]
  }
}
