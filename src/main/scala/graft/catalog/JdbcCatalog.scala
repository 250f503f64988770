package graft.catalog

import graft.datatypes.DataRef
import java.sql.DriverManager
import scala.collection.mutable.ListBuffer
import scala.util.Using

/** Catalog-from-a-database: list the tables behind a JDBC URL and emit one
  * entry per table, each readable through the Spark JDBC reader. Parity
  * with the reference's SQLAlchemyCatalog (reference
  * intake/readers/catalogs.py:71 — lists DB tables → SQLQuery entries),
  * built on `java.sql.DatabaseMetaData.getTables` + `spark.read.jdbc`.
  *
  * At scale, pass `partitionOptions` (partitionColumn/numPartitions/
  * lowerBound/upperBound) so Spark issues range-parallel reads instead of
  * one executor streaming the whole table.
  */
object JdbcCatalog {

  def fromJdbc(
      jdbcUrl: String,
      schemaPattern: String = null,
      tableTypes: Seq[String] = Seq("TABLE"),
      connectionProps: Map[String, String] = Map.empty,
      partitionOptions: Map[String, String] = Map.empty
  ): Catalog = {
    val props = new java.util.Properties()
    connectionProps.foreach { case (k, v) => props.put(k, v) }
    val tables = ListBuffer[(String, String)]() // (schema, table)
    Using.resource(DriverManager.getConnection(jdbcUrl, props)) { conn =>
      val md = conn.getMetaData
      Using.resource(md.getTables(null, schemaPattern, "%", tableTypes.toArray)) { rs =>
        while (rs.next()) {
          tables += ((Option(rs.getString("TABLE_SCHEM")).getOrElse(""), rs.getString("TABLE_NAME")))
        }
      }
    }
    tables.foldLeft(Catalog(metadata = Map("jdbc_url" -> jdbcUrl))) { case (cat, (schema, tbl)) =>
      val qualified = if (schema.nonEmpty) s"$schema.$tbl" else tbl
      cat.add(
        tbl.toLowerCase,
        DataRef("sql_query", jdbcUrl, connectionProps ++ partitionOptions + ("dbtable" -> qualified)),
        "spark_jdbc"
      )
    }
  }
}
