package graft.catalog

import graft.SparkSpec
import java.sql.DriverManager

/** End-to-end JDBC catalog test against an embedded Derby database (the
  * derby jars ship with Spark for the Hive metastore).
  */
class JdbcCatalogSpec extends SparkSpec {

  private lazy val dbDir = java.nio.file.Files.createTempDirectory("derbydb").toString
  private lazy val url = s"jdbc:derby:$dbDir/testdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE T_USERS (ID INT, NAME VARCHAR(32))")
    st.execute("INSERT INTO T_USERS VALUES (1, 'ada'), (2, 'grace'), (3, 'edsger')")
    st.execute("CREATE TABLE T_ORDERS (ID INT, USER_ID INT, AMOUNT DOUBLE)")
    st.execute("INSERT INTO T_ORDERS VALUES (10, 1, 9.5), (11, 2, 12.0)")
    st.close(); conn.close()
  }

  test("fromJdbc lists tables and entries read through spark.read.jdbc") {
    val cat = JdbcCatalog.fromJdbc(url, schemaPattern = "APP")
    assert(cat.names.toSet == Set("t_users", "t_orders"))
    val users = cat("t_users").read(spark)
    assert(users.count() == 3)
    assert(users.columns.toSeq == Seq("ID", "NAME"))
    // and SQL passthrough over the whole DB catalog
    val joined = cat.sql(spark,
      "SELECT u.NAME, sum(o.AMOUNT) a FROM t_users u JOIN t_orders o ON u.ID = o.USER_ID GROUP BY u.NAME ORDER BY 1")
    assert(joined.collect().map(_.getString(0)).toSeq == Seq("ada", "grace"))
  }
}
