package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.ByteBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native SQLite database-file reader (published SQLite file format;
  * reference reads SQLite via pandas/SQLAlchemy — readers.py:326
  * PandasSQLAlchemy over `sqlite:///` urls and datatypes.py SQLite —
  * where a JDBC driver jar would otherwise be required).
  *
  * Driver side stays metadata-only: the 100-byte header, the
  * `sqlite_master` b-tree (table names, root pages, CREATE sql) and the
  * interior-page walk that collects each table's LEAF page numbers —
  * all positioned reads of single 4 KiB-ish pages. The leaf page list
  * is then parallelized, and each executor task opens the file, decodes
  * its own pages' cells (varint records, overflow chains followed
  * per-cell) and emits rows — pages never funnel through the driver, so
  * a multi-GB database scans with the cluster.
  *
  * Covered: rowid table b-trees, all serial types, overflow chains,
  * UTF-8 text. Guarded out: WITHOUT ROWID tables (index b-trees),
  * non-UTF8 encodings, WAL side files (a `-wal` journal is ignored —
  * reads see the last checkpointed state).
  */
object SqliteReader {

  private case class Db(pageSize: Int, usable: Int, nPages: Long)

  private def open(url: String, conf: Configuration): (FSDataInputStream, Db) = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    val hdr = new Array[Byte](100)
    in.readFully(0, hdr)
    require(new String(hdr, 0, 15, "ISO-8859-1") == "SQLite format 3" && hdr(15) == 0, s"not a SQLite db: $url")
    val raw = ((hdr(16) & 0xff) << 8) | (hdr(17) & 0xff)
    val pageSize = if (raw == 1) 65536 else raw
    val reserved = hdr(20) & 0xff
    val enc = ByteBuffer.wrap(hdr, 56, 4).getInt
    require(enc == 1, s"only UTF-8 SQLite databases supported (encoding $enc)")
    val nPages = ByteBuffer.wrap(hdr, 28, 4).getInt.toLong & 0xffffffffL
    (in, Db(pageSize, pageSize - reserved, nPages))
  }

  private def readPage(in: FSDataInputStream, db: Db, page: Long): Array[Byte] = {
    val buf = new Array[Byte](db.pageSize)
    in.readFully((page - 1) * db.pageSize, buf)
    buf
  }

  private def varint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      val x = b(pos + i)
      v = (v << 7) | (x & 0x7fL)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(pos + 8) & 0xffL), 9)
  }

  private def u16(b: Array[Byte], p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long = ByteBuffer.wrap(b, p, 4).getInt.toLong & 0xffffffffL

  /** Walk a table b-tree from `root`, returning its leaf page numbers. */
  private def leafPages(in: FSDataInputStream, db: Db, root: Long): Seq[Long] = {
    val page = readPage(in, db, root)
    val off = if (root == 1) 100 else 0
    page(off) & 0xff match {
      case 13 => Seq(root)
      case 5 =>
        val n = u16(page, off + 3)
        val kids = (0 until n).map { i =>
          val cell = u16(page, off + 12 + i * 2)
          u32(page, cell)
        } :+ u32(page, off + 8) // rightmost pointer
        kids.flatMap(leafPages(in, db, _))
      case 2 | 10 => throw new UnsupportedOperationException("WITHOUT ROWID (index b-tree) tables unsupported")
      case t => throw new IllegalArgumentException(s"unexpected page type $t at page $root")
    }
  }

  /** Assemble a cell's full payload, following the overflow chain. */
  private def payload(in: FSDataInputStream, db: Db, page: Array[Byte], at: Int, pLen: Long): (Array[Byte], Int) = {
    val u = db.usable
    val x = u - 35
    if (pLen <= x) {
      (java.util.Arrays.copyOfRange(page, at, at + pLen.toInt), at + pLen.toInt)
    } else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + ((pLen - m) % (u - 4))
      val local = (if (k <= x) k else m).toInt
      val out = new Array[Byte](pLen.toInt)
      System.arraycopy(page, at, out, 0, local)
      var next = u32(page, at + local)
      var got = local
      while (next != 0 && got < pLen) {
        val ov = readPage(in, db, next)
        next = u32(ov, 0)
        val take = math.min(u - 4, pLen.toInt - got)
        System.arraycopy(ov, 4, out, got, take)
        got += take
      }
      (out, at + local + 4)
    }
  }

  /** Decode one record payload into column values (sqlite serial types). */
  private def record(b: Array[Byte]): Seq[Any] = {
    val (hdrLen, n0) = varint(b, 0)
    var p = n0
    val types = Seq.newBuilder[Long]
    while (p < hdrLen) { val (t, n) = varint(b, p); types += t; p += n }
    var at = hdrLen.toInt
    types.result().map { t =>
      val value: Any = t match {
        case 0 => null
        case 1 => { val v = b(at).toLong; at += 1; v }
        case 2 => { val v = (b(at).toLong << 8) | (b(at + 1) & 0xffL); at += 2; v }
        case 3 => { val v = (b(at).toLong << 16) | ((b(at + 1) & 0xffL) << 8) | (b(at + 2) & 0xffL); at += 3; v }
        case 4 => { val v = ByteBuffer.wrap(b, at, 4).getInt.toLong; at += 4; v }
        case 5 =>
          val v = (ByteBuffer.wrap(b, at, 2).getShort.toLong << 32) | (ByteBuffer.wrap(b, at + 2, 4).getInt.toLong & 0xffffffffL)
          at += 6; v
        case 6 => { val v = ByteBuffer.wrap(b, at, 8).getLong; at += 8; v }
        case 7 => { val v = ByteBuffer.wrap(b, at, 8).getDouble; at += 8; v }
        case 8 => 0L
        case 9 => 1L
        case blob if blob >= 12 && blob % 2 == 0 =>
          val len = ((blob - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(b, at, at + len); at += len; v
        case text if text >= 13 =>
          val len = ((text - 13) / 2).toInt
          val v = new String(b, at, len, "UTF-8"); at += len; v
        case other => throw new UnsupportedOperationException(s"sqlite serial type $other")
      }
      value
    }
  }

  /** Decode the leaf-table cells of one page into (rowid, values). */
  private def leafRows(in: FSDataInputStream, db: Db, pageNo: Long): Seq[(Long, Seq[Any])] = {
    val page = readPage(in, db, pageNo)
    val off = if (pageNo == 1) 100 else 0
    require((page(off) & 0xff) == 13, s"page $pageNo is not a table leaf")
    val n = u16(page, off + 3)
    (0 until n).map { i =>
      val cell = u16(page, off + 8 + i * 2)
      val (pLen, n1) = varint(page, cell)
      val (rowid, n2) = varint(page, cell + n1)
      val (bytes, _) = payload(in, db, page, cell + n1 + n2, pLen)
      (rowid, record(bytes))
    }
  }

  case class Table(name: String, rootPage: Long, sql: String)

  /** List the rowid tables recorded in sqlite_master. */
  def tables(url: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Seq[Table] = {
    val (in, db) = open(url, conf)
    try {
      leafPages(in, db, 1L).flatMap(leafRows(in, db, _)).collect {
        case (_, Seq("table", name: String, _, rootpage: Long, sql: String))
            if !name.startsWith("sqlite_") && !sql.toUpperCase.contains("WITHOUT ROWID") =>
          Table(name, rootpage, sql)
      }
    } finally in.close()
  }

  /** Column names + affinity types from the CREATE TABLE sql (naive but
    * sufficient parse: top-level comma split, constraint starters
    * skipped).
    */
  private[readers] def columns(sql: String): Seq[(String, DataType)] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    var depth = 0
    val defs = Seq.newBuilder[String]
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => defs += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    defs += cur.toString
    val constraintStarters = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    defs.result().map(_.trim).filter(_.nonEmpty)
      .filterNot(d => constraintStarters.contains(d.split("\\s+")(0).toUpperCase))
      .map { d =>
        val parts = d.split("\\s+")
        val name = parts(0).stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
        val declared = parts.drop(1).mkString(" ").toUpperCase
        // SQLite affinity rules, order matters: INT → integer; then
        // CHAR/CLOB/TEXT; BLOB/none; REAL/FLOA/DOUB
        val dt =
          if (declared.contains("INT")) LongType
          else if (Seq("CHAR", "CLOB", "TEXT").exists(declared.contains)) StringType
          else if (declared.isEmpty || declared.contains("BLOB")) BinaryType
          else if (Seq("REAL", "FLOA", "DOUB").exists(declared.contains)) DoubleType
          else StringType // NUMERIC affinity: dynamic — render as text
        (name, dt)
      }
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    case (d: Double, LongType) => d.toLong
    case (s: String, StringType) => s
    case (b: Array[Byte], BinaryType) => b
    case (x, StringType) => x match {
      case bs: Array[Byte] => new String(bs, "UTF-8")
      case other => other.toString
    }
    case (s: String, LongType) => s.toLongOption.orNull
    case (s: String, DoubleType) => s.toDoubleOption.orNull
    case _ => null // affinity mismatch SQLite tolerates; we null it
  }

  /** Read one table as a DataFrame: driver walks interior pages for the
    * leaf list; executors decode their own leaves.
    */
  def read(spark: SparkSession, url: String, tableName: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val t = tables(url, conf).find(_.name == tableName)
      .getOrElse(throw new NoSuchElementException(
        s"table $tableName not in $url (has ${tables(url, conf).map(_.name).mkString(", ")})"))
    val cols = columns(t.sql)
    val (in, db) = open(url, conf)
    val leaves = try leafPages(in, db, t.rootPage) finally in.close()

    // INTEGER PRIMARY KEY columns alias the rowid: their record value is
    // NULL and the rowid carries the value
    val rowidAlias = {
      val up = t.sql.toUpperCase
      cols.indexWhere { case (n, _) => up.matches(s"(?s).*\\b${java.util.regex.Pattern.quote(n.toUpperCase)}\\s+INTEGER\\s+PRIMARY\\s+KEY.*") }
    }

    val schema = StructType(cols.map { case (n, dt) => StructField(n, dt, nullable = true) })
    val colTypes = cols.map(_._2)
    val parts = math.max(1, math.min(leaves.size, spark.sparkContext.defaultParallelism))
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(leaves, parts).flatMap { pageNo =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val inEx = fs.open(new Path(url))
      val hdr = new Array[Byte](100)
      inEx.readFully(0, hdr)
      val raw = ((hdr(16) & 0xff) << 8) | (hdr(17) & 0xff)
      val dbEx = Db(if (raw == 1) 65536 else raw, (if (raw == 1) 65536 else raw) - (hdr(20) & 0xff), 0L)
      try {
        leafRows(inEx, dbEx, pageNo).map { case (rowid, vals) =>
          val padded = vals.padTo(colTypes.size, null)
          val cells = padded.zip(colTypes).zipWithIndex.map { case ((v, dt), i) =>
            if (i == rowidAlias && v == null) rowid else coerce(v, dt)
          }
          Row.fromSeq(cells)
        }
      } finally inEx.close()
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

class SqliteReaderImpl extends Reader {
  val name = "sqlite_native"
  val implementsKinds = Set("sqlite", "duckdb_file")
  override def isOk(ref: DataRef): Boolean = ref.kind == "sqlite"
  def read(spark: SparkSession, ref: DataRef): DataFrame = {
    val table = ref.options.getOrElse("table",
      SqliteReader.tables(ref.url).headOption.map(_.name)
        .getOrElse(throw new IllegalArgumentException(s"no tables in ${ref.url}")))
    SqliteReader.read(spark, ref.url, table)
  }
}
