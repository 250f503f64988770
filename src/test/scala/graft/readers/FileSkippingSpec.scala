package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.spark.sql.types._

/** Scale contract for planning-time file skipping in the native table
  * readers (VERDICT r7 #1): a partition-filtered read of a
  * 100-partition fixture must OPEN only the matching files. The specs
  * here make non-skipping unfalsifiable two ways: `df.inputFiles`
  * counts what the scan will read, and — stronger — every file/manifest
  * the filter excludes points at a NONEXISTENT path, so a reader that
  * fails to skip cannot even plan the scan, let alone pass.
  */
class FileSkippingSpec extends SparkSpec {

  // ---- pure helpers (no Spark) ---------------------------------------

  test("conjuncts split on top-level AND only; shapes classify operands both ways") {
    val cs = FileSkipping.conjuncts("p = 7 AND (a > 1 OR b < 2) AND id >= 10")
    assert(cs.length == 3)
    assert(FileSkipping.simpleShape(cs.head).contains(FileSkipping.Cmp("p", "=",
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(7)))))
    // OR stays one conjunct and is not a simple shape
    assert(FileSkipping.simpleShape(cs(1)).isEmpty)
    // reversed operand order flips the comparison
    val rev = FileSkipping.conjuncts("10 <= id").head
    assert(FileSkipping.simpleShape(rev).exists {
      case FileSkipping.Cmp("id", ">=", _) => true; case _ => false
    })
    // BETWEEN splits into its two comparisons (the Spark 4 parser emits
    // an unresolved `between` FUNCTION, not the And it desugars to — a
    // shape every matcher here would otherwise fail open on)
    val bt = FileSkipping.conjuncts("p = 7 AND id BETWEEN 10 AND 20")
    assert(bt.length == 3)
    assert(FileSkipping.simpleShape(bt(1)).exists {
      case FileSkipping.Cmp("id", ">=", _) => true; case _ => false
    })
    assert(FileSkipping.simpleShape(bt(2)).exists {
      case FileSkipping.Cmp("id", "<=", _) => true; case _ => false
    })
  }

  test("usableRefs fails closed on qualified names, subqueries, nondeterminism") {
    def refs(sql: String) = FileSkipping.usableRefs(FileSkipping.conjuncts(sql).head)
    assert(refs("p = 7").contains(Set("p")))
    assert(refs("year(ds) = 2024").contains(Set("ds")))
    assert(refs("t.p = 7").isEmpty)       // qualified
    assert(refs("p = rand()").isEmpty)    // nondeterministic
    assert(refs("1 = 1").isEmpty)         // no refs: nothing to prune on
    // time-dependent functions freeze a value the lazy residual re-times
    assert(refs("ds < current_date()").isEmpty)
    assert(refs("ds < curdate()").isEmpty)
    assert(refs("ts < unix_timestamp()").isEmpty)   // zero-arg = now()
    assert(refs("p = spark_partition_id()").isEmpty)
    // ...but unix_timestamp WITH an argument is a pure conversion
    assert(refs("unix_timestamp(ds) > 100").contains(Set("ds")))
  }

  test("rangeExcludes is conservative: unknowns and open sides keep the file") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def cmp(op: String, v: Int) = FileSkipping.Cmp("p", op, Seq(Literal(v)))
    assert(FileSkipping.rangeExcludes(cmp("=", 7), Some(10L), Some(19L)))
    assert(!FileSkipping.rangeExcludes(cmp("=", 12), Some(10L), Some(19L)))
    assert(FileSkipping.rangeExcludes(cmp(">", 19), Some(10L), Some(19L)))
    assert(!FileSkipping.rangeExcludes(cmp(">", 18), Some(10L), Some(19L)))
    assert(FileSkipping.rangeExcludes(cmp("<", 10), Some(10L), Some(19L)))
    assert(FileSkipping.rangeExcludes(cmp(">=", 20), Some(10L), Some(19L)))
    assert(FileSkipping.rangeExcludes(cmp("<=", 9), Some(10L), Some(19L)))
    // open bounds never exclude; type mismatch never excludes
    assert(!FileSkipping.rangeExcludes(cmp("=", 7), None, None))
    assert(!FileSkipping.rangeExcludes(FileSkipping.Cmp("p", "=",
      Seq(Literal.create("x", StringType))), Some(10L), Some(19L)))
    // decimal literals compare EXACTLY against decimal and long bounds
    def dec(sql: String) = FileSkipping.simpleShape(FileSkipping.conjuncts(sql).head)
      .get.asInstanceOf[FileSkipping.Cmp]
    val bd = (s: String) => new java.math.BigDecimal(s)
    assert(FileSkipping.rangeExcludes(dec("x > 100.00"), Some(bd("10.50")), Some(bd("99.99"))))
    assert(!FileSkipping.rangeExcludes(dec("x > 100.00"), Some(bd("10.50")), Some(bd("100.01"))))
    assert(FileSkipping.rangeExcludes(dec("x = 7.5"), Some(10L), Some(19L)))
    assert(!FileSkipping.rangeExcludes(dec("x = 12.0"), Some(10L), Some(19L)))
    // strings compare by CODE POINT (UTF-8 bound order): U+10000 sorts
    // ABOVE U+FFFF even though its UTF-16 lead surrogate is smaller —
    // code-unit order would wrongly exclude it from this range
    val supp = new String(Character.toChars(0x10000))
    assert(!FileSkipping.rangeExcludes(
      FileSkipping.Cmp("s", "=", Seq(Literal.create(supp, StringType))),
      Some("￿"), Some(new String(Character.toChars(0x10005)))))
    assert("￿".compareTo(supp) > 0) // documents the code-unit trap
  }

  // ---- Delta fixtures ------------------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)

  private val schemaWithP = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("p", IntegerType))).json
  private val schemaIdName = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))).json

  private def metaAction(schema: String, partitionCols: Seq[String] = Nil): String =
    s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
       |"schemaString":${js(schema)},
       |"partitionColumns":[${partitionCols.map(js).mkString(",")}],
       |"configuration":{},"createdTime":1}}""".stripMargin.replace("\n", "")
  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def addAction(path: String, pv: String = "{}", stats: String = null): String = {
    val statsPart = if (stats == null) "" else s""","stats":${js(stats)}"""
    s"""{"add":{"path":${js(path)},"partitionValues":$pv,"size":1,"modificationTime":1,"dataChange":true$statsPart}}"""
  }
  private def writeCommit(table: JPath, version: Long, actions: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"), actions.mkString("\n") + "\n")
  }
  private def writeParquetFile(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("fsparts").toString
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }

  /** 100-partition Delta table; only partitions [realFrom, realTo) have
    * physical files (one shared payload, copied) — every other add
    * points at a path that does NOT exist, so reading it fails. */
  private def delta100(realFrom: Int, realTo: Int): JPath = {
    val t = Files.createTempDirectory("delta100")
    writeParquetFile(t, "payload.parquet", Seq((1L, "alpha"), (2L, "beta")))
    for (p <- realFrom until realTo)
      Files.copy(t.resolve("payload.parquet"), {
        val d = t.resolve(f"p=$p/f.parquet"); Files.createDirectories(d.getParent); d
      })
    Files.delete(t.resolve("payload.parquet"))
    val adds = (0 until 100).map(p => addAction(f"p=$p/f.parquet", s"""{"p":"$p"}"""))
    writeCommit(t, 0, Seq(protocolAction, metaAction(schemaWithP, Seq("p"))) ++ adds)
    t
  }

  test("delta: partition filter on a 100-partition table opens exactly one file") {
    import spark.implicits._
    val t = delta100(7, 8) // ONLY p=7 exists on disk
    val df = DeltaReader.read(spark, t.toString, filter = Some("p = 7"))
    assert(df.inputFiles.length == 1, s"expected 1 input file, got ${df.inputFiles.toSeq}")
    val got = df.select("id", "name", "p").as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "alpha", 7), (2L, "beta", 7)))
  }

  test("delta: pruning reaches the >maxPartitionScans broadcast path") {
    val t = delta100(7, 27) // p=7..26 exist
    // 20 surviving groups > maxPartitionScans=10 → single-scan+broadcast
    // plan, with the file LIST already pruned to the 20 matching files
    val df = DeltaReader.read(spark, t.toString, maxPartitionScans = 10,
      filter = Some("p >= 7 AND p < 27"))
    assert(df.inputFiles.length == 20, s"expected 20 input files, got ${df.inputFiles.length}")
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, s"expected ONE data scan:\n$plan")
    assert(df.count() == 40)
    assert(df.select("p").distinct().count() == 20)
  }

  test("delta: expression conjuncts evaluate exactly (pmod) against partitions") {
    val t = delta100(0, 10)
    // pmod(p, 10) = 3 AND p < 10 → only p=3; arbitrary deterministic
    // expressions work because pruning evaluates the real expression
    val df = DeltaReader.read(spark, t.toString, filter = Some("pmod(p, 10) = 3 and p < 10"))
    assert(df.inputFiles.length == 1)
    assert(df.count() == 2)
  }

  test("delta: add.stats min/max prune unpartitioned files; missing stats keep") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltastats")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    writeParquetFile(t, "f2.parquet", Seq((150L, "gamma"), (200L, "delta")))
    writeParquetFile(t, "f3.parquet", Seq((50L, "eps"), (60L, "zeta")))
    def stats(lo: Long, hi: Long) =
      s"""{"numRecords":2,"minValues":{"id":$lo},"maxValues":{"id":$hi},"nullCount":{"id":0}}"""
    writeCommit(t, 0, Seq(protocolAction, metaAction(schemaIdName),
      addAction("f1.parquet", stats = stats(1, 2)),
      addAction("f2.parquet", stats = stats(150, 200)),
      addAction("f3.parquet"))) // no stats → must be kept
    val df = DeltaReader.read(spark, t.toString, filter = Some("id > 100"))
    assert(df.inputFiles.length == 2, s"expected f2+f3, got ${df.inputFiles.toSeq}")
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((150L, "gamma"), (200L, "delta"))) // residual filter still exact on f3
    // BETWEEN prunes like its two comparisons (end-to-end through the
    // stats path, not just the conjunct splitter)
    val bt = DeltaReader.read(spark, t.toString, filter = Some("id BETWEEN 150 AND 160"))
    assert(bt.inputFiles.length == 2, s"expected f2+f3, got ${bt.inputFiles.toSeq}")
    assert(bt.as[(Long, String)].collect().toSeq == Seq((150L, "gamma")))
  }

  test("iceberg: p IS NULL skips manifests whose summary says contains_null=false") {
    // every iceberg100 summary has contains_null=false, including the
    // nine dangling manifests — IS NULL must exclude them all unread
    val t = iceberg100()
    val df = IcebergReader.read(spark, t.toString, filter = Some("p IS NULL"))
    assert(df.count() == 0)
  }

  test("delta: date-typed partition values cast and prune correctly") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltadate")
    writeParquetFile(t, "ds=2024-01-01/f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "ds=2024-01-02/f2.parquet", Seq((2L, "beta")))
    val schemaWithDs = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("ds", DateType))).json
    writeCommit(t, 0, Seq(protocolAction, metaAction(schemaWithDs, Seq("ds")),
      addAction("ds=2024-01-01/f1.parquet", """{"ds":"2024-01-01"}"""),
      addAction("ds=2024-01-02/f2.parquet", """{"ds":"2024-01-02"}""")))
    // string literal against the date column: the prune evaluation must
    // apply the same implicit cast the residual filter does
    val df = DeltaReader.read(spark, t.toString, filter = Some("ds = '2024-01-02'"))
    assert(df.inputFiles.length == 1)
    assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
    // and an expression over the partition column evaluates exactly
    val df2 = DeltaReader.read(spark, t.toString, filter = Some("month(ds) = 1 AND day(ds) = 1"))
    assert(df2.inputFiles.length == 1)
    assert(df2.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("delta: generated partition columns derive filters from the source column") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltagen")
    // ds is GENERATED ALWAYS AS (CAST(ts AS DATE)) and is the partition
    // column; the filter touches only ts. Files for other days are
    // dangling, so failing to derive the partition filter cannot plan.
    def writeTs(rel: String, ts: String): Unit = {
      val tmp = Files.createTempDirectory("dgen").toString
      Seq((1L, java.sql.Timestamp.valueOf(ts))).toDF("id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
      val dest = t.resolve(rel); Files.createDirectories(dest.getParent)
      Files.copy(Paths.get(part), dest)
    }
    writeTs("ds=2024-03-15/f.parquet", "2024-03-15 07:30:00")
    val genMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "CAST(ts AS DATE)").build()
    val genSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("ds", DateType, nullable = true, genMeta))).json
    val adds = (10 to 20).map { d =>
      addAction(f"ds=2024-03-$d/f.parquet", s"""{"ds":"2024-03-$d"}""")
    }
    writeCommit(t, 0, Seq(protocolAction, metaAction(genSchema, Seq("ds"))) ++ adds)
    // equality on ts derives ds = CAST(... AS DATE)
    val eq = DeltaReader.read(spark, t.toString,
      filter = Some("ts = TIMESTAMP '2024-03-15 07:30:00'"))
    assert(eq.inputFiles.length == 1, s"expected 1 file, got ${eq.inputFiles.toSeq}")
    assert(eq.select("id").as[Long].collect().toSeq == Seq(1L))
    // ranges derive through the monotone cast: a closed band inside the
    // 15th derives ds >= 15th AND ds <= 15th, pruning the dangling
    // earlier days (>=) and later days (<=) in both directions
    val band = DeltaReader.read(spark, t.toString,
      filter = Some("ts >= TIMESTAMP '2024-03-15 00:00:00' AND ts <= TIMESTAMP '2024-03-15 23:00:00'"))
    assert(band.inputFiles.length == 1, s"expected 1 file, got ${band.inputFiles.toSeq}")
    assert(band.count() == 1)
  }

  test("delta: date_format generated columns derive range filters when monotone") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltagenfmt")
    def writeTs(rel: String, ts: String): Unit = {
      val tmp = Files.createTempDirectory("dgf").toString
      Seq((1L, java.sql.Timestamp.valueOf(ts))).toDF("id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
      val dest = t.resolve(rel); Files.createDirectories(dest.getParent)
      Files.copy(Paths.get(part), dest)
    }
    // month partition via date_format(ts, 'yyyy-MM') — the real-table
    // pattern the cast/trunc whitelist missed; only 2024-03 exists
    writeTs("ym=2024-03/f.parquet", "2024-03-15 07:30:00")
    def table(genExpr: String): Unit = {
      val genMeta = new MetadataBuilder()
        .putString("delta.generationExpression", genExpr).build()
      val genSchema = StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType),
        StructField("ym", StringType, nullable = true, genMeta))).json
      val adds = Seq("2024-01", "2024-02", "2024-03", "2024-04").map(m =>
        addAction(s"ym=$m/f.parquet", s"""{"ym":"$m"}"""))
      writeCommit(t, 0, Seq(protocolAction, metaAction(genSchema, Seq("ym"))) ++ adds)
    }
    table("date_format(ts, 'yyyy-MM')")
    // a March band derives ym >= '2024-03' AND ym <= '2024-03' — the
    // dangling other months cannot even plan if derivation fails
    val band = DeltaReader.read(spark, t.toString,
      filter = Some("ts >= TIMESTAMP '2024-03-01 00:00:00' AND ts < TIMESTAMP '2024-03-20 00:00:00'"))
    assert(band.inputFiles.length == 1, s"expected 1 file, got ${band.inputFiles.toSeq}")
    assert(band.count() == 1)
    // a NON-monotone pattern ('MM' alone reorders across years) must NOT
    // derive ranges — the read fails open and hits the dangling files
    table("date_format(ts, 'MM')")
    intercept[Exception](DeltaReader.read(spark, t.toString,
      filter = Some("ts >= TIMESTAMP '2024-03-01 00:00:00'")).count())
    // time-of-day components run BACKWARD across a DST fall-back — the
    // whitelist is date-granularity only, so 'yyyy-MM-dd HH' fails open
    table("date_format(ts, 'yyyy-MM-dd HH')")
    intercept[Exception](DeltaReader.read(spark, t.toString,
      filter = Some("ts >= TIMESTAMP '2024-03-01 00:00:00'")).count())
  }

  test("delta: stats prune under column mapping via physical-name keys") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltamappedstats")
    // physical column names in the files AND in the stats JSON
    def writePhys(rel: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("dms").toString
      rows.toDF("col-aaa", "col-bbb").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
      val dest = t.resolve(rel); Files.createDirectories(dest.getParent)
      Files.copy(Paths.get(part), dest)
    }
    writePhys("f1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    writePhys("f2.parquet", Seq((150L, "gamma"), (200L, "delta")))
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val mappedSchema = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa", 1)),
      StructField("name", StringType, nullable = true, meta("col-bbb", 2)))).json
    def stats(lo: Long, hi: Long) = // stats keyed by PHYSICAL name
      s"""{"numRecords":2,"minValues":{"col-aaa":$lo},"maxValues":{"col-aaa":$hi},"nullCount":{"col-aaa":0}}"""
    val metaAct =
      s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
         |"schemaString":${js(mappedSchema)},"partitionColumns":[],
         |"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"},
         |"createdTime":1}}""".stripMargin.replace("\n", "")
    writeCommit(t, 0, Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", metaAct,
      addAction("f1.parquet", stats = stats(1, 2)),
      addAction("f2.parquet", stats = stats(150, 200))))
    // the filter names the LOGICAL column; stats are physical-keyed
    val df = DeltaReader.read(spark, t.toString, filter = Some("id > 100"))
    assert(df.inputFiles.length == 1, s"expected only f2, got ${df.inputFiles.toSeq}")
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((150L, "gamma"), (200L, "delta")))
  }

  test("delta: a filter pruning every file returns the typed empty result") {
    val t = delta100(7, 8)
    val df = DeltaReader.read(spark, t.toString, filter = Some("p = 7 AND p = 8"))
    assert(df.columns.toSeq == Seq("id", "name", "p"))
    assert(df.count() == 0)
  }

  test("delta: IS NULL partition filter keeps only the null-partition file") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltanullp")
    writeParquetFile(t, "p=1/f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "nullp/f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction, metaAction(schemaWithP, Seq("p")),
      addAction("p=1/f1.parquet", """{"p":"1"}"""),
      addAction("nullp/f2.parquet", """{"p":null}"""),
      addAction("p=2/DOES_NOT_EXIST.parquet", """{"p":"2"}""")))
    val df = DeltaReader.read(spark, t.toString, filter = Some("p IS NULL"))
    assert(df.inputFiles.length == 1)
    assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
    val notNull = DeltaReader.read(spark, t.toString, filter = Some("p = 1"))
    assert(notNull.inputFiles.length == 1)
    assert(notNull.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("delta: versionAsOf composes with the filter") {
    import spark.implicits._
    val t = delta100(7, 9)
    // time travel to v0 then filter: replay first, prune second
    val df = DeltaReader.read(spark, t.toString, versionAsOf = Some(0L), filter = Some("p = 8"))
    assert(df.inputFiles.length == 1)
    assert(df.select("p").distinct().as[Int].collect().toSeq == Seq(8))
  }

  test("delta: a filter on a non-partition column without stats fails open") {
    import spark.implicits._
    val t = delta100(7, 9)
    // name has no stats and is no partition column: nothing prunes, the
    // two real files both open, and the residual filter stays exact
    val df = DeltaReader.read(spark, t.toString, filter = Some("name = 'alpha' AND p in (7, 8)"))
    assert(df.inputFiles.length == 2) // p-pruning works, name cannot prune
    assert(df.select("name").distinct().as[String].collect().toSeq == Seq("alpha"))
  }

  test("delta: result equals where(filter) when the filter is only partly prunable") {
    import spark.implicits._
    val t = delta100(7, 9)
    val df = DeltaReader.read(spark, t.toString,
      filter = Some("p in (7, 8) AND name like 'a%'"))
    assert(df.inputFiles.length == 2)
    val got = df.select("id", "name", "p").as[(Long, String, Int)].collect().sortBy(r => (r._3, r._1))
    assert(got.toSeq == Seq((1L, "alpha", 7), (1L, "alpha", 8))) // beta filtered by residual
  }

  // ---- Iceberg fixture -----------------------------------------------

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
  private def writeAvro(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.coalesce(1).write.format(avroFmt).save(dir)
    Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".avro")).get
  }
  private def withFieldIds(df: org.apache.spark.sql.DataFrame, ids: Map[String, Int]) =
    df.select(df.columns.map(c => df(c).as(c,
      new MetadataBuilder().putLong("parquet.field.id", ids(c).toLong).build())).toSeq: _*)

  private def leInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** 100-partition Iceberg table as 10 manifests × 10 files. Only the
    * [0, 10) manifest and its files physically exist; the other nine
    * manifests are DANGLING paths whose `partitions` summaries cover
    * [10i, 10i+9] — a reader that opens a skipped manifest crashes. */
  private def iceberg100(): JPath = {
    import spark.implicits._
    val root = Files.createTempDirectory("iceberg100")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2, "p" -> 3)
    val realFiles: Seq[(Int, String)] = (0 until 10).map { p =>
      withFieldIds(Seq((p.toLong * 10 + 1, s"row$p", p)).toDF("id", "name", "p"), ids)
        .coalesce(1).write.parquet(s"$table/data/p$p")
      p -> Files.list(Paths.get(s"$table/data/p$p")).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }
    // manifest 0: the ten real files, each with its partition tuple
    val manifestDf = realFiles.toDF("p", "file_path").selectExpr("1 as status",
      """named_struct('file_path', file_path, 'file_format', 'PARQUET',
        |'content', 0, 'partition', named_struct('p', p)) as data_file""".stripMargin)
    val m0 = writeAvro(manifestDf, s"$table/metadata/manifest0")
    val manifests: Seq[(String, Int, Int)] = // (path, lower, upper)
      (m0, 0, 9) +: (1 until 10).map(i =>
        (s"$table/metadata/DOES_NOT_EXIST_manifest$i.avro", i * 10, i * 10 + 9))
    val listRows = manifests.map { case (p, lo, hi) =>
      org.apache.spark.sql.Row(p, 0, 0,
        Seq(org.apache.spark.sql.Row(false, false, leInt(lo), leInt(hi))))
    }
    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("partition_spec_id", IntegerType),
      StructField("partitions", ArrayType(StructType(Seq(
        StructField("contains_null", BooleanType), StructField("contains_nan", BooleanType),
        StructField("lower_bound", BinaryType), StructField("upper_bound", BinaryType)))))))
    import scala.jdk.CollectionConverters._
    val listPath = writeAvro(spark.createDataFrame(listRows.asJava, listSchema), s"$table/metadata/snap1")
    val metadata =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "11111111-2222-3333-4444-555555555555",
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"},
         |    {"id": 3, "name": "p", "type": "int"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "p", "transform": "identity", "source-id": 3, "field-id": 1000}]}],
         |  "current-snapshot-id": 77,
         |  "snapshots": [{"snapshot-id": 77, "manifest-list": "$listPath"}]
         |}""".stripMargin
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"), metadata)
    root
  }

  test("iceberg: manifest summaries + per-file partition values skip to one file") {
    import spark.implicits._
    val t = iceberg100()
    // p=7 lives in manifest 0; manifests 1..9 MUST be skipped unread
    // (their paths do not exist) and manifest 0's other files pruned
    val df = IcebergReader.read(spark, t.toString, filter = Some("p = 7"))
    assert(df.inputFiles.length == 1, s"expected 1 input file, got ${df.inputFiles.toSeq}")
    assert(df.select("id", "name", "p").as[(Long, String, Int)].collect().toSeq ==
      Seq((71L, "row7", 7)))
  }

  test("iceberg: range filter prunes per-file inside the surviving manifest") {
    val t = iceberg100()
    val df = IcebergReader.read(spark, t.toString, filter = Some("p >= 3 AND p <= 5"))
    assert(df.inputFiles.length == 3)
    assert(df.count() == 3)
  }

  test("iceberg: a filter excluding every manifest returns the typed empty result") {
    val t = iceberg100()
    val df = IcebergReader.read(spark, t.toString, filter = Some("p = 55 AND p = 7"))
    // p=55's manifest is dangling, but rangeExcludes(p=7) kills it and
    // rangeExcludes(p=55) kills manifest 0 — nothing is ever opened
    assert(df.columns.toSeq == Seq("id", "name", "p"))
    assert(df.count() == 0)
  }

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  test("iceberg: per-file column bounds prune like delta stats; no bounds keeps") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergbounds")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2)
    def mk(dir: String, rows: Seq[(Long, String)]): String = {
      withFieldIds(rows.toDF("id", "name"), ids).coalesce(1).write.parquet(s"$table/data/$dir")
      Files.list(Paths.get(s"$table/data/$dir")).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }
    val p1 = mk("f1", Seq((1L, "alpha"), (2L, "beta")))
    val p2 = mk("f2", Seq((150L, "gamma"), (200L, "delta")))
    val p3 = mk("f3", Seq((50L, "eps"), (60L, "zeta")))
    // bounds ride the REAL manifest shape: array of {key, value} records
    // (avro maps need string keys, so Iceberg writes the array form)
    val entries = Seq(
      (1, p1, leLong(1L), leLong(2L)),
      (1, p2, leLong(150L), leLong(200L)),
      (1, p3, null: Array[Byte], null: Array[Byte])) // no bounds → kept
    val manifestDf = entries.toDF("status", "file_path", "lb", "ub").selectExpr("status",
      """named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0,
        |'lower_bounds', CASE WHEN lb IS NULL THEN NULL ELSE array(named_struct('key', 1, 'value', lb)) END,
        |'upper_bounds', CASE WHEN ub IS NULL THEN NULL ELSE array(named_struct('key', 1, 'value', ub)) END
        |) as data_file""".stripMargin)
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table, filter = Some("id > 100"))
    assert(df.inputFiles.length == 2, s"expected f2+f3, got ${df.inputFiles.toSeq}")
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(150L, 200L))
  }

  test("iceberg: decimal column bounds prune exactly (big-endian unscaled)") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergdec")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "price" -> 2)
    def mk(dir: String, rows: Seq[(Long, String)]): String = {
      val df = rows.toDF("id", "p").selectExpr("id", "cast(p as decimal(10,2)) as price")
      withFieldIds(df, ids).coalesce(1).write.parquet(s"$table/data/$dir")
      Files.list(Paths.get(s"$table/data/$dir")).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }
    val p1 = mk("f1", Seq((1L, "10.50"), (2L, "99.99")))
    val p2 = mk("f2", Seq((3L, "150.25"), (4L, "200.00")))
    def beDec(s: String): Array[Byte] = // spec: unscaled two's-complement big-endian
      new java.math.BigDecimal(s).unscaledValue().toByteArray
    val entries = Seq(
      (1, p1, beDec("10.50"), beDec("99.99")),
      (1, p2, beDec("150.25"), beDec("200.00")))
    val manifestDf = entries.toDF("status", "file_path", "lb", "ub").selectExpr("status",
      """named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0,
        |'lower_bounds', array(named_struct('key', 2, 'value', lb)),
        |'upper_bounds', array(named_struct('key', 2, 'value', ub))
        |) as data_file""".stripMargin)
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "price", "type": "decimal(10,2)"}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table, filter = Some("price > 100.00"))
    assert(df.inputFiles.length == 1, s"expected only f2, got ${df.inputFiles.toSeq}")
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("iceberg: partition-spec evolution keeps old-spec files (absent field ≠ null)") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergevolve")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2, "p" -> 3)
    def mk(dir: String, rows: Seq[(Long, String, Int)]): String = {
      withFieldIds(rows.toDF("id", "name", "p"), ids).coalesce(1).write.parquet(s"$table/data/$dir")
      Files.list(Paths.get(s"$table/data/$dir")).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }
    // old era: table was UNPARTITIONED (spec 1, empty fields); its file
    // holds p=2 rows the filter must return. new era: spec 0 partitions
    // by p; the p=3 file is dangling, so pruning it is observable.
    val oldFile = mk("old", Seq((1L, "old-match", 2), (2L, "old-other", 9)))
    val newFile = mk("new", Seq((3L, "new-match", 2)))
    def manifest(dir: String, path: String, p: Any): String = {
      val df = Seq((1, path)).toDF("status", "file_path").selectExpr("status",
        s"""named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0,
           |'partition', named_struct('p', ${p match { case null => "cast(null as int)"; case v => v.toString }})) as data_file""".stripMargin)
      writeAvro(df, s"$table/metadata/$dir")
    }
    // the old manifest's Avro ALSO carries a partition struct (the
    // single-load resolution gives null for spec-evolved files) — the
    // reader must gate on the manifest's spec id, not the JSON shape
    val mOld = manifest("m_old", oldFile, null)
    val mNew = manifest("m_new", newFile, 2)
    val mDangling = manifest("m_dang", s"$table/data/DOES_NOT_EXIST.parquet", 3)
    val listDf = Seq((mOld, 0, 1), (mNew, 0, 0), (mDangling, 0, 0))
      .toDF("manifest_path", "content", "partition_spec_id")
    val listPath = writeAvro(listDf, s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"},
         |    {"id": 3, "name": "p", "type": "int"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [
         |    {"spec-id": 0, "fields": [
         |      {"name": "p", "transform": "identity", "source-id": 3, "field-id": 1000}]},
         |    {"spec-id": 1, "fields": []}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table, filter = Some("p = 2"))
    // the p=3 file pruned (it is dangling — reaching it would crash);
    // the old-spec file KEPT despite its null partition tuple, and the
    // residual filter recovers exactly its p=2 row
    assert(df.select("name").as[String].collect().sorted.toSeq == Seq("new-match", "old-match"))
  }

  test("delta: generated-column derivation is immune to the JVM default timezone") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltagentz")
    def writeTs(rel: String, ts: String): Unit = {
      val tmp = Files.createTempDirectory("dgtz").toString
      Seq((1L, java.sql.Timestamp.valueOf(ts))).toDF("id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
      val dest = t.resolve(rel); Files.createDirectories(dest.getParent)
      Files.copy(Paths.get(part), dest)
    }
    writeTs("ds=2024-06-01/f.parquet", "2024-06-01 12:00:00")
    val genMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "CAST(ts AS DATE)").build()
    val genSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("ds", DateType, nullable = true, genMeta))).json
    writeCommit(t, 0, Seq(protocolAction, metaAction(genSchema, Seq("ds")),
      addAction("ds=2024-06-01/f.parquet", """{"ds":"2024-06-01"}"""),
      addAction("ds=2024-05-31/DOES_NOT_EXIST.parquet", """{"ds":"2024-05-31"}""")))
    // session tz stays UTC; a different JVM default must not shift the
    // derived literal (a toString roundtrip would render NY local time
    // and prune the matching partition)
    val prior = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val df = DeltaReader.read(spark, t.toString,
        filter = Some("ts = TIMESTAMP '2024-06-01 12:00:00'"))
      assert(df.inputFiles.length == 1)
      assert(df.select("id").as[Long].collect().toSeq == Seq(1L))
    } finally java.util.TimeZone.setDefault(prior)
  }

  test("iceberg: non-prunable conjuncts stay exact through the residual filter") {
    import spark.implicits._
    val t = iceberg100()
    val df = IcebergReader.read(spark, t.toString,
      filter = Some("p < 2 AND name = 'row1'"))
    assert(df.inputFiles.length == 2) // p=0 and p=1 opened
    assert(df.select("id").as[Long].collect().toSeq == Seq(11L)) // row0 filtered residually
  }

  /** Data p=3 (one row) + p=7 (two rows) under identity spec 0; a
    * DANGLING delete manifest whose summary covers [10,19]; a REAL
    * pos-delete manifest covering [0,9] listing one real delete (p=7
    * pos 0) and one NONEXISTENT delete file for p=3; optionally a
    * GLOBAL equality-delete manifest under the unpartitioned spec 1
    * (no summary) removing id=72. Scoped-delete flags add data eras
    * under the bucket/truncate specs so the same-spec gate is
    * falsifiable: the delete values always ALSO exist in the spec-0
    * era, where they must survive whatever they recompute to. */
  private def icebergDeletes(withGlobalEq: Boolean, withScopedEq: Boolean = false,
      withBucketEq: Boolean = false, withTruncEq: Boolean = false,
      withStrTruncEq: Boolean = false, withUnsupportedEq: Boolean = false,
      withDangling: Boolean = true): JPath = {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergdel")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2, "p" -> 3)
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    withFieldIds(Seq((31L, "row3", 3)).toDF("id", "name", "p"), ids)
      .coalesce(1).write.parquet(s"$table/data/p3")
    withFieldIds(Seq((71L, "row7a", 7), (72L, "row7b", 7)).toDF("id", "name", "p"), ids)
      .coalesce(1).write.parquet(s"$table/data/p7")
    val (f3, f7) = (partFile(s"$table/data/p3"), partFile(s"$table/data/p7"))
    Seq((f7, 0L)).toDF("file_path", "pos").coalesce(1).write.parquet(s"$table/data/del7")
    val del7 = partFile(s"$table/data/del7")
    val eqPath = if (!withGlobalEq) null else {
      withFieldIds(Seq(Tuple1(72L)).toDF("id"), Map("id" -> 1))
        .coalesce(1).write.parquet(s"$table/data/eqdel")
      partFile(s"$table/data/eqdel")
    }
    // scoped eq delete: values (31, 72) but the file lives in partition
    // p=3 — only 31 may die; 72 is in p=7 and must survive the scope
    val eqScopedPath = if (!withScopedEq) null else {
      withFieldIds(Seq(31L, 72L).toDF("id"), Map("id" -> 1))
        .coalesce(1).write.parquet(s"$table/data/eqscoped")
      partFile(s"$table/data/eqscoped")
    }

    // (status, path, content, partition p/id_bucket/p_trunc/name_trunc,
    // equality ids) — every manifest carries ALL partition fields (one
    // avro read merges their schemas; a file's unused fields stay null
    // and its own spec decides which one scopes)
    case class MRow(status: Int, path: String, content: Int,
        p: Option[Int] = None, bucket: Option[Int] = None, ptr: Option[Int] = None,
        ntr: Option[String] = None, eq: Seq[Int] = Nil)
    def manifest(dir: String, rows: Seq[MRow]): String = {
      val df = rows.map { r =>
        (r.status, r.path, r.content, r.p.map(_.toString).orNull,
          r.bucket.map(_.toString).orNull, r.ptr.map(_.toString).orNull,
          r.ntr.orNull, if (r.eq.isEmpty) null else r.eq) }
        .toDF("status", "file_path", "content", "pstr", "bstr", "tstr", "nstr", "eq_ids")
        .selectExpr("status", "cast(null as bigint) as sequence_number",
          """named_struct('file_path', file_path, 'file_format', 'PARQUET',
            |'content', content, 'partition',
            |named_struct('p', cast(pstr as int), 'id_bucket', cast(bstr as int),
            |             'p_trunc', cast(tstr as int), 'name_trunc', nstr),
            |'equality_ids', eq_ids) as data_file""".stripMargin)
      writeAvro(df, dir)
    }
    val m0 = manifest(s"$table/metadata/m0", Seq(
      MRow(1, f3, 0, p = Some(3)), MRow(1, f7, 0, p = Some(7))))
    val dmReal = manifest(s"$table/metadata/dm0",
      MRow(1, del7, 1, p = Some(7)) +: (if (withDangling)
        Seq(MRow(1, s"$table/data/DOES_NOT_EXIST_del3.parquet", 1, p = Some(3)))
      else Nil))
    val dmEq = if (!withGlobalEq) null else manifest(s"$table/metadata/dmeq", Seq(
      MRow(1, eqPath, 2, eq = Seq(1))))
    val dmEqScoped = if (!withScopedEq) null else manifest(s"$table/metadata/dmeqs", Seq(
      MRow(1, eqScopedPath, 2, p = Some(3), eq = Seq(1))))
    // bucket era (spec 2): one file per bucket — fb1 holds id 31
    // (bucket[4]=1), fb2 holds id 72 (bucket[4]=3). The delete (spec 2,
    // tuple id_bucket=1, values 31 AND 72) kills only fb1's 31: 72
    // recomputes to bucket 3 (tuple mismatch) and the spec-0 copies of
    // both ids survive on the same-spec gate alone.
    val (fb1, fb2) = if (!withBucketEq) (null, null) else {
      withFieldIds(Seq((31L, "b31", 9)).toDF("id", "name", "p"), ids)
        .coalesce(1).write.parquet(s"$table/data/fb1")
      withFieldIds(Seq((72L, "b72", 9)).toDF("id", "name", "p"), ids)
        .coalesce(1).write.parquet(s"$table/data/fb2")
      (partFile(s"$table/data/fb1"), partFile(s"$table/data/fb2"))
    }
    val m2 = if (!withBucketEq) null else manifest(s"$table/metadata/m2", Seq(
      MRow(1, fb1, 0, bucket = Some(1)), MRow(1, fb2, 0, bucket = Some(3))))
    val eqBucketPath = if (!withBucketEq) null else {
      withFieldIds(Seq(31L, 72L).toDF("id"), Map("id" -> 1))
        .coalesce(1).write.parquet(s"$table/data/eqbucket")
      partFile(s"$table/data/eqbucket")
    }
    val dmEqBucket = if (!withBucketEq) null else manifest(s"$table/metadata/dmeqb", Seq(
      MRow(1, eqBucketPath, 2, bucket = Some(1), eq = Seq(1))))
    // truncate era (spec 3 over p int, truncate[2]; spec 4 over name
    // string, truncate[3]): ft1 (id 201, name "alpha1", p=2 → groups
    // int 2 / str "alp"), ft2 (id 203, name "beta2", p=7 → groups
    // int 6 / str "bet"). Each truncate delete carries values
    // (201, 203) and a tuple matching only ft1's group.
    val needTruncData = withTruncEq || withStrTruncEq
    val (ft1, ft2) = if (!needTruncData) (null, null) else {
      withFieldIds(Seq((201L, "alpha1", 2)).toDF("id", "name", "p"), ids)
        .coalesce(1).write.parquet(s"$table/data/ft1")
      withFieldIds(Seq((203L, "beta2", 7)).toDF("id", "name", "p"), ids)
        .coalesce(1).write.parquet(s"$table/data/ft2")
      (partFile(s"$table/data/ft1"), partFile(s"$table/data/ft2"))
    }
    val m3 = if (!withTruncEq) null else manifest(s"$table/metadata/m3", Seq(
      MRow(1, ft1, 0, ptr = Some(2)), MRow(1, ft2, 0, ptr = Some(6))))
    val m4 = if (!withStrTruncEq) null else manifest(s"$table/metadata/m4", Seq(
      MRow(1, ft1, 0, ntr = Some("alp")), MRow(1, ft2, 0, ntr = Some("bet"))))
    val eqTruncPath = if (!needTruncData && !withUnsupportedEq) null else {
      withFieldIds(Seq(201L, 203L).toDF("id"), Map("id" -> 1))
        .coalesce(1).write.parquet(s"$table/data/eqtrunc")
      partFile(s"$table/data/eqtrunc")
    }
    val dmEqTrunc = if (!withTruncEq) null else manifest(s"$table/metadata/dmeqt", Seq(
      MRow(1, eqTruncPath, 2, ptr = Some(2), eq = Seq(1))))
    val dmEqStrTrunc = if (!withStrTruncEq) null else manifest(s"$table/metadata/dmeqnt", Seq(
      MRow(1, eqTruncPath, 2, ntr = Some("alp"), eq = Seq(1))))
    // spec 5 (temporal transform): outside the scoping profile — refuse
    val dmEqUnsupported = if (!withUnsupportedEq) null else manifest(s"$table/metadata/dmequ", Seq(
      MRow(1, eqTruncPath, 2, p = Some(3), eq = Seq(1))))

    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("sequence_number", LongType),
      StructField("partition_spec_id", IntegerType),
      StructField("partitions", ArrayType(StructType(Seq(
        StructField("contains_null", BooleanType), StructField("contains_nan", BooleanType),
        StructField("lower_bound", BinaryType), StructField("upper_bound", BinaryType)))))))
    def sum(lo: Int, hi: Int) = Seq(org.apache.spark.sql.Row(false, false, leInt(lo), leInt(hi)))
    var listRows = Seq(
      org.apache.spark.sql.Row(m0, 0, 1L, 0, sum(0, 9)),
      org.apache.spark.sql.Row(dmReal, 1, 2L, 0, sum(0, 9)))
    if (withDangling)
      listRows = listRows :+
        org.apache.spark.sql.Row(s"$table/metadata/DOES_NOT_EXIST_dm.avro", 1, 2L, 0, sum(10, 19))
    if (withGlobalEq)
      listRows = listRows :+ org.apache.spark.sql.Row(dmEq, 1, 3L, 1, null)
    if (withScopedEq)
      listRows = listRows :+ org.apache.spark.sql.Row(dmEqScoped, 1, 3L, 0, sum(0, 9))
    if (withBucketEq)
      listRows = listRows ++ Seq(
        org.apache.spark.sql.Row(m2, 0, 1L, 2, null),
        org.apache.spark.sql.Row(dmEqBucket, 1, 3L, 2, null))
    if (withTruncEq)
      listRows = listRows ++ Seq(
        org.apache.spark.sql.Row(m3, 0, 1L, 3, null),
        org.apache.spark.sql.Row(dmEqTrunc, 1, 3L, 3, null))
    if (withStrTruncEq)
      listRows = listRows ++ Seq(
        org.apache.spark.sql.Row(m4, 0, 1L, 4, null),
        org.apache.spark.sql.Row(dmEqStrTrunc, 1, 3L, 4, null))
    if (withUnsupportedEq)
      listRows = listRows :+ org.apache.spark.sql.Row(dmEqUnsupported, 1, 3L, 5, null)
    import scala.jdk.CollectionConverters._
    val listPath = writeAvro(spark.createDataFrame(listRows.asJava, listSchema), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{
         |  "format-version": 2,
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"},
         |    {"id": 3, "name": "p", "type": "int"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [
         |    {"spec-id": 0, "fields": [
         |      {"name": "p", "transform": "identity", "source-id": 3, "field-id": 1000}]},
         |    {"spec-id": 1, "fields": []},
         |    {"spec-id": 2, "fields": [
         |      {"name": "id_bucket", "transform": "bucket[4]", "source-id": 1, "field-id": 1001}]},
         |    {"spec-id": 3, "fields": [
         |      {"name": "p_trunc", "transform": "truncate[2]", "source-id": 3, "field-id": 1002}]},
         |    {"spec-id": 4, "fields": [
         |      {"name": "name_trunc", "transform": "truncate[3]", "source-id": 2, "field-id": 1003}]},
         |    {"spec-id": 5, "fields": [
         |      {"name": "p_year", "transform": "year", "source-id": 3, "field-id": 1004}]}],
         |  "current-snapshot-id": 77,
         |  "snapshots": [{"snapshot-id": 77, "manifest-list": "$listPath"}]
         |}""".stripMargin)
    root
  }

  test("iceberg: delete manifests and delete files prune by partition; kept deletes apply") {
    import spark.implicits._
    val t = icebergDeletes(withGlobalEq = false)
    val df = IcebergReader.read(spark, t.toString, filter = Some("p = 7"))
    // the [10,19] delete manifest is skipped UNREAD (its path does not
    // exist); the p=3 delete file (nonexistent) prunes per-file; the
    // p=7 pos delete still applies, removing (71, row7a)
    assert(df.select("id", "name", "p").as[(Long, String, Int)].collect().toSeq ==
      Seq((72L, "row7b", 7)))
    // negative control: an unfiltered read must hit the dangling manifest
    intercept[Exception](IcebergReader.read(spark, t.toString).count())
  }

  test("iceberg: global equality deletes (unpartitioned spec) survive partition pruning") {
    val t = icebergDeletes(withGlobalEq = true)
    val df = IcebergReader.read(spark, t.toString, filter = Some("p = 7"))
    // the pos delete removed 71; the GLOBAL eq delete (id=72, spec 1,
    // no partition tuple) must NOT be pruned by the p=7 filter
    assert(df.count() == 0L)
  }

  test("iceberg: partitioned equality deletes apply ONLY in their own partition") {
    import spark.implicits._
    // eq delete values (31, 72) scoped to partition p=3: 31 dies, 72
    // (same value, partition p=7) SURVIVES — global application would
    // have emptied the table. Pos delete still removes 71.
    val t = icebergDeletes(withGlobalEq = false, withScopedEq = true, withDangling = false)
    val df = IcebergReader.read(spark, t.toString)
    assert(df.select("id", "name", "p").as[(Long, String, Int)].collect().toSeq ==
      Seq((72L, "row7b", 7)))
    // and filtering composes: read(p = 7) sees the same surviving row
    val filtered = IcebergReader.read(spark, t.toString, filter = Some("p = 7"))
    assert(filtered.select("id").as[Long].collect().toSeq == Seq(72L))
  }

  test("iceberg: bucket-scoped equality deletes recompute murmur3 per row AND gate on spec id") {
    import spark.implicits._
    // eq delete (spec 2, tuple id_bucket=1, values 31 AND 72): in the
    // spec-2 era, bucket[4](31)=1 so fb1's 31 dies and bucket[4](72)=3
    // so fb2's 72 survives the tuple; in the spec-0 era, BOTH ids
    // survive on the same-spec gate alone — without it, f3's 31
    // (recomputing to bucket 1) would be silently over-deleted, the
    // migrated-unpartitioned-to-bucket[N] CDC scenario. Pos delete
    // removes 71.
    val t = icebergDeletes(withGlobalEq = false, withBucketEq = true, withDangling = false)
    val df = IcebergReader.read(spark, t.toString)
    assert(df.select("id", "name", "p").as[(Long, String, Int)].collect().sortBy(r => (r._1, r._2)).toSeq ==
      Seq((31L, "row3", 3), (72L, "b72", 9), (72L, "row7b", 7)))
  }

  test("iceberg: truncate-scoped equality deletes recompute the int prefix group per row") {
    import spark.implicits._
    // eq delete (spec 3 = truncate[2] over int p, tuple p_trunc=2,
    // values 201 AND 203): ft1 (p=2 → group 2) dies, ft2 (p=7 → group
    // 6) survives the tuple; the spec-0 era is untouched (31 survives
    // the gate, 71 goes to the pos delete).
    val t = icebergDeletes(withGlobalEq = false, withTruncEq = true, withDangling = false)
    val df = IcebergReader.read(spark, t.toString)
    assert(df.select("id", "name", "p").as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      Seq((31L, "row3", 3), (72L, "row7b", 7), (203L, "beta2", 7)))
  }

  test("iceberg: truncate-scoped equality deletes take string prefixes by code point") {
    import spark.implicits._
    // eq delete (spec 4 = truncate[3] over string name, tuple
    // name_trunc='alp', values 201 AND 203): 'alpha1' truncates to
    // 'alp' so ft1's 201 dies; 'beta2' → 'bet' so ft2's 203 survives.
    val t = icebergDeletes(withGlobalEq = false, withStrTruncEq = true, withDangling = false)
    val df = IcebergReader.read(spark, t.toString)
    assert(df.select("id", "name", "p").as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      Seq((31L, "row3", 3), (72L, "row7b", 7), (203L, "beta2", 7)))
  }

  test("iceberg: global and partition-scoped equality deletes compose in one snapshot") {
    // pos delete removes 71; the GLOBAL eq delete removes 72 everywhere;
    // the p=3-scoped eq delete removes 31 — one anti-join per
    // (equality-cols, scope) group, empty table at the end
    val t = icebergDeletes(withGlobalEq = true, withScopedEq = true, withDangling = false)
    assert(IcebergReader.read(spark, t.toString).count() == 0L)
  }

  test("iceberg: truncate-scoped equality deletes over DECIMAL columns floor the unscaled value") {
    import spark.implicits._
    // spec example: truncate[50] of decimal 10.65 (unscaled 1065, scale
    // kept) → 10.50. fd1 (id 301, d 10.65 → group 10.50) matches the
    // delete tuple and dies; fd2 (id 303, d 22.22 → group 22.00)
    // recomputes to a different group and SURVIVES even though its id
    // is among the delete values — the discriminating pair (round 11,
    // converts the r10 decimal refusal into a scoped read).
    val root = Files.createTempDirectory("icebergdectrunc")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val ids = Map("id" -> 1, "d" -> 2)
    def dataFile(dir: String, id: Long, d: String): String = {
      withFieldIds(Seq((id, d)).toDF("id", "dstr")
        .selectExpr("id", "cast(dstr as decimal(9,2)) as d"), ids)
        .coalesce(1).write.parquet(dir)
      partFile(dir)
    }
    val fd1 = dataFile(s"$table/data/fd1", 301L, "10.65")
    val fd2 = dataFile(s"$table/data/fd2", 303L, "22.22")
    withFieldIds(Seq(301L, 303L).toDF("id"), Map("id" -> 1))
      .coalesce(1).write.parquet(s"$table/data/eqdec")
    val eqDec = partFile(s"$table/data/eqdec")
    def manifest(dir: String, rows: Seq[(Int, String, Int, String, Seq[Int])]): String = {
      val df = rows.map { case (st, p, c, tr, eq) =>
        (st, p, c, tr, if (eq.isEmpty) null else eq) }
        .toDF("status", "file_path", "content", "dstr", "eq_ids")
        .selectExpr("status", "cast(null as bigint) as sequence_number",
          """named_struct('file_path', file_path, 'file_format', 'PARQUET',
            |'content', content, 'partition',
            |named_struct('d_trunc', cast(dstr as decimal(9,2))),
            |'equality_ids', eq_ids) as data_file""".stripMargin)
      writeAvro(df, dir)
    }
    val m1 = manifest(s"$table/metadata/m1", Seq(
      (1, fd1, 0, "10.50", Nil), (1, fd2, 0, "22.00", Nil)))
    val dm = manifest(s"$table/metadata/dm1", Seq(
      (1, eqDec, 2, "10.50", Seq(1))))
    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("sequence_number", LongType), StructField("partition_spec_id", IntegerType)))
    import scala.jdk.CollectionConverters._
    val listRows = Seq(
      org.apache.spark.sql.Row(m1, 0, 1L, 1),
      org.apache.spark.sql.Row(dm, 1, 3L, 1))
    val listPath = writeAvro(spark.createDataFrame(listRows.asJava, listSchema), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{
         |  "format-version": 2,
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "d", "type": "decimal(9, 2)"}]}],
         |  "default-spec-id": 1,
         |  "partition-specs": [
         |    {"spec-id": 0, "fields": []},
         |    {"spec-id": 1, "fields": [
         |      {"name": "d_trunc", "transform": "truncate[50]", "source-id": 2, "field-id": 1000}]}],
         |  "current-snapshot-id": 77,
         |  "snapshots": [{"snapshot-id": 77, "manifest-list": "$listPath"}]
         |}""".stripMargin)
    val df = IcebergReader.read(spark, table)
    assert(df.select("id", "d").collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString))
      .toSeq == Seq((303L, "22.22")))
  }

  // ---- format-version 3: puffin deletion vectors (round 11) ----------

  /** DV payload deleting `positions` (all < 2^16): magic + roaring64
    * with one keyed roaring32 array container — Delta PROTOCOL.md
    * layout, which the Iceberg v3 spec adopts verbatim for
    * deletion-vector-v1 blobs. */
  private def dvData(positions: Seq[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 16 + 2 * positions.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377).putLong(1L).putInt(0) // magic, nBitmaps, key 0
    bb.putInt(12346).putInt(1)                  // roaring32 no-run cookie, 1 container
    bb.putShort(0).putShort((positions.size - 1).toShort) // container key, card-1
    bb.putInt(16)                               // offsets table (1 entry)
    positions.sorted.foreach(p => bb.putShort(p.toShort))
    bb.array()
  }

  /** v3 table: data p=3 (3 rows, real) + p=9 (NONEXISTENT path), plus
    * a puffin DV over the p=3 file deleting positions {0, 2}. */
  private def icebergV3Dv(formatVersion: Int = 3, withParquetPosDelete: Boolean = false,
      recordCount: Long = 2L, initialDefault: Boolean = false): JPath = {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergv3dv")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val ids = Map("id" -> 1, "name" -> 2, "p" -> 3)
    withFieldIds(Seq((1L, "a", 3), (2L, "b", 3), (3L, "c", 3)).toDF("id", "name", "p"), ids)
      .coalesce(1).write.parquet(s"$table/data/fdv1")
    val fdv1 = partFile(s"$table/data/fdv1")
    // puffin: 4-byte header, then the DV blob ([len BE][magic+vector][CRC BE])
    val dv = dvData(Seq(0, 2))
    val crc = new java.util.zip.CRC32(); crc.update(dv)
    val blob = java.nio.ByteBuffer.allocate(4 + dv.length + 4)
      .putInt(dv.length).put(dv).putInt(crc.getValue.toInt).array()
    val puffinPath = s"$table/data/dv1.puffin"
    Files.write(Paths.get(puffinPath), "PFA1".getBytes ++ blob ++ "PFA1".getBytes)
    def manifest(dir: String, rows: Seq[(Int, String, String, Int, Option[Int],
        Option[(String, Long, Long, Long)])]): String = {
      val df = rows.map { case (st, p, fmt, c, pv, dvRef) =>
        (st, p, fmt, c, pv.map(_.toString).orNull, dvRef.map(_._1).orNull,
          dvRef.map(d => java.lang.Long.valueOf(d._2)).orNull,
          dvRef.map(d => java.lang.Long.valueOf(d._3)).orNull,
          dvRef.map(d => java.lang.Long.valueOf(d._4)).orNull) }
        .toDF("status", "file_path", "fmt", "content", "pstr", "refdf", "coff", "csz", "rcnt")
        .selectExpr("status", "cast(null as bigint) as sequence_number",
          """named_struct('file_path', file_path, 'file_format', fmt,
            |'content', content, 'partition', named_struct('p', cast(pstr as int)),
            |'referenced_data_file', refdf, 'content_offset', coff,
            |'content_size_in_bytes', csz, 'record_count', rcnt) as data_file""".stripMargin)
      writeAvro(df, dir)
    }
    val m0 = manifest(s"$table/metadata/m0", Seq(
      (1, fdv1, "PARQUET", 0, Some(3), None),
      (1, s"$table/data/DOES_NOT_EXIST_p9.parquet", "PARQUET", 0, Some(9), None)))
    val dm = manifest(s"$table/metadata/dm0", Seq(
      if (withParquetPosDelete) (1, s"$table/data/DOES_NOT_EXIST_pos.parquet", "PARQUET", 1, Some(3), None)
      else (1, puffinPath, "PUFFIN", 1, Some(3),
        Some((fdv1, 4L, blob.length.toLong, recordCount)))))
    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("sequence_number", LongType), StructField("partition_spec_id", IntegerType)))
    import scala.jdk.CollectionConverters._
    val listRows = Seq(
      org.apache.spark.sql.Row(m0, 0, 1L, 0),
      org.apache.spark.sql.Row(dm, 1, 2L, 0))
    val listPath = writeAvro(spark.createDataFrame(listRows.asJava, listSchema), s"$table/metadata/snap1")
    val defaultClause = if (initialDefault) """, "initial-default": 42""" else ""
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{
         |  "format-version": $formatVersion,
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"$defaultClause},
         |    {"id": 2, "name": "name", "type": "string"},
         |    {"id": 3, "name": "p", "type": "int"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "p", "transform": "identity", "source-id": 3, "field-id": 1000}]}],
         |  "current-snapshot-id": 77,
         |  "snapshots": [{"snapshot-id": 77, "manifest-list": "$listPath"}]
         |}""".stripMargin)
    root
  }

  test("iceberg v3: puffin deletion vectors apply like position deletes; pruning still fires") {
    import spark.implicits._
    val t = icebergV3Dv()
    // the p=9 data file does not exist: only a read that prunes it AND
    // decodes the DV can answer — positions 0 and 2 of the p=3 file die
    val df = IcebergReader.read(spark, t.toString, filter = Some("p = 3"))
    assert(df.select("id", "name").as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    // negative control: unfiltered hits the dangling p=9 file
    intercept[Exception](IcebergReader.read(spark, t.toString).count())
  }

  test("iceberg v3: a wrong record_count refuses (misparse gate), never silently misapplies") {
    val t = icebergV3Dv(recordCount = 7L)
    val e = intercept[Exception](
      IcebergReader.read(spark, t.toString, filter = Some("p = 3")).count())
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("refusing a misparsed vector")))
  }

  test("iceberg v3 gates: DVs in v2 refuse; parquet position deletes in v3 refuse; id-bearing files ignore initial-default") {
    import spark.implicits._
    val e1 = intercept[Exception](
      IcebergReader.read(spark, icebergV3Dv(formatVersion = 2).toString, filter = Some("p = 3")))
    assert(e1.getMessage.contains("v1/v2"))
    val e2 = intercept[Exception](
      IcebergReader.read(spark, icebergV3Dv(withParquetPosDelete = true).toString, filter = Some("p = 3")))
    assert(e2.getMessage.contains("deletion"))
    // initial-default on a top-level primitive SERVES (round 12): this
    // fixture's data file CARRIES the field id, so its real values win
    // over the default and the DV still applies
    val served = IcebergReader.read(spark,
      icebergV3Dv(initialDefault = true).toString, filter = Some("p = 3"))
    assert(served.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("iceberg v3 initial-default: files predating the field read the default; id-bearing files keep real values/nulls") {
    import spark.implicits._
    val root = Files.createTempDirectory("iceberbdefaults")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    // old file: written BEFORE tag/d existed (only id, with its field id)
    withFieldIds(Seq(1L, 2L).toDF("id"), Map("id" -> 1))
      .coalesce(1).write.parquet(s"$table/data/old")
    // new file: carries every field id, including a REAL NULL tag
    withFieldIds(Seq((3L, "real", "2024-06-01"), (4L, null.asInstanceOf[String], "2024-06-02"))
      .toDF("id", "tag", "d").selectExpr("id", "tag", "cast(d as date) as d"),
      Map("id" -> 1, "tag" -> 2, "d" -> 3))
      .coalesce(1).write.parquet(s"$table/data/new")
    val m = writeAvro(Seq(partFile(s"$table/data/old"), partFile(s"$table/data/new"))
      .toDF("file_path")
      .selectExpr("1 as status", "cast(null as bigint) as sequence_number",
        "named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0) as data_file"),
      s"$table/metadata/m0")
    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("sequence_number", LongType), StructField("partition_spec_id", IntegerType)))
    import scala.jdk.CollectionConverters._
    val listPath = writeAvro(spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(m, 0, 1L, 0)).asJava, listSchema), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{
         |  "format-version": 3,
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "tag", "type": "string", "initial-default": "legacy"},
         |    {"id": 3, "name": "d", "type": "date", "initial-default": "2020-01-05"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "current-snapshot-id": 77,
         |  "snapshots": [{"snapshot-id": 77, "manifest-list": "$listPath"}]
         |}""".stripMargin)
    val got = IcebergReader.read(spark, table)
      .selectExpr("id", "tag", "cast(d as string) as d")
      .as[(Long, Option[String], String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some("legacy"), "2020-01-05"),   // predates the fields: defaults
      (2L, Some("legacy"), "2020-01-05"),
      (3L, Some("real"), "2024-06-01"),     // real values win
      (4L, None, "2024-06-02")))            // a REAL null stays null
    // initial-default inside a list/map subtree still refuses loudly at
    // schema conversion (struct-nested serves as of round 15)
    val inList = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      """{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "a", "type": {"type": "list", "element-id": 2, "element":
        |    {"type": "struct", "fields": [
        |      {"id": 3, "name": "x", "type": "long", "initial-default": 9}]}}}]}""".stripMargin)
    val e = intercept[Exception](IcebergReader.toSparkSchema(inList))
    assert(e.getMessage.contains("list/map"))
  }

  test("iceberg v3 nested initial-default: struct-nested defaults serve; null parent structs stay null") {
    import org.apache.spark.sql.Row
    val root = Files.createTempDirectory("icebergnesteddef")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    def fid(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    import scala.jdk.CollectionConverters._
    // old file: written BEFORE s.y existed — s carries only x(3); one
    // row's s is NULL outright (must STAY null: a missing parent struct
    // never materializes from a child default, iceberg-java semantics)
    val oldSchema = StructType(Seq(
      StructField("id", LongType, nullable = true, fid(1)),
      StructField("s", StructType(Seq(
        StructField("x", LongType, nullable = true, fid(3)))), nullable = true, fid(2))))
    spark.createDataFrame(
      Seq(Row(1L, Row(10L)), Row(2L, null)).asJava, oldSchema)
      .coalesce(1).write.parquet(s"$table/data/old")
    // new file: carries y(4), including a REAL NULL y
    val newSchema = StructType(Seq(
      StructField("id", LongType, nullable = true, fid(1)),
      StructField("s", StructType(Seq(
        StructField("x", LongType, nullable = true, fid(3)),
        StructField("y", IntegerType, nullable = true, fid(4)))), nullable = true, fid(2))))
    spark.createDataFrame(
      Seq(Row(3L, Row(30L, 5)), Row(4L, Row(40L, null))).asJava, newSchema)
      .coalesce(1).write.parquet(s"$table/data/new")
    import spark.implicits._
    val m = writeAvro(Seq(partFile(s"$table/data/old"), partFile(s"$table/data/new"))
      .toDF("file_path")
      .selectExpr("1 as status", "cast(null as bigint) as sequence_number",
        "named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0) as data_file"),
      s"$table/metadata/m0")
    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("sequence_number", LongType), StructField("partition_spec_id", IntegerType)))
    val listPath = writeAvro(spark.createDataFrame(
      Seq(Row(m, 0, 1L, 0)).asJava, listSchema), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{
         |  "format-version": 3,
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "s", "type": {"type": "struct", "fields": [
         |      {"id": 3, "name": "x", "type": "long"},
         |      {"id": 4, "name": "y", "type": "int", "initial-default": 7}]}}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "current-snapshot-id": 77,
         |  "snapshots": [{"snapshot-id": 77, "manifest-list": "$listPath"}]
         |}""".stripMargin)
    val got = IcebergReader.read(spark, table)
      .selectExpr("id", "s.x as x", "s.y as y")
      .as[(Long, Option[Long], Option[Int])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(7)),   // predates y: the nested default
      (2L, None, None),           // null parent struct stays null
      (3L, Some(30L), Some(5)),   // real values win
      (4L, Some(40L), None)))     // a REAL null stays null
  }

  test("iceberg: equality deletes under an unsupported partition transform refuse loudly") {
    // spec 5 partitions by year(p) — temporal scoping is outside the
    // profile (identity/bucket/truncate only); applying the delete
    // globally would over-delete, so the read refuses
    val t = icebergDeletes(withGlobalEq = false, withScopedEq = true,
      withUnsupportedEq = true, withDangling = false)
    val e = intercept[IllegalArgumentException](IcebergReader.read(spark, t.toString).count())
    assert(e.getMessage.contains("non-identity"))
  }
}
