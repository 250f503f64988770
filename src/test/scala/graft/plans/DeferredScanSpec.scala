package graft.plans

import graft.SparkSpec
import graft.datatypes.DataRef
import graft.readers.{DeltaReader, IcebergReader}
import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.spark.sql.types._

/** Scale contract for AUTOMATIC file skipping (VERDICT r8 #1): the
  * deferred-scan frames returned by `DeltaReader.table` /
  * `IcebergReader.table` (and the registry/catalog surface built on
  * them) must prune files from the QUERY's own filters — `.where()`,
  * `spark.sql` over a temp view, `Catalog.sql` — with no filter string
  * threaded by hand. Non-skipping is unfalsifiable by construction:
  * every file/manifest a filter excludes points at a NONEXISTENT path,
  * so a plan that fails to skip cannot even be constructed, let alone
  * return rows.
  */
class DeferredScanSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)

  // ---- delta fixture (FileSkippingSpec mold) -------------------------

  private val schemaWithP = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("p", IntegerType))).json

  private def metaAction(schema: String, partitionCols: Seq[String]): String =
    s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
       |"schemaString":${js(schema)},
       |"partitionColumns":[${partitionCols.map(js).mkString(",")}],
       |"configuration":{},"createdTime":1}}""".stripMargin.replace("\n", "")
  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def addAction(path: String, pv: String): String =
    s"""{"add":{"path":${js(path)},"partitionValues":$pv,"size":1,"modificationTime":1,"dataChange":true}}"""
  private def writeCommit(table: JPath, version: Long, actions: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"), actions.mkString("\n") + "\n")
  }
  private def writeParquetFile(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dsparts").toString
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }

  /** 100-partition Delta table; ONLY partitions [realFrom, realTo) have
    * physical files — every other add points at a nonexistent path. */
  private def delta100(realFrom: Int, realTo: Int): JPath = {
    val t = Files.createTempDirectory("dsdelta")
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

  test("delta: .where on the deferred frame prunes to the matching partition") {
    import spark.implicits._
    val df = DeltaReader.table(spark, delta100(7, 8).toString) // only p=7 exists
    val got = df.where("p = 7").select("id", "name", "p")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "alpha", 7), (2L, "beta", 7)))
  }

  test("delta: registration probes metadata only; an unfiltered read still fails") {
    val df = DeltaReader.table(spark, delta100(7, 8).toString) // registration OK
    assert(df.columns.toSeq == Seq("id", "name", "p"))
    // negative control: with no filter nothing can prune, and the 99
    // dangling adds make the scan unplannable — proving the fixture
    // really forces pruning in the positive cases
    intercept[Exception](df.count())
  }

  test("delta: spark.sql over a temp view prunes; projection composes") {
    val df = DeltaReader.table(spark, delta100(7, 8).toString)
    df.createOrReplaceTempView("ds_delta_v")
    val rows = spark.sql("SELECT name FROM ds_delta_v WHERE p = 7 ORDER BY name")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("alpha", "beta"))
    // aggregate above the pruned scan
    assert(spark.sql("SELECT count(*) FROM ds_delta_v WHERE p = 7").collect().head.getLong(0) == 2L)
  }

  test("delta: residual conjuncts and unpushable conjuncts stay exact") {
    val df = DeltaReader.table(spark, delta100(7, 8).toString)
    // mixed filter: p=7 prunes, id >= 2 filters residually
    assert(df.where("p = 7 AND id >= 2").count() == 1L)
    // a nondeterministic conjunct must NOT block the deterministic one
    // from pruning (rand() < 2 is always true; the partition conjunct
    // still reaches the reader or the dangling adds would blow up)
    assert(df.where("p = 7 AND rand() < 2.0").count() == 2L)
    // time-dependent functions are frozen to literals by the optimizer
    // BEFORE the rewrite, so they push safely on this path
    assert(df.where("p = 7 AND p < year(current_date())").count() == 2L)
  }

  test("delta: UDF and registered-function conjuncts are never pushed; the rest still prunes") {
    import org.apache.spark.sql.functions.{col, udf}
    val df = DeltaReader.table(spark, delta100(7, 8).toString)
    // a resolved ScalaUDF renders as UDF(...) — pushing it would make
    // the reader's residual re-parse fail (or resolve to something
    // else); it must ride the retained Filter while p = 7 still prunes
    val pos = udf((p: Int) => p > 0)
    assert(df.where(pos(col("p")) && col("p") === 7).count() == 2L)
    // session-registered functions are not builtin either — same path
    spark.udf.register("ds_spec_gt", (p: Int, n: Int) => p > n)
    assert(df.where("ds_spec_gt(id, 1) AND p = 7").count() == 1L)
    // a UDF registered under a BUILTIN name renders as that name — the
    // ScalaUDF gate keeps it on the retained Filter, where the caller
    // session resolves the USER's function, not the builtin
    val fid = org.apache.spark.sql.catalyst.FunctionIdentifier("abs")
    val reg = spark.sessionState.functionRegistry
    val prev = reg.lookupFunction(fid).zip(reg.lookupFunctionBuilder(fid))
    spark.udf.register("abs", (x: Long) => x + 100L)
    try assert(df.where("abs(id) = 101 AND p = 7").count() == 1L) // user's abs: 1+100
    finally prev.foreach { case (i, b) => reg.registerFunction(fid, i, b) }
  }

  test("delta: a self-joined view realizes one pruned subtree per leg") {
    val df = DeltaReader.table(spark, delta100(7, 8).toString)
    df.createOrReplaceTempView("ds_delta_sj")
    val n = spark.sql(
      """SELECT a.id FROM ds_delta_sj a JOIN ds_delta_sj b ON a.id = b.id
        |WHERE a.p = 7 AND b.p = 7""".stripMargin).count()
    assert(n == 2L)
  }

  test("delta: registry wrapper serves the deferred frame; Catalog.sql prunes") {
    val t = delta100(7, 8)
    val cat = graft.catalog.Catalog()
      .add("dtab", DataRef("delta", t.toString), "delta_native")
    val out = cat.sql(spark,
      "SELECT id, name FROM dtab WHERE p = 7 ORDER BY id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  test("delta: an explicit reader filter option keeps the eager pruned read") {
    val t = delta100(7, 8)
    val ref = DataRef("delta", t.toString, Map("filter" -> "p = 7"))
    val df = new graft.readers.DeltaReaderImpl().read(spark, ref)
    // eager frame: already pruned, collectable without further filters
    assert(df.count() == 2L)
  }

  // ---- iceberg fixture (FileSkippingSpec mold) -----------------------

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

  /** 100-partition Iceberg table as 10 manifests × 10 files; only
    * manifest 0 and its files exist, the other nine are dangling. */
  private def iceberg100(): JPath = {
    import spark.implicits._
    val root = Files.createTempDirectory("dsiceberg")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2, "p" -> 3)
    val realFiles: Seq[(Int, String)] = (0 until 10).map { p =>
      withFieldIds(Seq((p.toLong * 10 + 1, s"row$p", p)).toDF("id", "name", "p"), ids)
        .coalesce(1).write.parquet(s"$table/data/p$p")
      p -> Files.list(Paths.get(s"$table/data/p$p")).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }
    val manifestDf = realFiles.toDF("p", "file_path").selectExpr("1 as status",
      """named_struct('file_path', file_path, 'file_format', 'PARQUET',
        |'content', 0, 'partition', named_struct('p', p)) as data_file""".stripMargin)
    val m0 = writeAvro(manifestDf, s"$table/metadata/manifest0")
    val manifests: Seq[(String, Int, Int)] =
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
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
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
         |}""".stripMargin)
    root
  }

  test("iceberg: spark.sql over a deferred view skips dangling manifests") {
    import spark.implicits._
    val df = IcebergReader.table(spark, iceberg100().toString)
    df.createOrReplaceTempView("ds_ice_v")
    val got = spark.sql("SELECT id, name, p FROM ds_ice_v WHERE p = 7")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((71L, "row7", 7)))
    // range filter: manifest 0 survives, per-file pruning narrows inside
    assert(spark.sql("SELECT count(*) FROM ds_ice_v WHERE p >= 3 AND p <= 5")
      .collect().head.getLong(0) == 3L)
    // negative control: unfiltered must hit the dangling manifests
    intercept[Exception](df.count())
  }

  test("SnapshotPin: first resolution per key wins inside a pass; none outside") {
    assert(SnapshotPin.pin("sp_k")(10) == 10)
    assert(SnapshotPin.pin("sp_k")(20) == 20) // no scope open: resolve directly
    SnapshotPin.enter()
    try {
      assert(SnapshotPin.pin("sp_k")(1) == 1)
      assert(SnapshotPin.pin("sp_k")(2) == 1) // pinned for the pass
      SnapshotPin.enter() // a nested pass shares the outermost pins
      try assert(SnapshotPin.pin("sp_k")(3) == 1) finally SnapshotPin.exit()
      assert(SnapshotPin.pin("sp_k")(4) == 1) // still pinned after nested exit
      assert(SnapshotPin.pin("sp_other")(7) == 7)
    } finally SnapshotPin.exit()
    assert(SnapshotPin.pin("sp_k")(5) == 5) // scope closed: pins cleared
  }

  test("a wholesale extraOptimizations reset fails actionably; install() heals the session") {
    // isolated session: ExperimentalMethods is per-SessionState, so the
    // shared suite session never sees the wipe
    val s2 = spark.newSession()
    val df = DeltaReader.table(s2, delta100(7, 8).toString)
    df.createOrReplaceTempView("ds_guard_v")
    assert(s2.sql("SELECT count(*) FROM ds_guard_v WHERE p = 7").collect().head.getLong(0) == 2L)
    // user code replaces the experimental optimizations wholesale: the
    // rewrite is gone, but the guard strategy names the fix instead of
    // Spark's generic planner error
    val exp = s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    exp.extraOptimizations = Seq.empty
    val e = intercept[Exception](s2.sql("SELECT count(*) FROM ds_guard_v WHERE p = 7").collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("DeferredScan.install")))
    DeferredScan.install(s2)
    assert(s2.sql("SELECT count(*) FROM ds_guard_v WHERE p = 7").collect().head.getLong(0) == 2L)
  }

  test("delta: a version-pinned deferred frame composes pinning with pruning") {
    val t = delta100(7, 8)
    // commit 1 adds a second real p=7 file — the pin must hide it
    writeParquetFile(t, "p=7/g.parquet", Seq((5L, "extra")))
    writeCommit(t, 1, Seq(addAction("p=7/g.parquet", """{"p":"7"}""")))
    val pinned = DeltaReader.table(spark, t.toString, versionAsOf = Some(0L))
    assert(pinned.where("p = 7").count() == 2L)
    val live = DeltaReader.table(spark, t.toString)
    assert(live.where("p = 7").count() == 3L)
  }

  test("delta: column pruning and residual pushdown reach the parquet scan") {
    val df = DeltaReader.table(spark, delta100(7, 8).toString)
    df.createOrReplaceTempView("ds_delta_prune")
    val q = spark.sql("SELECT name FROM ds_delta_prune WHERE p = 7 AND id > 0")
    val plan = q.queryExecution.executedPlan.toString
    // the realized subtree is ordinary FileScan parquet: Catalyst prunes
    // the read schema to the referenced data columns and pushes the
    // residual data conjunct into the scan — the DSv2
    // SupportsPushDownRequiredColumns/Filters behaviors, for free
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.matches("(?s).*ReadSchema:[^\\n]*p:.*"), s"partition col in read schema:\n$plan")
    assert(plan.matches("(?s).*PushedFilters:[^\\n]*GreaterThan\\(id,0\\).*"), plan)
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("alpha", "beta"))
  }

  test("iceberg: Catalog.sql over the registry wrapper prunes") {
    val t = iceberg100()
    val cat = graft.catalog.Catalog()
      .add("itab", DataRef("iceberg", t.toString), "iceberg_native")
    val out = cat.sql(spark, "SELECT id FROM itab WHERE p = 7").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(71L))
  }

  // ---- join-driven pruning (VERDICT r9 #1) ---------------------------

  /** Parquet-backed dim (a LocalRelation would constant-fold through
    * the optimizer's own Filter/PropagateEmptyRelation rules before the
    * deferred rule ever ran — the file-backed relation keeps the build
    * side opaque until our planning-time collect, like a real dim). */
  private def dimView(name: String): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory("dsdim").toString
    Seq((7, "seven"), (8, "eight"), (55, "absent")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView(name)
  }

  test("delta: a star join prunes the fact side to the filtered dim's keys") {
    val fact = DeltaReader.table(spark, delta100(7, 8).toString) // only p=7 exists
    fact.createOrReplaceTempView("ds_fact_d")
    dimView("ds_dim_d")
    // no filter sits on the fact leg — the dim filter alone must reach
    // the fact scan as an IN-list, or the 99 dangling adds blow up
    val rows = spark.sql(
      """SELECT f.id, f.name FROM ds_fact_d f JOIN ds_dim_d d ON f.p = d.k
        |WHERE d.v = 'seven' ORDER BY f.id""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  test("iceberg: a star join prunes manifests and files to the dim's keys") {
    val fact = IcebergReader.table(spark, iceberg100().toString) // p in [0,9] real
    fact.createOrReplaceTempView("ds_fact_i")
    dimView("ds_dim_i")
    // keys {7, 8}: manifest 0 survives ([0,9] overlaps), the nine
    // dangling manifests ([10,99]) are excluded by the IN bounds
    val rows = spark.sql(
      """SELECT f.id FROM ds_fact_i f JOIN ds_dim_i d ON f.p = d.k
        |WHERE d.v IN ('seven', 'eight') ORDER BY f.id""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(71L, 81L))
  }

  test("multi-dim star: IN conjuncts from BOTH dims compose on one fact leaf") {
    // fact partitioned by (p, q), 10×10 grid, ONLY (7, 3) real: pruning
    // by p alone keeps the dangling (7, q≠3) adds and pruning by q
    // alone keeps (p≠7, 3) — the scan is constructible ONLY when the
    // IN lists from BOTH joins reach the leaf together.
    val t = Files.createTempDirectory("dsdelta2d")
    val schema2d = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("p", IntegerType), StructField("q", IntegerType))).json
    writeParquetFile(t, "p=7/q=3/f.parquet", Seq((1L, "alpha"), (2L, "beta")))
    val adds = for (p <- 0 until 10; q <- 0 until 10)
      yield addAction(f"p=$p/q=$q/f.parquet", s"""{"p":"$p","q":"$q"}""")
    writeCommit(t, 0, Seq(protocolAction, metaAction(schema2d, Seq("p", "q"))) ++ adds)
    DeltaReader.table(spark, t.toString).createOrReplaceTempView("ds_fact_2d")
    import spark.implicits._
    val dim2dir = Files.createTempDirectory("dsdim2").toString
    Seq((3, "three"), (4, "four"), (90, "absent")).toDF("m", "w")
      .write.mode("overwrite").parquet(dim2dir)
    spark.read.parquet(dim2dir).createOrReplaceTempView("ds_dim2_m")
    dimView("ds_dim1_k")
    val rows = spark.sql(
      """SELECT f.id, f.name FROM ds_fact_2d f
        |JOIN ds_dim1_k d1 ON f.p = d1.k
        |JOIN ds_dim2_m d2 ON f.q = d2.m
        |WHERE d1.v = 'seven' AND d2.w = 'three' ORDER BY f.id""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
    // negative control: a single dim alone cannot make the scan
    // plannable — the other dimension's dangling adds remain
    intercept[Exception](spark.sql(
      """SELECT f.id FROM ds_fact_2d f JOIN ds_dim1_k d1 ON f.p = d1.k
        |WHERE d1.v = 'seven'""".stripMargin).collect())
  }

  test("multi-dim star: the IN conjunct reaches the leaf through a FULL OUTER inner join") {
    // the hardest leg-walk case: removing a leaf row that cannot match
    // the contributing join ORPHANS its full-outer partner, which then
    // null-extends into a NEW intermediate row — but that row's null
    // key fails the contributing join exactly like the removed row did,
    // so pruning through it is sound. The fixture forces it: the fact
    // scan is only constructible when dim keys reach the leaf THROUGH
    // the full-outer join.
    val fact = DeltaReader.table(spark, delta100(7, 8).toString)
    fact.createOrReplaceTempView("ds_fact_fo")
    dimView("ds_dim_fo")
    import spark.implicits._
    val sideDir = Files.createTempDirectory("dsside").toString
    Seq((7, "x"), (55, "y")).toDF("sk", "sv").write.mode("overwrite").parquet(sideDir)
    spark.read.parquet(sideDir).createOrReplaceTempView("ds_side_fo")
    val rows = spark.sql(
      """SELECT f.id FROM (SELECT f.id, f.p FROM ds_fact_fo f
        |                  FULL OUTER JOIN ds_side_fo s ON f.p = s.sk) f
        |JOIN ds_dim_fo d ON f.p = d.k
        |WHERE d.v = 'seven' ORDER BY f.id""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("join pruning: left outer keeps the fact side full; prunable on the inner side only") {
    val fact = DeltaReader.table(spark, delta100(7, 8).toString)
    fact.createOrReplaceTempView("ds_fact_lo")
    dimView("ds_dim_lo")
    // dim LEFT JOIN fact: fact is the right (inner) leg — prunable
    val rows = spark.sql(
      """SELECT d.k, f.id FROM ds_dim_lo d LEFT JOIN ds_fact_lo f ON f.p = d.k
        |WHERE d.v = 'seven' ORDER BY f.id""".stripMargin).collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((7, 1L), (7, 2L)))
    // fact LEFT JOIN dim: fact rows without a match survive, so the
    // fact leg must NOT be narrowed to dim keys — with pruning refused,
    // the unpruned scan cannot plan past the dangling adds (negative
    // control proving the join-type gate, not a silent wrong answer).
    // No WHERE on d: a null-filtering dim predicate would let
    // EliminateOuterJoin turn this into an inner join, where pruning
    // IS legal.
    intercept[Exception](spark.sql(
      "SELECT f.id FROM ds_fact_lo f LEFT JOIN ds_dim_lo d ON f.p = d.k").collect())
  }

  test("join pruning: above the key cap the RANGE fallback still prunes; nondeterministic build sides fail open") {
    import spark.implicits._
    // TWO real partitions, contiguous, and a dim whose filter keeps
    // BOTH keys: at the default cap the IN list {7,8} prunes; with the
    // cap below the FILTERED build side's key count the rule can't
    // build an IN list, and the BETWEEN min/max fallback (VERDICT r10
    // #1) must carry the pruning instead — the dangling adds outside
    // [7,8] make an unpruned scan unplannable, so success proves the
    // range conjunct reached the leaf
    val fact = DeltaReader.table(spark, delta100(7, 9).toString)
    fact.createOrReplaceTempView("ds_fact_gates")
    val dir = Files.createTempDirectory("dsdimgates").toString
    Seq((7, "seven"), (8, "seven"), (55, "absent")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ds_dim_gates")
    val q =
      """SELECT f.id FROM ds_fact_gates f JOIN ds_dim_gates d ON f.p = d.k
        |WHERE d.v = 'seven'""".stripMargin
    assert(spark.sql(q).count() == 4L) // default cap: keys {7,8} prune
    spark.conf.set("spark.graft.deferredScan.maxJoinKeys", "1")
    try assert(spark.sql(q).count() == 4L) // cap overflow: range [7,8] prunes
    finally spark.conf.unset("spark.graft.deferredScan.maxJoinKeys")
    // a nondeterministic build side may replay differently between the
    // planning-time collect and the runtime join: refuse to prune. The
    // rand() must live INSIDE the build leg (a WHERE conjunct would
    // stay above the join, leaving the leg deterministic), and the
    // bound must be inside rand()'s [0,1) range — the optimizer KNOWS
    // that range and folds `rand() < 2.0` to an always-true filter it
    // then deletes, leaving a deterministic leg (verified empirically).
    // The refusal crashes on the dangling adds before any row is
    // evaluated, so the 0.5 selectivity never matters.
    spark.table("ds_dim_gates").where(org.apache.spark.sql.functions.expr("rand() < 0.5"))
      .createOrReplaceTempView("ds_dim_nd")
    intercept[Exception](spark.sql(
      """SELECT f.id FROM ds_fact_gates f JOIN ds_dim_nd d ON f.p = d.k
        |WHERE d.v = 'seven'""".stripMargin).collect())
    // ...and the happy path still works after both refusals
    assert(spark.sql(q).count() == 4L)
  }

  test("join pruning: the cap fallback is a RANGE — dangling files inside the span stay fatal") {
    import spark.implicits._
    // real partitions {7, 9} with p=8 DANGLING between them: the IN
    // list {7,9} skips it, but the BETWEEN [7,9] fallback cannot — so
    // the same query succeeds at the default cap and crashes on the
    // dangling add under cap overflow. This is the discriminating
    // fixture: a fallback that silently re-collected a key list would
    // pass both, a fallback that pruned nothing would fail both.
    val t = Files.createTempDirectory("dsdeltarange")
    writeParquetFile(t, "p=7/f.parquet", Seq((1L, "alpha"), (2L, "beta")))
    Files.copy(t.resolve("p=7/f.parquet"), {
      val d = t.resolve("p=9/f.parquet"); Files.createDirectories(d.getParent); d
    })
    val adds = (0 until 100).map(p => addAction(f"p=$p/f.parquet", s"""{"p":"$p"}"""))
    writeCommit(t, 0, Seq(protocolAction, metaAction(schemaWithP, Seq("p"))) ++ adds)
    DeltaReader.table(spark, t.toString).createOrReplaceTempView("ds_fact_range")
    val dir = Files.createTempDirectory("dsdimrange").toString
    Seq((7, "keep"), (9, "keep"), (55, "absent")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ds_dim_range")
    val q =
      """SELECT f.id FROM ds_fact_range f JOIN ds_dim_range d ON f.p = d.k
        |WHERE d.v = 'keep'""".stripMargin
    assert(spark.sql(q).count() == 4L) // IN (7, 9): dangling p=8 skipped
    spark.conf.set("spark.graft.deferredScan.maxJoinKeys", "1")
    try intercept[Exception](spark.sql(q).collect()) // BETWEEN [7,9] keeps p=8
    finally spark.conf.unset("spark.graft.deferredScan.maxJoinKeys")
  }

  test("join pruning: an empty build side renders a never-true IN and scans nothing") {
    val fact = DeltaReader.table(spark, delta100(7, 8).toString)
    fact.createOrReplaceTempView("ds_fact_empty")
    dimView("ds_dim_empty")
    assert(spark.sql(
      """SELECT f.id FROM ds_fact_empty f JOIN ds_dim_empty d ON f.p = d.k
        |WHERE d.v = 'no-such-row'""".stripMargin).collect().isEmpty)
  }

  test("join pruning: static fact-side conjuncts compose with the dim keys") {
    val fact = DeltaReader.table(spark, delta100(7, 8).toString)
    fact.createOrReplaceTempView("ds_fact_mix")
    dimView("ds_dim_mix")
    val rows = spark.sql(
      """SELECT f.id FROM ds_fact_mix f JOIN ds_dim_mix d ON f.p = d.k
        |WHERE d.v = 'seven' AND f.id >= 2""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
