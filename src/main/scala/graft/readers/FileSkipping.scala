package graft.readers

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions.{coalesce, col, expr, from_json, lit}
import org.apache.spark.sql.types._
import scala.util.Try

/** Planning-time file skipping for the native table readers: prune a
  * table's live-file list from a SQL filter BEFORE any data file is
  * opened — the lever the real connectors pull at scale (reference
  * `DeltaQueryToDask`, intake/readers/convert.py:390-399
  * `DeltaTable.file_uris(filter)`; Iceberg's manifest `partitions`
  * summaries serve the same purpose in its spec's "Scan Planning").
  *
  * Everything here is conservative by construction — pruning may only
  * ever drop files that DEFINITELY contain no matching row, and every
  * unknown (un-parsable conjunct, missing stats, unsupported type,
  * evaluation error) fails OPEN, keeping the file. The readers apply
  * the full residual filter to the returned DataFrame, so the result
  * equals `table.where(filter)` whether or not any file was skipped.
  *
  * Three mechanisms, composed per conjunct of the top-level AND:
  *
  *  - [[partitionPrune]]: conjuncts whose references are all partition
  *    columns are evaluated EXACTLY against the per-file partition
  *    tuples (a driver-local LocalRelation filter — Spark itself does
  *    the casting and comparison, so any deterministic expression
  *    works, e.g. `year(ds) = 2024`).
  *  - [[statsPrune]]: single-column comparisons test per-file min/max
  *    ranges (Delta `add.stats` JSON via `from_json`): `a = v` keeps a
  *    file iff `min <= v && v <= max` could hold, null-safe.
  *  - [[rangeExcludes]]: the same range test as a pure driver-side
  *    predicate over already-decoded bounds, for Iceberg's
  *    manifest-level partition summaries where a whole manifest (and
  *    every file it lists) is skipped without being read.
  */
object FileSkipping {

  /** Parse a boolean SQL expression into its top-level AND conjuncts.
    * `x BETWEEN a AND b` splits into its two comparisons: since Spark
    * 3.3 the parser emits a `Between` RuntimeReplaceable instead of the
    * `And` it desugars to, which would otherwise be invisible to every
    * shape matcher downstream (no partition/stats pruning for the most
    * idiomatic range filter). */
  def conjuncts(filterSql: String): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case f: UnresolvedFunction
          if f.nameParts.last.equalsIgnoreCase("between") && f.arguments.size == 3 =>
        val Seq(v, lower, upper) = f.arguments
        split(GreaterThanOrEqual(v, lower)) ++ split(LessThanOrEqual(v, upper))
      case other     => Seq(other)
    }
    split(CatalystSqlParser.parseExpression(filterSql))
  }

  // evaluating one of these at planning time would freeze a value the
  // scan-time residual filter re-rolls (or re-times: the time-dependent
  // functions are "deterministic" to Catalyst within one query but
  // differ between the prune and the lazy scan) — never prune on such a
  // conjunct. `unix_timestamp` is time-dependent ONLY in its zero-arg
  // form (with arguments it is a pure conversion), handled separately.
  private[readers] val nondeterministic = Set(
    "rand", "randn", "random", "uuid", "shuffle", "monotonically_increasing_id",
    "current_timestamp", "now", "current_date", "curdate", "localtimestamp",
    "input_file_name", "spark_partition_id")

  /** The unqualified column names `e` references, or None when the
    * conjunct is outside the prune-safe shape (qualified or nested
    * attributes, subqueries, nondeterministic functions, no refs). */
  def usableRefs(e: Expression): Option[Set[String]] = {
    var ok = true
    val names = scala.collection.mutable.Set[String]()
    e.foreach {
      case a: UnresolvedAttribute =>
        if (a.nameParts.length == 1) names += a.nameParts.head.toLowerCase else ok = false
      case f: UnresolvedFunction
          if nondeterministic.contains(f.nameParts.last.toLowerCase) => ok = false
      case f: UnresolvedFunction
          if f.nameParts.last.toLowerCase == "unix_timestamp" && f.arguments.isEmpty => ok = false
      case _: SubqueryExpression => ok = false
      case _                     => ()
    }
    if (ok && names.nonEmpty) Some(names.toSet) else None
  }

  /** Exactly evaluate the partition-only conjuncts of a filter against
    * per-file partition tuples (raw strings aligned with `partFields`,
    * cast to the declared types — the same cast the readers use to
    * attach the values as columns). Returns the surviving paths, or
    * None when nothing is prunable (no partition-only conjunct, or
    * evaluation failed → fail open). */
  def partitionPrune(spark: SparkSession, partFields: Seq[StructField],
      files: Seq[(String, Seq[String])], conjs: Seq[Expression]): Option[Set[String]] = {
    if (partFields.isEmpty || files.isEmpty) return None
    val partNames = partFields.map(_.name.toLowerCase).toSet
    val applicable = conjs.filter(c => usableRefs(c).exists(_.subsetOf(partNames)))
    if (applicable.isEmpty) return None
    Try[Set[String]] {
      import scala.jdk.CollectionConverters._
      val strSchema = StructType(StructField("__path", StringType) +:
        partFields.map(f => StructField(f.name, StringType)))
      val rows: java.util.List[Row] = files.map { case (p, vs) => Row.fromSeq(p +: vs) }.asJava
      // LocalRelation → the filter runs driver-local, no cluster job
      val typed = spark.createDataFrame(rows, strSchema)
        .select(col("__path") +: partFields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      val filtered = typed.where(applicable.map(c => expr(c.sql)).reduce(_ && _))
      // second net behind the name denylist: once resolved, anything
      // Catalyst itself marks nondeterministic (e.g. a registered
      // nondeterministic UDF the denylist can't know about) fails open
      val resolvedDeterministic = filtered.queryExecution.analyzed.collect {
        case flt: org.apache.spark.sql.catalyst.plans.logical.Filter => flt.condition
      }.forall(_.deterministic)
      require(resolvedDeterministic, "nondeterministic filter — not prunable")
      filtered.select("__path").collect().map(_.getString(0)).toSet
    }.toOption
  }

  // ---- simple comparison shapes (stats / bounds range tests) ---------

  /** One range-testable conjunct: `col op literal` (either operand
    * order), `col IN (literals)` (op "=", several values), or a null
    * test. Null literals are excluded — `a = NULL` never matches and is
    * left to the residual filter. */
  sealed trait Shape { def name: String }
  final case class Cmp(name: String, op: String, values: Seq[Literal]) extends Shape
  final case class NullTest(name: String, isNull: Boolean) extends Shape

  private def attr1(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
    case _                                                 => None
  }
  private def lit1(e: Expression): Option[Literal] = e match {
    case l: Literal if l.value != null => Some(l)
    case _                             => None
  }

  def simpleShape(e: Expression): Option[Shape] = e match {
    case EqualTo(a, b) =>
      attr1(a).flatMap(n => lit1(b).map(l => Cmp(n, "=", Seq(l))))
        .orElse(attr1(b).flatMap(n => lit1(a).map(l => Cmp(n, "=", Seq(l)))))
    case GreaterThan(a, b) =>
      attr1(a).flatMap(n => lit1(b).map(l => Cmp(n, ">", Seq(l))))
        .orElse(attr1(b).flatMap(n => lit1(a).map(l => Cmp(n, "<", Seq(l)))))
    case GreaterThanOrEqual(a, b) =>
      attr1(a).flatMap(n => lit1(b).map(l => Cmp(n, ">=", Seq(l))))
        .orElse(attr1(b).flatMap(n => lit1(a).map(l => Cmp(n, "<=", Seq(l)))))
    case LessThan(a, b) =>
      attr1(a).flatMap(n => lit1(b).map(l => Cmp(n, "<", Seq(l))))
        .orElse(attr1(b).flatMap(n => lit1(a).map(l => Cmp(n, ">", Seq(l)))))
    case LessThanOrEqual(a, b) =>
      attr1(a).flatMap(n => lit1(b).map(l => Cmp(n, "<=", Seq(l))))
        .orElse(attr1(b).flatMap(n => lit1(a).map(l => Cmp(n, ">=", Seq(l)))))
    case In(a, vs) if vs.nonEmpty && vs.forall(lit1(_).isDefined) =>
      attr1(a).map(n => Cmp(n, "=", vs.map(v => lit1(v).get)))
    case IsNull(a)    => attr1(a).map(NullTest(_, isNull = true))
    case IsNotNull(a) => attr1(a).map(NullTest(_, isNull = false))
    case _            => None
  }

  /** Types whose JSON stats ranges are safe to prune on. Float/double
    * are deliberately OUT: writers put NaN in max under the engines'
    * "NaN sorts last" convention, and `max > c` is false for NaN in
    * plain SQL — which would wrongly prune a file whose NaN rows match. */
  private def statsSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType | BooleanType |
        DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType                             => true
    case _                                          => false
  }

  /** Prune by per-file min/max stats (Delta `add.stats` JSON strings).
    * A file survives a conjunct unless its stats DEFINITELY exclude
    * every matching row; files with missing/partial stats are kept
    * (`coalesce(pred, true)`). Returns surviving paths, or None when no
    * conjunct is stats-testable. `statsKey` maps a schema field name to
    * the key its stats are recorded under (Delta column mapping writes
    * stats by PHYSICAL name). */
  def statsPrune(spark: SparkSession, schema: StructType,
      files: Seq[(String, String)], conjs: Seq[Expression],
      statsKey: Map[String, String] = Map.empty): Option[Set[String]] = {
    if (files.isEmpty) return None
    val byName = schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val shapes = conjs.flatMap(simpleShape).filter {
      case Cmp(n, _, _)   => byName.get(n.toLowerCase).exists(f => statsSafe(f.dataType))
      case NullTest(n, _) => byName.contains(n.toLowerCase)
    }
    if (shapes.isEmpty) return None
    Try[Set[String]] {
      import scala.jdk.CollectionConverters._
      def keyOf(fl: StructField): String = statsKey.getOrElse(fl.name, fl.name)
      val referenced = shapes.map(s => byName(s.name.toLowerCase)).distinctBy(_.name)
      val minMax = StructType(referenced.map(f => StructField(keyOf(f), f.dataType)))
      val statsSchema = StructType(Seq(
        StructField("numRecords", LongType),
        StructField("minValues", minMax),
        StructField("maxValues", minMax),
        StructField("nullCount", StructType(referenced.map(f => StructField(keyOf(f), LongType))))))
      val rows: java.util.List[Row] = files.map { case (p, s) => Row(p, s) }.asJava
      val parsed = spark.createDataFrame(rows,
        StructType(Seq(StructField("__path", StringType), StructField("__stats", StringType))))
        .select(col("__path"), from_json(col("__stats"), statsSchema).as("s"))
      def f(which: String, n: String): Column =
        col(s"s.$which.`${keyOf(byName(n.toLowerCase))}`")
      val preds: Seq[Column] = shapes.map {
        case Cmp(n, op, vs) =>
          def one(l: Literal): Column = op match {
            case "="  => f("minValues", n) <= expr(l.sql) && f("maxValues", n) >= expr(l.sql)
            case ">"  => f("maxValues", n) > expr(l.sql)
            case ">=" => f("maxValues", n) >= expr(l.sql)
            case "<"  => f("minValues", n) < expr(l.sql)
            case "<=" => f("minValues", n) <= expr(l.sql)
          }
          vs.map(one).reduce(_ || _)
        case NullTest(n, true)  => f("nullCount", n) > lit(0L)
        case NullTest(n, false) => f("nullCount", n) < col("s.numRecords")
      }
      parsed.where(preds.map(p => coalesce(p, lit(true))).reduce(_ && _))
        .select("__path").collect().map(_.getString(0)).toSet
    }.toOption
  }

  // ---- driver-side range tests (Iceberg manifest summaries) ----------

  /** Catalyst literal → the bound comparison domain: integral/date →
    * Long, float/double → Double, decimal → java BigDecimal (EXACT —
    * a double roundtrip could flip a comparison at high precision),
    * string → String. None = not comparable (fail open). */
  def literalValue(l: Literal): Option[Any] = l.value match {
    case null                                        => None
    case v: Byte                                     => Some(v.toLong)
    case v: Short                                    => Some(v.toLong)
    case v: Int                                      => Some(v.toLong) // covers DateType days
    case v: Long                                     => Some(v)
    case v: Float                                    => Some(v.toDouble)
    case v: Double                                   => Some(v)
    case v: org.apache.spark.sql.types.Decimal       => Some(v.toJavaBigDecimal)
    case v: org.apache.spark.unsafe.types.UTF8String => Some(v.toString)
    case v: Boolean                                  => Some(v)
    case _                                           => None
  }

  private def cmpValues(a: Any, b: Any): Option[Int] = {
    type JBD = java.math.BigDecimal
    (a, b) match {
      case (x: Long, y: Long)       => Some(java.lang.Long.compare(x, y))
      case (x: Double, y: Double)   => Some(java.lang.Double.compare(x, y))
      case (x: Long, y: Double)     => Some(java.lang.Double.compare(x.toDouble, y))
      case (x: Double, y: Long)     => Some(java.lang.Double.compare(x, y.toDouble))
      case (x: JBD, y: JBD)         => Some(x.compareTo(y))
      case (x: JBD, y: Long)        => Some(x.compareTo(java.math.BigDecimal.valueOf(y)))
      case (x: Long, y: JBD)        => Some(java.math.BigDecimal.valueOf(x).compareTo(y))
      case (x: JBD, y: Double)      => Some(x.compareTo(java.math.BigDecimal.valueOf(y)))
      case (x: Double, y: JBD)      => Some(java.math.BigDecimal.valueOf(x).compareTo(y))
      case (x: String, y: String)   => Some(codePointCompare(x, y))
      case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
      case _                        => None
    }
  }

  /** Compare by UNICODE CODE POINT, matching UTF-8 byte order (the
    * order Iceberg's string bounds are computed in). Java's compareTo
    * ranks UTF-16 code units, which sorts supplementary-plane
    * characters BELOW U+E000..U+FFFF — a pruning decision made in that
    * order could wrongly drop a file whose bounds straddle the BMP
    * boundary. */
  private[readers] def codePointCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Whether a conjunct's literals live in the same raw comparison
    * domain as an Iceberg column/partition type. The driver-side range
    * tests compare BARE ordinals (days, micros, ints are all Longs), so
    * a date column tested against a TIMESTAMP literal would compare
    * days to micros and prune WRONG files, not merely fewer — Spark's
    * own evaluation coerces such comparisons, this path must refuse
    * them (fail open; the residual filter still answers exactly). */
  def literalsMatch(c: Cmp, icebergType: String): Boolean = {
    def numericOk(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }
    c.values.forall { l =>
      icebergType match {
        case "date"        => l.dataType == DateType
        case "timestamp"   => l.dataType == TimestampNTZType
        case "timestamptz" => l.dataType == TimestampType
        case "string"      => l.dataType == StringType
        case "boolean"     => l.dataType == BooleanType
        case "int" | "long" | "float" | "double" => numericOk(l.dataType)
        case t if t.startsWith("decimal") => numericOk(l.dataType)
        case _ => false
      }
    }
  }

  /** Does the closed range [lower, upper] (either side possibly
    * unknown) DEFINITELY exclude every value satisfying `c`? Unknown
    * comparisons never exclude (fail open). */
  def rangeExcludes(c: Cmp, lower: Option[Any], upper: Option[Any]): Boolean = {
    val vals = c.values.map(literalValue)
    if (vals.exists(_.isEmpty)) return false
    val vs = vals.flatten
    c.op match {
      case "=" => // every sought value outside the range
        vs.forall(v =>
          upper.exists(u => cmpValues(v, u).exists(_ > 0)) ||
            lower.exists(lo => cmpValues(v, lo).exists(_ < 0)))
      case ">"  => vs.headOption.exists(v => upper.exists(u => cmpValues(u, v).exists(_ <= 0)))
      case ">=" => vs.headOption.exists(v => upper.exists(u => cmpValues(u, v).exists(_ < 0)))
      case "<"  => vs.headOption.exists(v => lower.exists(lo => cmpValues(lo, v).exists(_ >= 0)))
      case "<=" => vs.headOption.exists(v => lower.exists(lo => cmpValues(lo, v).exists(_ > 0)))
      case _    => false
    }
  }

  /** Iceberg "single-value serialization" bound decode (spec Appendix D:
    * little-endian numerics, epoch micros for timestamps, raw UTF-8 for
    * strings, big-endian two's-complement unscaled decimals) — shared by
    * the reader's per-file bounds stage and the writer's row-level
    * detection pre-pruning. Unknown types / malformed bytes fail open
    * (None → the caller keeps the file). */
  def decodeIcebergBound(node: com.fasterxml.jackson.databind.JsonNode,
      icebergType: String): Option[Any] =
    Option(node).filterNot(_.isNull).flatMap { n =>
      Try {
        val bytes = java.util.Base64.getDecoder.decode(n.asText())
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        icebergType match {
          case "int" | "date" if bytes.length == 4              => Some(bb.getInt.toLong)
          case "long" if bytes.length == 8                      => Some(bb.getLong)
          case "timestamp" | "timestamptz" if bytes.length == 8 => Some(bb.getLong)
          case "float" if bytes.length == 4                     => Some(bb.getFloat.toDouble)
          case "double" if bytes.length == 8                    => Some(bb.getDouble)
          case "string" =>
            Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          case d if d.startsWith("decimal(") =>
            Try {
              val scale = d.stripPrefix("decimal(").stripSuffix(")").split(",")(1).trim.toInt
              new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
            }.toOption
          case _ => None
        }
      }.toOption.flatten
    }

  /** Conjuncts bounding merge key columns to the source keys' [min,
    * max] — detection pre-pruning for row-level MERGE: a file whose
    * stats / partition tuple excludes every source key cannot hold a
    * matched row, so the key-range conjuncts prune the detection scan
    * exactly like a delete predicate would. One small aggregate over
    * the (persisted) distinct-key frame; un-orderable key types or any
    * failure contribute nothing (fail open). */
  def keyBoundConjuncts(srcKeys: org.apache.spark.sql.DataFrame, keys: Seq[String],
      schema: StructType): Seq[Expression] =
    Try {
      import org.apache.spark.sql.functions.{max => maxF, min => minF}
      val aggs = keys.flatMap(k => Seq(minF(col(k)), maxF(col(k))))
      val r = srcKeys.agg(aggs.head, aggs.tail: _*).collect()(0)
      keys.zipWithIndex.flatMap { case (k, i) =>
        val dt = schema(schema.fieldNames.find(_.equalsIgnoreCase(k)).get).dataType
        (Option(r.get(2 * i)), Option(r.get(2 * i + 1))) match {
          case (Some(mn), Some(mx)) => Seq[Expression](
            GreaterThanOrEqual(UnresolvedAttribute(Seq(k)), Literal.create(mn, dt)),
            LessThanOrEqual(UnresolvedAttribute(Seq(k)), Literal.create(mx, dt)))
          case _ => Nil // empty/all-null key frame: nothing to bound
        }
      }
    }.getOrElse(Nil)

  /** One field's bound out of a manifest `lower_bounds`/`upper_bounds`
    * JSON — accepts both the Avro array-of-{key,value} record form real
    * manifests carry and the object form keyed by field-id text. */
  def icebergBound(json: String, fieldId: Int, icebergType: String): Option[Any] =
    Option(json).flatMap { j =>
      Try {
        import scala.jdk.CollectionConverters._
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
        val v =
          if (node.isArray)
            node.elements().asScala
              .find(e => Option(e.get("key")).exists(_.asInt() == fieldId))
              .flatMap(e => Option(e.get("value")))
          else Option(node.get(fieldId.toString))
        v.flatMap(decodeIcebergBound(_, icebergType))
      }.toOption.flatten
    }
}
