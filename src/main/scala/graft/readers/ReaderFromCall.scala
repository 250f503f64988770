package graft.readers

import graft.datatypes.DataRef

/** Parse a pandas/polars/dask/duckdb/spark read CALL STRING back into a
  * [[DataRef]] + reader — the reference's `reader_from_call`
  * (intake/readers/readers.py:3669-3740), which turns
  * `"df = pd.read_csv(path, sep=';')"` into a catalogable reader entry.
  *
  * Scala has no caller frame to `eval` identifiers in, so arguments must
  * be literals or resolve through an explicit `vars` map — a bare
  * identifier with no binding refuses loudly (the reference's eval would
  * NameError the same way). Supported shapes, the ones the reference's
  * own tests and docs exercise:
  *
  *   - `pd.read_csv("x.csv", sep=";")` / read_parquet / read_json /
  *     read_orc / read_excel / read_html / read_stata / read_spss /
  *     read_sas / read_feather (also `pandas.`-qualified)
  *   - `pl.scan_parquet` / `pl.read_csv` / `pl.read_ipc` / `pl.read_avro`
  *     / `pl.scan_delta` / `pl.scan_iceberg`, `dd.read_csv` /
  *     `dd.read_parquet` (dask), `duckdb.read_csv/read_parquet/read_json`
  *   - `np.load("a.npy")`, `xr.open_zarr("store")`
  *   - `spark.read.parquet("p")` / csv / json / orc / text, and the
  *     chained `spark.read.format("csv").option("header","true").load("p")`
  *
  * An assignment prefix (`df = ...`) is accepted and ignored. The result
  * lowers onto the SAME reader registry every other entry path uses
  * ([[SparkReaders.recommend]]), so `read()` behaves identically to a
  * hand-built DataRef.
  */
object ReaderFromCall {

  final case class Call(func: String, args: Seq[String], kwargs: Seq[(String, String)])

  /** function suffix (after the receiver) → datatype kind */
  private val funcKinds: Map[String, String] = Map(
    "read_csv" -> "csv", "scan_csv" -> "csv",
    "read_parquet" -> "parquet", "scan_parquet" -> "parquet",
    "read_json" -> "json", "scan_ndjson" -> "json",
    "read_orc" -> "orc",
    "read_excel" -> "excel",
    "read_html" -> "html",
    "read_stata" -> "stata",
    "read_spss" -> "spss",
    "read_sas" -> "sas",
    "read_feather" -> "arrow_ipc", "read_ipc" -> "arrow_ipc", "scan_ipc" -> "arrow_ipc",
    "read_avro" -> "avro",
    "scan_delta" -> "delta", "read_delta" -> "delta",
    "scan_iceberg" -> "iceberg",
    "read_fwf" -> "text",
    "load" -> "numpy",        // np.load
    "open_zarr" -> "zarr",
    "read_text" -> "text"
  )
  // spark.read.<method>(path) methods that ARE the format name
  private val sparkReadFormats = Set("parquet", "csv", "json", "orc", "text")

  /** Split a Python-ish argument list on top-level commas (quotes and
    * bracket/paren/brace nesting respected). */
  private[readers] def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        cur += c
        if (c == quote && s(i - 1) != '\\') quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur += c
        case '(' | '[' | '{' => depth += 1; cur += c
        case ')' | ']' | '}' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Evaluate one Python-ish argument VALUE: string/number/bool/None
    * literals directly; bare identifiers through `vars` (refuse loudly
    * when unbound — no caller frame to eval in). */
  private[readers] def evalValue(v: String, vars: Map[String, String]): String = v match {
    case s if s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head =>
      s.substring(1, s.length - 1)
    case "True"  => "true"
    case "False" => "false"
    case "None"  => ""
    case s if s.matches("-?[0-9]+(\\.[0-9]+)?") => s
    case ident =>
      vars.getOrElse(ident, throw new IllegalArgumentException(
        s"unresolved identifier '$ident' in call string — pass a binding via vars " +
          "(no caller frame to evaluate it in, unlike the reference's eval)"))
  }

  /** Parse the call string into (dotted function, args, kwargs). */
  def parseCall(call: String, joinLines: Boolean = false): Call = {
    val text0 = if (joinLines) call.replace("\n", "") else call
    // strip an assignment prefix: "df = pd.read_csv(...)"
    val text = text0.trim.replaceFirst("^[A-Za-z_][A-Za-z0-9_\\[\\]'\"\\.]*\\s*=\\s*", "")
    val open = text.indexOf('(')
    require(open > 0 && text.endsWith(")"), s"not a call: $call")
    val func = text.substring(0, open).trim
    require(func.matches("[A-Za-z_][A-Za-z0-9_.]*"), s"not a simple function: $func")
    // method CHAIN: spark.read.format("csv").option(...).load(p) —
    // re-fold onto the base call below
    val body = text.substring(open + 1, text.length - 1)
    if (func.endsWith(".format") && body.nonEmpty && text.contains(").")) {
      return parseChain(text)
    }
    val (args, kwargs) = splitKw(splitArgs(body))
    Call(func, args, kwargs)
  }

  private def splitKw(parts: Seq[String]): (Seq[String], Seq[(String, String)]) = {
    val (kw, pos) = parts.partition(_.matches("[A-Za-z_][A-Za-z0-9_]*\\s*=[^=].*"))
    (pos, kw.map { p =>
      val i = p.indexOf('=')
      p.substring(0, i).trim -> p.substring(i + 1).trim
    })
  }

  /** spark.read.format("csv").option("header","true").load("p") et al. */
  private def parseChain(text: String): Call = {
    var fmt = ""
    var path = ""
    val opts = Seq.newBuilder[(String, String)]
    var rest = text
    while (rest.contains("(")) {
      val open = rest.indexOf('(')
      val name = rest.substring(0, open).split("\\.").last
      // find the matching close paren (quote-aware); an unbalanced
      // paren or quote must refuse loudly, not index past the end
      var depth = 0; var i = open; var quote: Char = 0
      while ({
        require(i < rest.length,
          s"unbalanced call chain (unclosed '(' or quote): $text")
        val c = rest(i)
        if (quote != 0) { if (c == quote && rest(i - 1) != '\\') quote = 0 }
        else if (c == '\'' || c == '"') quote = c
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        depth > 0 }) i += 1
      val parts = splitArgs(rest.substring(open + 1, i))
      name match {
        case "format" =>
          require(parts.nonEmpty && parts.head.nonEmpty, s".format() needs an argument: $text")
          fmt = parts.head
        case "option" =>
          require(parts.length >= 2, s".option() needs a key and a value: $text")
          opts += ((parts(0), parts(1)))
        case "options" => splitKw(parts)._2.foreach(opts += _)
        case "load"    => path = parts.headOption.getOrElse("")
        case _         => // .schema(), .table() etc: pass through
      }
      rest = rest.substring(i + 1)
    }
    require(fmt.nonEmpty && path.nonEmpty, s"chain needs .format(...) and .load(...): $text")
    Call(s"spark.read.format.$fmt", Seq(path), opts.result())
  }

  /** Lower a parsed call to a DataRef: function suffix picks the kind,
    * first positional (or url-ish kwarg) is the url, remaining kwargs
    * become reader options verbatim. */
  def toDataRef(c: Call, vars: Map[String, String] = Map.empty): DataRef = {
    val segs = c.func.split("\\.")
    val formatKw = c.kwargs.find(_._1 == "format")
    val kind0 = segs match {
      case Array(_, "read", "format", f) => evalValue(f, vars)
      case _ if segs.length >= 2 && segs(segs.length - 2) == "read" &&
        sparkReadFormats.contains(segs.last) => segs.last
      // spark.read.load: PySpark's load(path, format="csv") carries the
      // format as a kwarg; WITHOUT one there is no format at all and it
      // must not fall through to funcKinds("load") (np.load → "numpy")
      case _ if segs.length >= 2 && segs(segs.length - 2) == "read" && segs.last == "load" =>
        formatKw.map(kv => evalValue(kv._2, vars)).getOrElse(
          throw new IllegalArgumentException(
            s"spark.read.load without a format — add .format(\"...\"), format=..., or use spark.read.<fmt>(path): ${c.func}"))
      case _ =>
        funcKinds.getOrElse(segs.last,
          throw new IllegalArgumentException(
            s"unknown read function '${c.func}' — supported: ${funcKinds.keys.toSeq.sorted.mkString(", ")}, spark.read.*"))
    }
    val urlKw = c.kwargs.find { case (k, _) =>
      Set("path", "filepath_or_buffer", "source", "url", "file").contains(k) }
    val url = urlKw.map(_._2).orElse(c.args.headOption).getOrElse(
      throw new IllegalArgumentException(s"no path argument in: ${c.func}(...)"))
    // the format kwarg became the kind in the spark.read.load case —
    // it is not a reader option either way
    val consumed = urlKw.toSeq ++
      (if (segs.length >= 2 && segs(segs.length - 2) == "read" && segs.last == "load") formatKw.toSeq
       else Nil)
    val optKws = c.kwargs.filterNot(consumed.contains(_))
    // chain-style .option("header","true") keys arrive quoted; kwarg
    // keys arrive bare — normalize both
    def key(k: String): String =
      if (k.length >= 2 && (k.head == '\'' || k.head == '"') && k.last == k.head)
        k.substring(1, k.length - 1) else k
    val opts = optKws.map { case (k, v) => key(k) -> evalValue(v, vars) }.toMap
    DataRef(kind0, evalValue(url, vars), opts)
  }

  /** One-call surface: parse, lower, pick a reader off the shared
    * registry, read. */
  def read(spark: org.apache.spark.sql.SparkSession, call: String,
           vars: Map[String, String] = Map.empty,
           joinLines: Boolean = false): org.apache.spark.sql.DataFrame = {
    val ref = toDataRef(parseCall(call, joinLines), vars)
    val (importable, rest) = SparkReaders.recommend(ref)
    val reader = importable.headOption.orElse(rest.headOption).getOrElse(
      throw new IllegalArgumentException(s"no reader for kind '${ref.kind}'"))
    reader.read(spark, ref)
  }
}
