package graft.catalog

import graft.core.{Token, Tokenizable}
import graft.datatypes.DataRef
import graft.pipeline.Pipeline
import graft.readers.SparkReaders
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Serialisable description of a dataset (reference
  * intake/readers/entry.py:38 DataDescription).
  */
final case class DataDescription(
    ref: DataRef,
    userParameters: Seq[UserParameter] = Nil,
    metadata: Map[String, String] = Map.empty
) extends Tokenizable {
  def qname: String = "graft.catalog.DataDescription"
  def tokenAttrs: Map[String, Any] = Map("kind" -> ref.kind, "url" -> ref.url, "options" -> ref.options)
}

/** Serialisable description of a reader bound to data (reference
  * entry.py:107 ReaderDescription). `kwargs("data")` may be a
  * `{data(token)}` cross-entry reference.
  */
final case class ReaderDescription(
    reader: String,
    kwargs: Map[String, String] = Map.empty,
    output: String = "org.apache.spark.sql.DataFrame",
    userParameters: Seq[UserParameter] = Nil,
    metadata: Map[String, String] = Map.empty
) extends Tokenizable {
  def qname: String = "graft.catalog.ReaderDescription"
  def tokenAttrs: Map[String, Any] = Map("reader" -> reader, "kwargs" -> kwargs, "output" -> output)
}

/** The catalog: token→entry maps with aliases, user parameters and
  * metadata; immutable — every operation returns a new catalog (reference
  * entry.py:215). Mirrors add/dedup/hoist, alias resolution, recursive
  * rehydration (cycle-guarded — the reference can stack-overflow there,
  * SURVEY §7 "Hard parts"), merge, rename, delete, search, YAML v2 I/O.
  */
final case class Catalog(
    entries: Map[String, ReaderDescription] = Map.empty,
    data: Map[String, DataDescription] = Map.empty,
    aliases: Map[String, String] = Map.empty,
    userParameters: Seq[UserParameter] = Nil,
    metadata: Map[String, String] = Map.empty
) {

  /** Add a reader entry, hoisting its DataRef into `data` and re-linking
    * via `{data(token)}` (reference entry.py:239-290). Identical
    * descriptions dedup by token.
    */
  def add(name: String, ref: DataRef, reader: String, kwargs: Map[String, String] = Map.empty): Catalog = {
    val dd = DataDescription(ref)
    val rd = ReaderDescription(reader, kwargs + ("data" -> s"{data(${dd.token})}"))
    copy(
      entries = entries + (rd.token -> rd),
      data = data + (dd.token -> dd),
      aliases = aliases + (name -> rd.token)
    )
  }

  def addEntry(name: String, rd: ReaderDescription): Catalog =
    copy(entries = entries + (rd.token -> rd), aliases = aliases + (name -> rd.token))

  def addData(dd: DataDescription): Catalog = copy(data = data + (dd.token -> dd))

  def names: Seq[String] = aliases.keys.toSeq.sorted

  /** Resolve an alias or token to a Pipeline, expanding templates and
    * `{data(token)}` references recursively with a cycle guard.
    */
  def apply(name: String, params: Map[String, Any] = Map.empty): Pipeline = {
    val token = aliases.getOrElse(name, name)
    val rd = entries.getOrElse(token, throw new NoSuchElementException(s"no entry $name"))
    rehydrate(rd, params, Set(token))
  }

  private def rehydrate(rd: ReaderDescription, params: Map[String, Any], seen: Set[String]): Pipeline = {
    val merged = defaults(userParameters ++ rd.userParameters) ++ params
    val resolvedKwargs = rd.kwargs.map { case (k, v) => k -> Templates.resolve(v, merged) }
    val dataRef = resolvedKwargs.get("data") match {
      case Some(Templates.DataRe(tok, _)) =>
        if (seen.contains(tok)) throw new IllegalStateException(s"cyclic {data()} reference at $tok")
        val dd = data.getOrElse(tok, throw new NoSuchElementException(s"no data $tok"))
        // precedence (weakest→strongest): data-level, catalog+entry, call
        // site — mirrors the reference's merge order (entry.py:176-186)
        val ddParams = defaults(dd.userParameters) ++ merged
        dd.ref.copy(
          url = Templates.resolve(dd.ref.url, ddParams),
          options = dd.ref.options.map { case (k, v) => k -> Templates.resolve(v, ddParams) })
      case _ =>
        DataRef(
          kind = resolvedKwargs.getOrElse("kind", "parquet"),
          url = resolvedKwargs.getOrElse("url", ""),
          options = resolvedKwargs - "url" - "kind" - "data")
    }
    // Declared-only entries (v1 import of drivers we don't implement,
    // incl. the legacy intake-server protocol) stay searchable but must
    // refuse READING loudly, naming the cause — not fall through to a
    // generic "unknown reader" (the refusal-edge contract GRIB2 5.40 /
    // blosclz follow).
    if (rd.reader.startsWith("unsupported:"))
      throw new UnsupportedOperationException(
        s"entry is declared-only (searchable, not readable): " +
          rd.metadata.getOrElse("unsupported_reason",
            s"v1 driver '${rd.reader.stripPrefix("unsupported:")}' has no implemented reader"))
    val reader = SparkReaders.reader(rd.reader)
      .getOrElse(throw new NoSuchElementException(s"unknown reader ${rd.reader}"))
    Pipeline(reader, dataRef)
  }

  private def defaults(ps: Seq[UserParameter]): Map[String, Any] =
    ps.collect { case p if p.default != null => p.name -> p.default }.toMap

  /** Validate+coerce call-site parameter values against declared
    * user parameters (reference user_parameters.py:280-313 set_values).
    */
  def coerceParams(name: String, values: Map[String, Any]): Map[String, Any] = {
    val token = aliases.getOrElse(name, name)
    val declared = userParameters ++ entries.get(token).map(_.userParameters).getOrElse(Nil)
    values.map { case (k, v) =>
      declared.find(_.name == k) match {
        case Some(p) => k -> p.coerce(v)
        case None    => k -> v
      }
    }
  }

  /** Parameter refactoring (reference entry.py:311 extract_parameter):
    * every occurrence of `value` in the entry's kwargs — and in its
    * referenced data description's url/options — becomes a `{paramName}`
    * template, and a user parameter with `value` as default is declared
    * on the entry, so call sites can override what was a hard-coded
    * literal.
    */
  def extractParameter(entryName: String, paramName: String, value: String): Catalog = {
    val tok = aliases.getOrElse(entryName, entryName)
    val rd = entries.getOrElse(tok, throw new NoSuchElementException(entryName))
    def templ(s: String): String = s.replace(value, s"{$paramName}")
    val param = SimpleUserParameter(paramName, s"extracted from $entryName", "str", value)
    // Rewrite the referenced data description FIRST: its token changes
    // with its contents, so it must be re-keyed under the new token (the
    // content-hash-key invariant add() dedups on) and the entry's
    // {data(...)} kwarg must follow it.
    val (newData, dataTokRewrite) = rd.kwargs.get("data") match {
      case Some(Templates.DataRe(dtok, _)) =>
        data.get(dtok) match {
          case Some(dd) =>
            val newDd = dd.copy(ref = dd.ref.copy(
              url = templ(dd.ref.url),
              options = dd.ref.options.map { case (k, v) => k -> templ(v) }))
            (data - dtok + (newDd.token -> newDd), Some(dtok -> newDd.token))
          case None => (data, None)
        }
      case _ => (data, None)
    }
    val newRd = rd.copy(
      kwargs = rd.kwargs.map { case (k, v) =>
        if (k == "data") k -> dataTokRewrite.fold(v) { case (o, n) => v.replace(o, n) }
        else k -> templ(v)
      },
      userParameters = rd.userParameters :+ param
    )
    // rd token changes with its kwargs/params: re-key and re-alias
    copy(
      entries = entries - tok + (newRd.token -> newRd),
      data = newData,
      aliases = aliases.map { case (n, t) => n -> (if (t == tok) newRd.token else t) }
    )
  }

  /** Move a per-entry user parameter up to the catalog level (reference
    * entry.py:346 promote/move_parameter): shared defaults live once.
    */
  def promoteParameter(entryName: String, paramName: String): Catalog = {
    val tok = aliases.getOrElse(entryName, entryName)
    val rd = entries.getOrElse(tok, throw new NoSuchElementException(entryName))
    val param = rd.userParameters.find(_.name == paramName)
      .getOrElse(throw new NoSuchElementException(s"$entryName has no parameter $paramName"))
    val newRd = rd.copy(userParameters = rd.userParameters.filterNot(_.name == paramName))
    copy(
      entries = entries - tok + (newRd.token -> newRd),
      aliases = aliases.map { case (n, t) => n -> (if (t == tok) newRd.token else t) },
      userParameters = (userParameters :+ param).distinct
    )
  }

  /** Merge (reference entry.py:621 `__add__`): right side wins aliases. */
  def ++(other: Catalog): Catalog = Catalog(
    entries = entries ++ other.entries,
    data = data ++ other.data,
    aliases = aliases ++ other.aliases,
    userParameters = (userParameters ++ other.userParameters).distinct,
    metadata = metadata ++ other.metadata
  )

  def rename(from: String, to: String): Catalog = {
    val tok = aliases.getOrElse(from, throw new NoSuchElementException(from))
    copy(aliases = aliases - from + (to -> tok))
  }

  def delete(name: String): Catalog = {
    val tok = aliases.getOrElse(name, name)
    val remaining = aliases - name
    val stillReferenced = remaining.values.toSet.contains(tok)
    copy(
      aliases = remaining,
      entries = if (stillReferenced) entries else entries - tok
    )
  }

  /** Filter entries by a composable search expression (reference
    * entry.py:496 + search.py algebra).
    */
  def search(expr: SearchExpr): Catalog = {
    val kept = aliases.filter { case (name, tok) =>
      entries.get(tok).exists(rd => expr.matches(name, rd, this))
    }
    copy(aliases = kept, entries = entries.filter { case (t, _) => kept.values.toSet.contains(t) })
  }

  /** Register every entry as a Spark temp view, enabling `spark.sql`
    * passthrough over catalog names (the DuckSQL-parity surface,
    * reference readers.py:510-516).
    */
  def registerViews(spark: SparkSession): Unit =
    names.foreach { n =>
      val viewName = n.replaceAll("[^A-Za-z0-9_]", "_")
      apply(n).read(spark).createOrReplaceTempView(viewName)
    }

  def sql(spark: SparkSession, query: String): DataFrame = {
    registerViews(spark)
    spark.sql(query)
  }
}

/** Composable search algebra (reference intake/readers/search.py:11-139:
  * Text, Or/And/Not/Any/All, Importable).
  */
sealed trait SearchExpr {
  def matches(name: String, rd: ReaderDescription, cat: Catalog): Boolean
  def &&(other: SearchExpr): SearchExpr = AndExpr(Seq(this, other))
  def ||(other: SearchExpr): SearchExpr = OrExpr(Seq(this, other))
  def unary_! : SearchExpr = NotExpr(this)
}
final case class TextExpr(text: String) extends SearchExpr {
  def matches(name: String, rd: ReaderDescription, cat: Catalog): Boolean = {
    // follow {data(token)} refs so hoisted urls/kinds stay searchable
    val refData = rd.kwargs.values.collect { case Templates.DataRe(tok, _) => cat.data.get(tok) }.flatten
    val hay = (Seq(name, rd.reader) ++ rd.kwargs.values ++ rd.metadata.values ++
      refData.flatMap(dd => Seq(dd.ref.kind, dd.ref.url) ++ dd.ref.options.values)).mkString(" ").toLowerCase
    hay.contains(text.toLowerCase)
  }
}
final case class AndExpr(exprs: Seq[SearchExpr]) extends SearchExpr {
  def matches(n: String, rd: ReaderDescription, c: Catalog): Boolean = exprs.forall(_.matches(n, rd, c))
}
final case class OrExpr(exprs: Seq[SearchExpr]) extends SearchExpr {
  def matches(n: String, rd: ReaderDescription, c: Catalog): Boolean = exprs.exists(_.matches(n, rd, c))
}
final case class NotExpr(expr: SearchExpr) extends SearchExpr {
  def matches(n: String, rd: ReaderDescription, c: Catalog): Boolean = !expr.matches(n, rd, c)
}
/** Entry's reader is importable on this classpath (reference
  * search.py Importable).
  */
case object ImportableExpr extends SearchExpr {
  def matches(n: String, rd: ReaderDescription, c: Catalog): Boolean =
    SparkReaders.reader(rd.reader).exists(_.importable)
}

object SearchExpr {
  /** Any/All text conveniences (reference search.py Any/All). */
  def anyText(terms: String*): SearchExpr = OrExpr(terms.map(TextExpr(_)))
  def allText(terms: String*): SearchExpr = AndExpr(terms.map(TextExpr(_)))
}
