package graft.catalog

/** Typed, validated, templated user parameters (reference
  * intake/readers/user_parameters.py:25-165: SimpleUserParameter,
  * Options, NamedOptions, MultiOption, BoundedNumber), as a sealed ADT
  * with coercion mirroring the builtin-only coercion rule (:78-97).
  */
sealed trait UserParameter {
  def name: String
  def description: String
  def default: Any
  /** Coerce + validate; throws IllegalArgumentException when invalid. */
  def coerce(v: Any): Any
}

object UserParameter {
  private[catalog] def toInt(v: Any): Int = v match {
    case i: Int => i; case l: Long => l.toInt; case d: Double => d.toInt
    case s: String => s.trim.toInt
    case other => throw new IllegalArgumentException(s"not an int: $other")
  }
  private[catalog] def toDouble(v: Any): Double = v match {
    case i: Int => i.toDouble; case l: Long => l.toDouble; case d: Double => d
    case s: String => s.trim.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }
  private[catalog] def toBool(v: Any): Boolean = v match {
    case b: Boolean => b
    case s: String  => Seq("true", "1", "yes").contains(s.trim.toLowerCase)
    case i: Int     => i != 0
    case other      => throw new IllegalArgumentException(s"not a bool: $other")
  }
}

/** dtype ∈ {str,int,float,bool} with builtin coercion. */
final case class SimpleUserParameter(
    name: String, description: String = "", dtype: String = "str", default: Any = null
) extends UserParameter {
  require(Seq("str", "int", "float", "bool").contains(dtype), s"bad dtype $dtype")
  def coerce(v: Any): Any = dtype match {
    case "str"   => if (v == null) null else v.toString
    case "int"   => UserParameter.toInt(v)
    case "float" => UserParameter.toDouble(v)
    case "bool"  => UserParameter.toBool(v)
  }
}

/** Value must be one of the allowed options. */
final case class OptionsParameter(
    name: String, description: String = "", options: Seq[Any] = Nil, default: Any = null
) extends UserParameter {
  def coerce(v: Any): Any =
    if (options.contains(v)) v
    else throw new IllegalArgumentException(s"$name: $v not in $options")
}

/** A subset of the allowed options. */
final case class MultiOptionParameter(
    name: String, description: String = "", options: Seq[Any] = Nil, default: Any = Nil
) extends UserParameter {
  def coerce(v: Any): Any = v match {
    case vs: Iterable[_] =>
      val bad = vs.filterNot(options.contains)
      if (bad.nonEmpty) throw new IllegalArgumentException(s"$name: $bad not in $options")
      vs.toSeq
    case one => coerce(Seq(one))
  }
}

/** Number within [min, max]. */
final case class BoundedNumberParameter(
    name: String, description: String = "", min: Double = Double.NegativeInfinity,
    max: Double = Double.PositiveInfinity, default: Any = null
) extends UserParameter {
  def coerce(v: Any): Any = {
    val d = UserParameter.toDouble(v)
    if (d < min || d > max) throw new IllegalArgumentException(s"$name: $d outside [$min,$max]")
    d
  }
}

/** Template resolution for string values (reference
  * user_parameters.py:177-313): `{env(VAR)}` → environment, `{data(tok)}`
  * → cross-entry reference (resolved by the catalog), `{func(name)}` →
  * named function from a closed allow-list (mirrors `allow_import=False`,
  * reference config.py:33 — no arbitrary reflection), `{param}` →
  * user-parameter substitution.
  */
object Templates {

  /** Closed registry standing in for `{func(module:obj)}` — extend via
    * [[registerFunc]]; nothing is reflectively imported.
    */
  private val funcs = scala.collection.concurrent.TrieMap[String, () => String](
    "cwd" -> (() => System.getProperty("user.dir")),
    "user" -> (() => System.getProperty("user.name"))
  )
  def registerFunc(name: String, f: () => String): Unit = funcs.put(name, f)

  private val EnvRe = "\\{env\\(([A-Za-z_][A-Za-z0-9_]*)\\)\\}".r
  private val FuncRe = "\\{func\\(([A-Za-z_][A-Za-z0-9_:.]*)\\)\\}".r
  private val ParamRe = "\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r
  val DataRe: scala.util.matching.Regex = "\\{data\\(([0-9a-f]+)(?:,\\s*(\\d+))?\\)\\}".r

  /** Expand env/func/param templates in a string. `{data(...)}` refs are
    * left intact — the catalog resolves those during rehydration.
    */
  def resolve(s: String, params: Map[String, Any] = Map.empty, env: String => Option[String] = k => sys.env.get(k)): String = {
    val e1 = EnvRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(env(m.group(1)).getOrElse("")))
    val e2 = FuncRe.replaceAllIn(e1, m =>
      java.util.regex.Matcher.quoteReplacement(
        funcs.get(m.group(1)).map(_.apply()).getOrElse(throw new IllegalArgumentException(s"unknown func ${m.group(1)} (closed registry; allow_import mirrors reference config.py:33)"))))
    ParamRe.replaceAllIn(e2, m =>
      if (m.group(1) == "data") m.matched
      else params.get(m.group(1)).map(v => java.util.regex.Matcher.quoteReplacement(v.toString)).getOrElse(m.matched))
  }
}
