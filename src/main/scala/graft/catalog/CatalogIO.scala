package graft.catalog

import graft.datatypes.DataRef
import java.io.{FileInputStream, FileWriter}
import java.util.{LinkedHashMap => JMap, List => JList}
import org.yaml.snakeyaml.{DumperOptions, Yaml}
import scala.jdk.CollectionConverters._

/** YAML v2 persistence, shape-compatible with the reference catalog
  * format (reference intake/readers/entry.py:413-438 to/from_yaml_file;
  * golden shape reference intake/readers/examples.py:26-72:
  * `version: 2`, `entries/data/aliases/user_parameters/metadata`).
  * Foreign (reference-written) tokens are accepted as opaque keys —
  * only alias resolution needs them, never token recomputation
  * (SURVEY §7 "Hard parts").
  */
object CatalogIO {

  private def jmap(pairs: (String, Any)*): JMap[String, Any] = {
    val m = new JMap[String, Any]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }
  private def jmapOf(m: Map[String, String]): JMap[String, Any] =
    jmap(m.toSeq.sortBy(_._1).map { case (k, v) => k -> (v: Any) }: _*)

  private def paramToJava(p: UserParameter): JMap[String, Any] = p match {
    case SimpleUserParameter(n, d, t, df) =>
      jmap("kind" -> "simple", "name" -> n, "description" -> d, "dtype" -> t, "default" -> df)
    case OptionsParameter(n, d, o, df) =>
      jmap("kind" -> "options", "name" -> n, "description" -> d, "options" -> o.asJava, "default" -> df)
    case MultiOptionParameter(n, d, o, df) =>
      jmap("kind" -> "multi", "name" -> n, "description" -> d, "options" -> o.asJava,
        "default" -> (df match { case s: Seq[_] => s.asJava; case x => x }))
    case BoundedNumberParameter(n, d, mn, mx, df) =>
      jmap("kind" -> "bounded", "name" -> n, "description" -> d, "min" -> mn, "max" -> mx, "default" -> df)
  }

  /** Parameter in the reference's serialized shape: flat `__dict__` plus a
    * `cls` qname (reference intake/readers/utils.py:299 `to_dict`,
    * user_parameters.py:72). The name comes from the containing dict key.
    */
  private def paramFromReference(name: String, m: java.util.Map[String, Any]): UserParameter = {
    val sm = m.asScala
    val cls = sm.getOrElse("cls", "").toString
    val desc = Option(sm.getOrElse("description", null)).map(_.toString).getOrElse("")
    val dflt = sm.getOrElse("default", null)
    def opts: Seq[Any] = sm.get("options") match {
      case Some(l: JList[_])             => l.asScala.toSeq
      case Some(jm: java.util.Map[_, _]) => jm.asScala.values.toSeq // NamedOptions: values are the choices
      case Some(st: java.util.Set[_])    => st.asScala.toSeq
      case _                             => Nil
    }
    if (cls.contains("MultiOption"))
      MultiOptionParameter(name, desc, opts,
        dflt match { case l: JList[_] => l.asScala.toSeq; case x => x })
    else if (cls.contains("Options"))
      OptionsParameter(name, desc, opts, dflt)
    else if (cls.contains("BoundedNumber"))
      BoundedNumberParameter(name, desc,
        UserParameter.toDouble(Option(sm.getOrElse("min", null)).getOrElse(Double.NegativeInfinity)),
        UserParameter.toDouble(Option(sm.getOrElse("max", null)).getOrElse(Double.PositiveInfinity)),
        dflt)
    else
      SimpleUserParameter(name, desc,
        Option(sm.getOrElse("dtype", null)).map(_.toString).getOrElse("str"), dflt)
  }

  private def paramFromJava(m: java.util.Map[String, Any]): UserParameter = {
    val sm = m.asScala
    def s(k: String, d: String = ""): String = Option(sm.getOrElse(k, null)).map(_.toString).getOrElse(d)
    def opts: Seq[Any] = sm.get("options").collect { case l: JList[_] => l.asScala.toSeq }.getOrElse(Nil)
    s("kind", "simple") match {
      case "options" => OptionsParameter(s("name"), s("description"), opts, sm.getOrElse("default", null))
      case "multi" =>
        MultiOptionParameter(s("name"), s("description"), opts,
          sm.getOrElse("default", null) match { case l: JList[_] => l.asScala.toSeq; case x => x })
      case "bounded" =>
        BoundedNumberParameter(s("name"), s("description"),
          UserParameter.toDouble(sm.getOrElse("min", Double.NegativeInfinity)),
          UserParameter.toDouble(sm.getOrElse("max", Double.PositiveInfinity)),
          sm.getOrElse("default", null))
      case _ => SimpleUserParameter(s("name"), s("description"), s("dtype", "str"), sm.getOrElse("default", null))
    }
  }

  def toYamlString(cat: Catalog): String = {
    val root = jmap(
      "version" -> 2,
      "entries" -> jmap(cat.entries.toSeq.sortBy(_._1).map { case (tok, rd) =>
        tok -> (jmap(
          "reader" -> rd.reader,
          "kwargs" -> jmapOf(rd.kwargs),
          "output" -> rd.output,
          "user_parameters" -> rd.userParameters.map(paramToJava).asJava,
          "metadata" -> jmapOf(rd.metadata)
        ): Any)
      }: _*),
      "data" -> jmap(cat.data.toSeq.sortBy(_._1).map { case (tok, dd) =>
        tok -> (jmap(
          "kind" -> dd.ref.kind,
          "url" -> dd.ref.url,
          "options" -> jmapOf(dd.ref.options),
          "user_parameters" -> dd.userParameters.map(paramToJava).asJava,
          "metadata" -> jmapOf(dd.ref.metadata)
        ): Any)
      }: _*),
      "aliases" -> jmapOf(cat.aliases),
      "user_parameters" -> cat.userParameters.map(paramToJava).asJava,
      "metadata" -> jmapOf(cat.metadata)
    )
    val opts = new DumperOptions()
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    new Yaml(opts).dump(root)
  }

  def fromYamlString(s: String): Catalog = {
    val root = new Yaml().load[java.util.Map[String, Any]](s).asScala
    def section(k: String): Map[String, java.util.Map[String, Any]] =
      root.get(k) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (key, v) => key.toString -> v.asInstanceOf[java.util.Map[String, Any]] }.toMap
        case _ => Map.empty
      }
    def strMap(m: Any): Map[String, String] = m match {
      case jm: java.util.Map[_, _] => jm.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
      case _                       => Map.empty
    }
    // Accepts both this library's list-shaped parameters and the
    // reference's name-keyed dict shape (reference entry.py:449
    // `from_dict` reads `user_parameters` as {name: param_dict}).
    def params(v: Any): Seq[UserParameter] = v match {
      case l: JList[_] => l.asScala.toSeq.collect { case m: java.util.Map[_, _] =>
        paramFromJava(m.asInstanceOf[java.util.Map[String, Any]]) }
      case jm: java.util.Map[_, _] =>
        jm.asScala.toSeq.sortBy(_._1.toString).collect { case (k, m: java.util.Map[_, _]) =>
          val mm = m.asInstanceOf[java.util.Map[String, Any]]
          if (mm.containsKey("cls")) paramFromReference(k.toString, mm) else paramFromJava(mm)
        }
      case _ => Nil
    }
    val entries = section("entries").map { case (tok, m) =>
      val sm = m.asScala
      tok -> ReaderDescription(
        reader = sm.getOrElse("reader", "").toString,
        kwargs = strMap(sm.getOrElse("kwargs", null)),
        // reference spelling: `output_instance` (entry.py:121)
        output = sm.get("output").orElse(sm.get("output_instance"))
          .map(_.toString).getOrElse("org.apache.spark.sql.DataFrame"),
        userParameters = params(sm.getOrElse("user_parameters", null)),
        metadata = strMap(sm.getOrElse("metadata", null))
      )
    }
    val data = section("data").map { case (tok, m) =>
      val sm = m.asScala
      // Reference shape: `datatype: module:Class` + `kwargs: {url: ...}`
      // (reference entry.py:48-56); this library's shape: kind/url/options.
      val kwargs: Map[String, Any] = sm.get("kwargs") match {
        case Some(jm: java.util.Map[_, _]) => jm.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
        case _                             => Map.empty
      }
      val kind = sm.get("kind").map(_.toString)
        .orElse(sm.get("datatype").map(_.toString.split(':').last.toLowerCase))
        .getOrElse("parquet")
      val url = sm.get("url").map(_.toString)
        .orElse(kwargs.get("url").filter(_ != null).map(_.toString))
        .getOrElse("")
      val options =
        if (sm.contains("options")) strMap(sm.getOrElse("options", null))
        else kwargs.collect {
          case (k, v) if k != "url" && k != "metadata" && v != null => k -> String.valueOf(v)
        }
      tok -> DataDescription(
        DataRef(
          kind = kind,
          url = url,
          options = options,
          metadata = strMap(sm.getOrElse("metadata", null))
        ),
        userParameters = params(sm.getOrElse("user_parameters", null))
      )
    }
    Catalog(
      entries = entries,
      data = data,
      aliases = strMap(root.getOrElse("aliases", null)),
      userParameters = params(root.getOrElse("user_parameters", null)),
      metadata = strMap(root.getOrElse("metadata", null))
    )
  }

  def toYamlFile(cat: Catalog, path: String): Unit = {
    val w = new FileWriter(path)
    try w.write(toYamlString(cat)) finally w.close()
  }

  def fromYamlFile(path: String): Catalog = {
    val in = new FileInputStream(path)
    try fromYamlString(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }
}
