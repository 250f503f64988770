package graft.catalog

import graft.datatypes.DataRef
import java.io.FileInputStream
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Read-only importer for v1 YAML catalogs (the reference's legacy
  * format: `sources:` with driver/args/parameters, jinja-style
  * `{{ param }}` templating — reference intake/catalog/local.py:333
  * CatalogParser, fixtures intake/tests/catalog1.yml). Lowers v1 sources
  * into v2 entries (SURVEY §7 step 10).
  */
object V1Import {

  /** v1 driver name → our reader. Unknown drivers become declared-only
    * entries with reader "unsupported:<driver>" (kept, searchable, not
    * readable — mirroring the reference's importable split).
    */
  private val driverMap = Map(
    "csv" -> ("spark_csv", "csv"),
    "parquet" -> ("spark_parquet", "parquet"),
    "json" -> ("spark_json", "json"),
    "ndjson" -> ("spark_json", "json"),
    "orc" -> ("spark_orc", "orc"),
    "avro" -> ("spark_avro", "avro"),
    "textfiles" -> ("spark_text", "text"),
    "text" -> ("spark_text", "text"),
    "sql" -> ("spark_jdbc", "sql_query"),
    "postgres" -> ("spark_jdbc", "sql_query")
  )

  def fromV1YamlString(s: String, catalogDir: String = ""): Catalog = {
    val root = new Yaml().load[java.util.Map[String, Any]](s).asScala
    val sources = root.get("sources") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[java.util.Map[String, Any]].asScala }
      case _ => Map.empty[String, scala.collection.mutable.Map[String, Any]]
    }

    // jinja-ish "{{ name }}" → our "{name}" placeholders
    def lowerTemplate(v: String): String =
      "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\}\\}".r.replaceAllIn(v, m => s"{${m.group(1)}}")

    val catParams = Seq(SimpleUserParameter("CATALOG_DIR", "directory of the catalog file", "str", catalogDir))

    sources.foldLeft(Catalog(userParameters = catParams)) { case (cat, (name, src)) =>
      val driver = src.getOrElse("driver", "").toString
      val args = src.get("args") match {
        case Some(m: java.util.Map[_, _]) => m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
        case _                            => Map.empty[String, String]
      }
      val params: Seq[UserParameter] = src.get("parameters") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.toSeq.map { case (pname, pv) =>
            val pm = pv.asInstanceOf[java.util.Map[String, Any]].asScala
            SimpleUserParameter(
              pname.toString,
              pm.getOrElse("description", "").toString,
              pm.getOrElse("type", "str").toString match {
                case "int" => "int"; case "float" => "float"; case "bool" => "bool"; case _ => "str"
              },
              pm.getOrElse("default", null)
            )
          }
        case _ => Nil
      }
      val url = lowerTemplate(args.getOrElse("urlpath", args.getOrElse("uri", "")))
      val options = (args - "urlpath" - "uri").map { case (k, v) => k -> lowerTemplate(v) }
      val (reader, kind) = driverMap.getOrElse(driver, (s"unsupported:$driver", driver))
      val description = src.getOrElse("description", "").toString

      val dd = DataDescription(DataRef(kind, url, options), userParameters = params)
      val rd = ReaderDescription(
        reader,
        Map("data" -> s"{data(${dd.token})}"),
        userParameters = params,
        metadata = Map("description" -> description, "v1_driver" -> driver)
      )
      cat.copy(
        entries = cat.entries + (rd.token -> rd),
        data = cat.data + (dd.token -> dd),
        aliases = cat.aliases + (name -> rd.token)
      )
    }
  }

  def fromV1YamlFile(path: String): Catalog = {
    val in = new FileInputStream(path)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    fromV1YamlString(s, catalogDir = Option(new java.io.File(path).getParent).getOrElse(""))
  }

  /** Dispatch like the reference's open_catalog: try v2, fall back to v1
    * (reference intake/__init__.py:105-187 VersionError fallback).
    */
  def openCatalog(path: String): Catalog = {
    val in = new FileInputStream(path)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val root = new Yaml().load[java.util.Map[String, Any]](s)
    val isV2 = root != null && root.asScala.get("version").exists(v => String.valueOf(v) == "2")
    if (isV2) CatalogIO.fromYamlString(s)
    else fromV1YamlString(s, catalogDir = Option(new java.io.File(path).getParent).getOrElse(""))
  }
}
