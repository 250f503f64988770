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
  *
  * Inheritance semantics mirror the reference:
  *   - catalog-level `metadata.parameters` become catalog user
  *     parameters (local.py:741-744); an entry-local parameter of the
  *     same name wins (base.py:345-355 `_get_entry` prepends only
  *     unshadowed catalog parameters) — our `Catalog.rehydrate` merge
  *     order (catalog then entry) reproduces exactly that.
  *   - `yaml_file_cat` sources (local.py:826-860) are nested catalogs:
  *     they import eagerly and their entries join the parent under
  *     dotted names (`nested.ex1` — the access path the reference's
  *     test_top_level.py:150 exercises via `cat["nested.ex1"]`), with
  *     `args.user_parameters` passed down (test_parameters.py:232
  *     catalog passthrough: `subcat.ex2` sees the parent's `bucket`
  *     and the passed `inner`).
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

  // jinja-ish "{{ name }}" → our "{name}" placeholders
  private def lowerTemplate(v: String): String =
    "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\}\\}".r.replaceAllIn(v, m => s"{${m.group(1)}}")

  private def asScalaMap(v: Any): scala.collection.Map[String, Any] = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> x }
    case _                      => Map.empty[String, Any]
  }

  /** One v1 `parameters:` item → a user parameter (local.py:28
    * UserParameter: name/description/type/default).
    */
  private def parseParam(name: String, spec: Any): UserParameter = {
    val pm = asScalaMap(spec)
    SimpleUserParameter(
      name,
      pm.getOrElse("description", "").toString,
      pm.getOrElse("type", "str").toString match {
        case "int" => "int"; case "float" => "float"; case "bool" => "bool"; case _ => "str"
      },
      pm.getOrElse("default", null)
    )
  }

  private def parseParams(v: Option[Any]): Seq[UserParameter] = v match {
    case Some(m: java.util.Map[_, _]) =>
      m.asScala.toSeq.map { case (n, spec) => parseParam(n.toString, spec) }
    case _ => Nil
  }

  def fromV1YamlString(s: String, catalogDir: String = ""): Catalog =
    importV1(s, catalogDir, Set.empty)

  private def importV1(s: String, catalogDir: String, seenPaths: Set[String]): Catalog = {
    val root = Option(new Yaml().load[java.util.Map[String, Any]](s))
      .map(_.asScala).getOrElse(scala.collection.mutable.Map.empty[String, Any])
    val sources = root.get("sources") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> asScalaMap(v) }
      case _ => Map.empty[String, scala.collection.Map[String, Any]]
    }

    // catalog-level shared parameters (local.py:741-744): every entry
    // sees them unless it declares a parameter of the same name
    val rootMeta = root.get("metadata").map(asScalaMap).getOrElse(Map.empty[String, Any])
    val sharedParams = parseParams(rootMeta.get("parameters"))
    val catParams =
      Seq(SimpleUserParameter("CATALOG_DIR", "directory of the catalog file", "str", catalogDir)) ++
        sharedParams

    sources.foldLeft(Catalog(userParameters = catParams)) { case (cat, (name, src)) =>
      val driver = src.getOrElse("driver", "").toString
      val rawArgs = src.get("args").map(asScalaMap).getOrElse(Map.empty[String, Any])
      val params: Seq[UserParameter] = parseParams(src.get("parameters"))
      val srcMetadata: Map[String, String] = src.get("metadata").map(asScalaMap)
        .getOrElse(Map.empty[String, Any])
        .map { case (k, v) => k -> String.valueOf(v) }.toMap

      if (driver == "yaml_file_cat") {
        // Nested catalog: import it now and join its entries under
        // "<name>.<subName>". The sub-catalog's own catalog-level
        // parameters (incl. its CATALOG_DIR) move onto each imported
        // entry so they override the parent's at rehydrate time; the
        // `args.user_parameters` passthrough appends last.
        val rawPath = String.valueOf(rawArgs.getOrElse("path", ""))
        val path = Templates.resolve(lowerTemplate(rawPath), Map("CATALOG_DIR" -> catalogDir))
        val f = new java.io.File(path)
        val canon = f.getCanonicalPath
        if (seenPaths.contains(canon))
          throw new IllegalStateException(s"cyclic nested catalog reference at $canon")
        if (!f.isFile)
          throw new java.io.FileNotFoundException(
            s"v1 nested catalog '$name' points at missing file $path")
        val in = new FileInputStream(f)
        val subYaml = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        val passed: Seq[UserParameter] = rawArgs.get("user_parameters") match {
          case Some(m: java.util.Map[_, _]) =>
            m.asScala.toSeq.map { case (n, spec) => parseParam(n.toString, spec) }
          case _ => Nil
        }
        val sub = importV1(subYaml, Option(f.getParent).getOrElse(""), seenPaths + canon)
        val withData = cat.copy(data = cat.data ++ sub.data)
        sub.aliases.foldLeft(withData) { case (c, (subName, subTok)) =>
          val srd = sub.entries(subTok)
          // Precedence weakest→strongest mirrors the reference: parent
          // source-level `parameters`, then the passed
          // `args.user_parameters`, then the sub-catalog's own globals
          // (local.py:742 .update — the sub's yaml wins over passed,
          // and its CATALOG_DIR must shadow the parent's), and the
          // entry's OWN parameters always win (base.py:345-355 only
          // prepends unshadowed catalog parameters).
          // The dotted v1_name re-keys the entry so same-args sources
          // in two DIFFERENT sub-catalogs don't collide (their
          // userParameters — e.g. each sub's CATALOG_DIR — differ but
          // the token ignores userParameters).
          val nrd = srd.copy(
            kwargs = srd.kwargs + ("v1_name" -> s"$name.$subName"),
            userParameters = params ++ passed ++ sub.userParameters ++ srd.userParameters)
          c.copy(
            entries = c.entries + (nrd.token -> nrd),
            aliases = c.aliases + (s"$name.$subName" -> nrd.token))
        }
      } else {
        val args = rawArgs.map { case (k, v) => k -> String.valueOf(v) }
        val url = lowerTemplate(args.getOrElse("urlpath", args.getOrElse("uri", "")))
        val options = (args - "urlpath" - "uri").map { case (k, v) => k -> lowerTemplate(v) }
        val (reader, kind) = driverMap.getOrElse(driver, (s"unsupported:$driver", driver))
        val description = src.getOrElse("description", "").toString

        val dd = DataDescription(DataRef(kind, url, options.toMap), userParameters = params)
        // "v1_name" keeps same-args sources DISTINCT entries: the token
        // hashes (reader, kwargs) only, and v1 catalogs legitimately
        // declare identical driver+args under different names with
        // different parameters/metadata (catalog1.yml ex1/ex2,
        // catalog_inherit_params.yml param/local_param_overwrites) —
        // without it the second source silently replaced the first.
        // a source-metadata "description" survives unless the source has
        // a real top-level description of its own (don't clobber with "")
        val descEntry =
          if (description.nonEmpty || !srcMetadata.contains("description"))
            Map("description" -> description)
          else Map.empty[String, String]
        val rd = ReaderDescription(
          reader,
          Map("data" -> s"{data(${dd.token})}", "v1_name" -> name),
          userParameters = params,
          metadata = srcMetadata ++ descEntry + ("v1_driver" -> driver)
        )
        cat.copy(
          entries = cat.entries + (rd.token -> rd),
          data = cat.data + (dd.token -> dd),
          aliases = cat.aliases + (name -> rd.token)
        )
      }
    }
  }

  def fromV1YamlFile(path: String): Catalog = {
    val in = new FileInputStream(path)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    fromV1YamlString(s, catalogDir = Option(new java.io.File(path).getParent).getOrElse(""))
  }

  /** An `intake://host` URI (reference intake/__init__.py:163-166: a
    * uri starting "intake:" dispatches to driver `intake_remote`, the
    * legacy v1 intake-server wire protocol — which the reference's own
    * v2 dropped). We have no server protocol to speak, so the dispatch
    * arm imports as ONE searchable declared-only entry whose read
    * refuses loudly naming the protocol — the same refusal-edge
    * contract as GRIB2 5.40/blosclz, never a silent or generic failure.
    */
  private[catalog] def remoteDeclaredOnly(url: String): Catalog = {
    val rd = ReaderDescription(
      reader = "unsupported:intake_remote",
      kwargs = Map("url" -> url, "v1_name" -> "intake_remote"),
      metadata = Map(
        "v1_driver" -> "intake_remote",
        "description" -> s"legacy intake-server remote catalog at $url (declared-only)",
        "unsupported_reason" ->
          (s"'$url' names a legacy v1 intake-server (the intake_remote wire protocol, " +
            "reference intake/__init__.py open_intake_remote); this engine does not speak " +
            "that protocol — export the server's catalog to YAML and open that instead")))
    Catalog().addEntry("intake_remote", rd)
  }

  /** Dispatch like the reference's open_catalog: try v2, fall back to v1
    * (reference intake/__init__.py:105-187 VersionError fallback);
    * `intake:` URIs lower to the declared-only remote entry
    * ([[remoteDeclaredOnly]]).
    */
  def openCatalog(path: String): Catalog = {
    if (path.startsWith("intake:")) return remoteDeclaredOnly(path)
    val in = new FileInputStream(path)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val root = new Yaml().load[java.util.Map[String, Any]](s)
    val isV2 = root != null && root.asScala.get("version").exists(v => String.valueOf(v) == "2")
    if (isV2) CatalogIO.fromYamlString(s)
    else fromV1YamlString(s, catalogDir = Option(new java.io.File(path).getParent).getOrElse(""))
  }
}
