package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.jdk.CollectionConverters._

/** Shared JSON fetch for registry/service catalog walkers: any Hadoop
  * filesystem (file:// fixtures in tests, https:// against live
  * services via the Hadoop http fs).
  */
private[catalog] object RegistryJson {
  private val mapper = new ObjectMapper()

  def read(url: String, conf: Configuration): JsonNode = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try mapper.readTree(in) finally in.close()
  }

  def resolve(base: String, href: String): String =
    if (href.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) href
    else new URI(base).resolve(href).toString

  def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)

  /** Flatten scalar fields of a JSON object into string metadata. */
  def scalarMeta(n: JsonNode): Map[String, String] =
    Option(n).filter(_.isObject).map { o =>
      o.properties().asScala.collect {
        case e if e.getValue.isValueNode && !e.getValue.isNull => e.getKey -> e.getValue.asText()
      }.toMap
    }.getOrElse(Map.empty)
}

/** Tiled data-service walker (reference intake/readers/catalogs.py:46
  * TiledLazyEntries / TiledCatalogReader): the reference wraps the
  * `tiled.client` and fetches child nodes lazily; here the walk speaks
  * Tiled's JSON:API directly. Each search document lists entries whose
  * `attributes.structure_family` says container (recurse via
  * `links.search`) or data (emit an entry addressed by `links.full`).
  * Table nodes rehydrate through the parquet source — Tiled serves
  * `?format=application/x-parquet` on full links — and array nodes stay
  * declared binary entries.
  */
object TiledCatalog {

  import RegistryJson._

  def fromUrl(rootUrl: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf(), maxDepth: Int = 4): Catalog = {
    val seen = scala.collection.mutable.Set[String]()

    def entryFor(name: String, item: JsonNode, links: JsonNode, cat: Catalog): Catalog = {
      val family = Option(item.get("attributes")).flatMap(a => textOpt(a, "structure_family")).getOrElse("")
      val full = Option(links).flatMap(l => textOpt(l, "full")).getOrElse("")
      if (full.isEmpty) cat
      else {
        val meta = Option(item.get("attributes")).map(a => scalarMeta(a.get("metadata"))).getOrElse(Map.empty) +
          ("structure_family" -> family)
        val (kind, reader) = family match {
          case "table"              => ("parquet", "spark_parquet")
          case "array" | "sparse"   => ("binary", "spark_binary")
          case _                    => ("binary", "spark_binary")
        }
        cat.add(name, DataRef(kind, full, metadata = meta), reader)
      }
    }

    def walk(url: String, prefix: String, depth: Int, cat: Catalog): Catalog = {
      if (depth > maxDepth || !seen.add(url)) return cat
      val doc = read(url, conf)
      val items = Option(doc.get("data")).toSeq.flatMap {
        case arr if arr.isArray => arr.elements().asScala.toSeq
        case one                => Seq(one)
      }
      val withItems = items.foldLeft(cat) { (c, item) =>
        val id = textOpt(item, "id").getOrElse("")
        val name = if (prefix.isEmpty) id else s"$prefix/$id"
        val links = item.get("links")
        val family = Option(item.get("attributes")).flatMap(a => textOpt(a, "structure_family")).getOrElse("")
        if (family == "container")
          Option(links).flatMap(l => textOpt(l, "search"))
            .map(next => walk(resolve(url, next), name, depth + 1, c))
            .getOrElse(c)
        else entryFor(name, item, links, c)
      }
      // pagination: top-level links.next chains further pages of this node
      Option(doc.get("links")).flatMap(l => textOpt(l, "next"))
        .map(next => walk(resolve(url, next), prefix, depth, withItems))
        .getOrElse(withItems)
    }

    walk(rootUrl, "", 0, Catalog(metadata = Map("tiled_root" -> rootUrl)))
  }
}

/** Huggingface Hub dataset registry (reference
  * intake/readers/catalogs.py:481 HuggingfaceHubCatalog): lists the hub's
  * datasets and emits one entry per dataset id, community datasets
  * (namespaced `user/name` ids) excluded unless asked for — same default
  * as the reference. Each entry's DataRef points at the hub's parquet
  * manifest for the dataset (`/api/datasets/{id}/parquet`), so
  * rehydration streams the hub-converted parquet shards straight into
  * the Spark parquet source (readers.Reader `hf_parquet`) instead of
  * requiring the Python `datasets` library.
  */
object HuggingFaceHubCatalog {

  import RegistryJson._

  val DefaultApi = "https://huggingface.co/api"

  def fromApi(
      apiBase: String = DefaultApi,
      conf: Configuration = graft.core.SerializableHadoopConf.sessionConf(),
      withCommunityDatasets: Boolean = false,
      maxEntries: Int = 10000
  ): Catalog = {
    val base = apiBase.stripSuffix("/")
    val listing = read(s"$base/datasets", conf)
    val items = Option(listing).filter(_.isArray).toSeq.flatMap(_.elements().asScala.toSeq)
    items
      .flatMap(d => textOpt(d, "id").map(_ -> d))
      .filter { case (id, _) => withCommunityDatasets || !id.contains("/") }
      .take(maxEntries)
      .foldLeft(Catalog(metadata = Map("hf_api" -> base))) { case (cat, (id, d)) =>
        cat.add(
          id,
          DataRef("huggingface", s"$base/datasets/$id/parquet",
            metadata = scalarMeta(d) + ("hf_id" -> id)),
          "hf_parquet"
        )
      }
  }
}
