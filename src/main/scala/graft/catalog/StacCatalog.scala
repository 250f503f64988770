package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.{DataRef, Detect}
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.jdk.CollectionConverters._

/** STAC (SpatioTemporal Asset Catalog) walker: follow child/item links
  * from a root catalog/collection JSON and emit one entry per item asset,
  * with the reader chosen by asset media type (reference
  * intake/readers/catalogs.py:99 StacCatalogReader + :200 `_get_reader`
  * asset dispatch). Works over any Hadoop filesystem (file://, s3a://,
  * https:// via the Hadoop http fs), depth-bounded, cycle-guarded.
  */
object StacCatalog {

  private val mapper = new ObjectMapper()

  private def readJson(url: String, conf: Configuration): JsonNode = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try mapper.readTree(in) finally in.close()
  }

  private def resolve(base: String, href: String): String =
    if (href.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) href
    else new URI(base).resolve(href).toString

  /** Media type → (kind, reader). Unknown types fall back to detection by
    * extension; still-unknown assets become declared-only binary entries.
    */
  private def assetKind(mediaType: String, href: String): (String, String) = mediaType match {
    case t if t.contains("parquet")       => ("parquet", "spark_parquet")
    case t if t.contains("csv")           => ("csv", "spark_csv")
    case t if t.contains("json")          => ("json", "spark_json")
    case t if t.contains("tiff")          => ("tiff", "spark_binary")
    case t if t.contains("png")           => ("png", "spark_binary")
    case t if t.contains("jpeg")          => ("jpeg", "spark_binary")
    case _ =>
      Detect.recommend(href).headOption
        .map(s => (s.kind.name, graft.readers.SparkReaders.recommend(DataRef(s.kind.name, href))._1.headOption.map(_.name).getOrElse("spark_binary")))
        .getOrElse(("binary", "spark_binary"))
  }

  def fromUrl(rootUrl: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf(), maxDepth: Int = 4): Catalog = {
    val seen = scala.collection.mutable.Set[String]()

    def walk(url: String, depth: Int, cat: Catalog): Catalog = {
      if (depth > maxDepth || !seen.add(url)) return cat
      val node = readJson(url, conf)
      val nodeType = Option(node.get("type")).map(_.asText()).getOrElse("")
      val id = Option(node.get("id")).map(_.asText()).getOrElse(url)

      val withAssets = Option(node.get("assets")) match {
        case Some(assets: JsonNode) if assets.isObject =>
          assets.properties().asScala.foldLeft(cat) { case (c, e) =>
            val assetName = e.getKey
            val a = e.getValue
            val href = resolve(url, Option(a.get("href")).map(_.asText()).getOrElse(""))
            val mediaType = Option(a.get("type")).map(_.asText()).getOrElse("")
            val (kind, reader) = assetKind(mediaType, href)
            c.add(s"$id/$assetName", DataRef(kind, href, metadata = Map("stac_item" -> id, "media_type" -> mediaType)), reader)
          }
        case _ => cat
      }

      Option(node.get("links")) match {
        case Some(links: JsonNode) if links.isArray =>
          links.elements().asScala.foldLeft(withAssets) { (c, link) =>
            val rel = Option(link.get("rel")).map(_.asText()).getOrElse("")
            if (rel == "child" || rel == "item")
              walk(resolve(url, link.get("href").asText()), depth + 1, c)
            else c
          }
        case _ => withAssets
      }
    }

    walk(rootUrl, 0, Catalog(metadata = Map("stac_root" -> rootUrl)))
  }
}
