package graft.catalog

import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.xml.{Elem, XML}

/** THREDDS catalog walker: parse `catalog.xml`, follow `catalogRef`
  * children, and emit one entry per `dataset` with a `urlPath`, resolved
  * against the HTTP file service base (reference
  * intake/readers/catalogs.py:413 THREDDSCatalogReader; THREDDS catalog
  * spec is public Unidata documentation). Depth-bounded, cycle-guarded,
  * filesystem-agnostic like [[StacCatalog]].
  */
object ThreddsCatalog {

  private def readXml(url: String, conf: Configuration): Elem = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try XML.load(in) finally in.close()
  }

  private def resolve(base: String, href: String): String =
    if (href.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) href
    else new URI(base).resolve(href).toString

  def fromUrl(rootUrl: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf(), maxDepth: Int = 4): Catalog = {
    val seen = scala.collection.mutable.Set[String]()

    def walk(url: String, depth: Int, cat0: Catalog): Catalog = {
      if (depth > maxDepth || !seen.add(url)) return cat0
      val root = readXml(url, conf)
      // service bases by name (HTTPServer-type services serve raw files)
      val bases = (root \\ "service")
        .map(s => ((s \ "@name").text, (s \ "@base").text))
        .filter(_._2.nonEmpty)
        .toMap
      val defaultBase = bases.values.headOption.getOrElse("")

      val withDatasets = (root \\ "dataset").foldLeft(cat0) { (cat, ds) =>
        val urlPath = (ds \ "@urlPath").text
        val name = (ds \ "@name").text
        if (urlPath.isEmpty) cat
        else {
          val dataUrl = resolve(url, defaultBase + urlPath)
          val kind = graft.datatypes.Detect.recommend(dataUrl).headOption.map(_.kind.name).getOrElse("binary")
          val reader = graft.readers.SparkReaders.recommend(DataRef(kind, dataUrl))._1.headOption
            .map(_.name).getOrElse("spark_binary")
          cat.add(if (name.nonEmpty) name else urlPath, DataRef(kind, dataUrl, metadata = Map("thredds_urlPath" -> urlPath)), reader)
        }
      }

      (root \\ "catalogRef").foldLeft(withDatasets) { (cat, ref) =>
        val href = ref.attributes.asAttrMap.collectFirst {
          case (k, v) if k == "xlink:href" || k.endsWith(":href") || k == "href" => v
        }.getOrElse("")
        if (href.nonEmpty) walk(resolve(url, href), depth + 1, cat) else cat
      }
    }

    walk(rootUrl, 0, Catalog(metadata = Map("thredds_root" -> rootUrl)))
  }
}
