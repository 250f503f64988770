package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** OGC API - Features walker + paged items reader (reference
  * readers.py:3446 OGCAPIFeatures via owslib) and a Prometheus range
  * reader (readers.py:1720 PrometheusMetricReader). Both speak the
  * published JSON wire shapes directly through the Hadoop FS (so specs
  * drive them with file:// fixtures, and a cluster with an http
  * filesystem or a fetch proxy reuses the same code path).
  */
object OgcApiFeatures {

  private val mapper = new ObjectMapper()

  private def readJson(url: String, conf: Configuration): JsonNode = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try mapper.readTree(in) finally in.close()
  }

  private def resolve(base: String, href: String): String =
    if (href.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) href
    else new URI(base).resolve(href).toString

  /** `/collections` document → one catalog entry per feature collection,
    * addressed by its `items` link.
    */
  def fromUrl(rootUrl: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Catalog = {
    val node = readJson(rootUrl, conf)
    val collections = Option(node.get("collections")).toSeq.flatMap(_.elements().asScala)
    collections.foldLeft(Catalog()) { (cat, c) =>
      val id = Option(c.get("id")).map(_.asText()).getOrElse("")
      val items = Option(c.get("links")).toSeq.flatMap(_.elements().asScala)
        .find(l => Option(l.get("rel")).exists(_.asText() == "items"))
        .flatMap(l => Option(l.get("href")).map(h => resolve(rootUrl, h.asText())))
      items match {
        case Some(href) if id.nonEmpty =>
          val title = Option(c.get("title")).map(_.asText()).getOrElse(id)
          cat.add(id, DataRef("ogc_features", href,
            metadata = Map("title" -> title)), "ogc_features_reader")
        case _ => cat
      }
    }
  }

  /** Read a collection's items across pages: each page is a GeoJSON
    * FeatureCollection whose `links[rel=next]` chains to the next page.
    * Page URLs resolve on the driver (metadata-only); each page's
    * features flatten through the shared GeoJSON layout and the pages
    * union.
    */
  def readItems(spark: SparkSession, itemsUrl: String, maxPages: Int = 1000): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pages = Seq.newBuilder[String]
    var url = Option(itemsUrl)
    val seen = scala.collection.mutable.Set[String]()
    var n = 0
    while (url.isDefined && n < maxPages && seen.add(url.get)) {
      pages += url.get
      val node = readJson(url.get, conf)
      url = Option(node.get("links")).toSeq.flatMap(_.elements().asScala)
        .find(l => Option(l.get("rel")).exists(_.asText() == "next"))
        .flatMap(l => Option(l.get("href")).map(h => resolve(url.get, h.asText())))
      n += 1
    }
    pages.result().map(graft.readers.GeoJsonReader.read(spark, _)).reduce(_.unionByName(_))
  }
}

/** Prometheus `query_range`/`query` response → long-form rows
  * `(metric, labels_json, ts, value)`. An API response is a bounded
  * JSON document, so it parses driver-side (the LLM-ops shape) and
  * parallelizes for downstream work.
  */
object PrometheusReader {

  private val mapper = new ObjectMapper()

  def read(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    val node = try mapper.readTree(in) finally in.close()
    require(Option(node.get("status")).exists(_.asText() == "success"),
      s"prometheus response status != success at $url")
    val results = Option(node.get("data")).flatMap(d => Option(d.get("result"))).toSeq
      .flatMap(_.elements().asScala)
    val rows = results.flatMap { r =>
      val metric = Option(r.get("metric")).getOrElse(mapper.createObjectNode())
      val name = Option(metric.get("__name__")).map(_.asText()).getOrElse("")
      val labels = mapper.writeValueAsString(metric)
      val values =
        Option(r.get("values")).toSeq.flatMap(_.elements().asScala) ++
          Option(r.get("value")).toSeq // instant query: single [ts, v]
      values.map { v =>
        (name, labels, v.get(0).asDouble(), v.get(1).asText().toDouble)
      }
    }
    spark.createDataset(rows).toDF("metric", "labels_json", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
  }
}

class OgcFeaturesReaderImpl extends graft.readers.Reader {
  val name = "ogc_features_reader"
  val implementsKinds = Set("ogc_features")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    OgcApiFeatures.readItems(spark, ref.url)
}

class PrometheusReaderImpl extends graft.readers.Reader {
  val name = "prometheus_reader"
  val implementsKinds = Set("prometheus")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    PrometheusReader.read(spark, ref.url)
}
