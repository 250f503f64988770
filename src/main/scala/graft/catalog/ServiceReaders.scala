package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Service-API readers for the remaining HTTP/JSON backends of the
  * reference's Services family: Socrata open-data portals
  * (`/root/reference/intake/readers/readers.py:3419`), Elasticsearch
  * search results (`readers.py:3377`), and `hdl:` handle dereference
  * (`readers.py:980` HandleToUrlReader).
  *
  * Transport conventions, matching the rest of the repo:
  *  - GET-shaped documents read through the Hadoop FS (specs drive them
  *    with `file://` fixtures; clusters plug an http filesystem or fetch
  *    proxy into the same path);
  *  - POST-shaped APIs (Elasticsearch `_search`) take an injectable
  *    transport exactly like `graft.ops.LlmOps` — a real
  *    HttpURLConnection transport in production, a canned one in specs.
  *
  * API responses are bounded documents, so pages parse driver-side and
  * the records distribute via `spark.read.json(Dataset[String])` —
  * schema inference and all downstream pushdown stay native. At scale
  * the paging loop is metadata-bounded (pageSize * maxPages), never a
  * corpus scan: these feed catalogs and dimension tables, not the
  * 100 TB fact path.
  */
object ServiceReaders {

  private val mapper = new ObjectMapper()

  private[catalog] def readJson(url: String, conf: Configuration): JsonNode = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try mapper.readTree(in) finally in.close()
  }

  /** GET transport: url => response body. Injectable so specs page
    * offline. The default routes http(s) through HttpURLConnection —
    * query-string aware, unlike a Hadoop `Path`, which folds the
    * `?$limit=..` pagination params into the path component — and
    * everything else (the `file://` fixture path) through the Hadoop FS.
    */
  type GetTransport = String => String

  def httpGetTransport(conf: Configuration): GetTransport = url => {
    val scheme = Option(new URI(url).getScheme).getOrElse("")
    if (scheme == "http" || scheme == "https") {
      val conn = new java.net.URL(url).openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(15000)
      conn.setReadTimeout(60000)
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    } else {
      val fs = FileSystem.get(new URI(url).resolve("/"), conf)
      val in = fs.open(new Path(url))
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    }
  }

  /** Socrata resource endpoint (`https://{domain}/resource/{4x4}.json`):
    * each page is a JSON array of records; pagination is `$limit`/
    * `$offset` query params; a short page terminates. `paged=false`
    * reads the URL as a single page (the `file://` fixture path).
    */
  def readSocrata(
      spark: SparkSession,
      url: String,
      pageSize: Int = 10000,
      maxPages: Int = 1000,
      paged: Boolean = true,
      transport: GetTransport = null
  ): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fetch = Option(transport).getOrElse(httpGetTransport(conf))
    val records = Seq.newBuilder[String]
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      val pageUrl =
        if (!paged) url
        else url + (if (url.contains("?")) "&" else "?") + s"$$limit=$pageSize&$$offset=${page * pageSize}"
      val node = mapper.readTree(fetch(pageUrl))
      require(node.isArray, s"socrata resource did not return a JSON array at $pageUrl")
      val n = node.size()
      node.elements().asScala.foreach(r => records += mapper.writeValueAsString(r))
      done = !paged || n < pageSize
      page += 1
    }
    spark.read.json(spark.createDataset(records.result()))
  }

  /** DCAT `data.json` (the catalog document every Socrata portal and
    * data.gov publish): one entry per dataset distribution with a
    * `downloadURL`/`accessURL`, typed by mediaType so `auto_pipeline`
    * can pick the reader.
    */
  def socrataCatalog(rootUrl: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Catalog = {
    val node = readJson(rootUrl, conf)
    val datasets = Option(node.get("dataset")).toSeq.flatMap(_.elements().asScala)
    datasets.foldLeft(Catalog()) { (cat, d) =>
      val id = Option(d.get("identifier")).map(_.asText()).getOrElse("")
      val title = Option(d.get("title")).map(_.asText()).getOrElse(id)
      val dist = Option(d.get("distribution")).toSeq.flatMap(_.elements().asScala)
        .find(x => Option(x.get("downloadURL")).orElse(Option(x.get("accessURL"))).isDefined)
      dist match {
        case Some(x) if id.nonEmpty =>
          val href = Option(x.get("downloadURL")).getOrElse(x.get("accessURL")).asText()
          val media = Option(x.get("mediaType")).map(_.asText()).getOrElse("")
          // reader names must be registered SparkReaders names, or
          // Catalog.read/auto_pipeline throws "unknown reader" on use
          val (kind, reader) =
            if (media.contains("csv")) ("csv", "spark_csv")
            else if (media.contains("json") || href.endsWith(".json")) ("socrata", "socrata_reader")
            else ("binary", "spark_binary")
          cat.add(title, DataRef(kind, href, metadata = Map("mediaType" -> media, "identifier" -> id)), reader)
        case _ => cat
      }
    }
  }

  /** POST transport for Elasticsearch: (url, jsonBody) => response body.
    * Injectable so specs run offline with canned pages.
    */
  type EsTransport = (String, String) => String

  /** Real HTTP transport (driver-side, bounded page loop; explicit
    * timeouts so a dead endpoint fails the query instead of hanging the
    * driver).
    */
  def httpPostTransport: EsTransport = (url, body) => {
    val conn = new java.net.URL(url).openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(15000)
    conn.setReadTimeout(60000)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    val in = conn.getInputStream
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
  }

  /** Elasticsearch `_search` with `search_after` pagination: each request
    * sorts on `sortField` (default `_doc`, the index order — the scan
    * idiom), takes the last hit's `sort` key as the next cursor, stops on
    * a short page. Hits flatten to their `_source` objects plus `_id`/
    * `_index` columns.
    */
  def readElasticsearch(
      spark: SparkSession,
      baseUrl: String,
      index: String,
      query: String = """{"match_all":{}}""",
      pageSize: Int = 1000,
      maxPages: Int = 1000,
      sortField: String = "_doc",
      transport: EsTransport = httpPostTransport
  ): DataFrame = {
    import spark.implicits._
    val url = s"${baseUrl.stripSuffix("/")}/$index/_search"
    val records = Seq.newBuilder[String]
    var cursor: Option[JsonNode] = None
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      val after = cursor.map(c => s""","search_after":${mapper.writeValueAsString(c)}""").getOrElse("")
      val body = s"""{"size":$pageSize,"query":$query,"sort":["$sortField"]$after}"""
      val node = mapper.readTree(transport(url, body))
      val hits = Option(node.get("hits")).flatMap(h => Option(h.get("hits"))).toSeq
        .flatMap(_.elements().asScala).toSeq
      hits.foreach { h =>
        val src = Option(h.get("_source")).getOrElse(mapper.createObjectNode()).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        src.put("_id", Option(h.get("_id")).map(_.asText()).getOrElse(""))
        src.put("_index", Option(h.get("_index")).map(_.asText()).getOrElse(index))
        records += mapper.writeValueAsString(src)
      }
      cursor = hits.lastOption.flatMap(h => Option(h.get("sort")))
      done = hits.size < pageSize || cursor.isEmpty
      page += 1
    }
    spark.read.json(spark.createDataset(records.result()))
  }

  /** InfluxDB 1.x `/query` response (`readers.py:3322` InfluxDB):
    * `{"results":[{"series":[{name, tags?, columns, values}]}]}` →
    * long-form rows `(series, tags_json, <columns...>)` with the series'
    * columns flattened through JSON schema inference. A query response is
    * a bounded document (the reader targets dashboards/dimensions, not
    * the fact path), so it parses driver-side like Prometheus.
    */
  def readInflux(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val node = readJson(url, conf)
    val records = Seq.newBuilder[String]
    Option(node.get("results")).toSeq.flatMap(_.elements().asScala).foreach { res =>
      require(!res.has("error"), s"influx error: ${res.get("error")}")
      Option(res.get("series")).toSeq.flatMap(_.elements().asScala).foreach { ser =>
        val name = Option(ser.get("name")).map(_.asText()).getOrElse("")
        val tags = Option(ser.get("tags")).map(mapper.writeValueAsString).getOrElse("{}")
        val cols = Option(ser.get("columns")).toSeq.flatMap(_.elements().asScala).map(_.asText()).toIndexedSeq
        Option(ser.get("values")).toSeq.flatMap(_.elements().asScala).foreach { row =>
          val o = mapper.createObjectNode()
          o.put("series", name)
          o.put("tags_json", tags)
          cols.zipWithIndex.foreach { case (c, i) => o.set[JsonNode](c, row.get(i)) }
          records += mapper.writeValueAsString(o)
        }
      }
    }
    spark.read.json(spark.createDataset(records.result()))
  }

  /** Dereference a `hdl:`/`doi:` persistent identifier through the
    * handle-system REST API response (`readers.py:980` HandleToUrlReader):
    * returns the first `URL`-typed value.
    */
  def resolveHandle(responseUrl: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Option[String] = {
    val node = readJson(responseUrl, conf)
    Option(node.get("values")).toSeq.flatMap(_.elements().asScala)
      .find(v => Option(v.get("type")).exists(_.asText() == "URL"))
      .flatMap(v => Option(v.get("data")).flatMap(d => Option(d.get("value"))).map(_.asText()))
  }
}

class SocrataReaderImpl extends graft.readers.Reader {
  val name = "socrata_reader"
  val implementsKinds = Set("socrata")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    ServiceReaders.readSocrata(spark, ref.url,
      paged = ref.options.get("paged").forall(_.toBoolean))
}

class ElasticsearchReaderImpl extends graft.readers.Reader {
  val name = "elasticsearch_reader"
  val implementsKinds = Set("elasticsearch")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    ServiceReaders.readElasticsearch(spark, ref.url,
      ref.options.getOrElse("index", "_all"),
      ref.options.getOrElse("query", """{"match_all":{}}"""))
}
