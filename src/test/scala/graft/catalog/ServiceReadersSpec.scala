package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

/** Socrata / Elasticsearch / handle-system fixtures follow the published
  * wire shapes (SODA resource arrays, DCAT data.json, ES `_search`
  * responses, handle REST API), served from file:// or a canned
  * transport like the other service specs.
  */
class ServiceReadersSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("svc")
    Files.writeString(d.resolve("resource.json"),
      """[{"region": "north", "sales": "1200", "when": "2024-01-02"},
        | {"region": "south", "sales": "870", "when": "2024-01-03"}]""".stripMargin)
    Files.writeString(d.resolve("data.json"),
      """{"dataset": [
        | {"identifier": "abcd-1234", "title": "City Sales",
        |  "distribution": [{"downloadURL": "https://example.org/resource/abcd-1234.json",
        |                    "mediaType": "application/json"}]},
        | {"identifier": "efgh-5678", "title": "Street CSV",
        |  "distribution": [{"downloadURL": "https://example.org/x.csv", "mediaType": "text/csv"}]},
        | {"identifier": "ignored", "title": "No dist", "distribution": []}
        |]}""".stripMargin)
    Files.writeString(d.resolve("handle.json"),
      """{"responseCode": 1, "handle": "10.1000/demo",
        | "values": [
        |  {"index": 100, "type": "HS_ADMIN", "data": {"value": "x"}},
        |  {"index": 1, "type": "URL", "data": {"format": "string", "value": "https://example.org/dataset.parquet"}}
        |]}""".stripMargin)
    d
  }

  test("socrata resource array reads into an inferred-schema frame") {
    val df = ServiceReaders.readSocrata(spark, s"file://$dir/resource.json", paged = false)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("region", "sales", "when"))
    assert(df.filter(df("region") === "north").count() == 1)
  }

  test("DCAT data.json yields typed catalog entries") {
    val cat = ServiceReaders.socrataCatalog(s"file://$dir/data.json")
    assert(cat.names.toSet == Set("City Sales", "Street CSV"))
    val refs = cat.names.map { n =>
      val tok = Templates.DataRe
        .findFirstMatchIn(cat.entries(cat.aliases(n)).kwargs("data")).get.group(1)
      n -> cat.data(tok).ref
    }.toMap
    assert(refs("City Sales").kind == "socrata")
    assert(refs("Street CSV").kind == "csv")
    assert(refs("City Sales").metadata("identifier") == "abcd-1234")
  }

  test("DCAT csv entry pipelines end-to-end through a registered reader") {
    Files.writeString(dir.resolve("streets.csv"), "name,lanes\nMain,4\nElm,2\n")
    Files.writeString(dir.resolve("data_local.json"),
      s"""{"dataset": [
         | {"identifier": "efgh-5678", "title": "Street CSV",
         |  "distribution": [{"downloadURL": "file://$dir/streets.csv", "mediaType": "text/csv"}]}
         |]}""".stripMargin)
    val cat = ServiceReaders.socrataCatalog(s"file://$dir/data_local.json")
    // the registered reader name must resolve (regression: csv_reader
    // vs spark_csv threw "unknown reader" on every non-socrata entry)
    val df = cat("Street CSV").read(spark)
    assert(df.count() == 2)
    assert(df.columns.contains("name"))
  }

  test("paged socrata walks $limit/$offset pages through the transport") {
    val urls = collection.mutable.ArrayBuffer[String]()
    val transport: ServiceReaders.GetTransport = url => {
      urls += url
      if (url.contains("offset=0")) """[{"id":"1"},{"id":"2"}]"""
      else """[{"id":"3"}]"""
    }
    val df = ServiceReaders.readSocrata(spark, "https://example.org/resource/ab12-cd34.json",
      pageSize = 2, transport = transport)
    assert(df.count() == 3)
    assert(urls.size == 2)
    assert(urls.head.contains("$limit=2") && urls.head.contains("$offset=0"))
    assert(urls(1).contains("$offset=2"))
  }

  test("elasticsearch search_after pagination walks pages and flattens _source") {
    val pages = collection.mutable.ArrayBuffer[String]()
    val transport: ServiceReaders.EsTransport = (url, body) => {
      pages += body
      if (body.contains("search_after")) {
        // second page: short -> terminates
        """{"hits":{"hits":[
          |  {"_id":"3","_index":"logs","_source":{"level":"warn","msg":"late"},"sort":[3]}
          |]}}""".stripMargin
      } else {
        """{"hits":{"hits":[
          |  {"_id":"1","_index":"logs","_source":{"level":"info","msg":"started"},"sort":[1]},
          |  {"_id":"2","_index":"logs","_source":{"level":"error","msg":"boom"},"sort":[2]}
          |]}}""".stripMargin
      }
    }
    val df = ServiceReaders.readElasticsearch(spark, "http://es.invalid", "logs",
      pageSize = 2, transport = transport)
    assert(df.count() == 3)
    assert(df.columns.sorted.toSeq == Seq("_id", "_index", "level", "msg"))
    assert(pages.size == 2 && pages(1).contains(""""search_after":[2]"""))
    assert(df.filter(df("_id") === "3").select("level").head().getString(0) == "warn")
  }

  test("handle response dereferences to its URL value") {
    val url = ServiceReaders.resolveHandle(s"file://$dir/handle.json")
    assert(url.contains("https://example.org/dataset.parquet"))
  }

  test("socrata/elasticsearch readers are registered and recommended") {
    val ref = graft.datatypes.DataRef("socrata", "https://example.org/resource/abcd-1234.json")
    val (ok, _) = graft.readers.SparkReaders.recommend(ref)
    assert(ok.exists(_.name == "socrata_reader"))
    val kinds = graft.datatypes.Detect.recommend("https://data.example.org/resource/ab12-cd34.json")
    assert(kinds.exists(_.kind.name == "socrata"))
  }
}
