package graft.convert

import graft.readers.SparkReaders

/** The conversion graph: nodes are qualified container-type names, edges
  * are readers (datatype → container) and converters (container →
  * container). Mirrors the reference's conversions_graph + k-shortest
  * simple-path search with cutoff 5 and avoid/prefer filters (reference
  * intake/readers/convert.py:1072-1157) — in-memory, no graph library
  * (SURVEY §2a row `conversions_graph`).
  *
  * With Spark as the single tabular container most converter edges of
  * the reference collapse to identity; the graph remains load-bearing
  * for reader selection and writer endpoints (DataFrame → parquet file →
  * re-readable datatype), and stays extensible for future containers
  * (Dataset[T], streaming DataFrame, chunked-array frame).
  */
final case class Edge(from: String, to: String, label: String, cost: Double = 1.0)

final case class ConversionGraph(edges: Seq[Edge]) {

  lazy val nodes: Set[String] = edges.flatMap(e => Seq(e.from, e.to)).toSet
  private lazy val adjacency: Map[String, Seq[Edge]] = edges.groupBy(_.from)

  /** Enumerate simple paths start→end, shortest (by summed cost) first,
    * bounded by `cutoff` hops; edges whose label matches an `avoid`
    * regex are excluded (reference convert.py:1121-1157 `path`).
    */
  def paths(start: String, end: String, cutoff: Int = 5, avoid: Seq[String] = Nil): Seq[Seq[Edge]] = {
    val avoidRes = avoid.map(_.r)
    def excluded(e: Edge): Boolean = avoidRes.exists(_.findFirstIn(e.label).isDefined)
    val out = Seq.newBuilder[Seq[Edge]]
    def dfs(node: String, visited: Set[String], trail: Vector[Edge]): Unit = {
      if (trail.length > cutoff) return
      if (node == end && trail.nonEmpty) { out += trail; return }
      adjacency.getOrElse(node, Nil).foreach { e =>
        if (!excluded(e) && !visited.contains(e.to)) dfs(e.to, visited + e.to, trail :+ e)
      }
    }
    dfs(start, Set(start), Vector.empty)
    out.result().sortBy(p => (p.map(_.cost).sum, p.length))
  }

  /** First path, honoring prefer/exclude label regexes: preferred edges
    * get a cost discount, excluded ones are dropped (reference
    * datatypes.py:90-113 to_reader_cls selection semantics).
    */
  def bestPath(
      start: String,
      end: String,
      prefer: Seq[String] = Nil,
      exclude: Seq[String] = Nil
  ): Option[Seq[Edge]] = {
    val preferRes = prefer.map(_.r)
    def score(p: Seq[Edge]): Double =
      p.map(e => if (preferRes.exists(_.findFirstIn(e.label).isDefined)) e.cost * 0.5 else e.cost).sum
    paths(start, end, avoid = exclude).sortBy(score).headOption
  }
}

object ConversionGraph {

  val DataFrameType = "org.apache.spark.sql.DataFrame"
  val StreamingDataFrameType = "org.apache.spark.sql.DataFrame[streaming]"

  /** Build the default graph from the live reader registry plus writer
    * endpoints (writers produce datatype nodes, so URL→DataFrame→file→
    * DataFrame chains are plannable, mirroring the reference's
    * output-as-datatype convention, reference output.py).
    */
  def default(): ConversionGraph = {
    val readerEdges = SparkReaders.all.filter(_.importable).flatMap { r =>
      val to = if (r.name == "spark_kafka") StreamingDataFrameType else DataFrameType
      r.implementsKinds.toSeq.map(k => Edge(s"datatype:$k", to, s"reader:${r.name}"))
    }
    // tabular sinks (Writers), array sinks (ZarrWriter/NetCDF3Writer),
    // structured sinks (Hdf5Writer), geo (GeoJSON) — each produces a
    // datatype node a registered reader can re-open, so write→read
    // chains plan end-to-end
    val writerEdges = Seq(
      "parquet", "csv", "json", "orc", "avro", "text", "xml",
      "zarr", "netcdf3", "hdf5", "geojson",
      // native lakehouse writers (round 11): written tables re-open
      // through the native delta/iceberg readers, so write→read chains
      // plan through the table formats too
      "delta", "iceberg").map(f =>
      Edge(DataFrameType, s"datatype:$f", s"writer:$f")) :+
      // chart rendering (reference output.py:132 ToMatplotlib + :147
      // MatplotlibToPNG): DataFrame plans straight to a PNG datatype via
      // the headless rasterizer (output.ChartRenderer.toPngFile)
      Edge(DataFrameType, "datatype:png", "writer:chart_png") :+
      // round-16 media/array sinks: per-row baseline TIFFs
      // (MediaWriters.tiffImages) and the NRRD array sink (NrrdWriter) —
      // both round-trip through this registry's own readers
      Edge(DataFrameType, "datatype:tiff", "writer:tiff_images") :+
      Edge(DataFrameType, "datatype:nrrd", "writer:nrrd")
    val streamEdges = Seq(
      Edge(StreamingDataFrameType, DataFrameType, "converter:stream_to_batch_memory_sink"),
      Edge(DataFrameType, StreamingDataFrameType, "converter:batch_as_stream_source")
    )
    // LLM service chain (reference convert.py:561 GGUFToLlamaCPPService,
    // :569 LLamaCPPServiceToOpenAIService): a GGUF model file plans to a
    // spawned llama.cpp server (ops.LlmService.start) whose /v1 surface
    // is an OpenAI endpoint feeding LlmOps transports.
    val serviceEdges = Seq(
      Edge("datatype:gguf", "service:llama_cpp", "reader:llama_server"),
      Edge("service:llama_cpp", "service:openai", "converter:llama_to_openai")
    )
    ConversionGraph(readerEdges ++ writerEdges ++ streamEdges ++ serviceEdges)
  }
}
