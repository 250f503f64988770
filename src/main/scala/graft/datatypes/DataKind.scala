package graft.datatypes

import graft.core.Tokenizable

/** A *description* of a dataset kind — not the data. Mirrors the
  * reference's BaseData class attributes (reference
  * intake/readers/datatypes.py:21-31: mimetypes/filepattern/structure/
  * magic/contains) as a closed Scala registry.
  *
  * `magic` entries are (offset, bytes) — a NEGATIVE offset means "the
  * bytes appear anywhere in the fetched head", the reference's
  * `(None, sig)` magic form (datatypes.py:823 STACJSON, :866 Iceberg);
  * `filePattern` are regexes matched against the URL; `contains` are
  * member names any one of which, seen in a directory listing,
  * identifies the kind (e.g. Delta's _delta_log, Zarr's
  * version-specific metadata objects).
  */
final case class DataKind(
    name: String,
    mimeTypes: Seq[String] = Nil,
    filePattern: Seq[String] = Nil,
    structure: Set[String] = Set.empty,
    magic: Seq[(Int, Array[Byte])] = Nil,
    contains: Seq[String] = Nil,
    /** Content veto: given (head bytes, url), can this kind be right?
      * Mirrors the reference's per-class `_head_ok` checks
      * (datatypes.py:293 CSV binary-reject, :334 XML, :746 GeoJSON ...).
      */
    headOk: (Array[Byte], String) => Boolean = (_, _) => true
) {
  def matchesMime(mime: String): Boolean =
    mime.nonEmpty && mimeTypes.exists(p => mime.matches(p))
  def matchesPattern(url: String): Boolean =
    filePattern.exists(p => java.util.regex.Pattern.compile(p).matcher(url.toLowerCase).find())
  def matchesMagic(head: Array[Byte]): Boolean =
    magic.exists {
      case (off, sig) if off < 0 => // anywhere-in-head magic
        head.indexOfSlice(sig) >= 0
      case (off, sig) =>
        head.length >= off + sig.length && sig.indices.forall(i => head(off + i) == sig(i))
    }
  def matchesContains(listing: Seq[String]): Boolean =
    // exact member name, or a path ending in "/member" (listings may be
    // full paths) — a bare suffix match would let `model_snapshots`
    // trigger icechunk's `snapshots` marker
    contains.exists(m => listing.exists(l =>
      l == m || l.endsWith("/" + m) || l.stripSuffix("/") == m || l.stripSuffix("/").endsWith("/" + m)))
}

/** A concrete dataset reference: kind + url + reader options + metadata.
  * The unit stored in catalogs (≈ reference FileData/Service instances).
  */
final case class DataRef(
    kind: String,
    url: String,
    options: Map[String, String] = Map.empty,
    metadata: Map[String, String] = Map.empty
) extends Tokenizable {
  def qname: String = s"graft.datatypes.$kind"
  def tokenAttrs: Map[String, Any] = Map("url" -> url, "options" -> options)
}

object Registry {

  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
  private def bytes(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray

  private def printableHead(head: Array[Byte]): Boolean = {
    val n = math.min(head.length, 2048)
    var i = 0
    while (i < n) {
      val b = head(i) & 0xff
      if (b == 0) return false
      i += 1
    }
    true
  }
  private def headText(head: Array[Byte]): String =
    new String(head.take(4096), java.nio.charset.StandardCharsets.ISO_8859_1)

  /** ~104 kinds covering the reference's ~110 concrete datatypes
    * (SURVEY §8 "Datatype registry expansion"); detection attributes
    * follow the reference tables, the published format specs supply the
    * magic numbers.
    */
  val kinds: Seq[DataKind] = Seq(
    DataKind("parquet", Seq("application/vnd.apache.parquet"), Seq("\\.parquet$", "\\.parq$"),
      Set("table"), Seq(0 -> ascii("PAR1"))),
    DataKind("csv", Seq("text/csv", "application/csv"), Seq("\\.csv(\\.|$)", "\\.tsv(\\.|$)"),
      Set("table"), headOk = (h, _) => printableHead(h)),
    // HuggingFace-style model directory marker (datatypes.py ModelConfig:
    // filepattern config.json, magic "model_type":) — outranks plain json
    // via magic; reads through the json reader (the config IS json)
    DataKind("model_config", Nil, Seq("config\\.json$"), Set("model", "nested"),
      magic = Seq(-1 -> ascii("\"model_type\":")),
      headOk = (h, _) => headText(h).contains("\"model_type\":")),
    DataKind("json", Seq("application/json", "text/json"), Seq("\\.json(l|)$", "\\.ndjson$"),
      Set("nested"),
      headOk = (h, _) => { val t = headText(h).dropWhile(_.isWhitespace); t.isEmpty || t.startsWith("{") || t.startsWith("[") }),
    DataKind("orc", Seq("application/x-orc"), Seq("\\.orc$"), Set("table"), Seq(0 -> ascii("ORC"))),
    DataKind("avro", Seq("application/avro", "avro/binary"), Seq("\\.avro$"), Set("table"),
      Seq(0 -> (ascii("Obj") :+ 1.toByte))),
    DataKind("arrow_ipc", Seq("application/vnd.apache.arrow.file"), Seq("\\.arrow$", "\\.feather$", "\\.ipc$"),
      Set("table"), Seq(0 -> ascii("ARROW1"))),
    DataKind("text", Seq("text/plain"), Seq("\\.txt$", "\\.log$"), Set("text"),
      headOk = (h, _) => printableHead(h)),
    DataKind("delta", Nil, Nil, Set("table"), contains = Seq("_delta_log")),
    DataKind("iceberg", Nil, Seq("metadata/[0-9v].*\\.metadata\\.json$"), Set("table"),
      headOk = (h, u) => !u.endsWith(".json") || headText(h).contains("\"format-version\"")),
    DataKind("excel", Seq("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", "application/vnd.ms-excel"),
      // xls legacy CFB magic + xlsx zip magic: magic+pattern outranks the
      // bare zip container kind for *.xlsx
      Seq("\\.xlsx$", "\\.xls$"), Set("table"), Seq(0 -> bytes(0xd0, 0xcf, 0x11, 0xe0), 0 -> ascii("PK\u0003\u0004"))),
    DataKind("sqlite", Seq("application/vnd.sqlite3"), Seq("\\.sqlite$", "\\.db$"),
      Set("table"), Seq(0 -> ascii("SQLite format 3\u0000"))),
    DataKind("duckdb_file", Nil, Seq("\\.duckdb$", "\\.ddb$"), Set("table"),
      Seq(8 -> ascii("DUCK"))),
    DataKind("yaml", Seq("application/yaml", "text/yaml"), Seq("\\.ya?ml$"), Set("nested"),
      headOk = (h, _) => printableHead(h)),
    DataKind("catalog_file", Nil, Seq("\\.ya?ml$"), Set("catalog"),
      // like the reference's CatalogFile._head_ok (datatypes.py:697):
      // only YAML containing an entries/sources/data key qualifies
      headOk = (h, _) => {
        val t = headText(h)
        Seq("entries:", "sources:", "data:", "aliases:").exists(t.contains)
      }),
    // THREDDS catalog XML before plain xml: the reference's offset-free
    // magic is "<catalog " inside an XML document (datatypes.py THREDDSCatalog)
    DataKind("thredds_catalog", Nil, Seq("catalog\\.xml$"), Set("catalog"),
      magic = Seq(-1 -> ascii("<catalog ")),
      headOk = (h, _) => {
        val t = headText(h)
        t.dropWhile(_.isWhitespace).startsWith("<") && t.contains("<catalog ")
      }),
    DataKind("xml", Seq("application/xml", "text/xml"), Seq("\\.xml$"), Set("nested"),
      headOk = (h, _) => headText(h).dropWhile(_.isWhitespace).startsWith("<")),
    DataKind("toml", Seq("application/toml"), Seq("\\.toml$"), Set("nested"),
      headOk = (h, _) => printableHead(h)),
    DataKind("ini", Nil, Seq("\\.ini$", "\\.cfg$", "\\.conf$"), Set("nested"),
      headOk = (h, _) => printableHead(h)),
    DataKind("markdown", Seq("text/markdown"), Seq("\\.md$", "\\.markdown$"), Set("text")),
    DataKind("html", Seq("text/html"), Seq("\\.html?$"), Set("text", "nested"),
      headOk = (h, _) => { val t = headText(h).toLowerCase; t.contains("<html") || t.contains("<!doctype html") }),
    DataKind("pdf", Seq("application/pdf"), Seq("\\.pdf$"), Set("text"), Seq(0 -> ascii("%PDF"))),
    DataKind("messagepack", Seq("application/msgpack", "application/x-msgpack"), Seq("\\.msgpack$", "\\.mp$"), Set("nested")),
    DataKind("png", Seq("image/png"), Seq("\\.png$"), Set("array", "image"),
      Seq(0 -> bytes(0x89, 0x50, 0x4e, 0x47))),
    DataKind("jpeg", Seq("image/jpeg"), Seq("\\.jpe?g$"), Set("array", "image"),
      Seq(0 -> bytes(0xff, 0xd8, 0xff))),
    // COG before plain tiff: byte-identical to TIFF (reference
    // datatypes.py:1449 COGFile "we rely on filepattern"), so the
    // .cog.tif naming convention plus the tiff magic is the signal;
    // routes to the GeoTIFF reader
    DataKind("cog", Seq("image/tiff"), Seq("\\.cog\\.tiff?$", "_cog\\.tiff?$"),
      Set("array", "image", "geo"),
      Seq(0 -> ascii("II*\u0000"), 0 -> ascii("MM\u0000*")),
      // the magic is shared with plain tiff, so the name must carry the
      // cog convention for this kind to apply (byte-identical formats)
      headOk = (_, u) => u.toLowerCase.contains("cog")),
    DataKind("tiff", Seq("image/tiff"), Seq("\\.tiff?$"), Set("array", "image"),
      Seq(0 -> ascii("II*\u0000"), 0 -> ascii("MM\u0000*"))),
    DataKind("wav", Seq("audio/x-wav", "audio/wav"), Seq("\\.wav$"), Set("array", "timeseries"),
      Seq(0 -> ascii("RIFF"), 8 -> ascii("WAVE"))),
    DataKind("mp3", Seq("audio/mpeg"), Seq("\\.mp3$"), Set("array", "timeseries"),
      Seq(0 -> ascii("ID3"), 0 -> bytes(0xff, 0xfb))),
    DataKind("mp4", Seq("video/mp4"), Seq("\\.mp4$"), Set("array", "video"),
      Seq(4 -> ascii("ftyp"))),
    DataKind("hdf5", Seq("application/x-hdf5?"), Seq("\\.h(df)?5$", "\\.hdf$", "\\.nc4?$"),
      Set("array"), Seq(0 -> (bytes(0x89) ++ ascii("HDF\r\n") ++ bytes(0x1a, 0x0a)))),
    DataKind("netcdf3", Seq("application/x-netcdf"), Seq("\\.nc3?$"), Set("array"),
      Seq(0 -> ascii("CDF"))),
    DataKind("zarr", Nil, Seq("\\.zarr/?$"), Set("array"),
      contains = Seq(".zmetadata", ".zarray", "zarr.json")),
    // Icechunk repo (reference datatypes.py:475 IcechunkRepo): a
    // zarr-adjacent versioned store identified by its `snapshots/`
    // member; detection-only — the registered reader names the store
    // and refuses with the icechunk-client guidance instead of
    // misreading the transactional layout as plain zarr
    DataKind("icechunk", Nil, Seq("\\.icechunk/?$"), Set("array"),
      contains = Seq("snapshots")),
    DataKind("raw_buffer", Nil, Seq("\\.raw$"), Set("array")),
    DataKind("numpy", Nil, Seq("\\.npy$"), Set("array"),
      Seq(0 -> (bytes(0x93) ++ ascii("NUMPY")))),
    DataKind("npz", Nil, Seq("\\.npz$"), Set("array"), Seq(0 -> ascii("PK\u0003\u0004"))),
    DataKind("tar", Seq("application/x-tar"), Seq("\\.tar$", "\\.tgz$", "\\.tar\\.(gz|bz2|xz|zst)$"),
      Set("container"), Seq(257 -> ascii("ustar"))),
    DataKind("zip", Seq("application/zip"), Seq("\\.zip$"), Set("container"),
      Seq(0 -> ascii("PK\u0003\u0004"))),
    // TFRecord has no magic bytes — suffix-only, like the reference's
    // filepattern "tfrec$" (datatypes.py:1007)
    DataKind("tfrecord", Nil, Seq("\\.tfrec(ord)?$"), Set("nested")),
    DataKind("gguf", Nil, Seq("\\.gguf$"), Set("model"), Seq(0 -> ascii("GGUF"))),
    DataKind("safetensors", Nil, Seq("\\.safetensors$"), Set("model")),
    DataKind("onnx", Nil, Seq("\\.onnx$"), Set("model")),
    DataKind("pickle", Seq("application/octet-stream"), Seq("\\.pkl$", "\\.pickle$"), Set("model"),
      Seq(0 -> bytes(0x80))),
    // STAC before geojson/json: a STAC document must carry stac_version
    // AND one of the structural keys (reference datatypes.py:820
    // STACJSON._head_ok) — the veto keeps plain GeoJSON/JSON out;
    // routes to the StacCatalog walker
    DataKind("stacjson", Seq("(text|application)/geo\\+json"), Seq("\\.json$"), Set("catalog", "geo"),
      magic = Seq(-1 -> ascii("\"stac_version\":")),
      headOk = (h, _) => {
        val t = headText(h)
        t.contains("\"stac_version\"") &&
          Seq("\"stac_extensions\"", "\"links\"", "\"assets\"", "\"collections\"", "\"items\"")
            .exists(t.contains)
      }),
    DataKind("geojson", Seq("application/geo\\+json"), Seq("\\.geojson$"), Set("table", "geo"),
      headOk = (h, _) => headText(h).contains("FeatureCollection") || headText(h).contains("\"geometry\"")),
    DataKind("shapefile", Nil, Seq("\\.shp$"), Set("table", "geo"),
      Seq(0 -> bytes(0x00, 0x00, 0x27, 0x0a))),
    DataKind("pmtiles", Nil, Seq("\\.pmtiles$"), Set("array", "geo"), Seq(0 -> ascii("PMTiles"))),
    // Scientific / stats-package / media formats (reference
    // datatypes.py: MatlabArray :503, MatrixMarket :515, GRIB2 :540,
    // FITS :549, ASDF :558, DICOM :566, Nifti :575, FlatGeoBuf :789,
    // GeoPackage :797, Matroska :1343, WebP :1351, BMP :1363, GIF
    // :1372, Stata :1497, SPSS :1509, SAS :1520) — detect + binaryFile
    // ingestion; BMP/PPM additionally feed the native pixel decoders.
    DataKind("matlab", Nil, Seq("\\.mat$"), Set("array"), Seq(0 -> ascii("MATLAB"))),
    DataKind("matrixmarket", Nil, Seq("\\.mtx$"), Set("array"), Seq(0 -> ascii("%%MatrixMarket"))),
    DataKind("grib2", Nil, Seq("\\.gri?b2?$"), Set("array"), Seq(0 -> ascii("GRIB"))),
    DataKind("fits", Nil, Seq("\\.fits?$"), Set("array"), Seq(0 -> ascii("SIMPLE"))),
    DataKind("asdf", Nil, Seq("\\.asdf$"), Set("array"), Seq(0 -> ascii("#ASDF"))),
    DataKind("dicom", Nil, Seq("\\.(dicom|dcm|ct|mri)$"), Set("array", "image"), Seq(128 -> ascii("DICM"))),
    DataKind("nrrd", Nil, Seq("\\.nrrd$", "\\.nhdr$"), Set("array"), Seq(0 -> ascii("NRRD"))),
    DataKind("nifti", Nil, Seq("\\.nii$", "\\.hdr$"), Set("array", "image"),
      Seq(344 -> (ascii("ni1") ++ bytes(0)), 344 -> (ascii("n+1") ++ bytes(0)))),
    DataKind("flatgeobuf", Nil, Seq("\\.fgb$"), Set("table", "geo"), Seq(0 -> ascii("fgb"))),
    DataKind("geopackage", Nil, Seq("\\.gpkg$"), Set("table", "geo"), Seq(0 -> ascii("SQLite format 3"))),
    // KML/GPX (reference readers.py:2287 KML, :2301 GPX): XML — sniff the
    // root element in the head text
    DataKind("kml", Seq("application/vnd.google-earth.kml+xml"), Seq("\\.kml$"), Set("table", "geo"),
      headOk = (h, _) => headText(h).contains("<kml")),
    DataKind("gpx", Seq("application/gpx+xml"), Seq("\\.gpx$"), Set("table", "geo"),
      headOk = (h, _) => headText(h).contains("<gpx")),
    // MBTiles (reference readers.py:2315): a SQLite db by magic; the
    // .mbtiles suffix disambiguates from plain sqlite
    DataKind("mbtiles", Nil, Seq("\\.mbtiles$"), Set("table", "geo"), Seq(0 -> ascii("SQLite format 3"))),
    DataKind("matroska", Seq("video/webm"), Seq("\\.webm$", "\\.mkv$"), Set("array", "video"),
      Seq(0 -> bytes(0x1a, 0x45, 0xdf, 0xa3))),
    DataKind("webp", Seq("image/webp"), Seq("\\.webp$"), Set("array", "image"), Seq(8 -> ascii("WEBP"))),
    DataKind("bmp", Seq("image/bmp"), Seq("\\.bmp$"), Set("array", "image"), Seq(0 -> ascii("BM"))),
    DataKind("gif", Seq("image/gif"), Seq("\\.gif$"), Set("array", "image"),
      Seq(0 -> ascii("GIF87a"), 0 -> ascii("GIF89a"))),
    DataKind("ppm", Nil, Seq("\\.p[pgn]m$"), Set("array", "image"),
      Seq(0 -> ascii("P6"), 0 -> ascii("P5"))),
    // Remaining media/doc/model kinds of the reference registry
    // (datatypes.py: AVIVideo :1310, FLACAudio :1228, OGGAudio :1247,
    // HEIFImage :1390, OpenEXRImage :1407, SVGFile :1416, DOCXFile :877,
    // EPUBFile :866, Feather1 :675, Lance :748, TileDB :759, BigWigFile
    // :1547, JoblibFile :1091, KerasModel :1064, TorchScriptModel :1043,
    // OSMPBFFile :813, ReStructuredText :922, PythonSourceCode :933,
    // MetaImage :1430, WholeSlideImage :1441, SDFFile :1556, OpenDAP
    // :584, MQTTTopic :1649, ArrowFlightService :1669) — detection +
    // binaryFile/zip-container ingestion; magic values are the public
    // file-format signatures.
    // offset-8 signature only: a 0->RIFF entry would also fire on WAV
    DataKind("avi", Seq("video/x-msvideo"), Seq("\\.avi$"), Set("array", "video"),
      Seq(8 -> ascii("AVI "))),
    DataKind("flac", Seq("audio/flac"), Seq("\\.flac$"), Set("array", "timeseries"),
      Seq(0 -> ascii("fLaC"))),
    DataKind("ogg", Seq("audio/ogg"), Seq("\\.(ogg|oga|opus)$"), Set("array", "timeseries"),
      Seq(0 -> ascii("OggS"))),
    DataKind("heif", Seq("image/hei[cf]"), Seq("\\.hei[cf]$"), Set("array", "image"),
      Seq(4 -> ascii("ftyphei"), 4 -> ascii("ftypmif1"))),
    DataKind("exr", Seq("image/x-exr"), Seq("\\.exr$"), Set("array", "image"),
      Seq(0 -> bytes(0x76, 0x2f, 0x31, 0x01))),
    DataKind("svg", Seq("image/svg\\+xml"), Seq("\\.svg$"), Set("array", "image"),
      headOk = (h, _) => headText(h).contains("<svg")),
    // zip-derived document/model kinds: pattern-driven with a PK head
    // VETO instead of PK magic -- scoring them on the shared zip magic
    // would suppress the generic `zip://*::` container rewrap.
    DataKind("docx",
      Seq("application/vnd\\.openxmlformats-officedocument\\.wordprocessingml\\.document"),
      Seq("\\.docx$"), Set("text"),
      headOk = (h, _) => h.length >= 2 && h(0) == 'P' && h(1) == 'K'),
    DataKind("epub", Seq("application/epub\\+zip"), Seq("\\.epub$"), Set("text"),
      headOk = (h, _) => h.length >= 2 && h(0) == 'P' && h(1) == 'K'),
    DataKind("rst", Nil, Seq("\\.rst$"), Set("text")),
    DataKind("python_source", Seq("text/x-python"), Seq("\\.py$"), Set("text")),
    DataKind("feather", Nil, Seq("\\.feather$"), Set("table"),
      Seq(0 -> ascii("FEA1"), 0 -> ascii("ARROW1"))),
    DataKind("lance", Nil, Seq("\\.lance/?$"), Set("table"), contains = Seq("_versions")),
    // tiledb: detection-only BY DECLARED SCOPE (SURVEY §8, round 6) —
    // the native on-disk format is 20+ storage versions of filtered
    // generic tiles, unverifiable without the tiledb client; no reader
    // registers this kind, so recommend() surfaces it with no native
    // read path rather than a misparsing one.
    DataKind("tiledb", Nil, Seq("\\.tiledb/?$"), Set("array"),
      contains = Seq("__array_schema.tdb")),
    DataKind("bigwig", Nil, Seq("\\.(bw|bigwig)$"), Set("timeseries"),
      Seq(0 -> bytes(0x26, 0xfc, 0x8f, 0x88), 0 -> bytes(0x88, 0x8f, 0xfc, 0x26))),
    DataKind("joblib", Nil, Seq("\\.joblib$"), Set("model")),
    DataKind("keras_model", Nil, Seq("\\.keras$"), Set("model"),
      headOk = (h, _) => h.length >= 2 && h(0) == 'P' && h(1) == 'K'),
    DataKind("torchscript", Nil, Seq("\\.pth?$"), Set("model"),
      headOk = (h, _) => h.length >= 2 && h(0) == 'P' && h(1) == 'K'),
    DataKind("osmpbf", Nil, Seq("\\.osm\\.pbf$"), Set("table", "geo")),
    DataKind("metaimage", Nil, Seq("\\.mh[da]$"), Set("array", "image"),
      headOk = (h, _) => headText(h).contains("ObjectType")),
    DataKind("wholeslide", Nil, Seq("\\.(svs|ndpi|scn)$"), Set("array", "image"),
      Seq(0 -> ascii("II*\u0000"), 0 -> ascii("MM\u0000*"))),
    DataKind("sdf", Seq("chemical/x-mdl-sdfile"), Seq("\\.sdf$"), Set("table"),
      headOk = (h, _) => { val t = headText(h); t.contains("V2000") || t.contains("V3000") }),
    // patterns match against the lowercased url (matchesPattern), so the
    // THREDDS "dodsC" path segment is written lowercase here
    // hdl:/doi: persistent identifiers resolve URL->URL through the
    // handle REST API (readers.py:980 HandleToUrlReader) — identified by
    // scheme only, like the reference (magic = none)
    DataKind("handle", Nil, Seq("^hdl:", "^doi:"), Set("service")),
    DataKind("opendap", Nil, Seq("/(dodsc|dods|opendap)/", "\\.dods$"), Set("array", "service")),
    DataKind("mqtt", Nil, Seq("^mqtts?://"), Set("sequence", "service")),
    DataKind("arrow_flight", Nil, Seq("^grpc(\\+tls)?://"), Set("table", "service")),
    DataKind("stata", Nil, Seq("\\.dta$"), Set("table"), Seq(0 -> ascii("<stata_dta>"))),
    DataKind("spss", Nil, Seq("\\.sav$"), Set("table"), Seq(0 -> ascii("$FL2"), 0 -> ascii("$FL3"))),
    DataKind("sas", Nil, Seq("\\.sas7bdat$", "\\.xpt$"), Set("table"),
      // sas7bdat binary magic bytes 12-15; "HEADER RECORD" covers .xpt
      Seq(12 -> bytes(0xc2, 0xea, 0x81, 0x60), 0 -> ascii("HEADER RECORD"))),
    // point clouds / molecular structures (reference datatypes.py:1489
    // E57 pointcloud, :1537 PDBFile; LAS lidar per its public spec)
    DataKind("e57", Nil, Seq("\\.e57$"), Set("array"), Seq(0 -> ascii("ASTM-E57"))),
    DataKind("las", Nil, Seq("\\.las$"), Set("array"), Seq(0 -> ascii("LASF"))),
    DataKind("pdb_structure", Seq("chemical/x-pdb"), Seq("\\.pdb$", "\\.ent$"), Set("table"),
      headOk = (h, _) => { val t = headText(h); t.startsWith("HEADER") || t.startsWith("ATOM") || t.startsWith("MODEL") }),
    DataKind("fasta", Nil, Seq("\\.fasta$", "\\.fa$"), Set("sequence"),
      headOk = (h, _) => headText(h).startsWith(">")),
    DataKind("fastq", Nil, Seq("\\.fastq$", "\\.fq$"), Set("sequence"),
      headOk = (h, _) => headText(h).startsWith("@")),
    // head gate: the OTHER ubiquitous .vcf — vCard contact files — must
    // not classify as variant calls (headOk only applies when a head is
    // available, so URL-only and gz-stripped detection still route)
    DataKind("vcf", Seq("text/x-variant-call-format"), Seq("\\.vcf$", "\\.vcf\\.gz$"),
      Set("table", "sequence"), Seq(0 -> ascii("##fileformat=VCF")),
      headOk = (h, _) => headText(h).contains("##fileformat=VCF")),
    // Value embedded in the catalog itself (reference Literal :923) —
    // never URL-detected, addressed by kind only
    DataKind("literal", Nil, Nil, Set("nested")),
    // Services (URL-scheme detection only; no head bytes to sniff)
    DataKind("sql_query", Nil, Seq("^(jdbc|postgres(ql)?|mysql|sqlite):"), Set("table", "service")),
    DataKind("kafka_topic", Nil, Seq("^kafka://"), Set("sequence", "timeseries", "service")),
    DataKind("websocket", Nil, Seq("^wss?://"), Set("sequence", "service")),
    DataKind("mongo", Nil, Seq("^mongodb(\\+srv)?://"), Set("nested", "service")),
    DataKind("elasticsearch", Nil, Seq("^(es|elasticsearch)://"), Set("nested", "service")),
    DataKind("redis", Nil, Seq("^redis://"), Set("nested", "service")),
    DataKind("influx", Nil, Seq("^influx(db)?://", "/query\\?"), Set("timeseries", "service")),
    // Socrata open-data resource endpoint (readers.py:3419): 4x4 dataset
    // ids under /resource/, or the explicit scheme.
    DataKind("socrata", Nil, Seq("^socrata://", "/resource/[a-z0-9]{4}-[a-z0-9]{4}(\\.json)?$"), Set("table", "service")),
    DataKind("prometheus", Nil, Seq("^prom(etheus)?://"), Set("timeseries", "service")),
    // Registry services (reference datatypes TiledService/TiledDataset and
    // HuggingfaceDataset, datatypes.py:1738,1616): addressed by kind/scheme,
    // no head bytes to sniff.
    DataKind("tiled_service", Nil, Nil, Set("catalog", "service")),
    DataKind("huggingface", Nil, Seq("^hf://"), Set("table", "service")),
    // OGC API - Features collections (readers.py:3446): addressed by kind
    DataKind("ogc_features", Nil, Nil, Set("table", "geo", "service"))
  )

  val byName: Map[String, DataKind] = kinds.map(k => k.name -> k).toMap
}
