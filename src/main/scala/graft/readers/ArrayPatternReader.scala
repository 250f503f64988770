package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-file array concat with captured coordinates (reference
  * readers.py:1441 XArrayPatternReader: xarray reads `{field}`-patterned
  * files and concatenates along a new dimension carrying the captured
  * value). The pattern expands to a glob on the driver; each matching
  * file reads through its native array reader (itself distributed), the
  * captured fields attach as literal columns, and the union is the
  * concat. The per-file loop is driver-side but touches only paths —
  * the data path stays on executors.
  */
object ArrayPatternReader {

  private val FieldRe = "\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r

  private[readers] def captures(pattern: String, path: String): Option[Seq[String]] = {
    val pathPart = pattern.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")
    val re = (".*" + java.util.regex.Pattern.quote(pathPart)
      .replaceAll("\\{[A-Za-z_][A-Za-z0-9_]*\\}", "\\\\E(.*?)\\\\Q") + "$").r
    re.findFirstMatchIn(path).map(m => (1 to m.groupCount).map(m.group))
  }

  private def readOne(spark: SparkSession, url: String, options: Map[String, String]): DataFrame =
    url match {
      case u if u.endsWith(".nc") =>
        val variable = options.get("variable")
          .getOrElse(NetCDF3Reader.variables(u, spark.sparkContext.hadoopConfiguration).head)
        NetCDF3Reader.read(spark, u, variable)
      case u if u.endsWith(".npy") => NumpyReader.read(spark, u)
      case u if u.endsWith(".nrrd") => NrrdReader.read(spark, u)
      case u => ZarrReader.read(spark, u) // directory stores
    }

  def read(spark: SparkSession, urlPattern: String, options: Map[String, String] = Map.empty): DataFrame = {
    val fields = FieldRe.findAllMatchIn(urlPattern).map(_.group(1)).toSeq
    require(fields.nonEmpty, s"no {field} captures in $urlPattern")
    val glob = FieldRe.replaceAllIn(urlPattern, "*")
    // braces make the raw pattern an illegal URI — resolve the FS from
    // the brace-free glob instead
    val fs = FileSystem.get(new URI(glob).resolve("/"), spark.sparkContext.hadoopConfiguration)
    val matches = fs.globStatus(new Path(glob))
    require(matches != null && matches.nonEmpty, s"no files match $glob")
    val parts = matches.toSeq.flatMap { st =>
      val p = st.getPath.toString
      captures(urlPattern, p).map(vals => (p, vals))
    }
    require(parts.nonEmpty, s"no matched paths re-parse against $urlPattern")
    parts.map { case (path, vals) =>
      fields.zip(vals).foldLeft(readOne(spark, path, options)) { case (df, (f, v)) =>
        df.withColumn(f, lit(v))
      }
    }.reduce(_.unionByName(_))
  }
}

class ArrayPatternReaderImpl extends Reader {
  val name = "array_pattern_reader"
  val implementsKinds = Set("netcdf3", "numpy", "zarr", "nrrd")
  override def isOk(ref: DataRef): Boolean = super.isOk(ref) && ref.url.contains("{")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    ArrayPatternReader.read(spark, ref.url, ref.options)
}
