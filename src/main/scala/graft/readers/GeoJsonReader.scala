package graft.readers

import graft.datatypes.DataRef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON FeatureCollection reader: `spark.read.json` keeps the nesting;
  * this explodes `features` and flattens each feature into
  * (feature_id, geometry_type, geometry_json, property columns...), with
  * geometry carried as a JSON string column (WKT-free representation —
  * full geo algebra is out of scope per SURVEY §2a; detection + loading +
  * property access are first-class).
  */
object GeoJsonReader {

  def read(spark: SparkSession, url: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(url)
    require(raw.columns.contains("features"), s"not a FeatureCollection: $url")
    val exploded = raw.select(explode(col("features")).as("f"))
    val fSchema = exploded.schema.fields.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val hasId = fSchema.fieldNames.contains("id")
    val propCols: Seq[org.apache.spark.sql.Column] =
      fSchema.fields.find(_.name == "properties") match {
        case Some(p) =>
          p.dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
            .map(n => col(s"f.properties.$n").as(n))
        case None => Nil
      }
    val idCol = if (hasId) col("f.id").cast("string").as("feature_id")
                else monotonically_increasing_id().cast("string").as("feature_id")
    exploded.select(
      Seq(
        idCol,
        col("f.geometry.type").as("geometry_type"),
        to_json(col("f.geometry")).as("geometry_json")
      ) ++ propCols: _*
    )
  }
}

class GeoJsonReaderImpl extends Reader {
  val name = "geojson_reader"
  val implementsKinds = Set("geojson")
  def read(spark: SparkSession, ref: DataRef): DataFrame = GeoJsonReader.read(spark, ref.url)
}
