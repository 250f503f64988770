package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

package object queries {
  /** A named query: builds a DataFrame from a testdata directory. */
  type QFn = (SparkSession, String) => DataFrame

  /** Load one testdata table (TESTDATA.md layout: `<dir>/<name>.parquet`).
    *
    * Parquet TIMESTAMP(NANOS) (the `events.ts` column) is not a Spark SQL
    * type; read it as nanos-since-epoch Long (legacy conf) and convert to
    * a microsecond timestamp with integral division (a double division
    * would lose precision above 2^53 ns).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
