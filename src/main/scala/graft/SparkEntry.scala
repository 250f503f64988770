package graft

import graft.queries.{CoreQueries, FunctionQueries, StreamingBatchQueries, TextQueries, WindowQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY §2b): every entry
  * is a named DataFrame builder over the testdata tables, and every
  * SQL-expressible entry has a DuckDB oracle in `oracleSql` with matching
  * output column names.
  */
object SparkEntry {

  private val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    CoreQueries.entries ++ WindowQueries.entries ++ FunctionQueries.entries ++
      TextQueries.entries ++ StreamingBatchQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (SURVEY §7 step 3).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hashes / RNG) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, _, Some(sql)) => name -> sql.trim }.toMap
}
