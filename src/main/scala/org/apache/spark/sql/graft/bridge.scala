package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column<->Expression conversion (needed to
  * expose custom Catalyst expressions as user-facing Columns in Spark 4's
  * split Column API). Lives under org.apache.spark.sql for access scope
  * only; contains no Spark code.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def showString(df: org.apache.spark.sql.DataFrame, n: Int, truncate: Int): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].showString(n, truncate)
  /** DataFrame over an arbitrary logical plan, bound to `spark`. Used to
    * (a) host deferred-scan leaf nodes and (b) re-bind a plan built in a
    * conf-scoped `newSession` clone back to the caller's session (file
    * relations keep the session they were created with, so per-relation
    * conf like parquet field-id resolution survives the re-bind).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-expose a batch frame as a STREAMING-flagged one (v1
    * `Source.getBatch` contract: MicroBatchExecution asserts
    * `isStreaming` on the returned plan). The batch plan's `toRdd` is
    * lazy, so nothing executes until the micro-batch runs. */
  def streamingFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = ds.sparkSession
    session.internalCreateDataFrame(ds.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse: re-expose a v1 `Sink.addBatch` frame (whose plan is
    * flagged streaming and refuses batch writes) as an ordinary batch
    * frame over the SAME incremental execution's rows. */
  def batchFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = ds.sparkSession
    session.internalCreateDataFrame(ds.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
