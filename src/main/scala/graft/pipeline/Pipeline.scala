package graft.pipeline

import graft.datatypes.{DataRef, Detect}
import graft.readers.{Reader, SparkReaders}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy multi-step pipeline: a source reader plus named
  * DataFrame→DataFrame stages (reference intake/readers/convert.py:855
  * `Pipeline`). Laziness is native — composing stages only grows the
  * Catalyst logical plan; nothing executes until an action.
  */
final case class Pipeline(
    source: Reader,
    ref: DataRef,
    steps: Seq[(String, DataFrame => DataFrame)] = Nil
) {

  def andThen(name: String, f: DataFrame => DataFrame): Pipeline =
    copy(steps = steps :+ (name -> f))

  /** Prefix pipeline of the first n stages (reference convert.py:977
    * `first_n_stages`; n=0 → bare source read).
    */
  def firstN(n: Int): Pipeline = copy(steps = steps.take(n))

  def read(spark: SparkSession): DataFrame =
    steps.foldLeft(source.read(spark, ref)) { case (df, (_, f)) => f(df) }

  /** Discover mode: sample the *source*, then run the same stages over the
    * sample (reference convert.py:936-944 — converters run on the
    * discover sample). Catalyst pushes the limit into the scan.
    */
  def discover(spark: SparkSession, n: Int = 10): DataFrame =
    steps.foldLeft(source.discover(spark, ref, n)) { case (df, (_, f)) => f(df) }

  /** Stepwise execution: materialise each stage boundary in turn
    * (reference convert.py:1026 `PipelineExecution` debugger). Lazy
    * iterator — each `next()` builds the prefix plan; caller actions it.
    */
  def stepwise(spark: SparkSession): Iterator[(String, DataFrame)] =
    Iterator("source" -> source.read(spark, ref)) ++
      steps.indices.iterator.map(i => steps(i)._1 -> firstN(i + 1).read(spark))

  def describe: Seq[String] = s"read:${source.name}(${ref.url})" +: steps.map(_._1)
}

object Pipeline {

  /** URL → pipeline producing a DataFrame: detect the datatype, pick the
    * best importable reader (reference convert.py:1160 `auto_pipeline` +
    * conversions-graph `path`; with one container the shortest path is
    * always detect→read, so the graph search degenerates to reader
    * choice).
    */
  def auto(url: String, options: Map[String, String] = Map.empty): Pipeline = {
    val candidates = Detect.recommendPath(url)
    val chosen = candidates.iterator
      .map(s => (s, SparkReaders.recommend(DataRef(s.kind.name, s.url, s.options ++ options))))
      .collectFirst { case (s, (importable, _)) if importable.nonEmpty =>
        (importable.head, DataRef(s.kind.name, s.url, s.options ++ options))
      }
    chosen match {
      case Some((reader, ref)) => Pipeline(reader, ref)
      case None =>
        throw new IllegalArgumentException(
          s"no importable reader for $url (candidates: ${candidates.map(_.kind.name).mkString(",")})")
    }
  }
}
