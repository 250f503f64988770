package graft.pipeline

import graft.catalog.{Catalog, ReaderDescription}
import org.apache.spark.sql.DataFrame

/** Driver-side control-flow combinators around lazy reads (reference
  * intake/readers/readers.py:1657 `Condition`, :1748 `Retry`;
  * transform.py:121 `CatalogMapper`). These run on the driver — Spark
  * task-level retries handle executor faults; Retry here covers
  * whole-action failures (flaky object store, transient service).
  */
object Combinators {

  /** Re-run `action` with exponential backoff on allowed exceptions. */
  def retry[T](
      maxTries: Int = 3,
      backoffMs: Long = 100,
      allowed: Throwable => Boolean = _ => true
  )(action: => T): T = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      attempt += 1
      try return action
      catch {
        case e: Throwable if attempt < maxTries && allowed(e) =>
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** If/else branch between two lazy DataFrames on a predicate evaluated
    * at read time (predicate may itself probe data — e.g. row count of a
    * sample).
    */
  def condition(pred: => Boolean)(ifTrue: => DataFrame)(ifFalse: => DataFrame): DataFrame =
    if (pred) ifTrue else ifFalse

  /** Map a transform over every entry of a catalog, producing a new
    * catalog whose entries carry an extra pipeline step (reference
    * CatalogMapper). The transform is recorded as metadata so the
    * derived catalog stays serialisable.
    */
  def catalogMap(cat: Catalog, stepName: String)(f: ReaderDescription => ReaderDescription): Catalog =
    cat.copy(entries = cat.entries.map { case (tok, rd) =>
      tok -> f(rd).copy(metadata = rd.metadata + ("derived_by" -> stepName))
    })
}
