package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** xarray-style selection over the long-form array layout every array
  * reader in this repo emits (`dim0..dimN: long, value`) — the full
  * `XarraySel` surface (reference intake/readers/transform.py:18
  * `Dataset.sel(indexers)`), not just raw `df.filter`:
  *
  *  - [[isel]]: positional selection (exact index / index range /
  *    stride) — pure Column predicates on the dim columns, so Catalyst
  *    pushes them into the chunk scan;
  *  - [[sel]]: LABEL-based selection against per-dimension coordinate
  *    arrays (their own long-form frames, e.g. a NetCDF coordinate
  *    variable): exact labels and ranges resolve by broadcast semi-join
  *    (coords are metadata-sized, never the data cube), and
  *    `Nearest` snaps to the closest existing label the way
  *    `sel(method="nearest")` does — via a bounded collect of the ONE
  *    dimension's coords, the same in-memory-dimension-coordinate
  *    contract xarray itself has.
  */
object ArraySel {

  sealed trait Indexer
  /** exact label / index */
  final case class At(value: Double) extends Indexer
  /** closed label/index range, xarray's `slice(lo, hi)` */
  final case class Between(lo: Double, hi: Double) extends Indexer
  /** label list */
  final case class Values(values: Seq[Double]) extends Indexer
  /** nearest existing label, `sel(..., method="nearest")` */
  final case class Nearest(value: Double) extends Indexer

  private def predicate(c: Column, ix: Indexer): Column = ix match {
    case At(v)          => c === v
    case Between(lo, hi) => c >= lo && c <= hi
    case Values(vs)     => c.isin(vs: _*)
    case Nearest(_) =>
      throw new IllegalArgumentException(
        "Nearest needs coordinate labels — use sel() with a coords frame")
  }

  /** Positional selection: one filter per dim column. */
  def isel(df: DataFrame, indexers: Map[String, Indexer]): DataFrame =
    indexers.foldLeft(df) { case (d, (dim, ix)) =>
      require(d.columns.contains(dim), s"no such dim column: $dim")
      d.where(predicate(col(dim).cast("double"), ix))
    }

  /** Label-based selection. `coords` maps a dim column name to its
    * coordinate frame: (index: long, label: double) — column names
    * `idxCol`/`labelCol`. Exact/range/list indexers semi-join the
    * resolved index set (broadcast — coordinate arrays are 1-D
    * metadata); `Nearest` collects that ONE dimension's labels (bounded
    * by `maxCoordValues`, refusing loudly past it) and snaps.
    */
  def sel(
      df: DataFrame,
      coords: Map[String, DataFrame],
      indexers: Map[String, Indexer],
      idxCol: String = "index",
      labelCol: String = "label",
      maxCoordValues: Int = 1000000
  ): DataFrame =
    indexers.foldLeft(df) { case (d, (dim, ix)) =>
      require(d.columns.contains(dim), s"no such dim column: $dim")
      val coord = coords.getOrElse(dim,
        throw new IllegalArgumentException(s"no coords frame for dim $dim"))
      ix match {
        case Nearest(target) =>
          val labels = coord.select(col(idxCol).cast("long"), col(labelCol).cast("double"))
            .limit(maxCoordValues + 1).collect()
          require(labels.length <= maxCoordValues,
            s"dim $dim has more than $maxCoordValues coordinate labels — nearest-label selection " +
              "needs the dimension coordinate in memory (the xarray contract); sel on a range instead")
          require(labels.nonEmpty, s"dim $dim has no coordinate labels")
          val nearestIdx = labels.minBy(r => (math.abs(r.getDouble(1) - target), r.getLong(0))).getLong(0)
          d.where(col(dim) === nearestIdx)
        case other =>
          val wanted = coord
            .where(predicate(col(labelCol).cast("double"), other))
            .select(col(idxCol).cast("long").as(dim))
          d.join(broadcast(wanted), Seq(dim), "left_semi")
      }
    }
}
