package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** XarraySel parity (reference transform.py:18 `Dataset.sel`): label and
  * positional selection over the long-form array layout, incl.
  * method="nearest" snapping.
  */
class ArraySelSpec extends SparkSpec {
  import spark.implicits._

  // a 4x3 "temperature(lat, lon)" cube in long form
  private lazy val cube = (for { la <- 0 until 4; lo <- 0 until 3 }
    yield (la.toLong, lo.toLong, (la * 10 + lo).toDouble)).toDF("dim0", "dim1", "value")
  // coordinate variables: lat = 10,20,30,40 ; lon = -5.0,0.0,5.0
  private lazy val latCoords = Seq((0L, 10.0), (1L, 20.0), (2L, 30.0), (3L, 40.0)).toDF("index", "label")
  private lazy val lonCoords = Seq((0L, -5.0), (1L, 0.0), (2L, 5.0)).toDF("index", "label")

  test("isel: exact, range, and list positional selection") {
    assert(ArraySel.isel(cube, Map("dim0" -> ArraySel.At(2))).count() == 3)
    assert(ArraySel.isel(cube, Map("dim0" -> ArraySel.Between(1, 2))).count() == 6)
    assert(ArraySel.isel(cube,
      Map("dim0" -> ArraySel.Values(Seq(0, 3)), "dim1" -> ArraySel.At(1))).count() == 2)
    intercept[IllegalArgumentException] {
      ArraySel.isel(cube, Map("nope" -> ArraySel.At(0)))
    }
  }

  test("sel: labels resolve through coords by broadcast semi-join") {
    val out = ArraySel.sel(cube,
      Map("dim0" -> latCoords, "dim1" -> lonCoords),
      Map("dim0" -> ArraySel.Between(20.0, 30.0), "dim1" -> ArraySel.At(0.0)))
    val rows = out.select("dim0", "dim1", "value").as[(Long, Long, Double)].collect().toSet
    assert(rows == Set((1L, 1L, 11.0), (2L, 1L, 21.0)))
    // the coord resolution broadcast, never a data-cube shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"coords must broadcast:\n$plan")
  }

  test("sel Nearest snaps to the closest existing label, ties to lower index") {
    // 24.9 -> lat 20 (index 1); 25.0 is equidistant 20/30 -> lower index wins
    val near = ArraySel.sel(cube, Map("dim0" -> latCoords),
      Map("dim0" -> ArraySel.Nearest(24.9)))
    assert(near.select("dim0").distinct().as[Long].head() == 1L)
    val tie = ArraySel.sel(cube, Map("dim0" -> latCoords),
      Map("dim0" -> ArraySel.Nearest(25.0)))
    assert(tie.select("dim0").distinct().as[Long].head() == 1L)
    // missing coords frame and the Nearest-without-coords misuse refuse loudly
    intercept[IllegalArgumentException] {
      ArraySel.sel(cube, Map.empty, Map("dim0" -> ArraySel.Nearest(1.0)))
    }
    intercept[IllegalArgumentException] {
      ArraySel.isel(cube, Map("dim0" -> ArraySel.Nearest(1.0)))
    }
  }

  test("sel composes with a real zarr-shaped read: filters prune on dim columns") {
    // isel predicates are plain filters — they appear as Filter over the
    // scan, Catalyst-pushable when the source supports it
    val plan = ArraySel.isel(cube, Map("dim0" -> ArraySel.Between(1, 2)))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("dim0"), plan)
  }
}
