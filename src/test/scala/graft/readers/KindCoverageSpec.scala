package graft.readers

import graft.datatypes.{DataRef, Registry}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-level contract: every kind the detector can classify must
  * route to at least one reader (importable or classpath-gated), so a
  * user pointing the engine at recognized data never gets classification
  * with no read path. Catalog/service container kinds dispatch through
  * the catalog layer instead, and TileDB is formally scoped out
  * (SURVEY §8) with detection retained — those are the only exemptions.
  */
class KindCoverageSpec extends AnyFunSuite {

  private val catalogDispatch = Set("catalog_file", "tiled_service", "stac_catalog",
    "thredds_catalog", "cmr", "intake_v1", "datapackage",
    // stacjson detects static STAC documents (stac_version + structural
    // keys); the route is StacCatalog.walk, a catalog not a DataFrame
    "stacjson",
    // hdl:/doi: identifiers resolve URL->URL through
    // ServiceReaders.resolveHandle (readers.py:980 HandleToUrlReader) —
    // the output is a reference to re-detect, not a DataFrame
    "handle")
  private val scopedOut = Set("tiledb")

  test("every classifiable kind has a reader candidate or a documented dispatch") {
    val orphans = Registry.kinds
      .map(_.name)
      .filterNot(catalogDispatch)
      .filterNot(scopedOut)
      .filterNot { k =>
        // a plausible file/service URL for isOk gates keyed on URL shape
        val url = if (k == "sql_query") "jdbc:derby:memory:x" else s"file:///data/sample.$k"
        val (importable, gated) = SparkReaders.recommend(DataRef(k, url))
        importable.nonEmpty || gated.nonEmpty
      }
    assert(orphans.isEmpty,
      s"kinds classify but route to no reader: ${orphans.mkString(", ")}")
  }

  test("doc_text reader wins for docx and extracts text rows") {
    val ref = DataRef("docx", "file:///tmp/none.docx")
    val (importable, _) = SparkReaders.recommend(ref)
    assert(importable.headOption.exists(_.name == "doc_text"))
  }
}
