package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.geom.Geo
import graft.model.SynthCorpus

/**
 * J2 agreement cross-check (SURVEY §2.3): for gridded sensors the tile id is
 * embedded in the scene name (`master_Search_Discover_example.ipynb` cells
 * 18/65/171) and the name path must agree with the geometric footprint path
 * — "both paths must agree, which is the cross-check test".
 *
 * Corpus: one doc per (tile, naming family) whose footprint is the tile's
 * rectangle inset by 1/16° on every side, so the geometric path intersects
 * EXACTLY the named tile (no boundary-sharing neighbors) and the two paths
 * must be set-equal.
 */
class TileAssignSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val tiles = SynthCorpus.tileGrid(spark)

  /** Gridded scene name for tile (i, j) in each reference naming family. */
  private def name(fam: Int, i: Int, j: Int): String = fam match {
    case 0 => f"S2A_MSIL2A_20190124T221941_N0211_R129_T$i%02d$j%02d_20190124T234256"
    case 1 => f"LC08_L1TP_$i%03d$j%03d_20190101_20190127_01_T1"
    case _ => f"MCD43A4.A2019010.h$i%02dv$j%02d.006.2019019120153"
  }

  /** Docs over a sub-grid: name carries the tile key, footprint is the tile
    * rect inset by 1/16 (strictly interior). */
  private def griddedDocs(is: Range, js: Range) = {
    val rows = for { i <- is; j <- js; fam <- 0 to 2 } yield {
      val (x0, y0) = (-180.0 + 15.0 * i, -90.0 + 10.0 * j)
      (name(fam, i, j),
        Geo.rectWkt(x0 + 1.0 / 16, y0 + 1.0 / 16, x0 + 15.0 - 1.0 / 16, y0 + 10.0 - 1.0 / 16),
        f"T$i%02d$j%02d")
    }
    rows.toDF("doc_id", "wkt", "expected_tile")
  }

  test("parseNameKey handles all three gridded naming families") {
    val parsed = Seq(
      name(0, 7, 3), name(1, 7, 3), name(2, 7, 3),
      "S1A_IW_GRDH_1SDV_20190101T000000", // free footprint: no grid key
      "LC08_L1TP_malformed"
    ).toDF("n").select(TileAssign.parseNameKey($"n").as("k"))
      .select($"k.path", $"k.row").as[(Option[Int], Option[Int])].collect()
    assert(parsed(0) == (Some(7), Some(3)))
    assert(parsed(1) == (Some(7), Some(3)))
    assert(parsed(2) == (Some(7), Some(3)))
    assert(parsed(3) == (None, None))
    assert(parsed(4) == (None, None))
  }

  test("gridded-name path ≡ geometric path on the inset gridded corpus") {
    val docs = griddedDocs(0 until 6, 0 until 5)
    val byName = TileAssign.assignByName(docs, tiles)
      .select("doc_id", "tile_id").as[(String, String)].collect().toSet
    val byGeom = TileAssign.assign(docs.drop("expected_tile"), tiles.drop("path", "row"))
      .select("doc_id", "tile_id").as[(String, String)].collect().toSet
    val expected = docs.select("doc_id", "expected_tile").as[(String, String)].collect().toSet
    assert(byName == expected, "name path must yield exactly the named tile")
    assert(byGeom == expected, "geometric path must yield exactly the enclosing tile")
    assert(byName == byGeom)
    assert(TileAssign.crossCheck(docs, tiles).isEmpty)
  }

  test("crossCheck flags a scene whose name contradicts its footprint") {
    val good = griddedDocs(0 until 2, 0 until 2)
    // claims tile T0000 but sits inside T0503
    val lie = Seq((name(0, 0, 0) + "_CORRUPT_T0000_X",
      Geo.rectWkt(-180.0 + 15 * 5 + 1, -90.0 + 10 * 3 + 1,
        -180.0 + 15 * 5 + 2, -90.0 + 10 * 3 + 2), "T0000"))
      .toDF("doc_id", "wkt", "expected_tile")
    val bad = TileAssign.crossCheck(good.unionByName(lie), tiles)
      .select("doc_id", "tile_id").as[(String, String)].collect()
    assert(bad.toSeq == Seq((name(0, 0, 0) + "_CORRUPT_T0000_X", "T0000")))
  }

  test("out-of-grid keys and keyless names drop from the name path") {
    val docs = Seq(
      (name(0, 30, 3), "POLYGON EMPTY", "x"), // path 30 outside the 24-col grid
      ("S1A_IW_GRDH_1SDV", "POLYGON EMPTY", "x")
    ).toDF("doc_id", "wkt", "expected_tile")
    assert(TileAssign.assignByName(docs, tiles).isEmpty)
  }
}
