package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tile assignment (SURVEY §2.3 J2): which output tile(s) does each scene
 * footprint feed. In the reference this is implicit for gridded sensors
 * (tile id embedded in the scene name, cells 18/65) and geometric for
 * free-footprint sensors (S1, cell 44). Here the geometric path is the
 * engine path; the gridded-name path is the cross-check (both must agree —
 * tested in TileAssignSpec).
 *
 * Output is deterministically ordered downstream by (doc_id, tile_id) —
 * the reference leans on pandas' stable order, which a distributed engine
 * must replace with an explicit total order (SURVEY §2.6).
 */
object TileAssign {

  /** Geometric assignment: footprint × tile polygons via the cell-cover join.
    * `geomCol` may be WKT (string) or WKB (binary). */
  def assign(scenes: DataFrame, tiles: DataFrame, res: Int = 5,
             shuffled: Boolean = false, saltBuckets: Int = 1,
             geomCol: String = "wkt"): DataFrame =
    SpatialJoin.intersectJoin(scenes, geomCol, tiles.withColumnRenamed("wkt", "tile_wkt"),
      "tile_wkt", res, shuffled, saltBuckets)
      .drop("tile_wkt")

  /** Point-in-polygon assignment of scene center points (reference:
    * `rasterio.features.rasterize` PIP at `utils/genprepWater.py:274-279`,
    * generalized). JTS intersects is boundary-inclusive, matching closed-set
    * `<=` range predicates. */
  def assignPoint(points: DataFrame, tiles: DataFrame, res: Int = 5): DataFrame =
    SpatialJoin.intersectJoin(points, "pt_wkt", tiles.withColumnRenamed("wkt", "tile_wkt"),
      "tile_wkt", res)
      .drop("tile_wkt")
}
