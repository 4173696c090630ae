package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * k-nearest-tile matching (SURVEY §2.3 J8) — gap-filling for scenes whose
 * footprint misses all tile polygons (the AM-crossing-frame generalization,
 * `utils/s1am/raw2ard.py:76-85`).
 *
 * Mechanism: probe the k-ring of the point's cell at a coarse resolution,
 * broadcast-equi-join against tile cell covers, rank by exact JTS distance.
 *
 * Exactness bound (why ring=1 at a coarse res suffices): with the world
 * fully tiled by rectangles of size W×H, the k-th nearest tile of any point
 * (k ≤ 4) lies within max(W, H)/ of the point ≤ diag of one tile, while any
 * tile NOT sharing a ring-1 cell is ≥ one full cell away. Choosing the cell
 * size ≥ tile diagonal makes the ring-1 candidate set a superset of the true
 * top-k. KnnSpec verifies against brute force.
 *
 * Scale: tiles broadcast; probe side = narrow ops + one window over
 * (doc_id) partitions — the only shuffle, sized by k·|ring| candidates/doc.
 */
object Knn {

  /**
   * @param points DataFrame with (pt columns..., lon, lat)
   * @param tiles  DataFrame with (tile_id, wkt)
   * @param k      neighbors wanted
   * @param res    coarse cell resolution (cell size must dominate tile diag)
   * @param ring   ring radius in cells
   */
  def nearestTiles(points: DataFrame, tiles: DataFrame, k: Int,
                   res: Int = 3, ring: Int = 1): DataFrame = {
    val p = points
      .withColumn("pt_wkt", pointWktUdf(col("lon"), col("lat")))
      .withColumn("__ring", kRingOfPointUdf(col("lon"), col("lat"), lit(res), lit(ring)))
      .withColumn("__cell", explode(col("__ring")))
    val t = tiles
      .withColumnRenamed("wkt", "tile_wkt")
      .withColumn("__tcells", cellCoverUdf(col("tile_wkt"), lit(res)))
      .withColumn("__cell", explode(col("__tcells")))
    val cand = p.join(broadcast(t), "__cell")
      // shuffle-free dedup: keep the pair only on the min shared cell
      .where(col("__cell") === array_min(array_intersect(col("__ring"), col("__tcells"))))
      .drop("__cell", "__ring", "__tcells")
      .withColumn("dist", pointDistanceUdf(col("lon"), col("lat"), col("tile_wkt")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("dist"), col("tile_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("tile_wkt", "pt_wkt")
  }
}
