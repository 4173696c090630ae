package graft.geom

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tie-point grid densification (SURVEY §2.9; reference
 * `utils/s1am/densifygrid.py:36-192`): a sparse geolocation grid of tie
 * points (pixel, line) → (lat, lon) is interpolated onto a dense
 * `gridPts × gridPts` grid. The reference interpolates with scipy `griddata`
 * (cubic); per SURVEY §7.4, bilinear over the regular tie-point lattice is
 * exact for the affine fields that matter for parity and is
 * deterministic/portable.
 *
 * Spark shape: one input row per scene carrying the tie-point arrays; the
 * densified grid EXPLODES into per-point rows (a Generator, same pattern as
 * the cell cover) — per-scene work is embarrassingly parallel, no shuffle.
 */
object DensifyGrid {

  /** Bilinear interpolation of a field sampled on a regular (rows × cols)
    * lattice spanning [0, width-1] × [0, height-1], evaluated at (x, y). */
  def bilinear(field: Array[Double], rows: Int, cols: Int,
               width: Double, height: Double, x: Double, y: Double): Double = {
    val gx = math.min(math.max(x / width * (cols - 1), 0.0), (cols - 1).toDouble)
    val gy = math.min(math.max(y / height * (rows - 1), 0.0), (rows - 1).toDouble)
    val c0 = math.min(gx.toInt, cols - 2); val r0 = math.min(gy.toInt, rows - 2)
    val fx = gx - c0; val fy = gy - r0
    val v00 = field(r0 * cols + c0); val v01 = field(r0 * cols + c0 + 1)
    val v10 = field((r0 + 1) * cols + c0); val v11 = field((r0 + 1) * cols + c0 + 1)
    (1 - fy) * ((1 - fx) * v00 + fx * v01) + fy * ((1 - fx) * v10 + fx * v11)
  }

  /** Densify one scene's tie-point lattice to gridPts × gridPts samples.
    * Returns (pixel, line, lat, lon) tuples in row-major order. */
  def densify(lats: Array[Double], lons: Array[Double], rows: Int, cols: Int,
              width: Double, height: Double, gridPts: Int): Array[(Double, Double, Double, Double)] = {
    require(lats.length == rows * cols && lons.length == rows * cols,
      s"tie-point arrays must be rows*cols, got ${lats.length} for $rows x $cols")
    val out = new Array[(Double, Double, Double, Double)](gridPts * gridPts)
    var i = 0
    var r = 0
    while (r < gridPts) {
      val y = r.toDouble * height / (gridPts - 1)
      var c = 0
      while (c < gridPts) {
        val x = c.toDouble * width / (gridPts - 1)
        out(i) = (x, y,
          bilinear(lats, rows, cols, width, height, x, y),
          bilinear(lons, rows, cols, width, height, x, y))
        i += 1; c += 1
      }
      r += 1
    }
    out
  }

  /** DataFrame operator: scenes (doc_id, lats, lons, rows, cols, width,
    * height) → exploded dense grid rows (doc_id, pixel, line, lat, lon). */
  def densifyDocs(scenes: DataFrame, gridPts: Int): DataFrame = {
    val gen = udf((lats: Seq[Double], lons: Seq[Double], rows: Int, cols: Int,
                   width: Double, height: Double) =>
      densify(lats.toArray, lons.toArray, rows, cols, width, height, gridPts))
    scenes
      .withColumn("__pt", explode(gen(col("lats"), col("lons"), col("rows"),
        col("cols"), col("width"), col("height"))))
      .select(col("doc_id"), col("__pt._1").as("pixel"), col("__pt._2").as("line"),
        col("__pt._3").as("lat"), col("__pt._4").as("lon"))
  }
}
