package graft.geom

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tie-point grid densification (SURVEY §2.9; reference
 * `utils/s1am/densifygrid.py:36-192`): a sparse geolocation grid of tie
 * points (pixel, line) → (lat, lon) is interpolated onto a dense
 * `gridPts × gridPts` grid. The reference interpolates with scipy `griddata`
 * (cubic = piecewise-cubic Clough–Tocher over a Delaunay triangulation of
 * the scattered points). The S1 annotation tie points form a REGULAR
 * lattice, so the JVM-side cubic is the separable not-a-knot bicubic
 * spline — like Clough–Tocher it is C1, local-ish, and exact on cubic
 * polynomial fields; on the smooth view/timing fields the reference
 * densifies (`incidenceAngle`, `azimuthTime`, …) the two agree to the
 * O(h⁴) interpolation error while bilinear diverges at O(h²). Bilinear
 * stays as the fast path (exact for the near-affine geolocation fields,
 * `raw2ard.py:86-102`).
 *
 * Spark shape: one input row per scene carrying the tie-point arrays; the
 * densified grid EXPLODES into per-point rows (a Generator, same pattern as
 * the cell cover) — per-scene work is embarrassingly parallel, no shuffle.
 */
object DensifyGrid {

  /** Second-derivative "moments" of the 1-D not-a-knot cubic spline through
    * `y` on a UNIFORM lattice with spacing `h`. Not-a-knot (scipy
    * `CubicSpline`'s default) keeps S''' continuous at the 2nd and
    * (n-1)th knots: `M0 - 2M1 + M2 = 0` on each end, which on a uniform
    * grid decouples to `M1 = d1/6` / `M_{n-2} = d_{n-2}/6` and a pure
    * tridiagonal interior — and, unlike natural BCs, reproduces cubic
    * polynomials exactly. n == 2 falls back to linear (M = 0); n == 3 is
    * the unique parabola (constant M). */
  def notAKnotMoments(y: Array[Double], h: Double): Array[Double] = {
    val n = y.length
    require(n >= 2, s"spline needs >= 2 knots, got $n")
    val m = new Array[Double](n)
    if (n == 2) return m
    @inline def d(i: Int) = 6.0 * (y(i - 1) - 2.0 * y(i) + y(i + 1)) / (h * h)
    if (n == 3) { val c = d(1) / 6.0; m(0) = c; m(1) = c; m(2) = c; return m }
    m(1) = d(1) / 6.0
    m(n - 2) = d(n - 2) / 6.0
    val k = n - 4 // unknowns M2..M_{n-3}
    if (k > 0) {
      // Thomas solve of M_{i-1} + 4 M_i + M_{i+1} = d_i, i = 2..n-3,
      // with M_1 and M_{n-2} already known and moved to the RHS
      val cp = new Array[Double](k); val dp = new Array[Double](k)
      var i = 0
      while (i < k) {
        val rhs = d(i + 2) - (if (i == 0) m(1) else 0.0) -
          (if (i == k - 1) m(n - 2) else 0.0)
        val denom = 4.0 - (if (i == 0) 0.0 else cp(i - 1))
        cp(i) = (if (i == k - 1) 0.0 else 1.0) / denom
        dp(i) = (rhs - (if (i == 0) 0.0 else dp(i - 1))) / denom
        i += 1
      }
      i = k - 1
      while (i >= 0) {
        m(i + 2) = dp(i) - cp(i) * (if (i == k - 1) 0.0 else m(i + 3))
        i -= 1
      }
    }
    m(0) = 2.0 * m(1) - m(2)
    m(n - 1) = 2.0 * m(n - 2) - m(n - 3)
    m
  }

  /** Evaluate the spline with values `y` / moments `m` / spacing `h`
    * (knots at i*h) at `t`, clamped to the knot span. */
  @inline def splineEval(y: Array[Double], m: Array[Double], h: Double, t: Double): Double = {
    val n = y.length
    val tc = math.min(math.max(t, 0.0), (n - 1) * h)
    val i = math.min((tc / h).toInt, n - 2)
    val s = tc - i * h
    y(i) + s * ((y(i + 1) - y(i)) / h - h / 6.0 * (2.0 * m(i) + m(i + 1))) +
      s * s * m(i) / 2.0 + s * s * s * (m(i + 1) - m(i)) / (6.0 * h)
  }

  /** Separable not-a-knot bicubic over a (rows × cols) lattice spanning
    * [0, width] × [0, height]: spline each lattice row along x at the `xs`
    * targets, then spline each resulting column along y at the `ys`
    * targets. Returns row-major ys.length × xs.length. Cost
    * O(rows·(cols + nx) + nx·(rows + ny)) per scene — no quadratic blowup,
    * no shuffle. */
  def bicubicGrid(field: Array[Double], rows: Int, cols: Int,
                  width: Double, height: Double,
                  xs: Array[Double], ys: Array[Double]): Array[Double] = {
    require(field.length == rows * cols, s"field must be rows*cols")
    val hx = width / (cols - 1); val hy = height / (rows - 1)
    val nx = xs.length; val ny = ys.length
    val tmp = new Array[Double](rows * nx) // lattice rows sampled at xs
    val rowBuf = new Array[Double](cols)
    var r = 0
    while (r < rows) {
      System.arraycopy(field, r * cols, rowBuf, 0, cols)
      val m = notAKnotMoments(rowBuf, hx)
      var j = 0
      while (j < nx) { tmp(r * nx + j) = splineEval(rowBuf, m, hx, xs(j)); j += 1 }
      r += 1
    }
    val out = new Array[Double](ny * nx)
    val colBuf = new Array[Double](rows)
    var j = 0
    while (j < nx) {
      var rr = 0
      while (rr < rows) { colBuf(rr) = tmp(rr * nx + j); rr += 1 }
      val m = notAKnotMoments(colBuf, hy)
      var i = 0
      while (i < ny) { out(i * nx + j) = splineEval(colBuf, m, hy, ys(i)); i += 1 }
      j += 1
    }
    out
  }

  /** Point-wise bicubic (test/debug convenience; batch work should use
    * [[bicubicGrid]]). */
  def bicubic(field: Array[Double], rows: Int, cols: Int,
              width: Double, height: Double, x: Double, y: Double): Double =
    bicubicGrid(field, rows, cols, width, height, Array(x), Array(y))(0)

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
    * Returns (pixel, line, lat, lon) tuples in row-major order.
    * `method`: "bilinear" (fast path, exact on affine fields) or "cubic"
    * (the reference's `griddata(method='cubic')` fidelity class). */
  def densify(lats: Array[Double], lons: Array[Double], rows: Int, cols: Int,
              width: Double, height: Double, gridPts: Int,
              method: String = "bilinear"): Array[(Double, Double, Double, Double)] = {
    require(lats.length == rows * cols && lons.length == rows * cols,
      s"tie-point arrays must be rows*cols, got ${lats.length} for $rows x $cols")
    val xs = Array.tabulate(gridPts)(c => c.toDouble * width / (gridPts - 1))
    val ys = Array.tabulate(gridPts)(r => r.toDouble * height / (gridPts - 1))
    val (las, los) = method match {
      case "cubic" =>
        (bicubicGrid(lats, rows, cols, width, height, xs, ys),
         bicubicGrid(lons, rows, cols, width, height, xs, ys))
      case "bilinear" =>
        (Array.tabulate(gridPts * gridPts)(i =>
           bilinear(lats, rows, cols, width, height, xs(i % gridPts), ys(i / gridPts))),
         Array.tabulate(gridPts * gridPts)(i =>
           bilinear(lons, rows, cols, width, height, xs(i % gridPts), ys(i / gridPts))))
      case other => throw new IllegalArgumentException(s"unknown method $other")
    }
    Array.tabulate(gridPts * gridPts)(i =>
      (xs(i % gridPts), ys(i / gridPts), las(i), los(i)))
  }

  /** DataFrame operator: scenes (doc_id, lats, lons, rows, cols, width,
    * height) → exploded dense grid rows (doc_id, pixel, line, lat, lon). */
  def densifyDocs(scenes: DataFrame, gridPts: Int,
                  method: String = "bilinear"): DataFrame = {
    val gen = udf((lats: Seq[Double], lons: Seq[Double], rows: Int, cols: Int,
                   width: Double, height: Double) =>
      densify(lats.toArray, lons.toArray, rows, cols, width, height, gridPts, method))
    scenes
      .withColumn("__pt", explode(gen(col("lats"), col("lons"), col("rows"),
        col("cols"), col("width"), col("height"))))
      .select(col("doc_id"), col("__pt._1").as("pixel"), col("__pt._2").as("line"),
        col("__pt._3").as("lat"), col("__pt._4").as("lon"))
  }
}
