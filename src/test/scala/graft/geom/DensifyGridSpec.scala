package graft.geom

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Bilinear densification: exact on affine fields (the geolocation grids the
  * reference densifies are near-affine per block, `raw2ard.py:86-102`);
  * tie points reproduced exactly; monotone fields stay monotone. */
class DensifyGridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = 5; private val cols = 7
  private val width = 24000.0; private val height = 16000.0
  // affine truth: lat = a + b·x + c·y, lon likewise
  private def latOf(x: Double, y: Double) = -18.0 + 2e-5 * x + 3e-5 * y
  private def lonOf(x: Double, y: Double) = 178.0 + 5e-5 * x - 1e-5 * y
  private val lats = Array.tabulate(rows * cols) { i =>
    val r = i / cols; val c = i % cols
    latOf(c * width / (cols - 1), r * height / (rows - 1))
  }
  private val lons = Array.tabulate(rows * cols) { i =>
    val r = i / cols; val c = i % cols
    lonOf(c * width / (cols - 1), r * height / (rows - 1))
  }

  test("bilinear is exact on affine fields; tie points reproduced") {
    val dense = DensifyGrid.densify(lats, lons, rows, cols, width, height, gridPts = 25)
    assert(dense.length == 25 * 25)
    dense.foreach { case (x, y, la, lo) =>
      assert(math.abs(la - latOf(x, y)) < 1e-9, s"lat at ($x,$y)")
      assert(math.abs(lo - lonOf(x, y)) < 1e-9, s"lon at ($x,$y)")
    }
    // corners == original tie points
    val corners = Seq(dense.head, dense.last)
    assert(math.abs(corners.head._3 - lats(0)) < 1e-12)
    assert(math.abs(corners.last._3 - lats(rows * cols - 1)) < 1e-12)
  }

  test("cubic is exact on a bicubic polynomial field where bilinear measurably diverges") {
    // truth: full bicubic polynomial — the reference's griddata(cubic)
    // fidelity class; not-a-knot splines reproduce it exactly, bilinear
    // cannot (it is exact only through degree 1 per axis)
    val R = 7; val C = 9
    def f(x: Double, y: Double) = {
      val u = x / width; val v = y / height
      2.0 + u + v - 3.0 * u * u + 2.0 * v * v + u * u * u - 0.5 * v * v * v +
        u * v + u * u * v * v * v
    }
    val field = Array.tabulate(R * C) { i =>
      f((i % C) * width / (C - 1), (i / C) * height / (R - 1))
    }
    var maxCub = 0.0; var maxLin = 0.0
    val gp = 33
    for (r <- 0 until gp; c <- 0 until gp) {
      val x = c * width / (gp - 1); val y = r * height / (gp - 1)
      maxCub = math.max(maxCub, math.abs(
        DensifyGrid.bicubic(field, R, C, width, height, x, y) - f(x, y)))
      maxLin = math.max(maxLin, math.abs(
        DensifyGrid.bilinear(field, R, C, width, height, x, y) - f(x, y)))
    }
    assert(maxCub < 1e-9, s"cubic must reproduce bicubic polynomials, err $maxCub")
    assert(maxLin > 1e-3, s"field must be one where bilinear diverges, err $maxLin")
  }

  test("cubic converges an order faster than bilinear on a smooth field") {
    // sinusoidal field (an incidence-angle-like swath profile): spline error
    // is O(h^4) vs bilinear's O(h^2) — at this lattice the gap is > 30x
    val R = 10; val C = 21
    def f(x: Double, y: Double) =
      30.0 + 15.0 * math.sin(x / width * 2.1) + 4.0 * math.cos(y / height * 1.7)
    val field = Array.tabulate(R * C) { i =>
      f((i % C) * width / (C - 1), (i / C) * height / (R - 1))
    }
    var maxCub = 0.0; var maxLin = 0.0
    val gp = 41
    for (r <- 0 until gp; c <- 0 until gp) {
      val x = c * width / (gp - 1); val y = r * height / (gp - 1)
      maxCub = math.max(maxCub, math.abs(
        DensifyGrid.bicubic(field, R, C, width, height, x, y) - f(x, y)))
      maxLin = math.max(maxLin, math.abs(
        DensifyGrid.bilinear(field, R, C, width, height, x, y) - f(x, y)))
    }
    assert(maxCub * 30 < maxLin, s"cubic $maxCub should beat bilinear $maxLin by >30x")
  }

  test("cubic reproduces tie points exactly and matches bilinear on affine fields") {
    val dense = DensifyGrid.densify(lats, lons, rows, cols, width, height,
      gridPts = 25, method = "cubic")
    dense.foreach { case (x, y, la, lo) =>
      assert(math.abs(la - latOf(x, y)) < 1e-9, s"cubic lat at ($x,$y)")
      assert(math.abs(lo - lonOf(x, y)) < 1e-9, s"cubic lon at ($x,$y)")
    }
    // knots hit exactly (interpolation, not approximation)
    for (r <- 0 until rows; c <- 0 until cols) {
      val x = c * width / (cols - 1); val y = r * height / (rows - 1)
      assert(math.abs(DensifyGrid.bicubic(lats, rows, cols, width, height, x, y)
        - lats(r * cols + c)) < 1e-9)
    }
  }

  test("batch bicubicGrid == point-wise bicubic; tiny lattices fall back sanely") {
    val R = 4; val C = 5
    val field = Array.tabulate(R * C)(i => math.sin(i * 0.7) * 3 + i % C)
    val xs = Array(0.0, width * 0.3, width * 0.77, width)
    val ys = Array(0.0, height * 0.41, height)
    val grid = DensifyGrid.bicubicGrid(field, R, C, width, height, xs, ys)
    for (i <- ys.indices; j <- xs.indices)
      assert(math.abs(grid(i * xs.length + j) -
        DensifyGrid.bicubic(field, R, C, width, height, xs(j), ys(i))) < 1e-12)
    // n=2 (linear) and n=3 (parabola) paths: exact on degree-1 / degree-2
    val m2 = DensifyGrid.notAKnotMoments(Array(1.0, 5.0), 1.0)
    assert(m2.forall(_ == 0.0))
    val par = Array(0.0, 1.0, 4.0) // y = x^2 at x = 0,1,2
    val m3 = DensifyGrid.notAKnotMoments(par, 1.0)
    assert(math.abs(DensifyGrid.splineEval(par, m3, 1.0, 0.5) - 0.25) < 1e-12)
    assert(math.abs(DensifyGrid.splineEval(par, m3, 1.0, 1.5) - 2.25) < 1e-12)
  }

  test("DataFrame generator cubic path: same plan shape, no shuffle") {
    val scenes = Seq(("d1", lats.toSeq, lons.toSeq, rows, cols, width, height))
      .toDF("doc_id", "lats", "lons", "rows", "cols", "width", "height")
    val out = DensifyGrid.densifyDocs(scenes, gridPts = 10, method = "cubic")
    assert(out.count() == 100)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val lat0 = out.where($"pixel" === 0.0 && $"line" === 0.0)
      .select("lat").as[Double].head()
    assert(math.abs(lat0 - lats(0)) < 1e-9)
  }

  test("DataFrame generator: per-scene explode, deterministic, no shuffle") {
    val scenes = Seq(
      ("d1", lats.toSeq, lons.toSeq, rows, cols, width, height),
      ("d2", lats.map(_ + 1.0).toSeq, lons.toSeq, rows, cols, width, height)
    ).toDF("doc_id", "lats", "lons", "rows", "cols", "width", "height")
    val out = DensifyGrid.densifyDocs(scenes, gridPts = 10)
    assert(out.count() == 2 * 100)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val d2lat = out.where($"doc_id" === "d2" && $"pixel" === 0.0 && $"line" === 0.0)
      .select("lat").as[Double].head()
    assert(math.abs(d2lat - (lats(0) + 1.0)) < 1e-9)
  }
}
