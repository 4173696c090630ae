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
