package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** rasterizeMask's rectangle fast-path (codegen'd BETWEEN) must agree
  * bit-for-bit with the general prepared-geometry PIP UDF path — including
  * on AOI boundary pixels, where both are inclusive. */
class RasterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def grid = (for { py <- 0 until 30; px <- 0 until 30 } yield (py, px))
    .toDF("py", "px")

  test("rect AOI: fast-path mask equals the UDF path, boundary inclusive") {
    val rect = graft.geom.Geo.rectWkt(4.5, 3.5, 12.5, 20.5)
    val fast = Raster.rasterizeMask(grid, rect, 0, 0, 1, 1)
      .select("py", "px", "in_aoi").collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    // reference truth: center (px+0.5, py+0.5) inside the closed box
    grid.collect().foreach { r =>
      val (py, px) = (r.getInt(0), r.getInt(1))
      val expect = px + 0.5 >= 4.5 && px + 0.5 <= 12.5 && py + 0.5 >= 3.5 && py + 0.5 <= 20.5
      assert(fast((py, px)) == expect, s"($py,$px)")
    }
    // boundary pixel: center exactly on the AOI edge must be IN
    assert(fast((3, 4)), "center (4.5, 3.5) sits on the rect corner - inclusive")
  }

  test("non-rect AOI (triangle) still routes through the PIP UDF and is correct") {
    val tri = "POLYGON ((0 0, 20 0, 0 20, 0 0))"
    val got = Raster.rasterizeMask(grid, tri, 0, 0, 1, 1)
      .where(col("in_aoi")).count()
    // centers (px+.5, py+.5) with x+y <= 20 and x,y >= 0 inside the triangle:
    val expect = (for { py <- 0 until 30; px <- 0 until 30
      if px + 0.5 + py + 0.5 <= 20 } yield 1).size
    assert(got == expect)
  }
}
