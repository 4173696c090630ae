package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Real tiled-GeoTIFF codec: round trips, COG layout rules, overview
  * resampling, corruption detection (SURVEY §2.1 S6/S8/S9). */
class GeoTiffSpec extends AnyFunSuite {

  private def randImage(rnd: scala.util.Random, w: Int, h: Int): Array[Int] =
    Array.fill(w * h)(rnd.nextInt(0x10000))

  test("property: lossless round trip over random dims / tile sizes / pixel data") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { i =>
      val w = 1 + rnd.nextInt(200)
      val h = 1 + rnd.nextInt(200)
      val tile = Seq(16, 32, 64, 512)(rnd.nextInt(4))
      val ovr = rnd.nextInt(6)
      val px = randImage(rnd, w, h)
      val bytes = GeoTiff.encode(w, h, px, nodata = 0, tileSize = tile,
        overviewLevels = ovr, zlevel = 6)
      val d = GeoTiff.decode(bytes)
      assert(d.main.width == w && d.main.height == h, s"case $i dims")
      assert(d.main.pixels.sameElements(px), s"case $i pixels (tile=$tile)")
      assert(d.overviews.length == ovr, s"case $i overview count")
      assert(d.nodata.contains(0))
      assert(GeoTiff.validateCog(bytes).isEmpty, s"case $i: ${GeoTiff.validateCog(bytes)}")
    }
  }

  test("multi-band: lossless round trip, per-band overviews, validator-clean, order kept") {
    val rnd = new scala.util.Random(11)
    // N spans the layout regimes: 2 (inline SHORT pair), 3 and 6 (external
    // BitsPerSample/SampleFormat arrays — the reference export writes one
    // band per data_var, typically 4-10)
    Seq(2, 3, 6).foreach { nb =>
      val (w, h) = (75, 53)
      val bands = (0 until nb).map(_ => randImage(rnd, w, h))
      val bytes = GeoTiff.encodeBands(w, h, bands, nodata = 7, tileSize = 32,
        overviewLevels = 2, zlevel = 6)
      val d = GeoTiff.decodeBands(bytes)
      assert(d.bands.length == nb, s"nb=$nb band count")
      d.bands.zip(bands).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got.width == w && got.height == h)
        assert(got.pixels.sameElements(want), s"nb=$nb band $i pixels")
      }
      assert(d.nodata.contains(7))
      assert(d.overviews.length == 2 && d.overviews.forall(_.length == nb))
      // each band's overview equals its own single-band decimation
      d.overviews.zipWithIndex.foreach { case (ovr, k) =>
        ovr.zip(bands).foreach { case (o, px) =>
          val solo = GeoTiff.decimateAverage(GeoTiff.Image(w, h, px), 1 << (k + 1))
          assert(o.pixels.sameElements(solo.pixels), s"nb=$nb ovr $k")
        }
      }
      assert(GeoTiff.validateCog(bytes).isEmpty, s"nb=$nb: ${GeoTiff.validateCog(bytes)}")
      // single-band decode of a multi-band file refuses loudly
      intercept[IllegalArgumentException](GeoTiff.decode(bytes))
    }
    // single-band through encodeBands == encode byte-for-byte (N=1 identity)
    val px1 = randImage(rnd, 40, 30)
    assert(GeoTiff.encodeBands(40, 30, Seq(px1), tileSize = 16, overviewLevels = 1)
      .sameElements(GeoTiff.encode(40, 30, px1, tileSize = 16, overviewLevels = 1)))
  }

  test("overviews: dims halve per level; pixels equal an independent box-average") {
    val rnd = new scala.util.Random(7)
    val (w, h) = (101, 67)
    val px = randImage(rnd, w, h)
    val d = GeoTiff.decode(GeoTiff.encode(w, h, px, tileSize = 32, overviewLevels = 3))
    d.overviews.zipWithIndex.foreach { case (o, i) =>
      val f = 1 << (i + 1)
      assert(o.width == (w + f - 1) / f && o.height == (h + f - 1) / f)
      // independent scalar twin of GDAL average decimation
      for (y <- 0 until o.height; x <- 0 until o.width) {
        val vals = for {
          sy <- y * f until math.min((y + 1) * f, h)
          sx <- x * f until math.min((x + 1) * f, w)
        } yield px(sy * w + sx).toLong
        val expect = ((vals.sum + vals.length / 2) / vals.length).toInt
        assert(o.pixels(y * o.width + x) == expect, s"ovr $i at ($x,$y)")
      }
    }
  }

  test("the reference COG profile: 512-tiled, 5 overviews, validator-clean") {
    val rnd = new scala.util.Random(3)
    val (w, h) = (600, 520) // >512 → tiling + overviews REQUIRED by validator
    val px = randImage(rnd, w, h)
    val bytes = GeoTiff.encode(w, h, px, nodata = 0) // defaults = the profile
    val d = GeoTiff.decode(bytes)
    assert(d.main.pixels.sameElements(px))
    assert(d.overviews.length == 5)
    assert(d.overviews.head.width == 300 && d.overviews.head.height == 260)
    assert(GeoTiff.validateCog(bytes).isEmpty)
    // main image spans 2x2 tiles of 512
    assert(GeoTiff.validate(bytes) == (true, "ok"))
  }

  test("validator enforces COG rules: missing overviews on a >=512px image flagged") {
    val rnd = new scala.util.Random(9)
    val px = randImage(rnd, 600, 40)
    val bytes = GeoTiff.encode(600, 40, px, overviewLevels = 0)
    val errs = GeoTiff.validateCog(bytes)
    assert(errs.exists(_.contains("no overviews")), s"got $errs")
  }

  test("corruption fails loudly: truncated header, severed tail, flipped magic") {
    val rnd = new scala.util.Random(11)
    val bytes = GeoTiff.encode(60, 44, randImage(rnd, 60, 44), tileSize = 32,
      overviewLevels = 2)
    assert(GeoTiff.validate(bytes.take(4)) == (false, "truncated_header"))
    // severing the tail cuts the MAIN tiles (last in COG order): the tile
    // range check must catch it
    val cut = bytes.dropRight(10)
    assert(GeoTiff.validate(cut) == (false, "body_length_mismatch"))
    intercept[IllegalArgumentException](GeoTiff.decode(cut))
    val flipped = bytes.clone(); flipped(2) = 99
    assert(GeoTiff.validate(flipped)._2 == "truncated_header")
    intercept[IllegalArgumentException](GeoTiff.decode(flipped))
    // corrupting a deflate stream inside a tile: decode must not spin/succeed
    val mangle = bytes.clone()
    mangle(mangle.length - 20) = (mangle(mangle.length - 20) ^ 0x5A).toByte
    val r = try { GeoTiff.decode(mangle); "decoded" } catch {
      case _: IllegalArgumentException => "rejected"
      case _: java.util.zip.ZipException => "rejected"
    }
    // a flipped byte may still inflate (deflate has no checksum mid-stream);
    // but it must never hang — and round-trip equality would catch it upstream
    assert(r == "rejected" || r == "decoded")
  }

  test("nodata round-trips and pads edge tiles (declared in GDAL_NODATA tag)") {
    val px = Array.tabulate(10 * 10)(i => if (i % 7 == 0) 0 else 100 + i)
    val d = GeoTiff.decode(GeoTiff.encode(10, 10, px, nodata = 0, tileSize = 16))
    assert(d.nodata.contains(0))
    assert(d.main.pixels.sameElements(px))
    val d2 = GeoTiff.decode(GeoTiff.encode(10, 10, px, nodata = 999, tileSize = 16))
    assert(d2.nodata.contains(999))
    // >4 ASCII bytes: GDAL_NODATA stored in the external value area
    val big = GeoTiff.encode(10, 10, px, nodata = 65535, tileSize = 16, overviewLevels = 1)
    val d3 = GeoTiff.decode(big)
    assert(d3.nodata.contains(65535) && d3.main.pixels.sameElements(px))
    assert(GeoTiff.validateCog(big).isEmpty)
  }
}
