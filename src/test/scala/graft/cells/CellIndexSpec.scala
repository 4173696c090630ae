package graft.cells

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Geo

/** Property-style tests with a fixed seed (no scalatest-scalacheck bridge in
  * the offline cache, so properties run as seeded loops — deterministic). */
class CellIndexSpec extends AnyFunSuite {
  import CellIndex._

  private def cases(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }
  private def lon(r: scala.util.Random) = r.nextDouble() * 360 - 180
  private def lat(r: scala.util.Random) = r.nextDouble() * 180 - 90

  test("encode/decode roundtrip") {
    cases(500) { rnd =>
      val r = rnd.nextInt(13)
      val n = width(r)
      val x = math.abs(rnd.nextLong()) % n; val y = math.abs(rnd.nextLong()) % n
      val c = encode(x, y, r)
      assert(res(c) == r && ix(c) == x && iy(c) == y)
    }
  }

  test("parent contains child; children partition parent") {
    cases(500) { rnd =>
      val r = 1 + rnd.nextInt(12)
      val c = cell(lon(rnd), lat(rnd), r)
      val p = parent(c)
      assert(children(p).contains(c))
      assert(children(p).map(parent).forall(_ == p))
    }
  }

  test("point cell is inside cell bounds") {
    cases(500) { rnd =>
      val r = rnd.nextInt(13)
      val lo = lon(rnd); val la = lat(rnd)
      val c = cell(lo, la, r)
      val (x0, y0, x1, y1) = bounds(c)
      assert(lo >= x0 - 1e-9 && lo <= x1 + 1e-9)
      assert(la >= y0 - 1e-9 && la <= y1 + 1e-9)
    }
  }

  test("coverBBox contains cell of every interior sample point (SURVEY §5.2a)") {
    cases(300) { rnd =>
      val r = 2 + rnd.nextInt(9)
      val x0 = lon(rnd); val y0 = lat(rnd)
      val w = 0.1 + rnd.nextDouble() * 20; val h = 0.1 + rnd.nextDouble() * 20
      val x1 = math.min(x0 + w, 180.0); val y1 = math.min(y0 + h, 90.0)
      val cover = coverBBox(x0, y0, x1, y1, r).toSet
      for (fx <- Seq(0.0, 0.3, 0.7, 1.0); fy <- Seq(0.0, 0.5, 1.0)) {
        val px = x0 + fx * (x1 - x0); val py = y0 + fy * (y1 - y0)
        assert(cover.contains(cell(px, py, r)), s"cell of ($px,$py) res=$r not in cover")
      }
    }
  }

  test("AM-wrapped bbox covers both sides of ±180 (SURVEY §5.2d)") {
    val cover = coverBBox(178.0, -19.0, -178.0, -15.0, 5)
    val east = cover.filter(c => bounds(c)._1 >= 168.75)
    val west = cover.filter(c => bounds(c)._3 <= -168.75)
    assert(east.nonEmpty && west.nonEmpty)
    assert(cover.toSet == (east ++ west).toSet)
  }

  test("kRing wraps longitude and clamps latitude") {
    val r = 4; val n = width(r)
    val atSeam = encode(0, 5, r)
    val ring = kRing(atSeam, 1)
    assert(ring.length == 9)
    assert(ring.contains(encode(n - 1, 5, r))) // wrapped west neighbor
    val atPole = encode(3, n - 1, r)
    assert(kRing(atPole, 1).length == 6) // clamped at pole
  }

  test("cellCover of AM-split geometry matches wrapped bbox cover") {
    // unwrapped footprint 178..182 == wrapped bbox 178..-178
    val g = Geo.fromWkt(Geo.rectWkt(178.0, -19.0, 182.0, -15.0))
    val viaGeom = Geo.cellCover(g, 5).toSet
    val viaBBox = coverBBox(178.0, -19.0, -178.0, -15.0, 5).toSet
    assert(viaGeom == viaBBox)
  }

  test("Morton ids of a parent's children form a contiguous range (locality)") {
    cases(300) { rnd =>
      val r = 1 + rnd.nextInt(12)
      val p = cell(lon(rnd), lat(rnd), r - 1)
      val ch = children(p).sorted
      assert(ch.last - ch.head == 3)
    }
  }

  test("uuid5 matches python uuid.uuid5(NAMESPACE_URL, ...) golden values") {
    // golden: python uuid.uuid5(uuid.NAMESPACE_URL, name) — the reference's
    // product-id scheme (utils/prepS2.py:368)
    assert(graft.functions.Uuid5.of("S2A_MSIL2A_20190124T221941_T60KYF") ==
      "4ae5d06a-a751-5896-b99c-1f76d25bfa50")
    assert(graft.functions.Uuid5.of("hello") == "074171de-bc84-5ea4-b636-1135477620e1")
  }
}
