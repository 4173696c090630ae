package graft.cells

/**
 * Pure-Scala hierarchical spatial cell index (H3/S2-style, quadkey flavor).
 *
 * The world rectangle lon ∈ [-180, 180], lat ∈ [-90, 90] is divided at
 * resolution `res` into a 2^res × 2^res grid. A cell id is a single Long:
 *
 * {{{
 *   [ 5 bits res ][ 58 bits: Morton(ix, iy) interleave, 2*res bits used ]
 * }}}
 *
 * Morton (Z-order) packing keeps parent/child ids prefix-related, which gives
 * locality when Parquet files are sorted by cell id — range scans of a parent
 * cell touch a contiguous id range (manifest min/max pruning in IcebergLite
 * exploits this).
 *
 * This replaces the reference's O(N*M) shapely loops
 * (`master_Search_Discover_example.ipynb` code cells 10/63/157 — the
 * "takes too long" spatial join) with an equi-joinable key. No external H3/S2
 * jar exists in this environment, so the index is built from scratch.
 *
 * Antimeridian (AM) safety: `coverBBox` accepts boxes where minLon > maxLon
 * (a box crossing ±180, the Fiji case — reference
 * `utils/s1am/raw2ard.py:76-85`) and splits them into east+west covers.
 */
object CellIndex {
  val MaxRes = 26

  /** Number of cells along one axis at `res`. */
  def width(res: Int): Long = 1L << res

  // --- Morton interleave ------------------------------------------------
  /** Spread the low 32 bits of v so bit i lands at bit 2i. */
  private[cells] def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private[cells] def unspread(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  def encode(ix: Long, iy: Long, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res $res out of [0,$MaxRes]")
    (res.toLong << 58) | spread(ix) | (spread(iy) << 1)
  }

  def res(cell: Long): Int = ((cell >>> 58) & 0x1FL).toInt
  def ix(cell: Long): Long = unspread(cell & 0x5555555555555555L & ((1L << 58) - 1))
  def iy(cell: Long): Long = unspread((cell >> 1) & 0x5555555555555555L & ((1L << 58) - 1))

  // --- lat/lon → grid ----------------------------------------------------
  private def clampIdx(i: Long, res: Int): Long = {
    val n = width(res)
    if (i < 0) 0L else if (i >= n) n - 1 else i
  }

  def lonToIx(lon: Double, res: Int): Long =
    clampIdx(math.floor((lon + 180.0) / 360.0 * width(res)).toLong, res)

  def latToIy(lat: Double, res: Int): Long =
    clampIdx(math.floor((lat + 90.0) / 180.0 * width(res)).toLong, res)

  /** Cell containing a point. lon=180 / lat=90 clamp into the last cell. */
  def cell(lon: Double, lat: Double, res: Int): Long =
    encode(lonToIx(lon, res), latToIy(lat, res), res)

  /** Cell bounds: (minLon, minLat, maxLon, maxLat). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val r = res(cell)
    val n = width(r).toDouble
    val x = ix(cell); val y = iy(cell)
    (-180.0 + 360.0 * x / n, -90.0 + 180.0 * y / n,
     -180.0 + 360.0 * (x + 1) / n, -90.0 + 180.0 * (y + 1) / n)
  }

  def parent(cell: Long): Long = {
    val r = res(cell)
    require(r > 0, "res-0 cell has no parent")
    encode(ix(cell) >> 1, iy(cell) >> 1, r - 1)
  }

  def children(cell: Long): Array[Long] = {
    val r = res(cell)
    require(r < MaxRes, s"res $r cell has no children")
    val x = ix(cell) << 1; val y = iy(cell) << 1
    Array(encode(x, y, r + 1), encode(x + 1, y, r + 1),
          encode(x, y + 1, r + 1), encode(x + 1, y + 1, r + 1))
  }

  /**
   * All cells within Chebyshev ring distance k. Longitude wraps across the
   * antimeridian; latitude clamps at the poles. Distinct, sorted.
   */
  def kRing(cell: Long, k: Int): Array[Long] = {
    val r = res(cell)
    val n = width(r)
    val cx = ix(cell); val cy = iy(cell)
    val out = scala.collection.mutable.SortedSet.empty[Long]
    var dy = -k
    while (dy <= k) {
      val y = cy + dy
      if (y >= 0 && y < n) {
        var dx = -k
        while (dx <= k) {
          val x = ((cx + dx) % n + n) % n // lon wrap
          out += encode(x, y, r)
          dx += 1
        }
      }
      dy += 1
    }
    out.toArray
  }

  /**
   * Cells covering the closed box [minLon,maxLon] × [minLat,maxLat].
   * If minLon > maxLon the box crosses the antimeridian and is split into
   * [minLon,180] ∪ [-180,maxLon] (AM-safe cover — SURVEY §7.4).
   * Result is distinct + sorted (deterministic).
   */
  def coverBBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
                res: Int): Array[Long] = {
    if (minLon > maxLon) {
      val e = coverBBox(minLon, minLat, 180.0, maxLat, res)
      val w = coverBBox(-180.0, minLat, maxLon, maxLat, res)
      val merged = new Array[Long](e.length + w.length)
      System.arraycopy(w, 0, merged, 0, w.length)
      System.arraycopy(e, 0, merged, w.length, e.length)
      merged.distinct.sorted
    } else {
      val x0 = lonToIx(minLon, res); val x1 = lonToIx(maxLon, res)
      val y0 = latToIy(minLat, res); val y1 = latToIy(maxLat, res)
      val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
      var i = 0
      var y = y0
      while (y <= y1) {
        var x = x0
        while (x <= x1) { out(i) = encode(x, y, res); i += 1; x += 1 }
        y += 1
      }
      java.util.Arrays.sort(out)
      out
    }
  }
}
