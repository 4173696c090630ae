package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/**
 * Per-pixel temporal composites (SURVEY §2.4 A7–A11) — Spark-first forms of
 * `utils/dc_mosaic.py`:
 *  - mean (`:121-165`): `avg(when(valid, v))` — partial+final hash agg
 *  - median (`:168-212`): exact `percentile` (parity); `percentile_approx`
 *    is the documented 100 TB alternative
 *  - most-recent-valid (`:55-119`): `max_by`-style lexicographic struct max —
 *    no window shuffle, single agg
 *  - max-NDVI (`:215-345`): argmax via struct max carrying all bands
 *  - OR-fold of masks through time (`dc_clean_mask.py:44-64`): `bool_or`
 *
 * All are algebraic aggregates: map-side partial combine keeps shuffle
 * volume at |pixels| regardless of time depth.
 */
object Composites {

  def valid(v: Column, nodata: Int = -9999): Column = v =!= nodata

  def meanComposite(px: DataFrame, keys: Seq[String], v: String): DataFrame =
    px.groupBy(keys.map(col): _*)
      .agg(avg(when(valid(col(v)), col(v))).as("mean_v"))

  def medianComposite(px: DataFrame, keys: Seq[String], v: String): DataFrame =
    px.groupBy(keys.map(col): _*)
      .agg(percentile(when(valid(col(v)), col(v)), lit(0.5)).as("median_v"))

  /** Most-recent valid observation of all carried columns; deterministic via
    * full lexicographic tie-break (ts, then carried cols). */
  def mostRecentValid(px: DataFrame, keys: Seq[String], ts: String,
                      carried: Seq[String], v: String): DataFrame = {
    val packed = struct((col(ts) +: carried.map(col)): _*)
    val agged = px.where(valid(col(v)))
      .groupBy(keys.map(col): _*)
      .agg(max(packed).as("__top"))
    carried.foldLeft(agged)((df, c) => df.withColumn(c, col(s"__top.$c"))).drop("__top")
  }

  /** NDVI = (nir − red) / (nir + red) (`utils/prepS2.py:299-323`,
    * `dc_mosaic.py:266`). */
  def ndvi: Column = (col("nir") - col("red")).cast("double") / (col("nir") + col("red"))
  val ndviSql: String = "(cast(nir - red AS double) / (nir + red))"

  /** Argmax-of-NDVI composite carrying all bands; ties broken by the carried
    * key columns (lexicographic struct max ≡ ORDER BY ... DESC LIMIT 1). */
  def maxNdviComposite(px: DataFrame, keys: Seq[String], tieBreak: Seq[String],
                       bands: Seq[String]): DataFrame = {
    val packed = struct((ndvi.as("__ndvi") +: tieBreak.map(col)) ++ bands.map(col): _*)
    val agged = px.groupBy(keys.map(col): _*).agg(max(packed).as("__top"))
    bands.foldLeft(agged)((df, b) => df.withColumn(b, col(s"__top.$b")))
      .withColumn("best_ndvi", col("__top.__ndvi")).drop("__top")
  }

  /** Argmin-of-NDVI composite (`dc_mosaic.py:215-345` min_ndvi kwarg). */
  def minNdviComposite(px: DataFrame, keys: Seq[String], tieBreak: Seq[String],
                       bands: Seq[String]): DataFrame = {
    val packed = struct((ndvi.as("__ndvi") +: tieBreak.map(col)) ++ bands.map(col): _*)
    val agged = px.groupBy(keys.map(col): _*).agg(min(packed).as("__top"))
    bands.foldLeft(agged)((df, b) => df.withColumn(b, col(s"__top.$b")))
      .withColumn("best_ndvi", col("__top.__ndvi")).drop("__top")
  }

  /** OR-fold of boolean masks through time (A12). */
  def anyThroughTime(px: DataFrame, keys: Seq[String], mask: Column): DataFrame =
    px.groupBy(keys.map(col): _*).agg(max(mask.cast("int")).cast("boolean").as("any_mask"))
}

/**
 * WOfS per-pixel time-series summary (SURVEY §2.4 A6) — the algebraic form
 * of `perform_timeseries_analysis` (`utils/dc_utilities.py:126-174`):
 * total_data=Σv, total_clean=count, normalized=Σ/count, min, max. The
 * reference's `intermediate_product` incremental merge IS Spark's
 * partial/final aggregation contract; SummarySpec checks merge associativity
 * (two halves merged == one pass).
 */
case class WofsObs(v: Double)
case class WofsStatsBuf(var sum: Double, var cnt: Long, var mn: Double, var mx: Double)
case class WofsSummary(total_data: Double, total_clean: Long,
                       normalized: Double, min: Double, max: Double)

object WofsStatsAgg extends Aggregator[Double, WofsStatsBuf, WofsSummary] {
  def zero: WofsStatsBuf = WofsStatsBuf(0.0, 0L, Double.PositiveInfinity, Double.NegativeInfinity)
  def reduce(b: WofsStatsBuf, v: Double): WofsStatsBuf = {
    if (v != -9999.0) {
      b.sum += v; b.cnt += 1
      if (v < b.mn) b.mn = v
      if (v > b.mx) b.mx = v
    }
    b
  }
  def merge(a: WofsStatsBuf, b: WofsStatsBuf): WofsStatsBuf = {
    a.sum += b.sum; a.cnt += b.cnt
    if (b.mn < a.mn) a.mn = b.mn
    if (b.mx > a.mx) a.mx = b.mx
    a
  }
  def finish(b: WofsStatsBuf): WofsSummary =
    WofsSummary(b.sum, b.cnt, if (b.cnt == 0) 0.0 else b.sum / b.cnt,
      if (b.cnt == 0) 0.0 else b.mn, if (b.cnt == 0) 0.0 else b.mx)
  def bufferEncoder: Encoder[WofsStatsBuf] = Encoders.product[WofsStatsBuf]
  def outputEncoder: Encoder[WofsSummary] = Encoders.product[WofsSummary]
}

/**
 * Geometric median (geomedian) composite — multi-band joint median per pixel
 * via Weiszfeld iteration (`utils/dc_mosaic.py:506-584`, hdstats
 * `nangeomedian`). Custom typed Aggregator: buffers the per-pixel band
 * vectors (bounded by time-series depth), runs Weiszfeld at finish.
 */
object GeomedianAgg extends Aggregator[Seq[Double], Seq[Seq[Double]], Seq[Double]] {
  def zero: Seq[Seq[Double]] = Vector.empty
  def reduce(b: Seq[Seq[Double]], v: Seq[Double]): Seq[Seq[Double]] =
    if (v == null || v.exists(_ == -9999.0)) b else b :+ v.toVector
  def merge(a: Seq[Seq[Double]], b: Seq[Seq[Double]]): Seq[Seq[Double]] = a ++ b
  def finish(pts: Seq[Seq[Double]]): Seq[Double] = weiszfeld(pts)
  def bufferEncoder: Encoder[Seq[Seq[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Double]]]()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Deterministic Weiszfeld with the Vardi–Zhang (2000) correction for
    * iterates landing on a data point. Points are sorted first so the result
    * is independent of partition merge order. */
  def weiszfeld(pts0: Seq[Seq[Double]], maxIter: Int = 200, tol: Double = 1e-9): Seq[Double] = {
    if (pts0.isEmpty) return Seq.empty
    val pts = pts0.sortBy(_.mkString(",")).map(_.toArray)
    val d = pts.head.length
    var cur = Array.tabulate(d)(i => pts.map(_(i)).sum / pts.length)
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      val num = new Array[Double](d)
      var den = 0.0
      var eta = 0 // multiplicity of data points coincident with cur
      pts.foreach { p =>
        var dist2 = 0.0
        var i = 0
        while (i < d) { val dx = p(i) - cur(i); dist2 += dx * dx; i += 1 }
        val dist = math.sqrt(dist2)
        if (dist < 1e-12) eta += 1
        else {
          val w = 1.0 / dist
          i = 0
          while (i < d) { num(i) += p(i) * w; i += 1 }
          den += w
        }
      }
      if (den == 0.0) moved = 0.0 // all points coincide with cur
      else {
        val tMap = num.map(_ / den) // plain Weiszfeld step over non-coincident points
        val next =
          if (eta == 0) tMap
          else {
            // r̃ = Σ_{p≠cur} (p−cur)/‖p−cur‖ ; ‖r̃‖ ≤ η ⇒ cur IS the geomedian
            val rt = Array.tabulate(d)(i => num(i) - den * cur(i))
            val rNorm = math.sqrt(rt.map(x => x * x).sum)
            if (rNorm <= eta) cur
            else {
              val a = 1.0 - eta / rNorm
              Array.tabulate(d)(i => a * tMap(i) + (eta / rNorm) * cur(i))
            }
          }
        moved = math.sqrt(next.zip(cur).map { case (a, b) => (a - b) * (a - b) }.sum)
        cur = next
      }
      it += 1
    }
    cur.toSeq
  }
}
