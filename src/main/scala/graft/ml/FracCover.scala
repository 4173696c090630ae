package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fractional-cover unmixing (SURVEY §2.9): per-pixel NNLS of an expanded
 * 64-feature reflectance vector against a 64×3 endmember matrix, yielding
 * (pv, npv, bs) percent covers — photosynthetic / non-photosynthetic
 * vegetation and bare soil.
 *
 * Semantics transcribed from `utils/dc_fractional_coverage_classifier.py:23-137`
 * (Guerschman et al. 2015):
 *  - reflectance scaling ×0.0001 on the 6 bands (blue green red nir swir1 swir2)
 *  - feature expansion to 63: b(6) ‖ log b(6) ‖ b·log b(6) ‖ bᵢ·bⱼ i<j (15)
 *    ‖ log bᵢ·log bⱼ i<j (15) ‖ (bⱼ−bᵢ)/(bⱼ+bᵢ) i<j (15); NaN→0; append 1 → 64
 *  - x = nnls(E, f) clipped to [0, 2.54], ×100, int — per-pixel
 *  - the endmember matrix carries a sum-to-one row weighted 0.02
 *  - unclean pixels → −9999
 *
 * The expansion + solve runs inside ONE deterministic UDF per pixel row
 * (a black-box numeric kernel, the documented exception to expression-only
 * operators) — no shuffle, trivially data-parallel at any scale.
 */
object FracCover {

  val SumToOneWeight = 0.02
  val Nodata: Int = -9999

  /** 63-feature expansion + bias 1, from the 6 scaled reflectances. */
  def expand(b: Array[Double]): Array[Double] = {
    val f = new Array[Double](64)
    val lg = b.map(math.log)
    var k = 0
    (0 until 6).foreach { i => f(k) = b(i); k += 1 }
    (0 until 6).foreach { i => f(k) = lg(i); k += 1 }
    (0 until 6).foreach { i => f(k) = b(i) * lg(i); k += 1 }
    for (i <- 0 until 6; j <- i + 1 until 6) { f(k) = b(i) * b(j); k += 1 }
    for (i <- 0 until 6; j <- i + 1 until 6) { f(k) = lg(i) * lg(j); k += 1 }
    for (i <- 0 until 6; j <- i + 1 until 6) { f(k) = (b(j) - b(i)) / (b(j) + b(i)); k += 1 }
    var t = 0
    while (t < 63) { if (f(t).isNaN || f(t).isInfinite) f(t) = 0.0; t += 1 }
    f(63) = 1.0
    f
  }

  /** Deterministic synthetic endmember matrix (64×3, seeded) standing in for
    * the reference's CSV data file (`endmembers_landsat.csv` is data, not
    * semantics). Rows ~ the expanded-feature signature of each cover class;
    * last row is the sum-to-one constraint ×0.02. */
  def syntheticEndmembers(seed: Long = 11L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    // three plausible reflectance signatures, expanded with the same map
    val sigs = Array(
      Array(0.03, 0.05, 0.04, 0.45, 0.20, 0.10), // pv: high nir
      Array(0.08, 0.10, 0.12, 0.25, 0.30, 0.25), // npv: flat, swir-heavy
      Array(0.12, 0.16, 0.20, 0.28, 0.38, 0.35)  // bs: bright soil ramp
    ).map(expand)
    val e = Array.ofDim[Double](64, 3)
    for (r <- 0 until 63; c <- 0 until 3)
      e(r)(c) = sigs(c)(r) * (1.0 + 0.01 * rnd.nextGaussian())
    for (c <- 0 until 3) e(63)(c) = SumToOneWeight
    e
  }

  /** Per-pixel solve: scaled bands → expanded features → NNLS → clip ×100.
    * The constraint row is ASYMMETRIC by the reference's literal arithmetic
    * (`dc_fractional_coverage_classifier.py:96-111`): the feature vector's
    * last slot is a plain 1.0 (`ones` appended to band_stack) while the
    * endmember matrix's last row is 0.02 (`SumToOneWeight`), i.e. the NNLS
    * target for that row is 1.0 against 0.02-weighted coefficients, pushing
    * sum(x) toward 1/0.02 = 50 before the [0, 2.54] clip. */
  def solvePixel(e: Array[Array[Double]],
                 blue: Double, green: Double, red: Double,
                 nir: Double, swir1: Double, swir2: Double): Array[Int] = {
    val f = expand(Array(blue, green, red, nir, swir1, swir2).map(_ * 0.0001))
    val x = Nnls.solve(e, f)
    x.map(v => (math.max(0.0, math.min(2.54, v)) * 100).toInt)
  }

  /**
   * DataFrame operator: adds int columns (pv, npv, bs); rows failing `clean`
   * get −9999 (reference `:114-118`). Bands must be raw uint16-scale values.
   */
  def classify(px: DataFrame, clean: Column,
               endmembers: Array[Array[Double]] = syntheticEndmembers()): DataFrame = {
    val e = endmembers
    val solver = udf { (bl: Double, g: Double, r: Double, n: Double, s1: Double, s2: Double) =>
      val v = solvePixel(e, bl, g, r, n, s1, s2)
      (v(0), v(1), v(2))
    }
    px.withColumn("__fc",
        when(clean, solver(col("blue").cast("double"), col("green").cast("double"),
          col("red").cast("double"), col("nir").cast("double"),
          col("swir1").cast("double"), col("swir2").cast("double"))))
      .withColumn("pv", coalesce(col("__fc._1"), lit(Nodata)))
      .withColumn("npv", coalesce(col("__fc._2"), lit(Nodata)))
      .withColumn("bs", coalesce(col("__fc._3"), lit(Nodata)))
      .drop("__fc")
  }
}
