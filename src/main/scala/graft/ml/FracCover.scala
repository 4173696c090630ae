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

  // ---------------- DuckDB oracle rendering ----------------
  //
  // NNLS with n = 3 unknowns and a CONSTANT Gram matrix has only 2³ = 8
  // possible active sets, and the strictly-convex optimum is unique — so the
  // whole solve is expressible in SQL: compute the 64-feature expansion, the
  // 3 endmember dot products, the closed-form LS solution of every candidate
  // support (elimination constants precomputed HERE with the same arithmetic
  // as Nnls.solvePassive), and pick the support whose solution is feasible
  // (x > 0 on-support) and optimal (gradient ≤ tol off-support).

  /** SQL for the 63+1 feature expansion, same order as [[expand]]; `b` are
    * SQL column names of the 6 scaled reflectances (all > 0 here, so the
    * NaN→0 guard in [[expand]] never fires and is omitted). */
  private def featureSqls(b: IndexedSeq[String]): IndexedSeq[String] = {
    val lg = b.map(x => s"ln($x)")
    val fs = IndexedSeq.newBuilder[String]
    fs ++= b
    fs ++= lg
    fs ++= b.zip(lg).map { case (x, l) => s"($x * $l)" }
    for (i <- 0 until 6; j <- i + 1 until 6) fs += s"(${b(i)} * ${b(j)})"
    for (i <- 0 until 6; j <- i + 1 until 6) fs += s"(${lg(i)} * ${lg(j)})"
    for (i <- 0 until 6; j <- i + 1 until 6) fs += s"((${b(j)} - ${b(i)}) / (${b(j)} + ${b(i)}))"
    fs += "1.0"
    fs.result()
  }

  /** Symbolic twin of Nnls.solvePassive's Gaussian elimination: the matrix
    * side is numeric (constants, identical op order ⇒ identical doubles),
    * the rhs side is emitted as SQL over the t-columns. */
  private def solveSql(g0: Array[Array[Double]], t: Array[String]): Array[String] = {
    val k = g0.length
    val a = g0.map(_.clone())
    val rhs = t.clone()
    var col = 0
    while (col < k) {
      var piv = col
      for (r <- col + 1 until k) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tm = a(col); a(col) = a(piv); a(piv) = tm
      val tr = rhs(col); rhs(col) = rhs(piv); rhs(piv) = tr
      val d = a(col)(col)
      if (math.abs(d) > 1e-14) {
        for (r <- col + 1 until k) {
          val f = a(r)(col) / d
          for (c <- col until k) a(r)(c) -= f * a(col)(c)
          rhs(r) = s"(${rhs(r)} - ($f) * ${rhs(col)})"
        }
      }
      col += 1
    }
    val z = new Array[String](k)
    for (r <- k - 1 to 0 by -1) {
      var s = rhs(r)
      for (c <- r + 1 until k) s = s"($s - (${a(r)(c)}) * ${z(c)})"
      z(r) = if (math.abs(a(r)(r)) > 1e-14) s"($s / (${a(r)(r)}))" else "0.0"
    }
    z
  }

  /** DuckDB twin of [[classify]] over a pixels CTE: emits
    * (l_orderkey, l_linenumber, pv, npv, bs). `cleanSql` is the boolean SQL
    * form of the clean mask. */
  def oracleSql(pixelsSql: String, cleanSql: String): String = {
    val e = syntheticEndmembers()
    val n = 3
    // Gram matrix with the same summation order as Nnls.solvePassive
    val g = Array.tabulate(n, n) { (p, q) =>
      var s = 0.0; var i = 0
      while (i < 64) { s += e(i)(p) * e(i)(q); i += 1 }
      s
    }
    val feats = featureSqls((1 to 6).map(i => s"b$i"))
    val featCols = feats.zipWithIndex.map { case (f, i) => s"$f AS f${i + 1}" }.mkString(",\n       ")
    val tCols = (0 until n).map { c =>
      (0 until 64).map(j => s"(${e(j)(c)}) * f${j + 1}").mkString(" + ") + s" AS t$c"
    }.mkString(",\n       ")

    val subsets: Seq[Seq[Int]] = Seq(Seq(), Seq(0), Seq(1), Seq(2),
      Seq(0, 1), Seq(0, 2), Seq(1, 2), Seq(0, 1, 2))
    // per-subset solution columns xs{s}_{i}
    val xCols = subsets.zipWithIndex.flatMap { case (ss, si) =>
      if (ss.isEmpty) Nil
      else {
        val gS = Array.tabulate(ss.size, ss.size)((p, q) => g(ss(p))(ss(q)))
        val sol = solveSql(gS, ss.map(i => s"t$i").toArray)
        ss.zip(sol).map { case (i, x) => s"$x AS xs${si}_$i" }
      }
    }.mkString(",\n       ")
    val tol = "1e-10"
    def xOf(si: Int, ss: Seq[Int], i: Int): String =
      if (ss.contains(i)) s"xs${si}_$i" else "0.0"
    // validity: on-support strictly positive, off-support gradient t_j - (G x)_j <= tol
    val vCols = subsets.zipWithIndex.map { case (ss, si) =>
      val pos = ss.map(i => s"xs${si}_$i > 0.0")
      val grad = (0 until n).filterNot(ss.contains).map { j =>
        val gx = if (ss.isEmpty) "0.0"
          else ss.map(i => s"(${g(j)(i)}) * xs${si}_$i").mkString(" + ")
        s"(t$j - ($gx)) <= $tol"
      }
      s"(${(pos ++ grad).mkString(" AND ")}) AS v$si"
    }.mkString(",\n       ")
    def pick(i: Int): String = {
      val cases = subsets.zipWithIndex.dropRight(1).map { case (ss, si) =>
        s"WHEN v$si THEN ${xOf(si, ss, i)}"
      }.mkString(" ")
      s"CASE $cases ELSE ${xOf(subsets.size - 1, subsets.last, i)} END"
    }
    def out(name: String, i: Int): String =
      s"""CASE WHEN NOT clean THEN -9999
         |  ELSE cast(floor(least(greatest(${pick(i)}, 0.0), 2.54) * 100) AS int) END AS $name"""
        .stripMargin
    s"""WITH px AS ($pixelsSql),
       |sb AS (SELECT l_orderkey, l_linenumber, $cleanSql AS clean,
       |       cast(blue AS double) * 0.0001 AS b1, cast(green AS double) * 0.0001 AS b2,
       |       cast(red AS double) * 0.0001 AS b3, cast(nir AS double) * 0.0001 AS b4,
       |       cast(swir1 AS double) * 0.0001 AS b5, cast(swir2 AS double) * 0.0001 AS b6
       |       FROM px),
       |feats AS (SELECT l_orderkey, l_linenumber, clean,
       |       $featCols
       |       FROM sb),
       |tvec AS (SELECT l_orderkey, l_linenumber, clean,
       |       $tCols
       |       FROM feats),
       |xs AS (SELECT *,
       |       $xCols
       |       FROM tvec),
       |vv AS (SELECT *,
       |       $vCols
       |       FROM xs)
       |SELECT l_orderkey, l_linenumber,
       |       ${out("pv", 0)},
       |       ${out("npv", 1)},
       |       ${out("bs", 2)}
       |FROM vv""".stripMargin
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
