package graft.ml

/**
 * Lawson–Hanson active-set non-negative least squares:
 * minimize ‖A·x − b‖₂ subject to x ≥ 0.
 *
 * The reference solves this per pixel with `scipy.optimize.nnls` against a
 * 64×3 endmember matrix (`utils/dc_fractional_coverage_classifier.py:111`).
 * Problem sizes here are tiny (n = 3 unknowns), so a dense textbook
 * implementation is exact and fast; no external solver needed.
 */
object Nnls {

  /** @param a row-major m×n matrix  @param b length-m target
    * @return length-n x ≥ 0 minimizing ‖Ax−b‖ */
  def solve(a: Array[Array[Double]], b: Array[Double], maxIter: Int = 0): Array[Double] = {
    val m = a.length
    val n = if (m == 0) 0 else a(0).length
    val iterCap = if (maxIter > 0) maxIter else 3 * n + 30
    val x = new Array[Double](n)
    val passive = new Array[Boolean](n) // true = in passive (free) set
    var nPassive = 0

    // w = Aᵀ(b − Ax), the negative gradient
    def gradient(): Array[Double] = {
      val r = new Array[Double](m)
      var i = 0
      while (i < m) {
        var s = b(i); var j = 0
        while (j < n) { s -= a(i)(j) * x(j); j += 1 }
        r(i) = s; i += 1
      }
      val w = new Array[Double](n)
      var j = 0
      while (j < n) {
        var s = 0.0; var i2 = 0
        while (i2 < m) { s += a(i2)(j) * r(i2); i2 += 1 }
        w(j) = s; j += 1
      }
      w
    }

    /** Unconstrained LS on the passive columns via normal equations +
      * Gaussian elimination with partial pivoting (n ≤ ~8 here). */
    def solvePassive(): Array[Double] = {
      val idx = (0 until n).filter(passive).toArray
      val k = idx.length
      val ata = Array.ofDim[Double](k, k + 1)
      var p = 0
      while (p < k) {
        var q = 0
        while (q < k) {
          var s = 0.0; var i = 0
          while (i < m) { s += a(i)(idx(p)) * a(i)(idx(q)); i += 1 }
          ata(p)(q) = s; q += 1
        }
        var s = 0.0; var i = 0
        while (i < m) { s += a(i)(idx(p)) * b(i); i += 1 }
        ata(p)(k) = s; p += 1
      }
      // elimination
      var col = 0
      while (col < k) {
        var piv = col; var r = col + 1
        while (r < k) { if (math.abs(ata(r)(col)) > math.abs(ata(piv)(col))) piv = r; r += 1 }
        val t = ata(col); ata(col) = ata(piv); ata(piv) = t
        val d = ata(col)(col)
        if (math.abs(d) > 1e-14) {
          r = col + 1
          while (r < k) {
            val f = ata(r)(col) / d
            var c = col
            while (c <= k) { ata(r)(c) -= f * ata(col)(c); c += 1 }
            r += 1
          }
        }
        col += 1
      }
      val z = new Array[Double](k)
      var r = k - 1
      while (r >= 0) {
        var s = ata(r)(k); var c = r + 1
        while (c < k) { s -= ata(r)(c) * z(c); c += 1 }
        z(r) = if (math.abs(ata(r)(r)) > 1e-14) s / ata(r)(r) else 0.0
        r -= 1
      }
      val full = new Array[Double](n)
      var t2 = 0
      while (t2 < k) { full(idx(t2)) = z(t2); t2 += 1 }
      full
    }

    val tol = 1e-10
    var iter = 0
    var done = false
    while (!done && iter < iterCap) {
      val w = gradient()
      // most-violating zero-set coordinate
      var best = -1; var bestW = tol
      var j = 0
      while (j < n) {
        if (!passive(j) && w(j) > bestW) { best = j; bestW = w(j) }
        j += 1
      }
      if (best < 0) done = true
      else {
        passive(best) = true; nPassive += 1
        var inner = true
        while (inner) {
          val z = solvePassive()
          var minNeg = Double.MaxValue; var anyNeg = false
          var jj = 0
          while (jj < n) {
            if (passive(jj) && z(jj) <= 0.0) {
              anyNeg = true
              val alpha = x(jj) / (x(jj) - z(jj))
              if (alpha < minNeg) minNeg = alpha
            }
            jj += 1
          }
          if (!anyNeg) {
            System.arraycopy(z, 0, x, 0, n)
            inner = false
          } else {
            var j3 = 0
            while (j3 < n) {
              if (passive(j3)) {
                x(j3) = x(j3) + minNeg * (z(j3) - x(j3))
                if (x(j3) <= tol) { x(j3) = 0.0; passive(j3) = false; nPassive -= 1 }
              }
              j3 += 1
            }
            if (nPassive == 0) inner = false
          }
        }
      }
      iter += 1
    }
    x
  }
}
