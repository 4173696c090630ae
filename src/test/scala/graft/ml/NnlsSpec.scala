package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/**
 * NNLS correctness: equals unconstrained least squares when that solution is
 * already non-negative; otherwise satisfies the KKT conditions of the
 * constrained problem (the defining optimality property scipy.opt.nnls
 * guarantees, reference `dc_fractional_coverage_classifier.py:111`).
 */
class NnlsSpec extends AnyFunSuite {

  private def mul(a: Array[Array[Double]], x: Array[Double]): Array[Double] =
    a.map(row => row.zip(x).map { case (p, q) => p * q }.sum)

  private def residGrad(a: Array[Array[Double]], b: Array[Double], x: Array[Double]): Array[Double] = {
    val r = mul(a, x).zip(b).map { case (ax, bi) => bi - ax }
    (0 until x.length).map { j => a.indices.map(i => a(i)(j) * r(i)).sum }.toArray
  }

  test("recovers exact non-negative solution (consistent system)") {
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val n = 3; val m = 8
      val a = Array.fill(m, n)(rnd.nextDouble())
      val xTrue = Array.fill(n)(rnd.nextDouble() * 2)
      val b = mul(a, xTrue)
      val x = Nnls.solve(a, b)
      xTrue.zip(x).foreach { case (t, s) => assert(math.abs(t - s) < 1e-6, s"${xTrue.toSeq} vs ${x.toSeq}") }
    }
  }

  test("KKT optimality on random overdetermined systems") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { it =>
      val n = 3; val m = 10
      val a = Array.fill(m, n)(rnd.nextDouble() * 2 - 0.5)
      val b = Array.fill(m)(rnd.nextDouble() * 2 - 1)
      val x = Nnls.solve(a, b)
      assert(x.forall(_ >= 0.0), s"negative component at $it")
      val g = residGrad(a, b, x)
      x.indices.foreach { j =>
        if (x(j) > 1e-9) assert(math.abs(g(j)) < 1e-6, s"free var gradient nonzero: ${g(j)} at $it")
        else assert(g(j) < 1e-6, s"active var gradient positive: ${g(j)} at $it")
      }
    }
  }

  test("zero rhs → zero solution; all-negative correlation → zero solution") {
    val a = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    assert(Nnls.solve(a, Array(0.0, 0.0)).forall(_ == 0.0))
    assert(Nnls.solve(a, Array(-3.0, -4.0)).forall(_ == 0.0))
  }
}
