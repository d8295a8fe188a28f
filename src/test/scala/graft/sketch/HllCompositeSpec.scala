package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** The round-1 estimator diverged from the reference mid-range (VERDICT
  * H12); with the interpolation-table composite estimator the merged
  * (out-of-order) path must now hold reference-grade error. */
class HllCompositeSpec extends AnyFunSuite {

  test("merged sketches (composite path) estimate within 2.5 sd across the crossover region") {
    for (n <- Seq(2000, 5000, 10000, 20000, 100000)) {
      val a = new HllSketch(12)
      val b = new HllSketch(12)
      (0 until n).foreach { i =>
        val s = s"item-$i"
        if (i % 2 == 0) a.update(s) else b.update(s)
      }
      a.merge(b) // merge forces outOfOrder -> composite estimator
      val est = a.estimate
      val tol = 2.5 * 1.0390 / math.sqrt(4096.0) // 2.5 sd of the ooo RSE = 4.1%
      assert(math.abs(est - n) <= n * tol,
        s"n=$n composite est $est off by ${(est - n) / n * 100}%%")
    }
  }

  test("in-order HIP path stays tighter (2.5 sd of HIP RSE)") {
    for (n <- Seq(10000, 100000)) {
      val a = new HllSketch(12)
      (0 until n).foreach(i => a.update(s"item-$i"))
      val tol = 2.5 * 0.8326 / math.sqrt(4096.0)
      assert(math.abs(a.estimate - n) <= n * tol)
    }
  }

  test("sparse coupon estimate uses the coupon mapping (exact in the small regime)") {
    val a = new HllSketch(12)
    (0 until 100).foreach(i => a.update(s"x-$i"))
    assert(math.rint(a.estimate) === 100.0)
  }
}
