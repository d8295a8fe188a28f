package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class QuickSelectSpec extends AnyFunSuite {

  test("matches sort for random arrays and every k") {
    val rnd = new java.util.Random(3)
    (0 until 20).foreach { _ =>
      val a = Array.fill(101)(rnd.nextLong() % 50)
      val sorted = a.clone().sorted
      Seq(0, 1, 50, 99, 100).foreach { k =>
        assert(QuickSelect.select(a.clone(), k) === sorted(k))
      }
    }
  }

  test("all-equal input stays O(n): the purge-median hot case") {
    // 4M equal counters (every count 1 after a uniform stream) — the
    // strict-< Lomuto degenerate case would do ~10^13 comparisons here;
    // 3-way partitioning must return immediately.
    val a = Array.fill(4 * 1024 * 1024)(1L)
    val t0 = System.nanoTime()
    assert(QuickSelect.select(a, a.length / 2) === 1L)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"all-equal select took ${ms}ms — partition degenerated")
  }

  test("mostly-equal input with a few outliers") {
    val a = Array.fill(100001)(7L)
    a(17) = 1L; a(9999) = 2L; a(50000) = 100L
    val sorted = a.clone().sorted
    Seq(0, 2, 50000, 100000).foreach { k =>
      assert(QuickSelect.select(a.clone(), k) === sorted(k))
    }
  }
}
