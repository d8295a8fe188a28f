package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{LongHashSet, Shingles}

/** The two pair-verify kernels (sorted-merge intersect vs hash-set probe)
  * must be bit-identical on every input: same jaccard double, same simhash
  * distance — q09-q12's hash-exact oracles ride on this. */
class VerifyKernelSpec extends AnyFunSuite {

  private def both(a: String, b: String, k: Int = 8, seed: Long = 9001L) = {
    val ua = UTF8String.fromString(a); val ub = UTF8String.fromString(b)
    val m = PairVerify.computeWith(new PairVerify.Scratch(false), ua, ub, k, seed, probe = false)
    val p = PairVerify.computeWith(new PairVerify.Scratch(true), ua, ub, k, seed, probe = true)
    (m, p)
  }

  test("kernels agree on random near-dup and unrelated docs") {
    val rnd = new java.util.Random(7)
    def doc(len: Int): String = {
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append((32 + rnd.nextInt(95)).toChar))
      sb.toString
    }
    (0 until 200).foreach { _ =>
      val base = doc(50 + rnd.nextInt(2000))
      val near = {
        val c = base.toCharArray
        (0 until 1 + rnd.nextInt(6)).foreach(_ => c(rnd.nextInt(c.length)) = (32 + rnd.nextInt(95)).toChar)
        new String(c)
      }
      for (other <- Seq(near, doc(50 + rnd.nextInt(500)), base)) {
        val (m, p) = both(base, other)
        assert(m._1 === p._1) // exact double equality: same inter/union ints
        assert(m._2 === p._2)
      }
    }
  }

  test("kernels agree on edge shapes: empty, 1-byte, shorter-than-k, repeated content") {
    for ((a, b) <- Seq(("", ""), ("", "xyz"), ("a", "a"), ("a", "b"),
        ("abc", "abc"), ("abc", "abd"), ("aaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaab"),
        ("ab" * 40, "ab" * 40 + "c"))) {
      val (m, p) = both(a, b)
      assert(m === p, s"mismatch on ('$a','$b')")
    }
  }

  test("kernels agree through the memo: repeated side A over a pair run") {
    val sm = new PairVerify.Scratch(false)
    val sp = new PairVerify.Scratch(true)
    val a = UTF8String.fromString("the quick brown fox jumps over the lazy dog " * 20)
    val rnd = new java.util.Random(3)
    (0 until 50).foreach { i =>
      val b = UTF8String.fromString(
        "the quick brown fox jumps over the lazy dog " * 20 + ("x" * rnd.nextInt(10)) + i)
      val m = PairVerify.computeWith(sm, a, b, 8, 9001L, probe = false)
      val p = PairVerify.computeWith(sp, a, b, 8, 9001L, probe = true)
      assert(m === p)
    }
  }

  test("kernels agree past RetainCap (transient path)") {
    val rnd = new java.util.Random(5)
    val big = {
      val sb = new StringBuilder
      (0 until 600000).foreach(_ => sb.append((32 + rnd.nextInt(95)).toChar)) // > 512k RetainCap
      sb.toString
    }
    val (m, p) = both(big, big.substring(0, 599000) + "zz")
    assert(m === p)
    val (m2, p2) = both(big, big)
    assert(m2 === p2 && m2._1 === 1.0)
  }

  test("LongHashSet: add/contains/dedup, zero element, reuse via reset") {
    val s = new LongHashSet(4)
    assert(s.add(5L) && !s.add(5L) && s.contains(5L) && !s.contains(6L))
    assert(s.add(0L) && !s.add(0L) && s.contains(0L))
    (1L to 100L).foreach(i => s.add(i * 0x9e3779b97f4a7c15L))
    assert(s.size === 102)
    s.reset(10)
    assert(s.size === 0 && !s.contains(5L) && !s.contains(0L))
    assert(s.add(5L))
  }

  test("jaccardProbe equals jaccardSorted on random long sets") {
    val rnd = new java.util.Random(11)
    (0 until 100).foreach { _ =>
      val a = Array.fill(rnd.nextInt(300))(rnd.nextInt(200).toLong + 1)
      val b = Array.fill(rnd.nextInt(300))(rnd.nextInt(200).toLong + 1)
      val sa = Shingles.sortedDistinct(a.clone())
      val sb = Shingles.sortedDistinct(b.clone())
      val ha = new LongHashSet(a.length max 1); a.foreach(ha.add)
      val hb = new LongHashSet(b.length max 1); b.foreach(hb.add)
      assert(ha.size === sa.length && hb.size === sb.length)
      assert(LongHashSet.jaccardProbe(ha, hb) === Shingles.jaccardSorted(sa, sb))
    }
  }
}
