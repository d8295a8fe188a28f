package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class Murmur3x128Spec extends AnyFunSuite {

  private def ref(bytes: Array[Byte], seed: Int): (Long, Long) = {
    val r = org.apache.commons.codec.digest.MurmurHash3.hash128x64(bytes, 0, bytes.length, seed)
    (r(0), r(1))
  }

  test("matches commons-codec x64-128 across lengths, seed 9001") {
    val rnd = new java.util.Random(42)
    for (len <- 0 to 64) {
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      assert(Murmur3x128.hashBytes(bytes, 9001L) === ref(bytes, 9001),
        s"mismatch at len=$len")
    }
  }

  test("matches guava murmur3_128") {
    val h = com.google.common.hash.Hashing.murmur3_128(9001)
    for (s <- Seq("", "a", "hello world", "The quick brown fox jumps over the lazy dog")) {
      val bytes = s.getBytes(UTF_8)
      val g = h.hashBytes(bytes).asBytes()
      val bb = java.nio.ByteBuffer.wrap(g).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(Murmur3x128.hashBytes(bytes, 9001L) === ((bb.getLong(0), bb.getLong(8))))
    }
  }

  test("hashLong equals hashing the 8 LE bytes") {
    val v = 0x0123456789abcdefL
    val bytes = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    assert(Murmur3x128.hashLong(v, 9001L) === Murmur3x128.hashBytes(bytes, 9001L))
  }
}

class ShinglesSpec extends AnyFunSuite {
  test("sorted distinct, deterministic") {
    val a = Shingles.shinglesOf("abcdefghij", 8, 9001L)
    assert(a.length === 3) // 10-8+1 windows, all distinct
    assert(a.sameElements(a.sorted))
    assert(a.sameElements(Shingles.shinglesOf("abcdefghij", 8, 9001L)))
  }
  test("short text yields one shingle; empty yields none") {
    assert(Shingles.shinglesOf("abc", 8, 9001L).length === 1)
    assert(Shingles.shinglesOf("", 8, 9001L).length === 0)
  }
  test("repeated shingles dedup") {
    val a = Shingles.shinglesOf("abababababababab", 2, 9001L)
    assert(a.length === 2) // "ab" and "ba"
  }
  test("jaccardSorted exact") {
    val a = Array(1L, 2L, 3L, 4L)
    val b = Array(3L, 4L, 5L, 6L)
    assert(Shingles.jaccardSorted(a, b) === 2.0 / 6.0)
    assert(Shingles.jaccardSorted(a, a) === 1.0)
    assert(Shingles.jaccardSorted(a, Array.emptyLongArray) === 0.0)
    assert(Shingles.jaccardSorted(Array.emptyLongArray, Array.emptyLongArray) === 1.0)
  }
}

class MinHasherSpec extends AnyFunSuite {
  test("modP / mulModP algebra") {
    import MinHasher._
    assert(modP(P) === 0L)
    assert(modP(P + 5) === 5L)
    assert(modP(-1L) === modP(java.lang.Long.parseUnsignedLong("18446744073709551615")))
    // small-value sanity vs BigInt
    val rnd = new java.util.Random(7)
    for (_ <- 1 to 200) {
      val a = math.abs(rnd.nextLong()) % P
      val b = math.abs(rnd.nextLong()) % P
      val expect = (BigInt(a) * BigInt(b) % BigInt(P)).toLong
      assert(mulModP(a, b) === expect)
    }
  }

  test("signature deterministic and length n") {
    val mh = new MinHasher(128, 9001L)
    val sh = Shingles.shinglesOf("the quick brown fox jumps over the lazy dog" * 3, 8, 9001L)
    val s1 = mh.signature(sh)
    val s2 = mh.signature(sh)
    assert(s1.length === 128)
    assert(s1.sameElements(s2))
  }

  test("signature agreement approximates Jaccard") {
    val mh = new MinHasher(256, 9001L)
    val rnd = new java.util.Random(1234)
    // two random sets with known overlap
    val common = Array.fill(600)(rnd.nextLong())
    val onlyA = Array.fill(400)(rnd.nextLong())
    val onlyB = Array.fill(400)(rnd.nextLong())
    val a = Shingles.sortedDistinct(common ++ onlyA)
    val b = Shingles.sortedDistinct(common ++ onlyB)
    val trueJ = Shingles.jaccardSorted(a, b)
    val sa = mh.signature(a)
    val sb = mh.signature(b)
    val agree = sa.indices.count(i => sa(i) == sb(i)).toDouble / sa.length
    assert(math.abs(agree - trueJ) < 0.08, s"agree=$agree trueJ=$trueJ")
  }

  test("empty set signature matches only empty") {
    val mh = new MinHasher(16, 9001L)
    val e = mh.signature(Array.emptyLongArray)
    assert(e.forall(_ == MinHasher.EmptySig))
    val ne = mh.signature(Array(42L, 7L))
    assert(!ne.exists(_ == MinHasher.EmptySig))
  }

  test("each h_i is a bijection (odd multiplier) and min is order-valid") {
    val mh = new MinHasher(8, 9001L)
    (0 until 8).foreach(i => assert((mh.a(i) & 1L) === 1L, s"a($i) must be odd"))
    // permutation property on a small domain: no collisions under h_0
    val xs = Array.tabulate(10000)(i => i.toLong * 0x9E3779B97F4A7C15L)
    val imgs = xs.map(x => mh.a(0) * x + mh.b(0))
    assert(imgs.distinct.length === xs.length)
  }
}

class SimHashSpec extends AnyFunSuite {
  test("identical input → identical fingerprint; near input → small distance") {
    val base = "conversation about apache spark dataframes and catalyst " * 10
    val near = base.replace("catalyst", "catalist")
    val far = "completely different words entirely unrelated topic matter " * 10
    val f1 = SimHash64.fingerprint(Shingles.shinglesOf(base, 8, 9001L))
    val f2 = SimHash64.fingerprint(Shingles.shinglesOf(near, 8, 9001L))
    val f3 = SimHash64.fingerprint(Shingles.shinglesOf(far, 8, 9001L))
    assert(SimHash64.hammingDist(f1, f1) === 0)
    assert(SimHash64.hammingDist(f1, f2) < SimHash64.hammingDist(f1, f3))
  }
}

class LcsSpec extends AnyFunSuite {
  test("hand cases") {
    assert(Lcs.lcsLength("", "") === 0)
    assert(Lcs.lcsLength("abc", "") === 0)
    assert(Lcs.lcsLength("abc", "abc") === 3)
    assert(Lcs.lcsLength("xabcy", "zabcw") === 3)
    assert(Lcs.lcsLength("abcdef", "zcdemn") === 3) // "cde"
    assert(Lcs.lcsLength("aaaa", "aa") === 2)
    assert(Lcs.lcsLength("abab", "baba") === 3)
    assert(Lcs.lcsLength("mississippi", "missouri") === 4) // "miss"
  }

  test("matches O(n·m) DP on random strings") {
    def dp(a: String, b: String): Int = {
      val m = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length) {
        if (a(i - 1) == b(j - 1)) {
          m(i)(j) = m(i - 1)(j - 1) + 1
          if (m(i)(j) > best) best = m(i)(j)
        }
      }
      best
    }
    val rnd = new java.util.Random(99)
    for (_ <- 1 to 50) {
      val a = (1 to (5 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to (5 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      assert(Lcs.lcsLength(a, b) === dp(a, b), s"a=$a b=$b")
    }
  }

  test("long repeated strings") {
    val a = "spark" * 2000
    val b = "xx" + ("spark" * 1500) + "yy"
    assert(Lcs.lcsLength(a, b) === 7500)
  }

  test("hasCommonRun agrees with lcsLength threshold on random strings") {
    val rnd = new java.util.Random(7)
    for (_ <- 1 to 200) {
      val a = (1 to (5 + rnd.nextInt(120))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to (5 + rnd.nextInt(120))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val exact = Lcs.lcsLength(a, b)
      for (l <- Seq(1, 2, 3, exact - 1, exact, exact + 1, 64) if l >= 0) {
        assert(Lcs.hasCommonRun(a, b, l) === (exact >= l),
          s"a=$a b=$b L=$l exact=$exact")
      }
    }
  }

  test("hasCommonRun edges: empty, zero threshold, repeated chars, long runs") {
    assert(Lcs.hasCommonRun("", "", 0))
    assert(!Lcs.hasCommonRun("", "abc", 1))
    assert(Lcs.hasCommonRun("abc", "xbcy", 2))
    assert(!Lcs.hasCommonRun("abc", "xbcy", 3))
    // degenerate repeated-char inputs: dedup keeps the probe clusters small
    val aa = "a" * 5000
    assert(Lcs.hasCommonRun(aa, "b" * 4000 + "a" * 64, 64))
    assert(!Lcs.hasCommonRun(aa, "b" * 4000 + "a" * 63, 64))
    // the verify-gate shape: 64-char runs inside ~1KB docs
    val doc = ("the quick brown fox " * 60).trim
    assert(Lcs.hasCommonRun(doc, "zzz" + doc.substring(100, 164) + "qqq", 64))
    assert(!Lcs.hasCommonRun(doc, doc.substring(100, 163).reverse, 64))
  }
}

class UnionFindSpec extends AnyFunSuite {
  test("min-id representative") {
    val uf = new UnionFind[String]()
    Seq("c", "a", "b", "z").foreach(uf.add)
    uf.union("c", "b")
    uf.union("b", "a")
    val asg = uf.assignments()
    assert(asg("a") === "a" && asg("b") === "a" && asg("c") === "a" && asg("z") === "z")
  }
}

class OracleDedupSpec extends AnyFunSuite {
  test("exact dup and near dup found, distractor not") {
    val doc = (0 until 8).map(i =>
      s"user: question number $i about spark partitioning strategies\n" +
      s"assistant: answer $i covers shuffle boundaries and adaptive execution plans"
    ).mkString("\n")
    val near = doc.replaceFirst("adaptive", "dynamic") // one small edit
    val other = "user: unrelated question about volcanoes\nassistant: magma is molten rock " * 8
    val truth = OracleDedup.run(
      Seq("c1" -> doc, "c2" -> doc, "c3" -> near, "c4" -> other), DedupConfig())
    assert(truth.pairs.contains(("c1", "c2")))
    assert(truth.pairs.contains(("c1", "c3")))
    assert(!truth.pairs.exists(p => p._1 == "c4" || p._2 == "c4"))
    assert(truth.clusters("c2") === "c1")
    assert(truth.clusters("c4") === "c4")
  }
}
