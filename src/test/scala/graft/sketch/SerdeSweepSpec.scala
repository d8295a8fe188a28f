package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.interop.DataSketchesHll

/** Randomized cross-config serde sweep. The golden-fixture specs pin
  * exact byte layouts at the configs the reference ships fixtures for;
  * this spec sweeps the whole (lgK × tgtType × n × compact) / (k × n) /
  * (lgMax × stream shape) grid with seeded streams and asserts the
  * contracts that must hold at EVERY config:
  *   - own-image round-trips are estimate/quantile-exact,
  *   - exported DataSketches images re-read to the same estimate,
  *   - Frequencies bounds bracket true counts through purge + serde.
  * Seeded java.util.Random throughout — deterministic, no flake. */
class SerdeSweepSpec extends AnyFunSuite {

  test("HLL own-image round-trip is estimate- and bounds-exact across (lgK x n)") {
    for (lgK <- Seq(4, 7, 12, 21); n <- Seq(0L, 1L, 10L, 1000L, 50000L)) {
      val s = new HllSketch(lgK)
      var i = 0L
      while (i < n) { s.update(i * 977L + lgK); i += 1 }
      val d = HllSketch.deserialize(s.serialize())
      assert(d.estimate === s.estimate, s"lgK=$lgK n=$n")
      assert(d.lowerBound(2) === s.lowerBound(2), s"lgK=$lgK n=$n lb")
      assert(d.upperBound(2) === s.upperBound(2), s"lgK=$lgK n=$n ub")
      // round-trip must survive a second cycle byte-stably
      assert(java.util.Arrays.equals(d.serialize(), s.serialize()),
        s"lgK=$lgK n=$n second-cycle image drift")
    }
  }

  test("HLL DataSketches export re-reads to the same estimate at every (lgK, tgt, n, compact)") {
    for (lgK <- Seq(4, 8, 12, 16); tgt <- 0 to 2;
         n <- Seq(0L, 1L, 5L, 40L, 600L, 20000L); compact <- Seq(true, false)) {
      val s = new HllSketch(lgK)
      var i = 0L
      while (i < n) { s.update(i * 131071L + tgt); i += 1 }
      val img = DataSketchesHll.read(s.toDataSketchesImage(tgt, compact))
      val est = img.estimate
      // A sparse sketch whose coupon count exceeds the legal sparse-image
      // capacity (LIST cap at lgK ≤ 7, reference SET cap 3/4·2^(lgK−3)
      // otherwise) exports as a densified HLL image — the image then
      // carries the dense composite/HIP estimator instead of the coupon
      // estimate, so parity is within the HLL error envelope, not exact.
      val densified = !s.isDense && img.mode == 2
      val tol =
        if (densified) math.max(2.0, 0.05 * math.max(est, s.estimate))
        else math.max(1e-9, 1e-9 * s.estimate)
      assert(math.abs(est - s.estimate) <= tol,
        s"lgK=$lgK tgt=$tgt n=$n compact=$compact densified=$densified: $est vs ${s.estimate}")
    }
  }

  test("KLL doubles round-trip is quantile-exact; rank error within contract across (k x n)") {
    val ranks = (0 to 100).map(_ / 100.0).toArray
    for (k <- Seq(8, 200, 1000); n <- Seq(0, 1, 10, 999, 100000)) {
      val rnd = new java.util.Random(k * 31 + n)
      val xs = Array.fill(n)(rnd.nextDouble() * 1e6 - 5e5)
      val s = new KllSketch(k)
      xs.foreach(s.update)
      val d = KllSketch.deserialize(s.serialize())
      assert(d.n === s.n)
      if (n > 0) {
        assert(java.util.Arrays.equals(d.quantiles(ranks), s.quantiles(ranks)),
          s"k=$k n=$n quantile drift after round-trip")
        // rank accuracy vs exact, through the serde cycle (2x the 99%-confidence
        // normalized error keeps a seeded deterministic stream comfortably inside)
        val eps = 2.0 * s.normalizedRankError(false)
        val sorted = xs.sorted
        for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
          val v = d.quantile(q)
          val exact = {
            var lo = 0; while (lo < n && sorted(lo) <= v) lo += 1
            lo.toDouble / n
          }
          assert(math.abs(exact - q) <= eps + 1.0 / n,
            s"k=$k n=$n q=$q exact-rank=$exact")
        }
      }
    }
  }

  test("Frequencies bounds bracket true counts through purge, binary serde and CSV") {
    for (lgMax <- Seq(3, 6, 10); trial <- 0 to 1) {
      val rnd = new java.util.Random(lgMax * 7 + trial)
      val s = new FreqSketch[Long](lgMax)
      val truth = scala.collection.mutable.HashMap.empty[Long, Long]
      // zipf-ish: a few heavy keys + a long random tail, forcing purges
      val heavy = Array.tabulate(4)(i => 1000L + i)
      for (_ <- 0 until 20000) {
        val item =
          if (rnd.nextInt(4) == 0) heavy(rnd.nextInt(heavy.length))
          else rnd.nextInt(5000).toLong
        val w = 1L + rnd.nextInt(5)
        s.update(item, w)
        truth(item) = truth.getOrElse(item, 0L) + w
      }
      def check(f: FreqSketch[Long], tag: String): Unit = {
        assert(f.streamWeight === s.streamWeight, s"$tag streamWeight")
        for ((item, t) <- truth) {
          assert(f.lowerBound(item) <= t, s"$tag lgMax=$lgMax lb(${item}) > true $t")
          assert(t <= f.upperBound(item), s"$tag lgMax=$lgMax ub(${item}) < true $t")
        }
        for (h <- heavy)
          assert(f.estimate(h) >= truth(h) - f.offset, s"$tag heavy $h")
      }
      check(s, "original")
      check(FreqSketch.deserialize(s.serialize(FreqSketch.LongSerde),
        FreqSketch.LongSerde), "binary-rt")
      check(FreqSketch.fromCsvString(s.toCsvString()), "csv-rt")
    }
  }

  test("HLL union sweep: mixed lgK and mixed modes stay inside merged-RSE bounds and round-trip") {
    // the union path crosses every mode pair (sparse+sparse, sparse+dense,
    // dense+sparse, dense+dense) and the lgK-mismatch downsampling branch
    for ((lgA, lgB) <- Seq((12, 12), (12, 10), (10, 14), (21, 4));
         (nA, nB) <- Seq((5L, 7L), (20L, 40000L), (30000L, 12L), (25000L, 50000L))) {
      val a = new HllSketch(lgA); val b = new HllSketch(lgB)
      var i = 0L
      while (i < nA) { a.update(i); i += 1 }
      i = 0L
      // 50% overlap with a's stream
      while (i < nB) { b.update(i + nA / 2); i += 1 }
      // distinct of [0,nA) ∪ [nA/2, nA/2+nB): b starts inside a, so the
      // union is one contiguous range
      val trueN = math.max(nA, nA / 2 + nB)
      val m = a.merge(b)
      val lgM = math.min(lgA, lgB)
      // merged / out-of-order RSE at the smaller lgK (hll/utils.go:51-54)
      val rse = 1.0390 / math.sqrt((1L << lgM).toDouble)
      assert(math.abs(m.estimate - trueN) / trueN < math.max(4 * rse, 0.15),
        s"lgA=$lgA lgB=$lgB nA=$nA nB=$nB est=${m.estimate} true=$trueN")
      val rt = HllSketch.deserialize(m.serialize())
      assert(rt.estimate === m.estimate, "merged sketch round-trip")
    }
  }

  test("KLL merge sweep: mixed k and sizes keep the larger-eps rank contract") {
    for ((kA, kB) <- Seq((200, 200), (200, 64), (64, 400));
         (nA, nB) <- Seq((1000, 1000), (50000, 17), (0, 5000))) {
      val rnd = new java.util.Random(kA + kB + nA + nB)
      val xsA = Array.fill(nA)(rnd.nextDouble())
      val xsB = Array.fill(nB)(rnd.nextDouble())
      val a = new KllSketch(kA); xsA.foreach(a.update)
      val b = new KllSketch(kB); xsB.foreach(b.update)
      val m = a.merge(b)
      assert(m.n === (nA + nB).toLong)
      val all = (xsA ++ xsB).sorted
      val eps = 2.0 * math.max(new KllSketch(kA).normalizedRankError(false),
        new KllSketch(kB).normalizedRankError(false))
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val v = m.quantile(q)
        var lo = 0; while (lo < all.length && all(lo) <= v) lo += 1
        assert(math.abs(lo.toDouble / all.length - q) <= eps + 1.0 / all.length,
          s"kA=$kA kB=$kB nA=$nA nB=$nB q=$q")
      }
      // serde stability through a merge
      val rt = KllSketch.deserialize(m.serialize())
      assert(java.util.Arrays.equals(
        rt.quantiles(Array(0.0, 0.25, 0.5, 0.75, 1.0)),
        m.quantiles(Array(0.0, 0.25, 0.5, 0.75, 1.0))))
    }
  }

  test("Frequencies merge accepts mismatched map sizes (reference Merge semantics)") {
    // longs_sketch.go:451-466 replays ANY other sketch through UpdateMany —
    // no size-equality requirement; self's capacity governs purging.
    for ((lgA, lgB) <- Seq((3, 10), (10, 3), (6, 6))) {
      val rnd = new java.util.Random(lgA * 100 + lgB)
      val a = new FreqSketch[Long](lgA)
      val b = new FreqSketch[Long](lgB)
      val truth = scala.collection.mutable.HashMap.empty[Long, Long]
      for (_ <- 0 until 5000) {
        val (sk, item) =
          if (rnd.nextBoolean()) (a, rnd.nextInt(400).toLong)
          else (b, rnd.nextInt(400).toLong + 200L)
        val w = 1L + rnd.nextInt(3)
        sk.update(item, w)
        truth(item) = truth.getOrElse(item, 0L) + w
      }
      val wantWeight = a.streamWeight + b.streamWeight
      val m = a.merge(b)
      assert(m.streamWeight === wantWeight, s"($lgA,$lgB) streamWeight")
      for ((item, t) <- truth) {
        assert(m.lowerBound(item) <= t, s"($lgA,$lgB) lb($item) > true $t")
        assert(t <= m.upperBound(item), s"($lgA,$lgB) ub($item) < true $t")
      }
    }
  }
}
