package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.interop.DataSketchesHll

/** Round-2 H15/H18 completion: lgK-mismatch downsampling unions (the
  * fork's unimplemented branches) and write-side DataSketches-format
  * export. */
class HllInteropSpec extends AnyFunSuite {

  private def filled(lgK: Int, from: Int, until: Int): HllSketch = {
    val sk = new HllSketch(lgK)
    (from until until).foreach(i => sk.update(s"item-$i"))
    sk
  }

  test("downsample: folded sketch equals a directly-built sketch register-for-register") {
    val big = filled(14, 0, 50000)
    val direct = filled(11, 0, 50000)
    val folded = big.downsample(11)
    assert(folded.lgK === 11)
    // identical register state => identical register section of the
    // serialized DataSketches image (HIP/KxQ differ in provenance: the
    // fold recomputes, the direct build accumulates incrementally)
    val a = folded.toDataSketchesImage
    val b = direct.toDataSketchesImage
    assert(a.length === b.length)
    assert(a(6) === b(6), "curMin byte")
    assert(a.drop(40).sameElements(b.drop(40)), "registers must match exactly")
    val tol = 3 * 1.0390 / math.sqrt(2048.0)
    assert(math.abs(folded.estimate - 50000) <= 50000 * tol)
  }

  test("lgK-mismatched merge resolves to min lgK with union semantics") {
    val a = filled(12, 0, 30000)
    val b = filled(14, 20000, 60000) // overlaps 20k..30k
    val m = a.merge(b)
    assert(m.lgK === 12)
    val tol = 3 * 1.0390 / math.sqrt(4096.0)
    assert(math.abs(m.estimate - 60000) <= 60000 * tol,
      s"union estimate ${m.estimate} vs 60000")
    // symmetric: small into large also lands at min lgK
    val c = filled(14, 0, 30000).merge(filled(12, 20000, 60000))
    assert(c.lgK === 12)
    assert(math.abs(c.estimate - 60000) <= 60000 * tol)
  }

  test("sparse downsample keeps coupons (they are lgK-independent)") {
    val sk = filled(16, 0, 500) // stays sparse at lgK=16 (threshold 16k)
    assert(!sk.isDense)
    sk.downsample(10)
    assert(sk.lgK === 10)
    assert(math.rint(sk.estimate) === 500.0 || math.abs(sk.estimate - 500) < 3)
  }

  test("write-side export round-trips through the DataSketches reader (dense + sparse)") {
    val dense = filled(12, 0, 100000)
    val img = DataSketchesHll.read(dense.toDataSketchesImage)
    assert(img.lgK === 12 && img.mode === 2 && img.tgtType === 2)
    assert(img.estimate === dense.estimate, "HIP carried through the image")

    val merged = filled(12, 0, 50000).merge(filled(12, 25000, 75000))
    val img2 = DataSketchesHll.read(merged.toDataSketchesImage)
    assert(img2.outOfOrder)
    assert(img2.estimate === merged.estimate, "composite path must agree exactly")

    val sparse = filled(12, 0, 300)
    val img3 = DataSketchesHll.read(sparse.toDataSketchesImage)
    assert(img3.mode === 1)
    assert(img3.estimate === sparse.estimate)
  }
}
