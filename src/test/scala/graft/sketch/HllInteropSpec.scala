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

  test("import: Java/C++ images (all encodings) become engine sketches and union") {
    val dir = "/root/reference/serialization_test_data/java_generated_files"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    def img(name: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name))
    for (enc <- Seq(4, 6, 8); n <- Seq(100, 10000, 100000)) {
      val sk = HllSketch.fromDataSketchesImage(img(s"hll${enc}_n${n}_java.sk"))
      assert(sk.lgK === 12)
      assert(math.abs(sk.estimate - n) <= n * 0.02, s"hll$enc n=$n -> ${sk.estimate}")
    }
    // the generators update items 1..n, so union(n=1000, n=100000) has
    // true cardinality 100000 — cross-encoding union via import
    val u = HllSketch.fromDataSketchesImage(img("hll4_n1000_java.sk"))
      .merge(HllSketch.fromDataSketchesImage(img("hll8_n100000_java.sk")))
    val tol = 3 * 1.0390 / math.sqrt(4096.0)
    assert(math.abs(u.estimate - 100000) <= 100000 * tol, s"union ${u.estimate}")
  }

  test("hll_from_ds: external images union with Spark-built sketches in a query") {
    val spark = graft.pipeline.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/reference/serialization_test_data/java_generated_files"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "hll8_n100000_java.sk"))
    val df = Seq(Tuple1(bytes)).toDF("img")
    val est = df.agg(graft.functions.hll_estimate(
      graft.functions.hll_merge_agg(graft.functions.hll_from_ds(col("img")), 12))
      .as("est")).head().getDouble(0)
    // the union aggregate is out-of-order by construction -> composite
    // estimator -> merged-sketch tolerance (3 sd of 1.0390/sqrt(k))
    assert(math.abs(est - 100000) <= 100000 * (3 * 1.0390 / math.sqrt(4096.0)), s"est $est")
  }
}
