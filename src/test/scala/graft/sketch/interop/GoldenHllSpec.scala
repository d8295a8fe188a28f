package graft.sketch.interop

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Cross-language golden-file compatibility — mirrors the reference's
  * hll_sketch_serialization_test.go:68-176: deserialize the Java- and
  * C++-generated `.sk` images (lgK=12, n in {0,1,10,...,10^6}, all three
  * encodings) and require the estimate within ±2% of true n. */
class GoldenHllSpec extends AnyFunSuite {

  private val dirs = Seq(
    "java" -> "/root/reference/serialization_test_data/java_generated_files",
    "cpp" -> "/root/reference/serialization_test_data/cpp_generated_files")
  private val ns = Seq(0, 1, 10, 100, 1000, 10000, 100000, 1000000)

  for ((lang, dir) <- dirs; enc <- Seq(4, 6, 8)) {
    test(s"$lang HLL$enc images: estimate within 2% for n in {0..10^6}") {
      assume(Files.isDirectory(Paths.get(dir)), s"fixtures absent: $dir")
      for (n <- ns) {
        val f = Paths.get(dir, s"hll${enc}_n${n}_$lang.sk")
        assert(Files.exists(f), s"missing fixture $f")
        val img = DataSketchesHll.read(Files.readAllBytes(f))
        assert(img.lgK === 12)
        val est = img.estimate
        if (n == 0) assert(est === 0.0, s"$f: empty sketch must estimate 0")
        else assert(math.abs(est - n) <= n * 0.02,
          s"$f: estimate $est not within 2% of $n (mode=${img.mode}, ooo=${img.outOfOrder})")
      }
    }
  }

  test("composite estimator (no HIP) lands within 4% (2.5 sd) on the HLL-mode fixtures") {
    // strip the HIP accumulator so the composite path (interpolation tables
    // + linear-counting crossover) is exercised — this is the estimator
    // merged/out-of-order sketches rely on; its RSE at lgK=12 is 1.04/64 =
    // 1.6%, so 4% is a 2.5-sd deterministic bound
    for ((lang, dir) <- dirs; enc <- Seq(4, 6, 8); n <- ns if n >= 10000) {
      val f = Paths.get(dir, s"hll${enc}_n${n}_$lang.sk")
      assume(Files.exists(f))
      val img = DataSketchesHll.read(Files.readAllBytes(f)).copy(outOfOrder = true)
      val est = img.estimate
      assert(math.abs(est - n) <= n * 0.04,
        s"$f composite: $est not within 4% of $n")
    }
  }

  test("coupon-mode images (small n) estimate exactly in the exact regime") {
    for ((lang, dir) <- dirs; enc <- Seq(4, 6, 8); n <- Seq(1, 10)) {
      val f = Paths.get(dir, s"hll${enc}_n${n}_$lang.sk")
      assume(Files.exists(f))
      val img = DataSketchesHll.read(Files.readAllBytes(f))
      assert(img.mode === 0 || img.mode === 1, s"$f: expected a coupon mode at n=$n")
      assert(math.rint(img.estimate) === n.toDouble)
    }
  }
}
