package graft.sketch.interop

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Cross-language golden-file compatibility for the KLL-string and
  * Frequencies images — mirrors kll/items_sletch_serialization_test.go:48-95
  * and frequencies/sketch_serialization_test.go:137-350. */
class GoldenKllFreqSpec extends AnyFunSuite {

  private val javaDir = "/root/reference/serialization_test_data/java_generated_files"
  private val cppDir = "/root/reference/serialization_test_data/cpp_generated_files"
  private val ns = Seq(0, 1, 10, 100, 1000, 10000, 100000, 1000000)

  /** kll/utils.go:93-118 fixture item format: space-prepadded decimal. */
  private def numDigits(n0: Int): Int = {
    val n = if (n0 % 10 == 0) n0 + 1 else n0
    math.ceil(math.log(n) / math.log(10)).toInt
  }
  private def fixedLen(i: Int, len: Int): String = {
    val s = i.toString
    (" " * math.max(0, len - s.length)) + s
  }

  test("java KLL-string images: k, min/max, total weight, bounds, quantile sanity") {
    assume(Files.isDirectory(Paths.get(javaDir)))
    for (n <- ns) {
      val f = Paths.get(javaDir, s"kll_string_n${n}_java.sk")
      assert(Files.exists(f), s"missing $f")
      val img = DataSketchesKll.readString(Files.readAllBytes(f))
      assert(img.k === 200, s"$f")
      if (n == 0) assert(img.isEmpty)
      else {
        assert(!img.isEmpty)
        assert(img.isEstimationMode === (n > 100), s"$f estimation mode")
        val digits = numDigits(n)
        assert(img.minItem.contains(fixedLen(1, digits)), s"$f min=${img.minItem}")
        assert(img.maxItem.contains(fixedLen(n, digits)), s"$f max=${img.maxItem}")
        assert(img.totalWeight === n.toLong, s"$f weight")
        val (minV, maxV) = (img.minItem.get, img.maxItem.get)
        img.iterator.foreach { case (q, _) =>
          assert(q >= minV && q <= maxV, s"$f item $q outside [$minV,$maxV]")
        }
        if (n >= 1000) {
          // median string must sit within the KLL rank error of n/2
          val med = img.quantile(0.5).trim.toLong
          assert(math.abs(med - n / 2.0) <= 0.02 * n, s"$f median $med vs ${n / 2}")
        }
      }
    }
  }

  for ((lang, dir) <- Seq("java" -> javaDir, "cpp" -> cppDir)) {
    test(s"$lang frequent-longs images: emptiness, error bound, stream length") {
      assume(Files.isDirectory(Paths.get(dir)))
      for (n <- ns) {
        val f = Paths.get(dir, s"frequent_long_n${n}_$lang.sk")
        assert(Files.exists(f), s"missing $f")
        val d = DataSketchesFreq.readLongs(Files.readAllBytes(f))
        if (n == 0) assert(d.empty)
        else {
          assert(!d.empty)
          if (n > 10) assert(d.maximumError > 0, s"$f maxErr")
          else assert(d.maximumError === 0L, s"$f maxErr")
          assert(d.streamWeight === n.toLong, s"$f streamWeight")
        }
      }
    }

    test(s"$lang frequent-string images: emptiness, error bound, stream length") {
      assume(Files.isDirectory(Paths.get(dir)))
      for (n <- ns) {
        val f = Paths.get(dir, s"frequent_string_n${n}_$lang.sk")
        assert(Files.exists(f), s"missing $f")
        val d = DataSketchesFreq.readStrings(Files.readAllBytes(f))
        if (n == 0) assert(d.empty)
        else {
          assert(!d.empty)
          if (n > 10) assert(d.maximumError > 0) else assert(d.maximumError === 0L)
          assert(d.streamWeight === n.toLong)
        }
      }
    }

    test(s"$lang frequent-string utf8/ascii images: exact estimates, engine import") {
      assume(Files.isDirectory(Paths.get(dir)))
      val utf8 = DataSketchesFreq.readStrings(
        Files.readAllBytes(Paths.get(dir, s"frequent_string_utf8_$lang.sk")))
      assert(!utf8.empty)
      assert(utf8.maximumError === 0L)
      assert(utf8.streamWeight === 28L)
      val expected = Seq("абвгд" -> 1L, "еёжзи" -> 2L, "йклмн" -> 3L,
        "опрст" -> 4L, "уфхцч" -> 5L, "шщъыь" -> 6L, "эюя" -> 7L)
      expected.foreach { case (item, est) =>
        assert(utf8.estimate(item) === est, s"utf8 estimate($item)")
      }
      // and the replay into the engine's own sketch preserves estimates
      val sk = utf8.toFreqSketch
      expected.foreach { case (item, est) => assert(sk.estimate(item) === est) }

      val ascii = DataSketchesFreq.readStrings(
        Files.readAllBytes(Paths.get(dir, s"frequent_string_ascii_$lang.sk")))
      assert(ascii.streamWeight === 10L)
      assert(ascii.estimate("aaaaaaaaaaaaaaaaaaaaaaaaaaaaa") === 1L)
      assert(ascii.estimate("ddddddddddddddddddddddddddddd") === 4L)
    }
  }
}
