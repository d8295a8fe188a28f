package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** K2 generic-item KLL — mirrors the reference's string instantiation
  * tests (kll/items_sketch_test.go:31-135): empty/one/many behavior,
  * rank error vs exact, merge, serde round-trip, and the StringType
  * Catalyst aggregate. */
class KllItemsSpec extends AnyFunSuite {
  lazy val spark = graft.pipeline.SparkTestSession.spark

  private def fixedLen(i: Int, len: Int): String = {
    val s = i.toString
    ("0" * math.max(0, len - s.length)) + s
  }

  test("empty and single-item behavior") {
    val sk = new KllItemsSketch[String](200)
    assert(sk.isEmpty)
    sk.update("only")
    assert(sk.n === 1L)
    assert(sk.minItem.contains("only") && sk.maxItem.contains("only"))
    assert(sk.quantile(0.5) === "only")
    assert(!sk.isEstimationMode)
  }

  test("10k zero-padded strings: quantiles within rank error, min/max exact") {
    val n = 10000
    val sk = new KllItemsSketch[String](200)
    (1 to n).foreach(i => sk.update(fixedLen(i, 5)))
    assert(sk.n === n.toLong)
    assert(sk.isEstimationMode)
    assert(sk.minItem.contains(fixedLen(1, 5)))
    assert(sk.maxItem.contains(fixedLen(n, 5)))
    val eps = sk.normalizedRankError(pmf = false) * 2.5
    for (r <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val q = sk.quantile(r).toInt
      assert(math.abs(q / n.toDouble - r) <= eps, s"rank $r -> $q")
    }
    // rank() is the inverse within error
    assert(math.abs(sk.rank(fixedLen(n / 2, 5)) - 0.5) <= eps)
  }

  test("merge matches single-sketch behavior within rank error; serde round-trips") {
    val n = 20000
    val a = new KllItemsSketch[String](200)
    val b = new KllItemsSketch[String](200)
    (1 to n).foreach { i =>
      if (i % 2 == 0) a.update(fixedLen(i, 5)) else b.update(fixedLen(i, 5))
    }
    a.merge(b)
    assert(a.n === n.toLong)
    val eps = a.normalizedRankError(pmf = false) * 3
    for (r <- Seq(0.25, 0.5, 0.75)) {
      assert(math.abs(a.quantile(r).toInt / n.toDouble - r) <= eps)
    }
    val rt = KllItemsSketch.deserialize[String](a.serialize())
    assert(rt.n === a.n)
    assert(rt.quantile(0.5) === a.quantile(0.5))
    assert(rt.minItem === a.minItem && rt.maxItem === a.maxItem)
  }

  test("kll_string_agg accepts StringType end-to-end in Spark") {
    import spark.implicits._
    val df = (1 to 5000).map(i => fixedLen(i, 4)).toDF("s")
    val out = df.agg(graft.functions.kll_string_quantiles(
      graft.functions.kll_string_agg(col("s"), 200),
      array(lit(0.5))).as("q")).head()
    val med = out.getSeq[String](0).head.toInt
    assert(math.abs(med - 2500) <= 2500 * 0.05, s"median $med")
  }

  test("cross-language golden import: java kll_string image replays into the generic sketch") {
    val f = java.nio.file.Paths.get(
      "/root/reference/serialization_test_data/java_generated_files/kll_string_n10000_java.sk")
    assume(java.nio.file.Files.exists(f))
    val img = graft.sketch.interop.DataSketchesKll.readString(java.nio.file.Files.readAllBytes(f))
    val sk = KllItemsSketch.fromDataSketchesString(img)
    assert(sk.n === 10000L)
    assert(sk.minItem === img.minItem && sk.maxItem === img.maxItem)
    val med = sk.quantile(0.5).trim.toInt
    assert(math.abs(med - 5000) <= 10000 * 0.02, s"imported median $med")
  }
}
