package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._
import graft.pipeline.SparkTestSession

class SketchAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hll_sketch_agg: distributed estimate within bounds vs exact") {
    val df = spark.range(0, 200000, 1, 8)
      .select((col("id") % 50000).as("v")) // 50k distinct
    val row = df.agg(
      hll_estimate(hll_agg(col("v"), 12)).as("est"),
      countDistinct(col("v")).as("exact")).head()
    val est = row.getDouble(0); val exact = row.getLong(1)
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
  }

  test("hll partial/merge path: grouped + re-union equals global") {
    val df = spark.range(0, 100000, 1, 8)
      .select((col("id") % 10).as("g"), col("id").as("v"))
    val perGroup = df.groupBy(col("g")).agg(hll_agg(col("v"), 12).as("sk"))
    val unioned = perGroup.agg(hll_estimate(hll_merge_agg(col("sk"), 12)).as("est")).head().getDouble(0)
    assert(math.abs(unioned - 100000) / 100000.0 < 0.05, s"unioned=$unioned")
    // bounds sandwich the estimate
    val b = perGroup.select(hll_bounds(col("sk"), 2).as("b"))
      .select("b.lb", "b.estimate", "b.ub").head()
    assert(b.getDouble(0) <= b.getDouble(1) && b.getDouble(1) <= b.getDouble(2))
  }

  test("hll on strings") {
    val df = (1 to 5000).map(i => s"user-${i % 1000}").toDF("s")
    val est = df.agg(hll_estimate(hll_agg(col("s"), 12))).head().getDouble(0)
    assert(math.abs(est - 1000) / 1000.0 < 0.05, s"est=$est")
  }

  test("kll_sketch_agg: quantiles/rank/cdf/partition boundaries") {
    val df = spark.range(1, 100001, 1, 8).select(col("id").cast("double").as("v"))
    val sk = df.agg(kll_sketch_agg(col("v"), 200).as("sk"))
    val row = sk.select(
      kll_quantiles(col("sk"), array(lit(0.1), lit(0.5), lit(0.9))).as("q"),
      kll_rank(col("sk"), lit(50000.0)).as("r"),
      kll_cdf(col("sk"), array(lit(25000.0), lit(75000.0))).as("cdf"),
      kll_partition_boundaries(col("sk"), 4).as("pb")).head()
    val q = row.getSeq[Double](0)
    assert(math.abs(q(0) - 10000) < 2000 && math.abs(q(1) - 50000) < 3000 &&
      math.abs(q(2) - 90000) < 3000, s"q=$q")
    assert(math.abs(row.getDouble(1) - 0.5) < 0.02)
    val cdf = row.getSeq[Double](2)
    assert(math.abs(cdf(0) - 0.25) < 0.02 && math.abs(cdf(1) - 0.75) < 0.02 && cdf(2) === 1.0)
    val pb = row.getSeq[Double](3)
    assert(pb.length === 5 && pb.head === 1.0 && pb.last === 100000.0)
  }

  test("freq_sketch_agg: heavy hitters across partitions") {
    val noise = spark.range(0, 20000, 1, 8).select(concat(lit("n"), col("id")).as("v"))
    val heavy = spark.range(0, 5000, 1, 8).select(
      when(col("id") % 2 === 0, lit("HOT-A")).otherwise(lit("HOT-B")).as("v"))
    val df = noise.unionAll(heavy)
    val items = df.agg(freq_top_items(freq_sketch_agg(col("v"), 8), false).as("t"))
      .select(explode(col("t")).as("r")).select("r.item", "r.estimate", "r.lb", "r.ub")
      .collect()
    val names = items.map(_.getString(0)).take(2).toSet
    assert(names === Set("HOT-A", "HOT-B"), s"got ${items.take(5).mkString(",")}")
    val hotA = items.find(_.getString(0) == "HOT-A").get
    assert(hotA.getLong(2) <= 2500 && 2500 <= hotA.getLong(3)) // lb <= true <= ub
  }

  test("sketches in SQL via DataFrame column ops compose with groupBy") {
    val df = spark.range(0, 30000, 1, 4).select(
      (col("id") % 3).as("g"), (col("id") % 5000).cast("double").as("v"))
    val out = df.groupBy(col("g"))
      .agg(kll_sketch_agg(col("v")).as("sk"), hll_agg(col("v")).as("h"))
      .select(col("g"),
        kll_quantiles(col("sk"), array(lit(0.5))).getItem(0).as("median"),
        hll_estimate(col("h")).as("nd"))
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - 2500.0) < 200, s"median ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - 5000.0) / 5000.0 < 0.05)
    }
  }
}
