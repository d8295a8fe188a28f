package graft.sketch.interop

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestSession
import java.nio.file.{Files, Paths}

class DsHllExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ds_hll_estimate column function reads Java/C++ images in a DataFrame") {
    import spark.implicits._
    val dir = "/root/reference/serialization_test_data/java_generated_files"
    assume(Files.isDirectory(Paths.get(dir)))
    val rows = Seq(1000, 10000, 100000).map { n =>
      (n.toLong, Files.readAllBytes(Paths.get(dir, s"hll8_n${n}_java.sk")))
    }
    val df = rows.toDF("true_n", "image")
      .select(col("true_n"), graft.functions.ds_hll_estimate(col("image")).as("est"))
    df.collect().foreach { r =>
      val n = r.getLong(0).toDouble
      assert(math.abs(r.getDouble(1) - n) <= 0.02 * n)
    }
  }
}
