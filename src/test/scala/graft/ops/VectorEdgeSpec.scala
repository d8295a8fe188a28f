package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestSession

class VectorEdgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cosine_sim raises on dimension mismatch instead of silently truncating") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.cosine_sim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("IVF handles array<double> embedding corpora, not just array<float>") {
    import spark.implicits._
    val rnd = new java.util.Random(5)
    val emb = (0L until 64L).map(i => (i, Array.fill(8)(rnd.nextDouble())))
      .toDF("vec_id", "embedding")
    val model = Ivf.fit(emb, k = 4, iters = 3)
    val out = Ivf.topK(emb, emb.where(col("vec_id") < 3), model, k = 2, nProbe = 2)
    assert(out.count() === 6L)
  }
}
