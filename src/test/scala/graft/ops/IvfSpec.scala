package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestSession

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // clustered synthetic embeddings: 8 well-separated centers + noise
  private lazy val emb = {
    val rnd = new java.util.Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 3)
    (0 until 800).map { i =>
      val c = centers(i % 8)
      val v = c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding").cache()
  }

  test("fit is deterministic; cells cover the corpus") {
    val m1 = Ivf.fit(emb, k = 8, iters = 5)
    val m2 = Ivf.fit(emb, k = 8, iters = 5)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
    val cells = emb.select(Ivf.cellId(col("embedding"), m1).as("c"))
      .groupBy("c").count().collect()
    assert(cells.map(_.getLong(1)).sum === 800)
    // well-separated data: most cells carry a real share
    assert(cells.length >= 6)
  }

  test("ivf top-k recall vs brute force on clustered data") {
    val model = Ivf.fit(emb, k = 8, iters = 5)
    val queries = emb.where(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(emb, queries, model, 5, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"ivf recall $recall")
    // and scores are genuine cosines (rank 1 close to 1.0 on clustered data)
    val top1 = Ivf.topK(emb, queries, model, 1, nProbe = 2)
      .select("score").collect().map(_.getDouble(0))
    assert(top1.forall(_ > 0.8))
  }
}
