package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbour — the second scale
  * path next to SRP-LSH (`Ann.lshTopK`): a small deterministic k-means
  * codebook partitions the corpus into cells; a query probes only its
  * `nProbe` nearest cells, so the scan touches ~nProbe/k of the corpus.
  *
  * The codebook is trained driver-side on a deterministic sample (k ≤ a
  * few hundred centroids × small dim — kilobytes) and broadcast as
  * literals into codegen'd cosine expressions; the corpus-side cell
  * assignment is one map-side projection, making the index a cheap,
  * persistable column. No RDDs, no MLlib.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def toVec(row: org.apache.spark.sql.Row): Array[Double] =
    // float or double element types both appear in embedding corpora
    // (parquet float32 vs computed double columns) — handle both, like
    // CosineSim does
    row.getSeq[Any](0).map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(
        s"embedding element must be float or double, got ${other.getClass.getName}")
    }.toArray

  /** Deterministic Lloyd's k-means on a sample: init = first k vectors in
    * xxhash64(vec_id) order (seeded spread), fixed iteration count, cosine
    * metric (vectors L2-normalized internally). */
  def fit(corpus: DataFrame, k: Int = 16, iters: Int = 5,
          sampleSize: Int = 4096, seed: Long = 9001L): Model = {
    val sample = corpus
      .select(col("embedding"), xxhash64(col("vec_id"), lit(seed)).as("h"))
      .orderBy(col("h"))
      .limit(sampleSize)
      .select("embedding")
      .collect()
      .map(toVec)
      .map(normalize)
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")

    var centroids = sample.take(k).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else normalize(sums(c).map(_ / counts(c)))
      }
      it += 1
    }
    Model(centroids)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.MinValue
    var c = 0
    while (c < cs.length) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * cs(c)(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Column of cosine similarities to every centroid. */
  private def centroidSims(emb: Column, model: Model): Seq[Column] =
    model.centroids.toSeq.map(c => cosine_sim(emb, typedLit(c.toSeq)))

  /** Cell id (argmax centroid cosine) as a map-side projection. */
  def cellId(emb: Column, model: Model): Column = {
    val sims = centroidSims(emb, model)
    val best = sims.zipWithIndex
      .map { case (s, i) => struct(s.as("s"), lit(i).as("i")) }
    greatest(best: _*).getField("i")
  }

  /** Array of the nProbe closest cell ids for a query embedding. */
  def probeCells(emb: Column, model: Model, nProbe: Int): Column = {
    val scored = array(centroidSims(emb, model).zipWithIndex
      .map { case (s, i) => struct(s.as("s"), lit(i).as("i")) }: _*)
    slice(transform(array_sort(scored,
      (a, b) => when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1).otherwise(0)),
      x => x.getField("i")), 1, nProbe)
  }

  /** IVF top-k: probe the nProbe nearest cells per query, exact cosine
    * within them, global top-k. Corpus side shuffles by cell id only. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model,
           k: Int, nProbe: Int = 4): DataFrame = {
    val cells = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      cellId(col("embedding"), model).as("cell"))
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        explode(probeCells(col("embedding"), model, nProbe)).as("cell"))
    val cand = cells.join(probes, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine_sim(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }
}
