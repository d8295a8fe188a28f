package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB design requires:
  *  - `bruteForceTopK`: exact cosine top-k of a SMALL query set against the
  *    corpus — queries are broadcast, the corpus is scanned once, per-row
  *    score via zip_with/aggregate (codegen'd), top-k via window. Linear in
  *    corpus size, no shuffle of the corpus itself.
  *  - `lshTopK`: scale path — random-hyperplane LSH buckets both sides;
  *    candidates only join within a bucket, so the corpus-side shuffle is
  *    by bucket key and each query touches a tiny corpus slice. Recall is
  *    tunable via (nPlanes, nTables).
  */
object Ann {

  /** Cosine similarity of two array<float>/array<double> columns, computed
    * in double. NaN-safe: zero vectors score 0. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact top-k neighbors for each row of `queries` (vec_id, embedding)
    * against `corpus` (vec_id, embedding). Self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Deterministic random hyperplanes: dim × nPlanes signs derived from
    * murmur mix of (seed, plane, coordinate). */
  private def planeSign(plane: Int, coord: Column, seed: Long): Column =
    when(pmod(xxhash64(lit(seed), lit(plane), coord), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-random-projection bucket key for one table. */
  def srpKey(emb: Column, nPlanes: Int, table: Int, seed: Long): Column = {
    // bit p = sign( sum_i emb[i] * sign_hash(table, p, i) )
    val bits = (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (v, i) => v.cast("double") * planeSign(table * 1000 + p, i, seed)),
        lit(0.0), (acc, v) => acc + v)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _) + lit(table.toLong) * lit(1L << nPlanes)
  }

  /** LSH-bucketed ANN: both sides bucketed by nTables SRP keys; exact cosine
    * within buckets; global top-k per query. Recall < 1; the bucket join is
    * the scale win (no full cross product). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 12, nTables: Int = 4, seed: Long = 9001L): DataFrame = {
    def bucketed(df: DataFrame, idName: String, embName: String): DataFrame = {
      val keys = array((0 until nTables).map(t =>
        srpKey(col("embedding"), nPlanes, t, seed)): _*)
      df.select(col("vec_id").as(idName), col("embedding").as(embName),
        explode(keys).as("bucket"))
    }
    val c = bucketed(corpus, "neighbor_id", "c_emb")
    val q = bucketed(queries, "query_id", "q_emb")
    val cand = c.join(q, Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"), col("c_emb"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("score", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >= tau,
    * found via LSH buckets (scale path for embedding-level dedup). */
  def nearDupPairs(embeddings: DataFrame, tau: Double,
                   nPlanes: Int = 10, nTables: Int = 6, seed: Long = 9001L): DataFrame = {
    val keys = array((0 until nTables).map(t =>
      srpKey(col("embedding"), nPlanes, t, seed)): _*)
    val b = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", explode(keys))
    val pairs = b.as("l").join(b.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        col("l.embedding").as("ea"), col("r.embedding").as("eb"))
      .dropDuplicates("a", "b")
      .withColumn("score", cosine(col("ea"), col("eb")))
      .where(col("score") >= tau)
    pairs.select(col("a"), col("b"), round(col("score"), 6).as("score"))
  }
}
