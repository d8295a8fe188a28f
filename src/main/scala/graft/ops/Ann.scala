package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{cosine_sim, srp_keys}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB design requires:
  *  - `bruteForceTopK`: exact cosine top-k of a SMALL query set against the
  *    corpus — queries are broadcast, the corpus is scanned once, per-row
  *    score via the native CosineSim kernel (codegen'd tight loop, not
  *    interpreted higher-order lambdas), top-k via window.
  *  - `lshTopK`: scale path — sign-random-projection buckets both sides;
  *    candidates join only within a bucket, so each query touches a tiny
  *    corpus slice. Recall tunable via (nPlanes, nTables).
  */
object Ann {

  def cosine(a: Column, b: Column): Column = cosine_sim(a, b)

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

  /** LSH-bucketed ANN: both sides bucketed by nTables SRP keys; exact cosine
    * within buckets; global top-k per query. Recall < 1; the bucket join is
    * the scale win (no full cross product). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 12, nTables: Int = 4, seed: Long = 9001L): DataFrame = {
    def bucketed(df: DataFrame, idName: String, embName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(embName),
        explode(srp_keys(col("embedding"), nPlanes, nTables, seed)).as("bucket"))
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
    * found via LSH buckets (scale path for embedding-level dedup).
    * The cosine gate runs BEFORE dropDuplicates so the dedup shuffle only
    * carries survivors.
    *
    * Scale guard: the within-bucket join is all-pairs, so buckets larger
    * than `maxBucketSize` (hot SRP cells — near-constant embedding regions)
    * are excluded from pair emission, bounding the worst bucket at
    * O(maxBucketSize²) instead of O((N/2^nPlanes)²). Size nPlanes with the
    * corpus (2^nPlanes ≳ N/maxBucketSize keeps the cap from engaging on
    * uniform data) and count exclusions with `oversizedSrpBuckets` — no
    * silent caps. */
  def nearDupPairs(embeddings: DataFrame, tau: Double,
                   nPlanes: Int = 10, nTables: Int = 6, seed: Long = 9001L,
                   maxBucketSize: Int = 2000): DataFrame = {
    val b = embeddings.select(col("vec_id"), col("embedding"),
      explode(srp_keys(col("embedding"), nPlanes, nTables, seed)).as("bucket"))
    val sized = b.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("bucket"))))
    val kept = sized.where(col("bucket_n") <= maxBucketSize)
    kept.as("l").join(kept.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        cosine(col("l.embedding"), col("r.embedding")).as("score"))
      .where(col("score") >= tau)
      .select(col("a"), col("b"), round(col("score"), 6).as("score"))
      .dropDuplicates("a", "b")
  }

  /** SRP buckets over `maxBucketSize` that nearDupPairs excluded — surface
    * these as a metric next to the pair output. */
  def oversizedSrpBuckets(embeddings: DataFrame,
                          nPlanes: Int = 10, nTables: Int = 6, seed: Long = 9001L,
                          maxBucketSize: Int = 2000): DataFrame =
    embeddings
      .select(explode(srp_keys(col("embedding"), nPlanes, nTables, seed)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucketSize)
}
