package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sketch.{FreqSketch, KllSketch}
import graft.core.DedupConfig

/** Sketch-driven partitioning and skew planning — the reference families
  * doing the planner jobs SURVEY §2b assigns them:
  *  - K9 partition boundaries → deterministic range repartitioning (unlike
  *    repartitionByRange, which re-samples per run — a resume hazard);
  *  - F5 heavy hitters over band keys → salt-factor recommendation for hot
  *    LSH buckets (the boilerplate detector feeding DedupConfig.bandSalt).
  */
object SkewTools {

  /** One-pass KLL sketch of a numeric column → equal-weight boundaries. */
  def kllBoundaries(df: DataFrame, column: String, numParts: Int,
                    k: Int = KllSketch.DefaultK): Array[Double] = {
    val bytes = df.agg(kll_sketch_agg(col(column).cast("double"), k))
      .head().getAs[Array[Byte]](0)
    KllSketch.deserialize(bytes).partitionBoundaries(numParts)
  }

  /** Bucket id for a value under FIXED boundaries: #interior bounds ≤ v.
    * Buckets are contiguous value ranges of ~equal weight. */
  def rangeBucket(column: Column, bounds: Array[Double]): Column = {
    val interior = bounds.slice(1, bounds.length - 1)
    val v = column.cast("double")
    interior.foldLeft(lit(0)) { (acc, b) =>
      acc + when(v >= lit(b), 1).otherwise(0)
    }
  }

  /** Deterministic range repartitioning: bucket ids come from FIXED KLL
    * boundaries (computed once, storable in the metrics table), so a
    * resumed run reproduces the exact same row grouping — Spark's
    * repartitionByRange re-samples per run. Each bucket is a contiguous
    * ~equal-weight value range and lands whole in one partition (placement
    * is hash(bucket), like any shuffle). */
  def repartitionByKllRange(df: DataFrame, column: String, numParts: Int,
                            k: Int = KllSketch.DefaultK): DataFrame = {
    val bounds = kllBoundaries(df, column, numParts, k)
    df.withColumn("__range_bucket", rangeBucket(col(column), bounds))
      .repartition(numParts, col("__range_bucket"))
      .drop("__range_bucket")
  }

  final case class SaltAdvice(hotKeys: Seq[(String, Long)], recommendedSalt: Int)

  /** Heavy-hitter scan over LSH band keys: returns the hot buckets and the
    * salt factor that bounds them at `maxBucketSize` members. One pass,
    * fixed memory (the Misra-Gries sketch), mergeable across partitions. */
  def recommendSalt(bands: DataFrame, cfg: DedupConfig,
                    lgMaxMapSize: Int = 10): SaltAdvice = {
    val bytes = bands.agg(freq_sketch_agg(col("band_key"), lgMaxMapSize))
      .head().getAs[Array[Byte]](0)
    val sk = FreqSketch.deserialize(bytes, FreqSketch.StringSerde)
    // no-false-negatives: never miss a hot bucket (over-salting is cheap,
    // a missed hot bucket is a straggler task)
    val hot = sk.frequentItems(noFalsePositives = false, threshold = cfg.maxBucketSize.toLong)
      .map { case (item, est, _, _) => (item, est) }
    val maxEst = hot.headOption.map(_._2).getOrElse(0L)
    val salt = if (maxEst <= cfg.maxBucketSize) 1
      else math.min(64, math.ceil(maxEst.toDouble / cfg.maxBucketSize).toInt)
    SaltAdvice(hot, salt)
  }

  /** End-to-end skew-aware candidate generation: scan band keys once,
    * pick the salt factor, run chain+star with it. */
  def adaptiveCandidatePairs(bands: DataFrame, cfg: DedupConfig): DataFrame = {
    val advice = recommendSalt(bands, cfg)
    graft.pipeline.DedupPipeline.candidatePairs(bands, cfg.copy(bandSalt = advice.recommendedSalt))
  }
}
