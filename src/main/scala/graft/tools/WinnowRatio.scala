package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.DedupConfig
import graft.pipeline.DedupPipeline

/** Diagnostic: fingerprint-overlap ratio distribution of candidate pairs
  * vs the verified-true subset (calibrates q09's prefilter threshold). */
object WinnowRatio {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
          length(col("text")).cast("long").as("doc_len"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()
      val cap = math.max(64L, n / 20).toInt
      println(s"== $dir docs=$n avg_len=" + docs.agg(avg("doc_len")).head().getDouble(0).toInt)
      val fp = docs.select(col("conv_id"),
        explode(graft.functions.winnow_fingerprints(col("doc"), 8, 16)).as("band_key"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sized = fp.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("band_key"))))
      val kept = sized.where(col("bucket_n") <= cap)
      val nFp = kept.groupBy(col("conv_id")).agg(count(lit(1)).as("n_fp"))
      val withRatio = kept.as("l").join(kept.as("r"),
          col("l.band_key") === col("r.band_key") && col("l.conv_id") < col("r.conv_id"))
        .groupBy(col("l.conv_id").as("a"), col("r.conv_id").as("b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(nFp.select(col("conv_id").as("a"), col("n_fp").as("nfa")), Seq("a"))
        .join(nFp.select(col("conv_id").as("b"), col("n_fp").as("nfb")), Seq("b"))
        .withColumn("ratio", col("n_shared") / least(col("nfa"), col("nfb")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val verified = DedupPipeline.verifyPairs(
        withRatio.where(col("ratio") >= 0.05).select(col("a"), col("b")), docs, cfg)
        .select(col("a"), col("b")).withColumn("is_true", lit(1))
      val j = withRatio.join(verified, Seq("a", "b"), "left")
      println("true-pair ratio stats:")
      j.where(col("is_true") === 1).agg(count(lit(1)), min("ratio"), expr("percentile(ratio, 0.05)"), avg("ratio")).show(false)
      println("candidate ratio histogram:")
      j.select(floor(col("ratio") * 10).as("decile"), coalesce(col("is_true"), lit(0)).as("t"))
        .groupBy("decile").agg(count(lit(1)).as("n"), sum("t").as("n_true")).orderBy("decile").show(20, false)
    }
    spark.stop()
  }
}
