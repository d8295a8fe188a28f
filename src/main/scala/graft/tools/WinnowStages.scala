package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.DedupConfig
import graft.pipeline.DedupPipeline

/** Diagnostic: per-stage wall-clock of the q09 winnow path (two-tier). */
object WinnowStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cfg = DedupConfig()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[wstage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
        length(col("text")).cast("long").as("doc_len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs count")(docs.count())

    val buckets = DedupPipeline.winnowBuckets(docs, 8, 16)
      .where(col("m") <= 4096)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("buckets")(println("  buckets=" + buckets.count()))
    val stream = DedupPipeline.winnowPairStream(buckets, 256, 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pair stream")(println("  instances=" + stream.count()))
    val grouped = stream.groupBy(col("a"), col("b"))
      .agg(sum(when(col("wt") === 1L, 1L).otherwise(0L)).as("t1"),
        sum(col("wt")).as("est"), max(col("wt")).as("mw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("groupBy pairs")(println("  pairs=" + grouped.count()))
    val cand = DedupPipeline.winnowCandidatePairs(docs, 8, 16, cfg, minFpOverlap = 0.6)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("full candidates")(println("  survivors=" + cand.count()))
    val v = DedupPipeline.verifyPairs(cand, docs, cfg)
    time("verify")(println("  verified=" + v.count()))
    spark.stop()
  }
}
