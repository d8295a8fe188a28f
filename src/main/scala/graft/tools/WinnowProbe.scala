package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: winnow-fingerprint bucket-size distribution + all-pairs join
  * cost proxy at different frequency caps (feeds the q09 tier design). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"))
      val n = docs.count()
      val fp = docs.select(col("conv_id"),
        explode(graft.functions.winnow_fingerprints(col("doc"), 8, 16)).as("band_key"))
      val fpn = fp.count()
      val buckets = fp.groupBy("band_key").count()
      val nb = buckets.count()
      println(s"== $sf: docs=$n fp_rows=$fpn distinct_buckets=$nb avg_fp_per_doc=${fpn / n}")
      buckets.select(
        when(col("count") === 1, "a:1").when(col("count") <= 4, "b:2-4")
          .when(col("count") <= 16, "c:5-16").when(col("count") <= 64, "d:17-64")
          .when(col("count") <= 256, "e:65-256").when(col("count") <= 1024, "f:257-1024")
          .otherwise("g:>1024").as("bsz"))
        .groupBy("bsz").count().orderBy("bsz").show(20, false)
      println("top-10 bucket sizes:")
      buckets.orderBy(col("count").desc).show(10, false)
      for (cap <- Seq(64, 250, 256, 4096)) {
        val cost = buckets.where(col("count") <= cap)
          .agg(coalesce(sum(col("count") * col("count")), lit(0L))).head().getLong(0)
        println(s"  cap=$cap sum(m^2)=$cost")
      }
    }
    spark.stop()
  }
}
