package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: cost of the id-uniqueness probe at one core count.
  *   ProbeCost <cores> <corpusDir>
  * Times (a) the production form — distinct() then count+count_distinct —
  * and (b) a fused single-agg form, each twice (cold/warm).
  */
object ProbeCost {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.pipeline.BucketedCorpus.readAuto(spark, corpusDir)
    df.count() // warm IO
    val rawIds = df.select(col("conv_id"))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (r <- 1 to 2) {
      time(s"distinct+agg#$r")(rawIds.distinct()
        .agg(count(lit(1)), count_distinct(xxhash64(col("conv_id")))).head())
      time(s"fused#$r")(rawIds
        .agg(count_distinct(col("conv_id")),
          count_distinct(xxhash64(col("conv_id")))).head())
    }
    spark.stop()
  }
}
