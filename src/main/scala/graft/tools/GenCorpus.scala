package graft.tools
import org.apache.spark.sql.SparkSession

/** Materialize the distributed bench corpus: GenCorpus <nConvs> [seed]. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val seed = if (args.length > 1) args(1).toLong else 42L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/tmp/graft-bench-corpusd-$n"
    graft.pipeline.Transcripts.generateDf(spark, n, seed)
      .write.mode("overwrite").parquet(dir)
    println(s"GEN_ROWS=${spark.read.parquet(dir).count()} dir=$dir")
    spark.stop()
  }
}
