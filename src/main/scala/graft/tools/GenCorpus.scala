package graft.tools
import org.apache.spark.sql.SparkSession

/** Materialize the distributed bench corpus: GenCorpus <nConvs> [seed]
  * [bucketed]. With `bucketed`, writes the production conv_id-bucketed
  * layout (BucketedCorpus) to <dir>-bucketed instead of scattered parquet. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    // seed is the first NUMERIC optional arg, so `GenCorpus 1000 bucketed`
    // works without an explicit seed (ADVICE r4)
    val seed = args.drop(1).find(_.matches("-?\\d+")).map(_.toLong).getOrElse(42L)
    val bucketed = args.contains("bucketed")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.warehouse.dir", "/tmp/graft-gen-wh")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"/tmp/graft-bench-corpusd-$n"
    val df = graft.pipeline.Transcripts.generateDf(spark, n, seed)
    val dir = if (bucketed) {
      val d = s"$base-bucketed"
      // reuse the scattered corpus when it already exists (same content)
      val src = if (new java.io.File(s"$base/_SUCCESS").exists())
        spark.read.parquet(base) else df
      graft.pipeline.BucketedCorpus.write(src, d)
      d
    } else {
      df.write.mode("overwrite").parquet(base)
      base
    }
    println(s"GEN_ROWS=${graft.pipeline.BucketedCorpus.readAuto(spark, dir).count()} dir=$dir")
    spark.stop()
  }
}
