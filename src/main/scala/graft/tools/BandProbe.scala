package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.DedupConfig
import graft.pipeline.DedupPipeline

/** Isolates the band-explode stage's 32-thread CPU inflation (BenchStages
  * stage 65: 56 -> 187 core-s from 8 to 32 threads while sibling stages
  * inflate 1.3x): times (a) the band-key compute alone (scan + transform +
  * explode + xor, no exchange) and (b) compute + exchange write, at one
  * width.  BandProbe <cores> <corpusDir>
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    val docs = graft.pipeline.BucketedCorpus.readDocs(spark, corpusDir)
      .withColumn("id", xxhash64(col("conv_id")))
    val sigs = docs.withColumn("sig",
        graft.functions.text_signature(col("doc"), cfg.shingleK, cfg.numHashes, cfg.seed))
      .select(col("id"), col("sig.minhash").as("minhash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sigs.count() // materialize cache outside the timed section
    val bands = DedupPipeline.bandsById(sigs, cfg)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[band] $label%-16s $s%6.2f s  (~${s * cores}%6.1f core-s)")
    }
    for (r <- 1 to 2) {
      time(s"compute#$r")(bands.agg(bit_xor(col("band_key"))).head())
      time(s"compute+xchg#$r")(bands.repartition(256, col("band_key"))
        .agg(bit_xor(col("band_key"))).head())
    }
    spark.stop()
  }
}
