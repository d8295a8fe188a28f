package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel
import graft.core.DedupConfig
import graft.pipeline.DedupPipeline

/** A/B: windowed chainStar vs hash-agg array chainStar candidate
  * generation, on the bench corpus band stream.
  *   args: <cores> <corpusDir> <parts>
  */
object CandAB {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val parts = if (args.length > 2) args(2) else "256"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    val docs = DedupPipeline.buildDocs(spark.read.parquet(corpusDir))
    val sigs = DedupPipeline.signatures(docs, cfg)
      .select(col("conv_id"), col("minhash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = DedupPipeline.bands(sigs, cfg)
    sigs.count()
    def time(label: String)(f: => Long): Unit = {
      // warm + 2 timed repeats
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[candab] $label%-8s best=${ts.map(_._1).min}%6.2f s rows=${ts.head._2}")
    }
    time("window")(DedupPipeline.candidatePairs(bands, cfg).count())
    time("agg")(DedupPipeline.candidatePairsAgg(bands, cfg).count())
    // exactness: symmetric difference must be empty
    val w = DedupPipeline.candidatePairs(bands, cfg)
    val a = DedupPipeline.candidatePairsAgg(bands, cfg)
    val d1 = w.exceptAll(a).count(); val d2 = a.exceptAll(w).count()
    println(s"[candab] diff w-a=$d1 a-w=$d2")
    spark.stop()
  }
}
