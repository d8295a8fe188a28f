package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.DedupConfig
import graft.pipeline.{DedupPipeline, Transcripts}

/** Diagnostic: prints formatted physical plans for the pipeline stages and
  * times expression-vs-UDF signature computation. Run:
  *   sbt "runMain graft.tools.PlanCheck [nConvs]"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()

    val turns = Transcripts.generate(nConvs)
    val tdf = Transcripts.asDataFrame(spark, turns, 16).cache()
    tdf.count()

    val docs = DedupPipeline.buildDocs(tdf).cache()
    docs.count()

    println("=== docs plan ===")
    DedupPipeline.buildDocs(tdf).explain("formatted")

    println("=== signatures (expression) plan ===")
    DedupPipeline.signatures(docs, cfg).explain("formatted")

    println("=== candidates plan ===")
    val sigs = DedupPipeline.signatures(docs, cfg)
    DedupPipeline.candidatePairs(DedupPipeline.bands(sigs, cfg), cfg).explain("formatted")

    println("=== verify plan ===")
    val cand = DedupPipeline.candidatePairs(DedupPipeline.bands(sigs, cfg), cfg)
    DedupPipeline.verifyPairs(cand, docs, cfg).explain("formatted")

    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // A/B: expression vs UDF signature computation (3 runs each, warm cache)
    for (i <- 1 to 3) {
      time(s"signatures expr  #$i") {
        DedupPipeline.signatures(docs, cfg).select(bit_xor(col("simhash"))).head()
      }
      time(s"signatures udf   #$i") {
        DedupPipeline.signaturesUdf(docs, cfg).select(bit_xor(col("simhash"))).head()
      }
    }
    spark.stop()
  }
}
