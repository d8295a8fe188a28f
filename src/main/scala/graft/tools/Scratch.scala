package graft.tools
import org.apache.spark.sql.functions._
import graft.core._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = DedupPipelineDocs.docs(spark, "/tmp/graft-bench-corpus-200000", 3000)
    println(s"SCRATCH ndocs=${docs.length} avgLen=${docs.map(_.length).sum / docs.length}")
    val cfg = DedupConfig()
    // pairs: consecutive docs (mostly non-dup, like candidate pairs)
    val pairs = docs.sliding(2, 2).map(a => (a(0), a(1))).toArray
    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      val per = (System.nanoTime() - t0) / 1e6 / reps / pairs.length
      println(f"SCRATCH $label%-22s ${per}%8.4f ms/pair")
    }
    time("shinglesOf x2", 3) {
      pairs.foreach { case (a, b) =>
        Shingles.shinglesOf(a, cfg.shingleK, cfg.seed)
        Shingles.shinglesOf(b, cfg.shingleK, cfg.seed)
      }
    }
    time("pair_verify kernel", 3) {
      pairs.foreach { case (a, b) =>
        val sa = Shingles.shinglesOf(a, cfg.shingleK, cfg.seed)
        val sb = Shingles.shinglesOf(b, cfg.shingleK, cfg.seed)
        Shingles.jaccardSorted(sa, sb)
        SimHash64.fingerprint(sa); SimHash64.fingerprint(sb)
      }
    }
    time("lcs", 3) {
      pairs.foreach { case (a, b) => Lcs.lcsLength(a, b) }
    }
    spark.stop()
  }
}
object DedupPipelineDocs {
  def docs(spark: org.apache.spark.sql.SparkSession, dir: String, n: Int): Array[String] = {
    val df = spark.read.parquet(dir)
    graft.pipeline.DedupPipeline.buildDocs(df.where(col("conv_id") <= f"conv-${n}%06d"))
      .select("doc").collect().map(_.getString(0))
  }
}
