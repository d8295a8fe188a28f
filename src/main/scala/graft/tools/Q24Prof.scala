package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.DedupConfig
import graft.pipeline.{CheckpointedDedup, DedupPipeline, ParquetTableIO}

/** Temporary phase profiler for q24 (checkpoint/resume proof query). */
object Q24Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q24prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm JIT with the plain pipeline
    t("warm q12")(graft.SparkEntry.queries("q12_transcripts_dedup_e2e")(spark, dir).count())
    spark.catalog.clearCache()

    val cfg = DedupConfig()
    val base = "/tmp/graft-q24prof"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(basePath)) fs.delete(basePath, true)
    val io = new ParquetTableIO(base)
    val turnsDf = graft.SparkEntry.docTranscripts(spark, dir)
    t("run1 full ckpt")(new CheckpointedDedup(io, cfg, "q24").run(turnsDf).count())
    val resumed = new CheckpointedDedup(io, cfg, "q24")
    val a2 = t("run2 resume")(resumed.run(turnsDf)
      .select(col("conv_id"), col("cluster_id").as("c_resumed"))
      .localCheckpoint(true))
    t("delete+metrics rewrite") {
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/q24/cluster_assignments"), true)
      val keptMetrics = io.read(spark, "q24/metrics")
        .where(col("stage") =!= "cluster_assignments")
        .localCheckpoint(true)
      io.write(keptMetrics, "q24/metrics")
    }
    val mid = new CheckpointedDedup(io, cfg, "q24")
    val a3 = t("run3 mid resume")(mid.run(turnsDf))
    t("final join") {
      a2.join(a3.select(col("conv_id"), col("cluster_id").as("c_direct")),
          Seq("conv_id"), "full_outer")
        .agg(count(lit(1)).as("n"),
          coalesce(bool_and(col("c_resumed") === col("c_direct")), lit(false)).as("m"))
        .count()
    }
    spark.stop()
  }
}
