package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for q28 (streaming session docs vs batch). */
object Q28Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q28] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.streaming.StreamingDedup
    import org.apache.spark.sql.streaming.Trigger
    val base = s"/tmp/graft-q28prof"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(basePath)) fs.delete(basePath, true)
    val shared = t("sharedTranscriptsDir")(graft.SparkEntry.sharedTranscriptsDir(spark, dir))
    val in = spark.readStream
      .schema("conv_id STRING, turn_idx INT, ts TIMESTAMP, text STRING")
      .parquet(shared)
    val name = "q28prof"
    // mirror the query's scoped state-partition sizing (SparkEntry q28)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val q = try {
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_Q28_STATE_PARTS", "32"))
      StreamingDedup.sessionDocs(in, watermark = "1 minute", gap = "5 minutes")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    t("stream")(q.awaitTermination())
    q.recentProgress.foreach { p =>
      println(s"[q28] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durMs=${p.durationMs} stateOps=${p.stateOperators.toSeq.map(so =>
          (so.numRowsTotal, so.numRowsUpdated, so.commitTimeMs)).mkString(",")}")
    }
    val streamed = spark.table(name).where(col("conv_id") =!= "__sentinel__")
      .select(col("conv_id"), col("doc").as("doc_stream"))
    val batch = graft.pipeline.DedupPipeline.buildDocs(
        graft.SparkEntry.docTranscriptsCached(spark, dir))
      .select(col("conv_id"), col("doc").as("doc_batch"))
    val r = t("compare join")(
      streamed.join(batch, Seq("conv_id"), "full_outer")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(bool_and(col("doc_stream") === col("doc_batch")), lit(false))
            .as("streaming_equals_batch")).collect().toSeq)
    println(s"[q28] result=$r")
    spark.stop()
  }
}
