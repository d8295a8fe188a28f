package graft.tools

import org.apache.spark.sql.SparkSession

/** Docs-stage-only timing probe: buildDocs over a corpus dir (bucketed or
  * scattered), best-of-N in one JVM.
  *   args: <cores> <corpusDir> <repeats> <shufflePartitions>
  *   prints: DOCS_ONCE_SECONDS=<best>
  */
object DocsOnce {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 2
    val parts = if (args.length > 3) args(3) else "256"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-docs-once-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT", "16m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.pipeline.BucketedCorpus.readAuto(spark, corpusDir)
    df.count() // warm page cache + JIT the scan
    graft.pipeline.DedupPipeline.buildDocs(df.limit(10000))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count() // JIT agg
    spark.sharedState.cacheManager.clearCache()
    val best = (1 to repeats).map { _ =>
      // persist + count mirrors run(): materializes every column (a bare
      // count() lets the optimizer prune the concat entirely)
      val t0 = System.nanoTime()
      val docs = graft.pipeline.DedupPipeline.buildDocs(df)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      sec
    }.min
    println(f"DOCS_ONCE_SECONDS=$best%.3f")
    spark.stop()
  }
}
