package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Decompose the docs-stage wall into its components at one core count:
  *   scan      — parquet scan + UTF8 materialization only (sum(length))
  *   agg       — buildDocs hash-agg, result reduced to sum(doc_len), no persist
  *   persist   — buildDocs + MEMORY_AND_DISK persist + count (the run() shape)
  *   sortagg   — buildDocs with ObjectHashAggregate disabled (SortAggregate
  *               over the bucket-sorted scan: no hash table, streaming groups)
  *   stream    — mapPartitions streaming reconstruction exploiting the
  *               bucketed layout's (conv_id, turn_idx) within-file order:
  *               one pass, no hash map, no array_sort (order VERIFIED per
  *               partition; falls over to a local sort only if violated)
  *   args: <cores> <corpusDir> <mode|all> [repeats]
  */
object DocsProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val mode = if (args.length > 2) args(2) else "all"
    val repeats = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-docs-probe-$cores")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // the production stream path plans with bucket-aligned scans
      // (BucketedCorpus.readDocs pins this); measure the same plan
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.pipeline.BucketedCorpus.readAuto(spark, corpusDir)
    df.count() // warm page cache

    def best(f: => Unit): Double = {
      f // JIT
      (1 to repeats).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    def run(name: String)(f: => Unit): Unit =
      if (mode == "all" || mode == name)
        println(f"DOCS_PROBE $name%-8s ${best(f)}%8.3f s")

    run("scan") {
      df.select(sum(length(col("text")))).collect()
    }
    run("agg") {
      graft.pipeline.DedupPipeline.buildDocs(df)
        .select(sum(col("doc_len")), sum(length(col("doc")))).collect()
    }
    run("persist") {
      val docs = graft.pipeline.DedupPipeline.buildDocs(df)
        .persist(StorageLevel.MEMORY_AND_DISK)
      docs.count()
      docs.unpersist(blocking = true)
    }
    run("sortagg") {
      spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
      try graft.pipeline.DedupPipeline.buildDocs(df)
        .select(sum(col("doc_len")), sum(length(col("doc")))).collect()
      finally spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "true")
    }
    run("stream") {
      graft.pipeline.DedupPipeline.buildDocsSorted(df)
        .select(sum(col("doc_len")), sum(length(col("doc")))).collect()
    }
    run("streamp") {
      val docs = graft.pipeline.DedupPipeline.buildDocsSorted(df)
        .persist(StorageLevel.MEMORY_AND_DISK)
      docs.count()
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
