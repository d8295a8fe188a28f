package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Diagnostic: does the STREAMING docs path's scan (a bare projection over
  * the bucketed table — no aggregate, so no distribution requirement) keep
  * one-task-per-bucket alignment, or does Spark's
  * DisableUnnecessaryBucketedScan rule re-plan it as a regular splittable
  * file scan? The streaming reconstruction (DedupPipeline.buildDocsSorted)
  * is only correct when no bucket file is SPLIT mid-conversation; a split
  * piece is still (conv_id, turn_idx)-sorted, so the in-task monotonicity
  * assert cannot catch it — it must be guarded at the PLAN level.
  *
  * Usage: BucketScanProbe <dir?>  (defaults to a fresh 2k-conv corpus)
  */
object BucketScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("bucket-scan-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // force file splitting to be *possible* for even tiny corpora
      .config("spark.sql.files.maxPartitionBytes", 64 * 1024)
      .config("spark.sql.files.openCostInBytes", 0)
      .getOrCreate()
    try {
      val dir = if (args.nonEmpty) args(0) else {
        val d = "/tmp/graft_scanprobe_corpus"
        val t = graft.pipeline.Transcripts.generateDf(spark, 2000, 42L)
        graft.pipeline.BucketedCorpus.write(t, d, buckets = 8)
        d
      }
      val t = graft.pipeline.BucketedCorpus.read(spark, dir)

      def describe(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val scans = df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        val parts = df.rdd.getNumPartitions
        println(s"[scanprobe] $name: scans=${scans.size} " +
          s"bucketedScan=${scans.map(_.bucketedScan).mkString(",")} " +
          s"rddPartitions=$parts")
      }

      // the streaming path's shape: bare projection, no aggregate
      describe("projection", t.select("conv_id", "turn_idx", "ts", "text"))
      // same projection with the disable rule off: the readDocs guard window
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      spark.conf.set(key, "false")
      describe("projection-noauto", t.select("conv_id", "turn_idx", "ts", "text"))
      spark.conf.set(key, "true")
      // the groupBy path's shape: aggregate requires the distribution
      describe("groupBy", t.groupBy("conv_id").agg(count(lit(1)).as("n")))
      // what readDocs actually hands to buildDocsSorted
      val docs = graft.pipeline.BucketedCorpus.readDocs(spark, dir)
      println(s"[scanprobe] readDocs rows=${docs.count()} " +
        s"distinct=${docs.select("conv_id").distinct.count()}")
    } finally spark.stop()
  }
}
