package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The production transcript-table layout: bucketed by conv_id.
  *
  * The 10^12-turn corpus is stored CLUSTERED BY (conv_id) SORTED BY
  * (conv_id, turn_idx) — with Iceberg this is `bucket(N, conv_id)`
  * partitioning plus a sort order; here it is Spark's native parquet
  * bucketing (same hash family). Doc reconstruction (DedupPipeline
  * .buildDocs) then runs EXCHANGE-FREE: the bucketed scan satisfies the
  * groupBy(conv_id) distribution requirement, so the one full-corpus
  * shuffle the scattered layout pays — the pipeline's worst-scaling stage,
  * BENCH/BASELINE.md — disappears. Pinned by PlanContractSpec ("bucketed
  * transcripts reconstruct docs with NO shuffle").
  *
  * The table is declared EXTERNAL over a plain directory so any session
  * (including the bench's executor-sized child JVMs, which each have their
  * own in-memory catalog) can re-declare it over the same files: Spark
  * datasource bucketing carries the bucket id in the file NAME, so the
  * declaration is metadata-only and costs nothing.
  */
object BucketedCorpus {

  val DefaultBuckets = 256

  private def marker(dir: String) = new java.io.File(dir, "_graft_buckets")

  /** Deterministic per-path table name for the session catalog. */
  private def tableName(dir: String): String =
    "graft_corpus_b" + java.lang.Long.toHexString(
      graft.core.Murmur3x128.hashBytes64(dir.getBytes("UTF-8"), 9001L) & Long.MaxValue)

  /** Write `transcripts` as a conv_id-bucketed external table at `dir`.
    * The pre-repartition uses the SAME murmur3 hash family as the bucket
    * spec, so each write task holds exactly one bucket → one file per
    * bucket (which also lets Spark trust the SORTED BY metadata). */
  def write(transcripts: DataFrame, dir: String,
            buckets: Int = DefaultBuckets): Unit = {
    val spark = transcripts.sparkSession
    val tbl = tableName(dir)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    transcripts
      .repartition(buckets, col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .write
      .bucketBy(buckets, "conv_id")
      .sortBy("conv_id", "turn_idx")
      .option("path", dir)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(tbl)
    java.nio.file.Files.writeString(marker(dir).toPath, buckets.toString)
  }

  /** True if `dir` holds a bucketed corpus written by `write`. */
  def isBucketed(dir: String): Boolean = marker(dir).isFile

  /** Declare (if needed) and read the bucketed table at `dir` in this
    * session. Metadata-only: the files are not touched. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val buckets = java.nio.file.Files.readString(marker(dir).toPath).trim.toInt
    val tbl = tableName(dir)
    if (!spark.catalog.tableExists(tbl)) {
      spark.sql(
        s"""CREATE TABLE $tbl (
           |  conv_id STRING, turn_idx INT, role STRING,
           |  text STRING, tool STRING, ts TIMESTAMP)
           |USING parquet
           |CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx)
           |INTO $buckets BUCKETS
           |LOCATION '$dir'""".stripMargin)
    }
    spark.table(tbl)
  }

  /** Read `dir` through whichever layout it carries: bucketed (exchange-
    * free doc reconstruction) or scattered plain parquet. */
  def readAuto(spark: SparkSession, dir: String): DataFrame =
    if (isBucketed(dir)) read(spark, dir) else spark.read.parquet(dir)
}
