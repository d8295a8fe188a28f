package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.pipeline.DedupPipeline

/** CC at star-path scale: a synthetic edge set ABOVE the driver-UF gate
  * (so large-star/small-star is the real path, as it is at 100 TB),
  * timed with and without the local-contraction pre-pass, global round
  * counts recorded. The graph mixes long chains (worst case for round
  * count: diameter = chain length) with random cross links (the dup-
  * cluster shape verified pairs actually produce).
  *
  *   args: <cores> [nChains] [chainLen] [crossLinks] [shufflePartitions]
  *   prints: CC_SCALE=edges:<n>,contracted:<s>:<rounds>,plain:<s>:<rounds>,match:<bool>
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nChains = if (args.length > 1) args(1).toInt else 40000
    val chainLen = if (args.length > 2) args(2).toInt else 80
    val crossLinks = if (args.length > 3) args(3).toInt else 200000
    val parts = if (args.length > 4) args(4) else "256"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-cc-scale-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = nChains.toLong * chainLen
    // chain edges: node i -> i+1 within each chain (generated distributed)
    val chains = spark.range(n)
      .where((col("id") % chainLen) =!= (chainLen - 1))
      .select(
        format_string("n%010d", col("id")).as("a"),
        format_string("n%010d", col("id") + 1).as("b"))
    // deterministic pseudo-random cross links between chains
    val cross = spark.range(crossLinks.toLong)
      .select(
        format_string("n%010d", abs(xxhash64(col("id"))) % n).as("a"),
        format_string("n%010d", abs(xxhash64(col("id") + 7777777L)) % n).as("b"))
      .where(col("a") =!= col("b"))
    val edges = chains.unionByName(cross)
      .repartition(parts.toInt)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    val nodes = spark.range(n).select(format_string("n%010d", col("id")).as("conv_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    def run(contraction: Option[Boolean]): (Double, DataFrame) = {
      val t0 = System.nanoTime()
      val asg = DedupPipeline.connectedComponents(
          edges.select(col("a"), col("b")), nodes,
          driverMaxEdges = 0L, localContraction = contraction)
        .persist(StorageLevel.MEMORY_AND_DISK)
      asg.count()
      ((System.nanoTime() - t0) / 1e9, asg)
    }
    // JIT all three shapes on a slice
    val tiny = edges.limit(1000).localCheckpoint(true)
    for (m <- Seq(Some(true), Some(false), None))
      DedupPipeline.connectedComponents(tiny, nodes.limit(100), driverMaxEdges = 0L,
        localContraction = m).count()

    // round counts come from the [cc] profile lines (SPARK_GRAFT_CC_PROFILE)
    val (tContracted, a) = run(Some(true))
    val (tPlain, b) = run(Some(false))
    // auto: on this hash-scattered graph the yield probe must skip the
    // pre-pass, so tAuto/tPlain - 1 IS the probe overhead
    val (tAuto, c) = run(None)
    val mismatch = a.withColumnRenamed("cluster_id", "ca")
      .join(b.withColumnRenamed("cluster_id", "cb"), Seq("conv_id"))
      .join(c.withColumnRenamed("cluster_id", "cc"), Seq("conv_id"))
      .where(col("ca") =!= col("cb") || col("ca") =!= col("cc")).count()
    println(f"CC_SCALE=edges:$nEdges,contracted:$tContracted%.3f,plain:$tPlain%.3f," +
      f"auto:$tAuto%.3f,auto_overhead:${tAuto / tPlain - 1.0}%.3f,match:${mismatch == 0L}")
    spark.stop()
  }
}
