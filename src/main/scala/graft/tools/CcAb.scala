package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.pipeline.DedupPipeline

/** Connected-components A/B at bench scale (VERDICT r3 #4): time the
  * driver-side union-find against the distributed large-star/small-star
  * contraction on the SAME pre-materialized verified-pair set, and check
  * the assignments are identical. At 100 TB the distributed path IS the
  * path (driver-UF is gated at 2M edges); this records its cost next to
  * the driver-UF number instead of leaving it tested-but-untimed.
  * The edges/nodes parquet is written once by graft.Bench (one pipeline
  * execution) so both width legs time ONLY the CC stage.
  *
  *   args: <cores> <edgesDir> <nodesDir> [shufflePartitions]
  *   prints: CC_AB=edges:<n>,driver:<s>,star:<s>,match:<bool>
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val edgesDir = args(1)
    val nodesDir = args(2)
    val parts = if (args.length > 3) args(3) else "256"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-cc-ab-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verified = spark.read.parquet(edgesDir).persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = verified.count()
    val nodes = spark.read.parquet(nodesDir).persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // JIT all paths and contraction modes on a slice first
    val tiny = verified.limit(1000).localCheckpoint(true)
    DedupPipeline.connectedComponents(tiny, nodes.limit(2000)).count()
    for (m <- Seq(None, Some(true), Some(false)))
      DedupPipeline.connectedComponents(tiny, nodes.limit(2000), driverMaxEdges = 0L,
        localContraction = m).count()

    // persist inside the timed section (materialization IS the stage cost)
    // so the match check below reuses the assignments instead of running
    // both CC paths a second time
    val a = DedupPipeline.connectedComponents(verified, nodes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tDriver = timed(a.count())
    val b = DedupPipeline.connectedComponents(verified, nodes, driverMaxEdges = 0L)
      .withColumnRenamed("cluster_id", "cluster_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tStar = timed(b.count())
    val mismatches = a.join(b, Seq("conv_id"), "full_outer")
      .where(col("cluster_id") =!= col("cluster_b") ||
        col("cluster_id").isNull || col("cluster_b").isNull)
      .count()
    // contraction-mode legs on the star path: the default leg above runs
    // the yield probe (auto); these pin the forced-on/forced-off walls so
    // the probe's pick is visible next to both alternatives. Alternating
    // best-of-2 (on,off,off,on) because single ~3 s legs on this box
    // drift with leg order (accumulated cached blocks, GC)
    def starLeg(m: Option[Boolean]): Double = timed(
      DedupPipeline.connectedComponents(verified, nodes, driverMaxEdges = 0L,
        localContraction = m).count())
    val l1 = starLeg(Some(true)); val l2 = starLeg(Some(false))
    val l3 = starLeg(Some(false)); val l4 = starLeg(Some(true))
    val tOn = math.min(l1, l4)
    val tOff = math.min(l2, l3)
    println(f"CC_AB=edges:$nEdges,driver:$tDriver%.3f,star_auto:$tStar%.3f," +
      f"star_on:$tOn%.3f,star_off:$tOff%.3f,match:${mismatches == 0}")
    spark.stop()
  }
}
