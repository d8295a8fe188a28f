package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.DedupConfig
import graft.pipeline.DedupPipeline

/** Per-stage wall-clock breakdown of the dedup pipeline at one core count.
  *   sbt "runMain graft.tools.BenchStages <cores> <corpusDir> [parts] [aqe] [path]"
  * `path` = "id" (default — the production path run() takes when
  * xxhash64(conv_id) is injective: long-keyed banding/candidates/verify)
  * or "string" (the collision-fallback path).
  */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val parts = if (args.length > 2) args(2) else "64"
    val aqe = if (args.length > 3) args(3) else "true"
    val idPath = if (args.length > 4) args(4) != "string" else true
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-stage task skew report
    if (sys.env.contains("SPARK_GRAFT_STAGE_METRICS")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        // per-stage: task durations + cpu/gc sums, to tell memory stalls
        // (run up, cpu up, gc flat) from GC churn (gc up) from scheduling
        // (run up, cpu flat)
        private val durations = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
        private val cpuNs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
        private val gcMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          durations.computeIfAbsent(te.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(te.taskInfo.duration)
          val m = te.taskMetrics
          if (m != null) {
            cpuNs.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(m.executorCpuTime)
            gcMs.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(m.jvmGCTime)
          }
        }
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val q = durations.remove(sc.stageInfo.stageId)
          val cpu = Option(cpuNs.remove(sc.stageInfo.stageId)).map(_.sum / 1e9).getOrElse(0.0)
          val gc = Option(gcMs.remove(sc.stageInfo.stageId)).map(_.sum / 1e3).getOrElse(0.0)
          if (q != null) {
            val ds = q.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
            if (ds.nonEmpty && ds.sum > 500) {
              val med = ds(ds.length / 2)
              println(f"[tasks] stage=${sc.stageInfo.stageId}%4d n=${ds.length}%4d " +
                f"sum=${ds.sum / 1000.0}%7.1fs cpu=$cpu%7.1fs gc=$gc%5.1fs " +
                f"max=${ds.last / 1000.0}%6.2fs med=${med / 1000.0}%6.2fs " +
                sc.stageInfo.name.take(60))
            }
          }
        }
      })
    }
    val cfg = DedupConfig()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    // the production read path: bucketed dirs stream docs off the bucket
    // sort (readDocs), scattered dirs groupBy-shuffle — same as the e2e
    // legs (an earlier revision read plain parquet here, which made the
    // docs stage look shuffle-bound when the real legs pay no exchange)
    val df = graft.pipeline.BucketedCorpus.readAuto(spark, corpusDir)
    df.count() // warm IO
    // JIT warmup
    DedupPipeline.run(df.where(col("conv_id") <= "conv-000200"), cfg).count()

    val t0 = System.nanoTime()
    if (idPath) {
      // mirrors runWithDocs' happy path exactly: docs carry the xxhash64
      // id, sigs are UNPERSISTED at bandSalt=1 (text_signature fuses into
      // the band explode — the cached-minhash decode was the worst-scaling
      // stage, see BandProbe), banding/candidates/verify run long-keyed
      val docs = graft.pipeline.BucketedCorpus.readDocs(spark, corpusDir)
        .withColumn("id", xxhash64(col("conv_id")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("docs")(docs.count())
      val sigs = docs.withColumn("sig",
          graft.functions.text_signature(col("doc"), cfg.shingleK, cfg.numHashes, cfg.seed))
        .select(col("id"), col("sig.minhash").as("minhash"))
      val cand = DedupPipeline.candidatePairsById(
          DedupPipeline.bandsById(sigs, cfg), cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("sigs+bands+cand")(cand.count())
      val verified = DedupPipeline.verifyPairsById(cand, docs, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("verify")(verified.count())
      time("cc+assign")(DedupPipeline.connectedComponents(
        verified, docs.select(col("conv_id"))).count())
    } else {
      val docs = graft.pipeline.BucketedCorpus.readDocs(spark, corpusDir)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("docs")(docs.count())
      // mirror run(): persist ONLY the minhash projection — caching the
      // shingle arrays (~8x the text) spills at 1M docs and pollutes every
      // downstream stage measurement
      val sigs = DedupPipeline.signatures(docs, cfg)
        .select(col("conv_id"), col("minhash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("signatures")(sigs.count())
      val bands = DedupPipeline.bands(sigs, cfg)
      val cand = DedupPipeline.candidatePairs(bands, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("bands+candidates")(cand.count())
      val verified = DedupPipeline.verifyPairs(cand, docs, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("verify")(verified.count())
      time("cc+assign")(DedupPipeline.connectedComponents(
        verified, docs.select(col("conv_id"))).count())
    }
    println(f"[stage] TOTAL              ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    spark.stop()
  }
}
