package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-job and per-stage breakdown of one SparkEntry query (warm-run):
  *   QStages <sfDir> <warmupQuery...> -- <query>
  * Prints each Spark job's wall, and each stage's task count/sum/max/med
  * for the measured query only.
  */
object QStages {
  def main(args: Array[String]): Unit = {
    val sep = args.indexOf("--")
    val (dir, warm, q) =
      (args(0), args.slice(1, sep), args(sep + 1))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (w <- warm) graft.SparkEntry.queries(w)(spark, dir).count()

    @volatile var record = false
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (record) jobT0.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobT0.remove(je.jobId)
        if (t0 != null && record)
          println(f"[job] id=${je.jobId}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (record)
          stages.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(te.taskInfo.duration)
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val qd = stages.remove(sc.stageInfo.stageId)
        if (qd != null && record) {
          val ds = qd.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
          if (ds.nonEmpty)
            println(f"[tasks] stage=${sc.stageInfo.stageId}%4d n=${ds.length}%4d " +
              f"sum=${ds.sum / 1000.0}%7.2fs max=${ds.last / 1000.0}%6.2fs " +
              f"med=${ds(ds.length / 2) / 1000.0}%6.2fs " + sc.stageInfo.name.take(70))
        }
      }
    })
    spark.sharedState.cacheManager.clearCache()
    record = true
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(q)(spark, dir).count()
    println(f"[total] $q ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    record = false
    spark.stop()
  }
}
