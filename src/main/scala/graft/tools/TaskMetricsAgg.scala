package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Whole-run TaskMetrics aggregation for the scaling-protocol legs:
  * answers "WHERE does an executor-JVM leg lose time vs the in-process
  * leg at the same width" (netty fetch wait? serde? GC?) with driver-side
  * sums instead of guesses. Enabled by SPARK_GRAFT_TASK_METRICS; reset()
  * before a timed section, report() after. */
final class TaskMetricsAgg extends SparkListener {
  private val runMs = new LongAdder
  private val cpuNs = new LongAdder
  private val gcMs = new LongAdder
  private val deserMs = new LongAdder
  private val resSerMs = new LongAdder
  private val fetchWaitMs = new LongAdder
  private val remoteBytes = new LongAdder
  private val localBytes = new LongAdder
  private val writeNs = new LongAdder
  private val writeBytes = new LongAdder
  private val tasks = new LongAdder

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      tasks.increment()
      runMs.add(m.executorRunTime)
      cpuNs.add(m.executorCpuTime)
      gcMs.add(m.jvmGCTime)
      deserMs.add(m.executorDeserializeTime)
      resSerMs.add(m.resultSerializationTime)
      val r = m.shuffleReadMetrics
      if (r != null) {
        fetchWaitMs.add(r.fetchWaitTime)
        remoteBytes.add(r.remoteBytesRead)
        localBytes.add(r.localBytesRead)
      }
      val w = m.shuffleWriteMetrics
      if (w != null) {
        writeNs.add(w.writeTime)
        writeBytes.add(w.bytesWritten)
      }
    }
  }

  def reset(): Unit =
    Seq(runMs, cpuNs, gcMs, deserMs, resSerMs, fetchWaitMs,
      remoteBytes, localBytes, writeNs, writeBytes, tasks).foreach(_.reset())

  /** One parseable line: all sums in seconds / MB. */
  def report(label: String): String =
    f"TASK_METRICS=$label,tasks:${tasks.sum()}," +
      f"run_s:${runMs.sum() / 1e3}%.1f,cpu_s:${cpuNs.sum() / 1e9}%.1f," +
      f"gc_s:${gcMs.sum() / 1e3}%.1f,deser_s:${deserMs.sum() / 1e3}%.1f," +
      f"res_ser_s:${resSerMs.sum() / 1e3}%.1f," +
      f"fetch_wait_s:${fetchWaitMs.sum() / 1e3}%.1f," +
      f"shuf_write_s:${writeNs.sum() / 1e9}%.1f," +
      f"remote_mb:${remoteBytes.sum() / 1e6}%.0f,local_mb:${localBytes.sum() / 1e6}%.0f," +
      f"write_mb:${writeBytes.sum() / 1e6}%.0f"
}

object TaskMetricsAgg {
  /** Install if SPARK_GRAFT_TASK_METRICS is set; None otherwise. */
  def maybeInstall(spark: SparkSession): Option[TaskMetricsAgg] =
    if (!sys.env.contains("SPARK_GRAFT_TASK_METRICS")) None
    else {
      val agg = new TaskMetricsAgg
      spark.sparkContext.addSparkListener(agg)
      Some(agg)
    }
}
