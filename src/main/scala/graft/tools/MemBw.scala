package graft.tools

/** Direct DRAM bandwidth probe (STREAM-triad style): a[i] = b[i] + s*c[i]
  * over buffers far larger than LLC, on T threads. The 8→32-thread ratio
  * of this number IS the hardware's answer to "does adding cores add
  * bandwidth on this box" — the single-machine confound the N→4N scaling
  * protocol has to live with (a real 4N-executor cluster brings 4x
  * memory channels; one VM does not). Bench records it next to the
  * end-to-end efficiency so the two can be read together.
  */
object MemBw {
  // 3 x 64 MB doubles per thread-set = 192 MB working set, ~20x any LLC
  private val N = 8 * 1024 * 1024
  private val a = new Array[Double](N)
  private val b = new Array[Double](N)
  private val c = new Array[Double](N)
  java.util.Arrays.fill(b, 1.5)
  java.util.Arrays.fill(c, 2.5)

  private def triad(lo: Int, hi: Int): Unit = {
    var i = lo
    while (i < hi) { a(i) = b(i) + 3.0 * c(i); i += 1 }
  }

  /** GB/s moved (3 arrays × 8 bytes per element) at `threads`, best of
    * `reps` sweeps. Threads split the same arrays — total traffic is
    * constant across thread counts, so GB/s compares directly. */
  def bandwidthGbps(threads: Int, reps: Int = 5): Double = {
    var best = 0.0
    var r = 0
    while (r < reps) {
      val chunk = N / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val lo = t * chunk
        val hi = if (t == threads - 1) N else lo + chunk
        val th = new Thread(() => triad(lo, hi))
        th.start(); th
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val gb = 3.0 * N * 8.0 / 1e9
      if (gb / sec > best) best = gb / sec
      r += 1
    }
    best
  }

  def main(args: Array[String]): Unit = {
    bandwidthGbps(4, 2) // warm
    for (t <- Seq(1, 2, 4, 8, 16, 32))
      println(f"[membw] threads=$t%2d GB/s=${bandwidthGbps(t)}%7.1f")
  }
}
