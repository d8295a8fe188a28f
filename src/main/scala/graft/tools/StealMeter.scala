package graft.tools

/** Hypervisor-interference meter: /proc/stat deltas around a measured leg.
  *
  * This sandbox is a shared VM whose identical binaries swing ±20-30%
  * minutes apart (documented across rounds in BENCH/BASELINE.md). The
  * paired-leg protocol removes slow DRIFT from the ratio, but a steal
  * burst DURING one leg of a pair still skews it. Sampling
  * (steal, busy, total) jiffies before/after each leg turns that from an
  * inference ("the ratios disagree") into a measurement: legs whose
  * steal share exceeds a threshold are re-run, and every recorded pair
  * carries its own weather report in the bench JSON. */
object StealMeter {

  /** (busy, steal, total) jiffies summed over all cpus since boot;
    * (-1,-1,-1) when /proc/stat is unavailable (non-Linux). */
  def sample(): (Long, Long, Long) = {
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse(return (-1L, -1L, -1L))
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // user nice system idle iowait irq softirq steal guest guest_nice
      val idle = f(3) + f(4)
      val steal = if (f.length > 7) f(7) else 0L
      val total = f.sum
      (total - idle - steal, steal, total)
    } catch { case _: Throwable => (-1L, -1L, -1L) }
  }

  final case class Window(busy: Long, steal: Long, total: Long) {
    /** Steal as a share of the CPU time the host actually consumed —
      * steal/(busy+steal) reads "of the cycles this VM wanted, how many
      * did the hypervisor withhold". */
    def stealShare: Double =
      if (busy + steal <= 0) -1.0 else steal.toDouble / (busy + steal)
  }

  /** Run `f`, returning (result, interference window). */
  def measure[A](f: => A): (A, Window) = {
    val (b0, s0, t0) = sample()
    val r = f
    val (b1, s1, t1) = sample()
    if (b0 < 0 || b1 < 0) (r, Window(-1, -1, -1))
    else (r, Window(b1 - b0, s1 - s0, t1 - t0))
  }
}
