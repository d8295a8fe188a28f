package graft.tools

import graft.core.{MinHasher, Shingles, SimHash64}

/** Spark-free CPU scaling probe: the raw signature kernel (shingle +
  * MinHash-128 + SimHash) on T threads over the same synthetic docs.
  * Separates machine-level scaling (host oversubscription, memory
  * bandwidth) from pipeline-structure effects in the Bench numbers.
  * The N→4N ratio of this probe IS the single-box ceiling for any
  * end-to-end efficiency number: the kernel shares one DRAM bus here,
  * where a real 4N-executor cluster brings 4× memory channels. */
object CpuScale {
  private val doc = (1 to 40).map(i => s"synthetic sentence number $i about spark pipelines " +
    s"and shingled minhash signatures for scaling probes").mkString("\n")
  private val mh = new MinHasher(128, 9001L)

  private def work(n: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < n) {
      val sh = Shingles.shinglesOf(doc + i, 8, 9001L)
      acc ^= mh.signature(sh)(0) ^ SimHash64.fingerprint(sh)
      i += 1
    }
    acc
  }

  /** docs/s at the given thread count over `total` docs (pre-warm JIT
    * with a small run before first use). */
  def throughput(threads: Int, total: Int): Double = {
    val per = total / threads
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => { work(per); () })
      t.start(); t
    }
    ts.foreach(_.join())
    total / ((System.nanoTime() - t0) / 1e9)
  }

  /** The 8→32 kernel scaling ceiling on this host (run by Bench so the
    * recorded efficiency can be read against it). Best-of-3 per width
    * over a run long enough to drown thread-startup — single short runs
    * measured anywhere from 0.70 to 0.91 on this VM. */
  def ceiling8to32(total: Int = 51200): Double = {
    work(400) // JIT warmup
    val tp8 = (1 to 3).map(_ => throughput(8, total)).max
    val tp32 = (1 to 3).map(_ => throughput(32, total)).max
    tp32 / (4.0 * tp8)
  }

  @volatile private var warmed = false

  /** Per-pair probe for Bench's interleaved pair loop (VERDICT r3: the
    * between-runs probe swung 0.676↔0.861; sampling it once per pair, in
    * the same machine window as the legs it bounds, and reporting the
    * median makes `efficiency_vs_ceiling` readable). Best-of-2 per width
    * inside ONE probe call: a single 2-3 s sweep still catches scheduler
    * hiccups (one 50k smoke run read 0.442), best-of-2 drops them at
    * ~6 s/probe — negligible against a 60-150 s leg pair. */
  def probe8to32(total: Int = 51200): Double = {
    if (!warmed) { work(400); warmed = true }
    val tp8 = (1 to 3).map(_ => throughput(8, total)).max
    val tp32 = (1 to 3).map(_ => throughput(32, total)).max
    tp32 / (4.0 * tp8)
  }

  /** Kernel ceiling for the 2→8 pairs: even at these widths the box is
    * not 4× — DRAM bandwidth grows only ~2.1× from 2 to 8 threads
    * (MemBw 22→45 GB/s), so the partially-bandwidth-bound kernel caps
    * any 2→8 pipeline efficiency below 1.0 before Spark is involved. */
  def probe2to8(total: Int = 51200): Double = {
    if (!warmed) { work(400); warmed = true }
    val tp2 = (1 to 3).map(_ => throughput(2, total)).max
    val tp8 = (1 to 3).map(_ => throughput(8, total)).max
    tp8 / (4.0 * tp2)
  }

  /** Kernel ceiling matched to the executor pair's ACTUAL core range:
    * local-cluster[2,2] vs [8,2] runs 4 vs 16 TOTAL cores, and on this
    * box bandwidth already sags past 8 threads — bounding a 4→16-core
    * measurement with a 2→8-thread probe overstates the ceiling and
    * understates efficiency_vs_ceiling (r5: exec eff 0.682 read 0.791
    * of the mismatched 2→8 ceiling 0.862). */
  def probe4to16(total: Int = 51200): Double = {
    if (!warmed) { work(400); warmed = true }
    val tp4 = (1 to 3).map(_ => throughput(4, total)).max
    val tp16 = (1 to 3).map(_ => throughput(16, total)).max
    tp16 / (4.0 * tp4)
  }

  def main(args: Array[String]): Unit = {
    val docsPerThread = if (args.nonEmpty) args(0).toInt else 400
    work(200)
    for (threads <- Seq(1, 8, 32)) {
      val total = docsPerThread * 32 // fixed total work
      val t0 = System.nanoTime()
      val tp = throughput(threads, total)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cpu] threads=$threads%2d total_docs=$total sec=$sec%6.2f docs/s=$tp%8.0f")
    }
  }
}
