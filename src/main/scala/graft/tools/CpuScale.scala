package graft.tools

import graft.core.{MinHasher, Shingles, SimHash64}

/** Spark-free CPU scaling probe: the raw signature kernel (shingle +
  * MinHash-128 + SimHash) on T threads over the same synthetic docs.
  * Separates machine-level scaling (host oversubscription, memory
  * bandwidth) from pipeline-structure effects in the Bench numbers. */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val docsPerThread = if (args.nonEmpty) args(0).toInt else 400
    val doc = (1 to 40).map(i => s"synthetic sentence number $i about spark pipelines " +
      s"and shingled minhash signatures for scaling probes").mkString("\n")
    val mh = new MinHasher(128, 9001L)

    def work(n: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < n) {
        val sh = Shingles.shinglesOf(doc + i, 8, 9001L)
        acc ^= mh.signature(sh)(0) ^ SimHash64.fingerprint(sh)
        i += 1
      }
      acc
    }

    // JIT warmup
    work(200)

    for (threads <- Seq(1, 8, 32)) {
      val total = docsPerThread * 32 // fixed total work
      val per = total / threads
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => { work(per); () })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cpu] threads=$threads%2d total_docs=$total sec=$sec%6.2f docs/s=${total / sec}%8.0f")
    }
  }
}
