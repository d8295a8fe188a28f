package graft.core

/** MinHash over 64-bit shingle hashes using n affine permutations
  * h_i(x) = (a_i·x + b_i) mod p over the Mersenne prime p = 2^61−1
  * (min-wise independent enough for E[sig agreement] = Jaccard).
  *
  * (a_i, b_i) are derived deterministically from the seed via murmur3
  * finalizer mixing — no RNG state, so signatures are reproducible across
  * partitions, retries, and resume (the determinism requirement the fork
  * itself adopted for KLL compaction: kll/items_sketch.go:866-867).
  */
final class MinHasher(val numHashes: Int, val seed: Long) extends Serializable {
  import MinHasher._

  private val as: Array[Long] = Array.tabulate(numHashes) { i =>
    // splitmix-style stream off the seed; a must be in [1, p-1], b in [0, p-1]
    1L + modP(mix64(seed + 0x9e3779b97f4a7c15L * (2L * i + 1))) % (P - 1)
  }
  private val bs: Array[Long] = Array.tabulate(numHashes) { i =>
    modP(mix64(seed ^ mix64(0xbf58476d1ce4e5b9L * (i + 1))))
  }

  def a(i: Int): Long = as(i)
  def b(i: Int): Long = bs(i)

  /** Signature of a shingle set; length numHashes. Empty set → all P
    * (an impossible hash value, so empty docs only match empty docs). */
  def signature(shingles: Array[Long]): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, P)
    var j = 0
    while (j < shingles.length) {
      val x = modP(shingles(j))
      var i = 0
      while (i < numHashes) {
        val h = mulModP(as(i), x) + bs(i)
        val hm = if (h >= P) h - P else h // h < 2p since both < p
        if (hm < sig(i)) sig(i) = hm
        i += 1
      }
      j += 1
    }
    sig
  }
}

object MinHasher {
  /** Mersenne prime 2^61 − 1. */
  final val P: Long = (1L << 61) - 1

  /** x mod P for any 64-bit x, treated unsigned. */
  @inline def modP(x: Long): Long = {
    var r = (x & P) + (x >>> 61)
    if (r >= P) r -= P
    r
  }

  /** (a·b) mod P for a, b in [0, P). 2^64 ≡ 8 (mod P). */
  @inline def mulModP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // both < 2^61 ⇒ signed == unsigned
    val lo = a * b
    var r = (hi << 3) + (lo >>> 61) + (lo & P)
    while (r >= P) r -= P
    r
  }

  /** murmur3 fmix64 — bijective 64-bit mixer. */
  @inline def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}
