package graft.core

/** SimHash (Charikar) 64-bit fingerprint from a shingle-hash multiset:
  * per-bit vote of +1/−1 over the item hashes; fingerprint bit j set iff the
  * vote is positive. Hamming distance on fingerprints approximates cosine
  * similarity of the shingle vectors — used as a cheap prefilter before
  * exact Jaccard (north_star: "SimHash fingerprints").
  */
object SimHash64 {

  def fingerprint(shingleHashes: Array[Long]): Long =
    fingerprint(shingleHashes, shingleHashes.length)

  /** Length-aware variant over a scratch buffer's first n entries. */
  def fingerprint(shingleHashes: Array[Long], n: Int): Long = {
    // branchless vote: each hash bit is random, so a per-bit conditional
    // mispredicts ~50% of 64·n times — measured ~5x slower than the
    // arithmetic form on the verification hot path
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = shingleHashes(i)
      var j = 0
      while (j < 64) {
        votes(j) += ((((h >>> j) & 1L) << 1) - 1L).toInt
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  @inline def hammingDist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
