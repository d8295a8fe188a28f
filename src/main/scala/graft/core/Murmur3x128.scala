package graft.core

import org.apache.spark.unsafe.Platform

/** MurmurHash3 x64-128 (Austin Appleby, public domain), the hash family the
  * reference routes every update through with seed 9001
  * (reference: hll/hll_sketch.go:367-369, internal/utils.go:33).
  *
  * Operates over raw (base, offset, len) memory so Catalyst expressions can
  * hash `UTF8String` payloads zero-copy (reference's zero-copy string path:
  * hll/hll_sketch.go:292-295). Assumes a little-endian platform, as Spark's
  * own unsafe hashing does.
  */
object Murmur3x128 {
  final val DefaultSeed: Long = 9001L

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** 128-bit hash; returns (h1, h2). h1 is what callers use as "the" 64-bit
    * hash (reference coupon addressing uses lo=h1, hi=h2). */
  def hash(base: AnyRef, offset: Long, len: Int, seed: Long): (Long, Long) = {
    val h = hashInto(base, offset, len, seed)
    (h._1, h._2)
  }

  /** 64-bit convenience: h1 of the 128-bit hash. */
  def hash64(base: AnyRef, offset: Long, len: Int, seed: Long): Long =
    hashInto(base, offset, len, seed)._1

  def hashBytes(bytes: Array[Byte], seed: Long): (Long, Long) =
    hash(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)

  def hashBytes64(bytes: Array[Byte], seed: Long): Long =
    hash64(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)

  /** Hash a long as its 8 little-endian bytes, matching the reference's
    * update-by-value convention (hll/hll_sketch.go:274-283 writes the value
    * into an 8-byte LE buffer before hashing). */
  def hashLong(v: Long, seed: Long): (Long, Long) = {
    val buf = new Array[Byte](8)
    Platform.putLong(buf, Platform.BYTE_ARRAY_OFFSET, v) // LE on x86
    hashBytes(buf, seed)
  }

  private def hashInto(base: AnyRef, offset: Long, len: Int, seed: Long): (Long, Long) = {
    var h1 = seed
    var h2 = seed
    val nblocks = len >>> 4

    // body: 16-byte blocks
    var i = 0
    while (i < nblocks) {
      var k1 = Platform.getLong(base, offset + (i.toLong << 4))
      var k2 = Platform.getLong(base, offset + (i.toLong << 4) + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // tail: up to 15 bytes
    val tail = offset + (nblocks.toLong << 4)
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    @inline def b(j: Int): Long = (Platform.getByte(base, tail + j) & 0xffL)
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 ^= b(j) << ((j - 8) << 3); j -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= b(j) << (j << 3); j -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    // finalization
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }
}
