package graft.sketch.interop

import graft.sketch.FreqSketch

/** Reader for Apache DataSketches Frequencies images (longs and String
  * items), per frequencies/preamble_utils.go:20-134 and the
  * deserializers at frequencies/longs_sketch.go:101-174 /
  * frequencies/items_sketch.go:113-185:
  *   preamble long 0: preLongs | serVer<<8 | family<<16 | lgMax<<24 |
  *                    lgCur<<32 | flags<<40
  *   preamble long 1: activeItems (low 32)
  *   preamble long 2: streamWeight
  *   preamble long 3: offset
  *   then activeItems counts (int64) and activeItems items
  * (longs: int64 each; strings: 4-byte LE length + UTF-8).
  * The decoded (item, count) pairs replay into the engine's own
  * FreqSketch, so Java/C++ heavy-hitter state merges straight into the
  * Spark aggregates.
  */
object DataSketchesFreq {

  final case class Decoded[T](
      lgMaxMapSize: Int, empty: Boolean, streamWeight: Long, offset: Long,
      counts: Array[Long], items: Array[T]) {
    def maximumError: Long = offset
    def estimate(item: T): Long = {
      val i = items.indexOf(item)
      if (i < 0) 0L else counts(i) + offset
    }
    /** Replay into the engine's FreqSketch (estimates preserved), so
      * Java/C++ images merge straight into the Spark aggregates. */
    def toFreqSketch: FreqSketch[T] = {
      val sk = new FreqSketch[T](lgMaxMapSize)
      var i = 0
      while (i < items.length) {
        sk.update(items(i), counts(i))
        i += 1
      }
      sk.importState(offset, streamWeight)
      sk
    }
  }

  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def i64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j).toLong & 0xffL); j -= 1 }
    v
  }

  private def header(bytes: Array[Byte]): (Int, Int, Boolean, Int) = {
    require(bytes.length >= 8, "image too short")
    val pre0 = i64(bytes, 0)
    val preLongs = (pre0 & 0x3f).toInt
    val serVer = ((pre0 >> 8) & 0xff).toInt
    val family = ((pre0 >> 16) & 0xff).toInt
    val lgMax = ((pre0 >> 24) & 0xff).toInt
    val flags = ((pre0 >> 40) & 0xff).toInt
    require(serVer == 1, s"unsupported freq serVer $serVer")
    require(family == 10, s"not a Frequencies image (family $family)")
    // C++ and Java historically used different empty bits; both are set
    val empty = (flags & 5) != 0
    (preLongs, lgMax, empty, flags)
  }

  def readLongs(bytes: Array[Byte]): Decoded[Long] = {
    val (preLongs, lgMax, empty, _) = header(bytes)
    if (empty) return Decoded(lgMax, empty = true, 0L, 0L, Array.empty, Array.empty)
    val active = (i64(bytes, 8) & 0xffffffffL).toInt
    val streamWeight = i64(bytes, 16)
    val offset = i64(bytes, 24)
    val preBytes = preLongs << 3
    val counts = Array.tabulate(active)(i => i64(bytes, preBytes + 8 * i))
    val itemsOff = preBytes + 8 * active
    val items = Array.tabulate(active)(i => i64(bytes, itemsOff + 8 * i))
    Decoded(lgMax, empty = false, streamWeight, offset, counts, items)
  }

  def readStrings(bytes: Array[Byte]): Decoded[String] = {
    val (preLongs, lgMax, empty, _) = header(bytes)
    if (empty) return Decoded(lgMax, empty = true, 0L, 0L, Array.empty, Array.empty)
    val active = (i64(bytes, 8) & 0xffffffffL).toInt
    val streamWeight = i64(bytes, 16)
    val offset = i64(bytes, 24)
    val preBytes = preLongs << 3
    val counts = Array.tabulate(active)(i => i64(bytes, preBytes + 8 * i))
    var off = preBytes + 8 * active
    val items = new Array[String](active)
    var i = 0
    while (i < active) {
      val len = i32(bytes, off)
      items(i) = new String(bytes, off + 4, len, java.nio.charset.StandardCharsets.UTF_8)
      off += 4 + len
      i += 1
    }
    Decoded(lgMax, empty = false, streamWeight, offset, counts, items)
  }
}
