package graft.sketch.interop

/** Reader for Apache DataSketches KLL items images with String items —
  * the cross-language format the reference checks against the
  * kll_string_n*.sk golden fixtures (kll/items_sletch_serialization_test
  * .go:48-95). Layout per kll/preamble_utils.go:22-54 and
  * kll/items_sketch.go:332-443: COMPACT_EMPTY (8 B), COMPACT_SINGLE
  * (8 B preamble + one item), COMPACT_FULL (20 B preamble + numLevels
  * uint32 level offsets + min + max + retained items, level i carrying
  * weight 2^i). Strings serialize as 4-byte LE length + UTF-8 bytes.
  */
object DataSketchesKll {

  final case class StringImage(
      k: Int, m: Int, n: Long, minK: Int, numLevels: Int,
      levels: Array[Int],          // numLevels+1 offsets, rebased to 0
      minItem: Option[String], maxItem: Option[String],
      items: Array[String]) {      // retained items, level-major

    def isEmpty: Boolean = n == 0
    def isEstimationMode: Boolean = n > k

    /** (item, weight) pairs; weight of level i is 2^i. */
    def iterator: Iterator[(String, Long)] =
      (0 until numLevels).iterator.flatMap { lvl =>
        (levels(lvl) until levels(lvl + 1)).iterator
          .map(j => (items(j), 1L << lvl))
      }

    def totalWeight: Long = iterator.map(_._2).sum

    /** Quantile at normalized rank (LE criterion) from the sorted view. */
    def quantile(rank: Double): String = {
      require(n > 0, "empty sketch")
      val sorted = iterator.toArray.sortBy(_._1)
      val target = math.max(1L, math.ceil(rank * n).toLong)
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= target) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
  }

  /** Write-side: emit a StringImage back in the reference layout
    * (COMPACT_EMPTY / COMPACT_SINGLE / COMPACT_FULL) — state-preserving,
    * so read(write(img)) reproduces the exact (item, weight) multiset.
    * KllItemsSketch.toDataSketchesImage is the engine-sketch export; this
    * writer round-trips externally-produced images without replay. */
  def writeString(img: StringImage): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def strBytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def put(bb: ByteBuffer, s: String): Unit = {
      val b = strBytes(s); bb.putInt(b.length); bb.put(b)
    }
    if (img.isEmpty) {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte); bb.put(1.toByte); bb.put(15.toByte); bb.put(1.toByte)
      bb.putShort(img.k.toShort); bb.put(img.m.toByte); bb.put(0.toByte)
      return bb.array()
    }
    if (img.n == 1) {
      val item = img.items(0)
      val bb = ByteBuffer.allocate(8 + 4 + strBytes(item).length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte); bb.put(2.toByte); bb.put(15.toByte); bb.put(4.toByte)
      bb.putShort(img.k.toShort); bb.put(img.m.toByte); bb.put(0.toByte)
      put(bb, item)
      return bb.array()
    }
    val itemBytes = img.items.map(s => 4 + strBytes(s).length).sum
    val minMax = 8 + strBytes(img.minItem.get).length + strBytes(img.maxItem.get).length
    val bb = ByteBuffer.allocate(20 + 4 * img.numLevels + minMax + itemBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(5.toByte); bb.put(1.toByte); bb.put(15.toByte); bb.put(0.toByte)
    bb.putShort(img.k.toShort); bb.put(img.m.toByte); bb.put(0.toByte)
    bb.putLong(img.n)
    bb.putShort(img.minK.toShort)
    bb.put(img.numLevels.toByte); bb.put(0.toByte)
    // in-memory StringImage levels are rebased to 0; the wire format wants
    // ABSOLUTE offsets into a capacity-sized right-justified array (the
    // reference reader derives retained = capacity - levels[0],
    // items_sketch_validate.go:116) — re-exporting a golden fixture must
    // reproduce its original nonzero levels[0]
    val shift =
      graft.sketch.KllSketch.totalCapacity(img.k, img.numLevels) - img.items.length
    (0 until img.numLevels).foreach(i => bb.putInt(img.levels(i) + shift))
    put(bb, img.minItem.get); put(bb, img.maxItem.get)
    img.items.foreach(put(bb, _))
    bb.array()
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def i64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 7
    while (j >= 0) { v = (v << 8) | (u8(b, i + j).toLong & 0xffL); j -= 1 }
    v
  }

  private def readString(b: Array[Byte], off: Int): (String, Int) = {
    val len = i32(b, off)
    (new String(b, off + 4, len, java.nio.charset.StandardCharsets.UTF_8), off + 4 + len)
  }

  def readString(bytes: Array[Byte]): StringImage = {
    val serVer = u8(bytes, 1)
    val family = u8(bytes, 2)
    require(family == 15, s"not a KLL image (family $family)")
    val flags = u8(bytes, 3)
    val empty = (flags & 1) != 0
    val single = (flags & 4) != 0
    val k = u16(bytes, 4)
    val m = u8(bytes, 6)

    if (empty) {
      require(serVer == 1, s"empty image must have serVer 1, got $serVer")
      return StringImage(k, m, 0L, k, 0, Array(0, 0), None, None, Array.empty)
    }
    if (single) {
      require(serVer == 2, s"single-item image must have serVer 2, got $serVer")
      val (item, _) = readString(bytes, 8)
      return StringImage(k, m, 1L, k, 1, Array(0, 1), Some(item), Some(item), Array(item))
    }
    require(serVer == 1, s"full image must have serVer 1, got $serVer")
    val n = i64(bytes, 8)
    val minK = u16(bytes, 16)
    val numLevels = u8(bytes, 18)
    val rawLevels = Array.tabulate(numLevels)(i => i32(bytes, 20 + 4 * i))
    var off = 20 + 4 * numLevels
    val (minItem, o1) = readString(bytes, off)
    val (maxItem, o2) = readString(bytes, o1)
    off = o2
    // retained items run to the end of the buffer; count is implied
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    while (off < bytes.length) {
      val (s, next) = readString(bytes, off)
      items += s
      off = next
    }
    // serialized offsets are absolute into the original items array and
    // omit the final boundary; rebase to 0 and append it
    val base = rawLevels(0)
    val levels = Array.tabulate(numLevels + 1) { i =>
      if (i < numLevels) rawLevels(i) - base else items.length
    }
    require(levels(numLevels) == items.length,
      s"levels end ${levels(numLevels)} != retained ${items.length}")
    StringImage(k, m, n, minK, numLevels, levels, Some(minItem), Some(maxItem),
      items.toArray)
  }

  // ---- doubles images --------------------------------------------------

  /** Parsed Apache DataSketches KllDoublesSketch compact image (same
    * preamble as the items layout; items/min/max are 8-byte LE doubles).
    * No doubles fixtures ship with the reference, so the contract is
    * writer→reader round-trip parity (KllDoublesInteropSpec). */
  final case class DoubleImage(
      k: Int, m: Int, n: Long, minK: Int, numLevels: Int,
      levels: Array[Int],          // numLevels+1 offsets, rebased to 0
      minItem: Double, maxItem: Double,
      items: Array[Double],        // retained items, level-major
      level0Sorted: Boolean) {

    def isEmpty: Boolean = n == 0

    /** (item, weight) pairs; weight of level i is 2^i. */
    def iterator: Iterator[(Double, Long)] =
      (0 until numLevels).iterator.flatMap { lvl =>
        (levels(lvl) until levels(lvl + 1)).iterator
          .map(j => (items(j), 1L << lvl))
      }

    /** Exact state transfer into the engine sketch (no replay). */
    def toEngine: graft.sketch.KllSketch = {
      val sk = graft.sketch.KllSketch.fromParts(k, n, numLevels, levels,
        minItem, maxItem, items, level0Sorted)
      sk.setMinK(minK)
      sk
    }
  }

  private def f64(b: Array[Byte], i: Int): Double =
    java.lang.Double.longBitsToDouble(i64(b, i))

  def readDoubles(bytes: Array[Byte]): DoubleImage = {
    val serVer = u8(bytes, 1)
    val family = u8(bytes, 2)
    require(family == 15, s"not a KLL image (family $family)")
    val flags = u8(bytes, 3)
    val empty = (flags & 1) != 0
    val sorted = (flags & 2) != 0
    val single = (flags & 4) != 0
    val k = u16(bytes, 4)
    val m = u8(bytes, 6)

    if (empty) {
      require(serVer == 1, s"empty image must have serVer 1, got $serVer")
      return DoubleImage(k, m, 0L, k, 1, Array(0, 0),
        Double.NaN, Double.NaN, Array.empty, level0Sorted = true)
    }
    if (single) {
      require(serVer == 2, s"single-item image must have serVer 2, got $serVer")
      val item = f64(bytes, 8)
      return DoubleImage(k, m, 1L, k, 1, Array(0, 1), item, item,
        Array(item), level0Sorted = true)
    }
    require(serVer == 1, s"full image must have serVer 1, got $serVer")
    val n = i64(bytes, 8)
    val minK = u16(bytes, 16)
    val numLevels = u8(bytes, 18)
    val rawLevels = Array.tabulate(numLevels)(i => i32(bytes, 20 + 4 * i))
    var off = 20 + 4 * numLevels
    val minItem = f64(bytes, off)
    val maxItem = f64(bytes, off + 8)
    off += 16
    val retained = (bytes.length - off) / 8
    val items = Array.tabulate(retained)(i => f64(bytes, off + 8 * i))
    val base = rawLevels(0)
    val levels = Array.tabulate(numLevels + 1) { i =>
      if (i < numLevels) rawLevels(i) - base else retained
    }
    require(levels(numLevels) == retained,
      s"levels end ${levels(numLevels)} != retained $retained")
    DoubleImage(k, m, n, minK, numLevels, levels, minItem, maxItem, items,
      sorted)
  }
}
