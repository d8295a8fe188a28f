package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** Typeclass for KLL item types (the reference's ItemSketchOp[C],
  * kll/items_sketch.go:29-37): ordering + item serde. */
trait KllItemOps[T] extends Serializable {
  def ordering: Ordering[T]
  def write(bb: ByteBuffer, item: T): Unit
  def read(bb: ByteBuffer): T
  def sizeOf(item: T): Int
}

object KllItemOps {
  implicit object StringOps extends KllItemOps[String] {
    val ordering: Ordering[String] = Ordering.String
    def write(bb: ByteBuffer, item: String): Unit = {
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      bb.putInt(b.length); bb.put(b)
    }
    def read(bb: ByteBuffer): String = {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
    def sizeOf(item: String): Int =
      4 + item.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
  }

  implicit object LongOps extends KllItemOps[Long] {
    val ordering: Ordering[Long] = Ordering.Long
    def write(bb: ByteBuffer, item: Long): Unit = bb.putLong(item)
    def read(bb: ByteBuffer): Long = bb.getLong()
    def sizeOf(item: Long): Int = 8
  }
}

/** Generic KLL quantiles sketch over any ordered item type `T` — the K2
  * typeclass generalization of [[KllSketch]] (which stays primitive-double
  * for the hot numeric paths). Same algorithm: end-aligned flat item
  * array, levels offsets, deterministic odd-position halving (the fork's
  * determinism choice, kll/items_sketch.go:866-884), weight 2^h at level h.
  *
  * Reference instantiates strings (kll/items_sketch_test.go:31-135);
  * [[KllItemOps.StringOps]] provides that here and backs the
  * `kll_string_agg` Catalyst aggregate.
  */
final class KllItemsSketch[T] private (
    val k: Int,
    private var items: Array[Any],
    private var levels: Array[Int],
    private var numLevels: Int,
    private var _n: Long,
    private var _minItem: Option[T],
    private var _maxItem: Option[T],
    private var level0Sorted: Boolean)(implicit ops: KllItemOps[T]) extends Serializable {

  import KllSketch.{levelCapacity, totalCapacity}

  /** Smallest k absorbed through merges (items_sketch.go:42,664) — governs
    * the a-priori rank-error contract after mixed-k merges. */
  private var _minK: Int = k
  def minK: Int = _minK
  private[sketch] def setMinK(v: Int): Unit =
    _minK = math.min(math.max(KllSketch.M, v), k)

  @inline private def lt(a: T, b: T): Boolean = ops.ordering.lt(a, b)
  @inline private def lteq(a: T, b: T): Boolean = ops.ordering.lteq(a, b)

  def this(k: Int)(implicit ops: KllItemOps[T]) = {
    this(k, new Array[Any](math.max(KllSketch.M, k)),
      Array(math.max(KllSketch.M, k), math.max(KllSketch.M, k)), 1, 0L,
      None, None, true)(ops)
    require(k >= KllSketch.M && k <= 65535, s"k must be in [8, 65535], got $k")
  }

  def n: Long = _n
  def isEmpty: Boolean = _n == 0
  def isEstimationMode: Boolean = numLevels > 1
  def minItem: Option[T] = _minItem
  def maxItem: Option[T] = _maxItem
  def numRetained: Int = levels(numLevels) - levels(0)

  @inline private def at(i: Int): T = items(i).asInstanceOf[T]

  // ---- update -------------------------------------------------------------

  def update(v: T): Unit = {
    if (v == null) return
    if (isEmpty) { _minItem = Some(v); _maxItem = Some(v) }
    else {
      if (lt(v, _minItem.get)) _minItem = Some(v)
      if (lt(_maxItem.get, v)) _maxItem = Some(v)
    }
    if (levels(0) == 0) compress()
    levels(0) -= 1
    items(levels(0)) = v
    level0Sorted = false
    _n += 1
  }

  private def compress(): Unit = {
    sortLevel0()
    var h = findLevelToCompact()
    while (h >= 0) {
      compactLevel(h)
      h = findLevelToCompact()
    }
    if (levels(0) == 0) growLevels()
  }

  private def findLevelToCompact(): Int = {
    var h = 0
    while (h < numLevels) {
      if (levelSize(h) >= levelCapacity(k, numLevels, h)) return h
      h += 1
    }
    -1
  }

  private def levelSize(h: Int): Int = levels(h + 1) - levels(h)

  private def sortLevel0(): Unit = {
    if (!level0Sorted) {
      val cmp = new java.util.Comparator[AnyRef] {
        def compare(a: AnyRef, b: AnyRef): Int =
          ops.ordering.compare(a.asInstanceOf[T], b.asInstanceOf[T])
      }
      java.util.Arrays.sort(items.asInstanceOf[Array[AnyRef]], levels(0), levels(1), cmp)
      level0Sorted = true
    }
  }

  private def compactLevel(h: Int): Unit = {
    if (h == 0) sortLevel0()
    if (h == numLevels - 1) growLevels()
    val lo = levels(h); val hi = levels(h + 1)
    val sz = hi - lo
    val half = sz / 2
    val keepOdd = new Array[Any](half)
    var i = 0
    while (i < half) { keepOdd(i) = items(lo + 2 * i + 1); i += 1 }
    val leftover = sz - 2 * half
    val aboveLo = levels(h + 1); val aboveHi = levels(h + 2)
    val aboveSz = aboveHi - aboveLo
    val merged = new Array[Any](half + aboveSz)
    var a = 0; var b = aboveLo; var w = 0
    while (a < half && b < aboveHi) {
      if (lteq(keepOdd(a).asInstanceOf[T], at(b))) { merged(w) = keepOdd(a); a += 1 }
      else { merged(w) = items(b); b += 1 }
      w += 1
    }
    while (a < half) { merged(w) = keepOdd(a); a += 1; w += 1 }
    while (b < aboveHi) { merged(w) = items(b); b += 1; w += 1 }
    val newAboveLo = aboveHi - merged.length
    val savedLeftover = if (leftover == 1) items(lo) else null
    System.arraycopy(merged, 0, items, newAboveLo, merged.length)
    if (leftover == 1) items(newAboveLo - 1) = savedLeftover
    if (lo - levels(0) > 0) {
      System.arraycopy(items, levels(0), items, levels(0) + half, lo - levels(0))
    }
    levels(h + 1) = newAboveLo
    var lvl = 0
    while (lvl <= h) { levels(lvl) += half; lvl += 1 }
  }

  private def growLevels(): Unit = {
    val newNumLevels = numLevels + 1
    val newCap = totalCapacity(k, newNumLevels)
    val curCap = levels(numLevels)
    val delta = newCap - curCap
    val newItems = new Array[Any](newCap)
    System.arraycopy(items, levels(0), newItems, levels(0) + delta, levels(numLevels) - levels(0))
    val newLevelsArr = new Array[Int](newNumLevels + 1)
    var h = 0
    while (h <= numLevels) { newLevelsArr(h) = levels(h) + delta; h += 1 }
    newLevelsArr(newNumLevels) = newCap
    items = newItems
    levels = newLevelsArr
    numLevels = newNumLevels
  }

  // ---- queries --------------------------------------------------------------

  private def sortedView(): (Array[Any], Array[Long]) = {
    sortLevel0()
    val est = numRetained
    val vals = new Array[Any](est)
    val wts = new Array[Long](est)
    val idx = new Array[Int](numLevels)
    var h = 0
    while (h < numLevels) { idx(h) = levels(h); h += 1 }
    var w = 0
    while (w < est) {
      var best = -1
      h = 0
      while (h < numLevels) {
        if (idx(h) < levels(h + 1) &&
          (best == -1 || lt(at(idx(h)), at(idx(best))))) best = h
        h += 1
      }
      vals(w) = items(idx(best))
      wts(w) = 1L << best
      idx(best) += 1
      w += 1
    }
    var c = 0L
    var i = 0
    while (i < est) { c += wts(i); wts(i) = c; i += 1 }
    (vals, wts)
  }

  /** Quantile at normalized rank (LE criterion). */
  def quantile(rank: Double): T = {
    require(rank >= 0.0 && rank <= 1.0, s"rank out of range: $rank")
    require(!isEmpty, "empty sketch")
    val (vals, cum) = sortedView()
    val target = math.max(1L, math.ceil(rank * _n).toLong)
    var lo = 0; var hi = vals.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid) < target) lo = mid + 1 else hi = mid
    }
    vals(lo).asInstanceOf[T]
  }

  /** Normalized LE rank of a value. */
  def rank(value: T): Double = {
    require(!isEmpty, "empty sketch")
    val (vals, cum) = sortedView()
    var lo = 0; var hi = vals.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lteq(vals(mid).asInstanceOf[T], value)) lo = mid + 1 else hi = mid
    }
    if (lo == 0) 0.0 else cum(lo - 1).toDouble / _n
  }

  def normalizedRankError(pmf: Boolean): Double =
    if (pmf) 2.446 / math.pow(_minK, 0.9433) else 2.296 / math.pow(_minK, 0.9723)

  // ---- merge ----------------------------------------------------------------

  def merge(other: KllItemsSketch[T]): KllItemsSketch[T] = {
    // mixed-k merges are legal (reference Merge accepts any other sketch);
    // minK records the weakest input's error contract (items_sketch.go:664)
    if (other.isEmpty) return this
    _minK = math.min(_minK, other.minK)
    if (isEmpty) { _minItem = other._minItem; _maxItem = other._maxItem }
    else {
      if (lt(other._minItem.get, _minItem.get)) _minItem = other._minItem
      if (lt(_maxItem.get, other._maxItem.get)) _maxItem = other._maxItem
    }
    other.sortLevel0()
    var h = 0
    while (h < other.numLevels) {
      val lo = other.levels(h); val hi = other.levels(h + 1)
      var i = lo
      while (i < hi) {
        insertAtLevel(other.at(i), h)
        i += 1
      }
      h += 1
    }
    _n += other._n
    this
  }

  private def insertAtLevel(v: T, h: Int): Unit = {
    while (numLevels <= h) growLevels()
    var guard = 0
    while (levels(0) == 0 && guard < 64) { compress(); guard += 1 }
    if (levels(0) == 0) growLevels()
    if (h == 0) {
      levels(0) -= 1
      items(levels(0)) = v
      level0Sorted = false
    } else {
      val lo0 = levels(0)
      System.arraycopy(items, lo0, items, lo0 - 1, levels(h) - lo0)
      var lvl = 0
      while (lvl < h) { levels(lvl) -= 1; lvl += 1 }
      var pos = levels(h) - 1
      levels(h) -= 1
      while (pos + 1 < levels(h + 1) && lt(at(pos + 1), v)) {
        items(pos) = items(pos + 1)
        pos += 1
      }
      items(pos) = v
      if (levelSize(h) >= levelCapacity(k, numLevels, h)) compress()
    }
  }

  // ---- serde ----------------------------------------------------------------

  /** Export as an Apache DataSketches-format compact KLL items image —
    * the write-side half of the cross-language serde (read side:
    * interop.DataSketchesKll). Structures per kll/preamble_utils.go:22-54
    * and kll/items_sketch.go:332-443 (ToSlice):
    *  - COMPACT_EMPTY: 8-byte preamble only (serVer 1, empty flag);
    *  - COMPACT_SINGLE: 8-byte preamble (serVer 2, single flag) + item;
    *  - COMPACT_FULL: 20-byte preamble + numLevels uint32 level offsets
    *    (final boundary implied) + min + max + retained items level-major
    *    (level 0 sorted), weight 2^level.
    * Items serialize through KllItemOps (strings: 4-byte LE length +
    * UTF-8 — the layout of the reference's kll_string_*.sk fixtures). */
  def toDataSketchesImage: Array[Byte] = {
    val FamilyKll = 15
    val M = KllSketch.M
    if (isEmpty) {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte); bb.put(1.toByte); bb.put(FamilyKll.toByte)
      bb.put(1.toByte) // flags: empty
      bb.putShort(k.toShort); bb.put(M.toByte); bb.put(0.toByte)
      return bb.array()
    }
    if (_n == 1) {
      val item = at(levels(0))
      val bb = ByteBuffer.allocate(8 + ops.sizeOf(item)).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte); bb.put(2.toByte) // serVer 2 for SINGLE
      bb.put(FamilyKll.toByte)
      bb.put(4.toByte) // flags: single item
      bb.putShort(k.toShort); bb.put(M.toByte); bb.put(0.toByte)
      ops.write(bb, item)
      return bb.array()
    }
    sortLevel0()
    var itemBytes = 0
    var i = levels(0)
    while (i < levels(numLevels)) { itemBytes += ops.sizeOf(at(i)); i += 1 }
    val bb = ByteBuffer.allocate(20 + 4 * numLevels +
      ops.sizeOf(_minItem.get) + ops.sizeOf(_maxItem.get) + itemBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(5.toByte); bb.put(1.toByte); bb.put(FamilyKll.toByte)
    bb.put(2.toByte) // flags: level zero sorted (sortLevel0 above)
    bb.putShort(k.toShort); bb.put(M.toByte); bb.put(0.toByte)
    bb.putLong(_n)
    bb.putShort(_minK.toShort) // minK (items_sketch.go:388,396)
    bb.put(numLevels.toByte); bb.put(0.toByte)
    // ABSOLUTE offsets into a totalCapacity-sized right-justified array —
    // the reference reader derives retained = capacity - levels[0]
    // (items_sketch_validate.go:116)
    val shift = KllSketch.totalCapacity(k, numLevels) - numRetained
    var h = 0
    while (h < numLevels) { bb.putInt(levels(h) - levels(0) + shift); h += 1 }
    ops.write(bb, _minItem.get)
    ops.write(bb, _maxItem.get)
    i = levels(0)
    while (i < levels(numLevels)) { ops.write(bb, at(i)); i += 1 }
    bb.array()
  }

  def serialize(): Array[Byte] = {
    sortLevel0()
    val retained = numRetained
    var itemBytes = 0
    var i = levels(0)
    while (i < levels(numLevels)) { itemBytes += ops.sizeOf(at(i)); i += 1 }
    val minMaxBytes =
      if (isEmpty) 0 else ops.sizeOf(_minItem.get) + ops.sizeOf(_maxItem.get)
    val bb = ByteBuffer.allocate(
      8 + 2 + 2 + 4 + 8 + minMaxBytes + 4 * (numLevels + 1) + itemBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(HllSketch.Magic); bb.put(2.toByte); bb.put(KllSketch.FamilyKll)
    // formerly-unused preamble slot now carries minK (0 in old images ⇒ k)
    bb.put(if (isEmpty) 1.toByte else 0.toByte); bb.putInt(_minK)
    bb.putShort(k.toShort)
    bb.putShort(numLevels.toShort)
    bb.putInt(retained)
    bb.putLong(_n)
    if (!isEmpty) { ops.write(bb, _minItem.get); ops.write(bb, _maxItem.get) }
    var h = 0
    while (h <= numLevels) { bb.putInt(levels(h) - levels(0)); h += 1 }
    i = levels(0)
    while (i < levels(numLevels)) { ops.write(bb, at(i)); i += 1 }
    bb.array()
  }
}

object KllItemsSketch {
  def deserialize[T](bytes: Array[Byte])(implicit ops: KllItemOps[T]): KllItemsSketch[T] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == HllSketch.Magic, "bad magic")
    require(bb.get() == 2, "bad serVer (items sketch is serVer 2)")
    require(bb.get() == KllSketch.FamilyKll, "bad family")
    val empty = bb.get() == 1
    val minKRaw = bb.getInt()
    val k = bb.getShort().toInt & 0xffff
    val numLevels = bb.getShort().toInt
    val retained = bb.getInt()
    val n = bb.getLong()
    val (minI, maxI) =
      if (empty) (None, None)
      else {
        val mn = ops.read(bb); val mx = ops.read(bb)
        (Some(mn), Some(mx))
      }
    val rel = new Array[Int](numLevels + 1)
    var h = 0
    while (h <= numLevels) { rel(h) = bb.getInt(); h += 1 }
    val cap = math.max(KllSketch.totalCapacity(k, numLevels), rel(numLevels))
    val shift = cap - rel(numLevels)
    val items = new Array[Any](cap)
    val levels = rel.map(_ + shift)
    var i = 0
    while (i < retained) { items(shift + i) = ops.read(bb); i += 1 }
    val sk = new KllItemsSketch[T](k, items, levels, numLevels, n, minI, maxI, false)(ops)
    sk.setMinK(if (minKRaw > 0) minKRaw else k)
    sk
  }

  /** Import a reference-format KLL string image (cross-language read path)
    * into the generic sketch: replay level by level. */
  def fromDataSketchesString(img: graft.sketch.interop.DataSketchesKll.StringImage): KllItemsSketch[String] = {
    // construct directly from the decoded level structure: items are already
    // level-major with weights 2^level, so replay via a donor sketch merge
    val donor = new KllItemsSketch[String](img.k)
    var lvl = 0
    while (lvl < img.numLevels) {
      var j = img.levels(lvl)
      while (j < img.levels(lvl + 1)) {
        donor.insertAtLevel(img.items(j), lvl)
        j += 1
      }
      lvl += 1
    }
    donor._n = img.n
    donor._minItem = img.minItem
    donor._maxItem = img.maxItem
    donor.setMinK(img.minK)
    donor
  }
}
