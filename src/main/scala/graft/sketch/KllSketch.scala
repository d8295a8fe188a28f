package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Arrays

/** Clean-room KLL quantiles sketch over doubles (SURVEY §2a K1–K15),
  * re-derived from the KLL paper (Karnin–Lang–Liberty, FOCS'16) and the
  * published Apache DataSketches design docs — NOT a port.
  *
  * Structure: a stack of levels; level h holds items each representing
  * 2^h original items. Level 0 is an unsorted insert buffer; higher levels
  * are sorted. When full, the lowest over-capacity level is sorted and
  * HALVED — keeping the items at odd positions (deterministic offset, the
  * behavior the fork chose over the upstream's random coin:
  * kll/items_sketch.go:866-884) — and merged into the level above.
  *
  * Level capacity: cap(h, numLevels) = max(m, ceil(k · (2/3)^(numLevels-1-h)))
  * with m = 8 (kll/items_sketch.go:54-61 config semantics).
  *
  * Normalized rank error (closed forms, kll/utils.go:137-142):
  *   PMF: 2.446/k^0.9433, CDF: 2.296/k^0.9723.
  */
final class KllSketch private (
    val k: Int,
    private var items: Array[Double],     // one flat array, levels end-aligned
    private var levels: Array[Int],       // level h occupies [levels(h), levels(h+1))
    private var numLevels: Int,
    private var _n: Long,
    private var _minItem: Double,
    private var _maxItem: Double,
    private var level0Sorted: Boolean) extends Serializable {

  import KllSketch._

  /** Smallest k this sketch has absorbed through merges — the reference
    * tracks it (items_sketch.go:42,664) because the a-priori rank-error
    * contract after a mixed-k merge is governed by the weakest input. */
  private var _minK: Int = k
  def minK: Int = _minK
  private[sketch] def setMinK(v: Int): Unit = _minK = math.min(math.max(M, v), k)

  def this(k: Int) = {
    this(k, new Array[Double](math.max(KllSketch.M, k)),
      Array(math.max(KllSketch.M, k), math.max(KllSketch.M, k)), 1, 0L,
      Double.NaN, Double.NaN, true)
    require(k >= KllSketch.M && k <= 65535, s"k must be in [8, 65535], got $k")
  }

  def n: Long = _n
  def isEmpty: Boolean = _n == 0
  def minItem: Double = _minItem
  def maxItem: Double = _maxItem
  def numRetained: Int = levels(numLevels) - levels(0)

  // ---- update --------------------------------------------------------------

  def update(v: Double): Unit = {
    if (v.isNaN) return
    if (isEmpty) { _minItem = v; _maxItem = v }
    else {
      if (v < _minItem) _minItem = v
      if (v > _maxItem) _maxItem = v
    }
    if (levels(0) == 0) compress()
    levels(0) -= 1
    items(levels(0)) = v
    level0Sorted = false
    _n += 1
  }

  /** Sort level 0, then repeatedly halve the lowest over-capacity level
    * into the level above until everything fits. */
  private def compress(): Unit = {
    sortLevel0()
    var h = findLevelToCompact()
    while (h >= 0) {
      compactLevel(h)
      h = findLevelToCompact()
    }
    if (levels(0) == 0) grow() // still no room at level 0 → add a level
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
      Arrays.sort(items, levels(0), levels(1))
      level0Sorted = true
    }
  }

  /** Halve level h (keep odd positions — deterministic) and merge the
    * survivors into level h+1. */
  private def compactLevel(h: Int): Unit = {
    if (h == 0) sortLevel0()
    if (h == numLevels - 1) growLevels() // need a level above to push into
    val lo = levels(h); val hi = levels(h + 1)
    val sz = hi - lo
    val half = sz / 2
    val keepOdd = new Array[Double](half)
    var i = 0
    while (i < half) { keepOdd(i) = items(lo + 2 * i + 1); i += 1 }
    val leftover = sz - 2 * half // odd size: one item stays at level h
    // merge keepOdd with level h+1 (both sorted) into the space ending at levels(h+2)
    val aboveLo = levels(h + 1); val aboveHi = levels(h + 2)
    val aboveSz = aboveHi - aboveLo
    val merged = new Array[Double](half + aboveSz)
    var a = 0; var b = aboveLo; var w = 0
    while (a < half && b < aboveHi) {
      if (keepOdd(a) <= items(b)) { merged(w) = keepOdd(a); a += 1 }
      else { merged(w) = items(b); b += 1 }
      w += 1
    }
    while (a < half) { merged(w) = keepOdd(a); a += 1; w += 1 }
    while (b < aboveHi) { merged(w) = items(b); b += 1; w += 1 }
    // write back, end-aligned: new level h+1 = [aboveHi - merged.length, aboveHi)
    val newAboveLo = aboveHi - merged.length // == hi - half
    val savedLeftover = if (leftover == 1) items(lo) else 0.0
    System.arraycopy(merged, 0, items, newAboveLo, merged.length)
    // leftover item (odd size) becomes the sole survivor of level h, sitting
    // just below the new level h+1
    if (leftover == 1) items(newAboveLo - 1) = savedLeftover
    // level h shrank by 2·half while level h+1 grew down by half → every
    // boundary at or below h moves UP by exactly `half`
    if (lo - levels(0) > 0) {
      System.arraycopy(items, levels(0), items, levels(0) + half, lo - levels(0))
    }
    levels(h + 1) = newAboveLo
    var lvl = 0
    while (lvl <= h) { levels(lvl) += half; lvl += 1 }
  }

  /** Add one more level slot (numLevels+1) and widen the backing array to
    * the new total capacity. */
  private def growLevels(): Unit = {
    val newNumLevels = numLevels + 1
    val newCap = totalCapacity(k, newNumLevels)
    val curCap = levels(numLevels)
    val delta = newCap - curCap
    val newItems = new Array[Double](newCap)
    System.arraycopy(items, levels(0), newItems, levels(0) + delta, levels(numLevels) - levels(0))
    val newLevelsArr = new Array[Int](newNumLevels + 1)
    var h = 0
    while (h <= numLevels) { newLevelsArr(h) = levels(h) + delta; h += 1 }
    // old levels were end-aligned at curCap; after +delta they end at newCap;
    // the new top level (numLevels) starts empty: [newCap, newCap)
    newLevelsArr(newNumLevels) = newCap
    items = newItems
    levels = newLevelsArr
    numLevels = newNumLevels
  }

  private def grow(): Unit = growLevels()

  // ---- queries -------------------------------------------------------------

  /** (sorted items, cumulative weights) over all levels. */
  private[sketch] def sortedView(): (Array[Double], Array[Long]) = {
    sortLevel0()
    var est = numRetained
    val vals = new Array[Double](est)
    val wts = new Array[Long](est)
    // k-way merge of sorted levels (simple repeated selection; levels are few)
    val idx = new Array[Int](numLevels)
    var h = 0
    while (h < numLevels) { idx(h) = levels(h); h += 1 }
    var w = 0
    while (w < est) {
      var best = -1
      var bestV = Double.MaxValue
      h = 0
      while (h < numLevels) {
        if (idx(h) < levels(h + 1) && items(idx(h)) <= bestV) {
          // <= keeps stability: later levels win ties deterministically
          if (best == -1 || items(idx(h)) < bestV) { best = h; bestV = items(idx(h)) }
        }
        h += 1
      }
      vals(w) = items(idx(best))
      wts(w) = 1L << best
      idx(best) += 1
      w += 1
    }
    // cumulate
    var c = 0L
    var i = 0
    while (i < est) { c += wts(i); wts(i) = c; i += 1 }
    (vals, wts)
  }

  /** Quantile at normalized rank in [0,1], LE (inclusive) criterion. */
  def quantile(rank: Double): Double = {
    require(rank >= 0.0 && rank <= 1.0, s"rank out of range: $rank")
    if (isEmpty) return Double.NaN
    val (vals, cum) = sortedView()
    val target = math.max(1L, math.ceil(rank * _n).toLong)
    var lo = 0; var hi = vals.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid) < target) lo = mid + 1 else hi = mid
    }
    vals(lo)
  }

  def quantiles(ranks: Array[Double]): Array[Double] = ranks.map(quantile)

  /** Normalized LE rank of a value. */
  def rank(value: Double): Double = {
    if (isEmpty) return Double.NaN
    val (vals, cum) = sortedView()
    // rank = cumWeight of the last item <= value
    var lo = 0; var hi = vals.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) <= value) lo = mid + 1 else hi = mid
    }
    if (lo == 0) 0.0 else cum(lo - 1).toDouble / _n
  }

  /** CDF at split points (each = rank of the point, plus trailing 1.0). */
  def cdf(splits: Array[Double]): Array[Double] = {
    requireSorted(splits)
    splits.map(rank) :+ 1.0
  }

  /** PMF between split points. */
  def pmf(splits: Array[Double]): Array[Double] = {
    val c = cdf(splits)
    val out = new Array[Double](c.length)
    var prev = 0.0
    var i = 0
    while (i < c.length) { out(i) = c(i) - prev; prev = c(i); i += 1 }
    out
  }

  /** Equal-weight partition boundaries: numParts+1 values including min/max
    * (K9 — feeds deterministic range-partition planning, SURVEY §2a). */
  def partitionBoundaries(numParts: Int): Array[Double] = {
    require(numParts >= 1)
    if (isEmpty) return Array.empty
    val out = new Array[Double](numParts + 1)
    out(0) = _minItem
    var i = 1
    while (i < numParts) { out(i) = quantile(i.toDouble / numParts); i += 1 }
    out(numParts) = _maxItem
    out
  }

  /** Closed-form normalized rank error (kll/utils.go:137-142) — computed
    * from minK like the reference (items_sketch.go:289-290), so the bound
    * stays honest after absorbing a lower-k sketch. */
  def normalizedRankError(pmf: Boolean): Double =
    if (pmf) 2.446 / math.pow(_minK, 0.9433) else 2.296 / math.pow(_minK, 0.9723)

  // ---- merge ---------------------------------------------------------------

  def merge(other: KllSketch): KllSketch = {
    // mixed-k merges are legal (reference Merge accepts any other sketch);
    // the weighted re-insertion below is k-agnostic — self's capacities
    // govern compaction — and minK records the weakest input's contract
    // (items_sketch.go:664)
    if (other.isEmpty) return this
    _minK = math.min(_minK, other.minK)
    if (isEmpty) { _minItem = other._minItem; _maxItem = other._maxItem }
    else {
      if (other._minItem < _minItem) _minItem = other._minItem
      if (other._maxItem > _maxItem) _maxItem = other._maxItem
    }
    // replay other's level 0 (weight-1 items), then graft higher levels by
    // weighted re-insertion: each level-h item is inserted into OUR level h
    // via a direct levelwise merge + compress loop.
    other.sortLevel0()
    var h = 0
    while (h < other.numLevels) {
      val lo = other.levels(h); val hi = other.levels(h + 1)
      var i = lo
      while (i < hi) {
        insertAtLevel(other.items(i), h)
        i += 1
      }
      h += 1
    }
    _n += other._n
    this
  }

  /** Insert one item carrying weight 2^h directly into level h. */
  private def insertAtLevel(v: Double, h: Int): Unit = {
    while (numLevels <= h) growLevels()
    // ensure space: compress until the FULL sketch has a free slot below level h
    var guard = 0
    while (levels(0) == 0 && guard < 64) { compress(); guard += 1 }
    if (levels(0) == 0) growLevels()
    if (h == 0) {
      levels(0) -= 1
      items(levels(0)) = v
      level0Sorted = false
    } else {
      // shift levels 0..h-1 down by one slot to open a hole at the BOTTOM of
      // level h, then place v in sorted position within level h
      val lo0 = levels(0)
      System.arraycopy(items, lo0, items, lo0 - 1, levels(h) - lo0)
      var lvl = 0
      while (lvl < h) { levels(lvl) -= 1; lvl += 1 }
      // hole now at levels(h) - 1; but level h content is [levels(h), levels(h+1))
      var pos = levels(h) - 1
      levels(h) -= 1
      // bubble v into sorted position within the (sorted) level h
      while (pos + 1 < levels(h + 1) && items(pos + 1) < v) {
        items(pos) = items(pos + 1)
        pos += 1
      }
      items(pos) = v
      // compact if this level overflowed
      if (levelSize(h) >= levelCapacity(k, numLevels, h)) compress()
    }
  }

  // ---- serialize -----------------------------------------------------------

  /** Export in the Apache DataSketches KllDoublesSketch compact layout
    * (same preamble as the items format the golden fixtures use,
    * kll/preamble_utils.go:22-54, with fixed 8-byte LE doubles as items
    * and min/max): COMPACT_EMPTY (8 B), COMPACT_SINGLE (8 B + one
    * double), COMPACT_FULL (20 B preamble + numLevels uint32 offsets +
    * min + max + retained doubles, level i carrying weight 2^i). The
    * reference ships no doubles fixtures (only kll_string_*), so parity
    * is proven by writer→reader round-trip + preamble-constant checks
    * (KllDoublesInteropSpec) rather than cross-language goldens. */
  def toDataSketchesImage: Array[Byte] = {
    if (isEmpty) {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte); bb.put(1.toByte); bb.put(FamilyKll)
      bb.put(1.toByte) // flags: empty
      bb.putShort(k.toShort); bb.put(M.toByte); bb.put(0.toByte)
      return bb.array()
    }
    if (_n == 1) {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte); bb.put(2.toByte) // serVer 2 for SINGLE
      bb.put(FamilyKll)
      bb.put(4.toByte) // flags: single item
      bb.putShort(k.toShort); bb.put(M.toByte); bb.put(0.toByte)
      bb.putDouble(items(levels(0)))
      return bb.array()
    }
    sortLevel0()
    val retained = numRetained
    val bb = ByteBuffer.allocate(20 + 4 * numLevels + 16 + 8 * retained)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(5.toByte); bb.put(1.toByte); bb.put(FamilyKll)
    bb.put(2.toByte) // flags: level zero sorted (we just sorted it)
    bb.putShort(k.toShort); bb.put(M.toByte); bb.put(0.toByte)
    bb.putLong(_n)
    bb.putShort(_minK.toShort) // minK (items_sketch.go:388,396)
    bb.put(numLevels.toByte); bb.put(0.toByte)
    // offsets are ABSOLUTE into a totalCapacity-sized right-justified
    // array: the reference reader derives retained = capacity - levels[0]
    // (items_sketch_validate.go:116), so levels[0] must be
    // capacity - retained, NOT 0
    val shift = totalCapacity(k, numLevels) - retained
    var h = 0
    while (h < numLevels) { bb.putInt(levels(h) - levels(0) + shift); h += 1 }
    bb.putDouble(_minItem)
    bb.putDouble(_maxItem)
    var i = levels(0)
    while (i < levels(numLevels)) { bb.putDouble(items(i)); i += 1 }
    bb.array()
  }

  def serialize(): Array[Byte] = {
    sortLevel0()
    val retained = numRetained
    val bb = ByteBuffer.allocate(8 + 2 + 2 + 4 + 8 + 8 + 8 + 4 * (numLevels + 1) + 8 * retained)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(HllSketch.Magic); bb.put(1.toByte); bb.put(FamilyKll)
    // formerly-unused preamble slot now carries minK (0 in old images ⇒ k)
    bb.put(0.toByte); bb.putInt(_minK)
    bb.putShort(k.toShort)
    bb.putShort(numLevels.toShort)
    bb.putInt(retained)
    bb.putLong(_n)
    bb.putDouble(_minItem)
    bb.putDouble(_maxItem)
    var h = 0
    while (h <= numLevels) { bb.putInt(levels(h) - levels(0)); h += 1 }
    var i = levels(0)
    while (i < levels(numLevels)) { bb.putDouble(items(i)); i += 1 }
    bb.array()
  }
}

object KllSketch {
  final val M = 8 // minimum level width (kll/items_sketch.go:54-61)
  final val FamilyKll: Byte = 15
  final val DefaultK = 200

  /** cap(h) = max(M, round_half_up(k · (2/3)^(numLevels-1-h))) — the
    * reference's exact integer formula (kll/items_sketch.go:839-862
    * levelCapacity/intCapAux): 2k·2^depth / 3^depth, then (x+1)/2 — i.e.
    * ROUND-HALF-UP, not ceil (they disagree: 133 vs 134 at k=200 depth=1).
    * Serialized level offsets are absolute into an array of
    * totalCapacity(k, numLevels) items (items_sketch_validate.go:116
    * derives retained = capacity - levels[0]), so the engine must agree
    * with the reference on this formula EXACTLY or exported images
    * mis-parse in the Java/C++/Go libraries. */
  def levelCapacity(k: Int, numLevels: Int, h: Int): Int = {
    val depth = numLevels - 1 - h
    math.max(M, intCapAux(k, depth))
  }

  /** Integer (2/3)^depth scaling with round-half-up; depth > 30 composes
    * two half-depth applications exactly like the reference (intCapAux,
    * kll/items_sketch.go:844-852). */
  private def intCapAux(k: Int, depth: Int): Int = {
    if (depth <= 30) intCapAuxAux(k, depth)
    else {
      val half = depth / 2
      intCapAuxAux(intCapAuxAux(k, half), depth - half)
    }
  }

  private def intCapAuxAux(k: Int, depth: Int): Int = {
    // 3^depth for depth <= 30 fits a Long; 2k << depth fits for k <= 65535,
    // depth <= 30 (17 + 30 bits < 63)
    var p3 = 1L
    var i = 0
    while (i < depth) { p3 *= 3L; i += 1 }
    val tmp = (2L * k << depth) / p3
    val result = (tmp + 1L) >> 1
    if (result <= k) result.toInt else k
  }

  def totalCapacity(k: Int, numLevels: Int): Int = {
    var s = 0
    var h = 0
    while (h < numLevels) { s += levelCapacity(k, numLevels, h); h += 1 }
    s
  }

  def deserialize(bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == HllSketch.Magic, "bad magic")
    require(bb.get() == 1, "bad serVer")
    require(bb.get() == FamilyKll, "bad family")
    bb.get()
    val minKRaw = bb.getInt()
    val k = bb.getShort().toInt & 0xffff
    val numLevels = bb.getShort().toInt
    val retained = bb.getInt()
    val n = bb.getLong()
    val minI = bb.getDouble()
    val maxI = bb.getDouble()
    val rel = new Array[Int](numLevels + 1)
    var h = 0
    while (h <= numLevels) { rel(h) = bb.getInt(); h += 1 }
    val cap = math.max(totalCapacity(k, numLevels), rel(numLevels))
    val shift = cap - rel(numLevels)
    val items = new Array[Double](cap)
    val levels = rel.map(_ + shift)
    var i = 0
    while (i < retained) { items(shift + i) = bb.getDouble(); i += 1 }
    val sk = new KllSketch(k, items, levels, numLevels, n, minI, maxI, false)
    sk.setMinK(if (minKRaw > 0) minKRaw else k)
    sk
  }

  /** Exact state transfer from an externally-read image: items are
    * level-major with rebased (base-0) levels offsets of length
    * numLevels+1. Used by the DataSketches doubles-image importer. */
  private[sketch] def fromParts(k: Int, n: Long, numLevels: Int,
                                rebasedLevels: Array[Int],
                                minItem: Double, maxItem: Double,
                                retainedItems: Array[Double],
                                level0Sorted: Boolean): KllSketch = {
    val retained = rebasedLevels(numLevels)
    require(retained == retainedItems.length,
      s"levels end $retained != retained ${retainedItems.length}")
    val cap = math.max(totalCapacity(k, numLevels), retained)
    val shift = cap - retained
    val items = new Array[Double](cap)
    System.arraycopy(retainedItems, 0, items, shift, retained)
    new KllSketch(k, items, rebasedLevels.map(_ + shift), numLevels, n,
      minItem, maxItem, level0Sorted)
  }

  private[sketch] def requireSorted(a: Array[Double]): Unit = {
    var i = 1
    while (i < a.length) {
      require(a(i - 1) <= a(i), "split points must be sorted")
      i += 1
    }
  }
}
