package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import graft.core.Murmur3x128

/** Clean-room HLL cardinality sketch with the reference's update/merge/
  * estimate/serialize lifecycle (SURVEY §2a H1–H20), re-derived from the
  * published HyperLogLog literature — NOT a port of the reference's code.
  *
  * Conventions shared with the reference (behavioral, re-derived):
  *  - murmur3-x64-128 with seed 9001 over the item's byte image
  *    (reference: hll/hll_sketch.go:367-369, internal/utils.go:33)
  *  - coupon = 26-bit slot address from hash lo + 6-bit value
  *    min(clz(hi),62)+1 (reference: hll/hll_sketch.go:338-343)
  *  - two-phase state: sparse coupon set → dense 8-bit register array
  *    (the reference's LIST/SET→HLL8 machine collapsed to one sparse
  *    phase; LIST-vs-SET is a constant-factor memory optimization)
  *  - HIP accumulator maintained incrementally while updates are in-order;
  *    merge invalidates HIP → composite estimate (reference:
  *    hll/hll_array.go:89-99). The composite/coupon estimators use the
  *    published interpolation tables (round 2; see compositeEstimate),
  *    matching the reference's estimator chain.
  *  - lgK-mismatched unions DOWNSAMPLE to the smaller lgK (slot-fold max,
  *    coupons are lgK-independent) — the branches the fork left
  *    unimplemented (hll/union.go:273,289,303), implemented here with
  *    upstream's effective-lgK = min semantics.
  *
  * Dense registers are a flat Array[Byte] — "columnar-within-one-value",
  * the layout that makes the TypedImperativeAggregate buffer mapping
  * natural (SURVEY §1.1).
  */
final class HllSketch private (
    private var _lgK: Int,
    private var sparse: java.util.HashSet[Integer],
    private var regs: Array[Byte],
    private var hipAccum: Double,
    private var kxq: Double,
    private var outOfOrder: Boolean) extends Serializable {

  import HllSketch._

  def lgK: Int = _lgK

  def this(lgK: Int) = {
    this(lgK, new java.util.HashSet[Integer](), null, 0.0, 0.0, false)
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK") // hll/utils.go:109-114
  }

  def k: Int = 1 << lgK
  def isDense: Boolean = regs != null

  // ---- update ------------------------------------------------------------

  def update(bytes: Array[Byte]): Unit = {
    val (lo, hi) = Murmur3x128.hashBytes(bytes, Murmur3x128.DefaultSeed)
    couponUpdate(coupon(lo, hi))
  }

  def update(s: String): Unit =
    update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def update(v: Long): Unit = {
    val (lo, hi) = Murmur3x128.hashLong(v, Murmur3x128.DefaultSeed)
    couponUpdate(coupon(lo, hi))
  }

  def update(d: Double): Unit = {
    // canonicalize -0.0 == 0.0 so equal doubles hash equal
    val canon = if (d == 0.0) 0.0 else d
    update(java.lang.Double.doubleToLongBits(canon))
  }

  /** Raw (base,offset,len) update for zero-copy UTF8String hashing. */
  def updateRaw(base: AnyRef, offset: Long, len: Int): Unit = {
    val (lo, hi) = Murmur3x128.hash(base, offset, len, Murmur3x128.DefaultSeed)
    couponUpdate(coupon(lo, hi))
  }

  private def couponUpdate(c: Int): Unit = {
    if (isDense) denseUpdate(c)
    else {
      sparse.add(c)
      if (sparse.size > (k >> 2)) promote() // sparse worthwhile until ~K/4 coupons
    }
  }

  private def promote(): Unit = {
    regs = new Array[Byte](k)
    kxq = k.toDouble // all registers 0: sum 2^-0 over k slots
    val it = sparse.iterator()
    while (it.hasNext) denseUpdate(it.next())
    // HIP is not valid for replayed coupons (duplicates were deduped);
    // recompute a consistent HIP baseline from the composite estimate
    hipAccum = compositeEstimate
    sparse = null
  }

  private def denseUpdate(c: Int): Unit = {
    val slot = (c & SlotMask26) & (k - 1)
    val value = (c >>> ValueShift) & 0x3f
    val old = regs(slot) & 0xff
    if (value > old) {
      // HIP/KxQ incremental maintenance (reference: hll/hll_8array.go:131-147)
      if (!outOfOrder) hipAccum += k / kxq
      kxq += invPow2(value) - invPow2(old)
      regs(slot) = value.toByte
    }
    // non-growing updates do not advance HIP: duplicates must not change
    // the estimate
  }

  // ---- estimate ----------------------------------------------------------

  def estimate: Double = {
    if (!isDense) {
      // coupon-count -> n cubic interpolation over the published mapping
      // (reference hll/coupon.go:75-79) — collisions in the 26-bit coupon
      // space start to matter above ~10^5 coupons
      val c = sparse.size
      return math.max(
        interop.DataSketchesHll.cubicWithTables(
          interop.HllXTables.couponMappingX, interop.HllXTables.couponMappingY, c.toDouble),
        c.toDouble)
    }
    if (outOfOrder) compositeEstimate else hipAccum
  }

  /** Reference composite estimator (hll/hll_estimator.go:26-77): raw HLL
    * estimate corrected through the published cubic-interpolation bias
    * tables, with the harmonic linear-counting estimator below the
    * crossover — replaces the round-1 classic alpha*m^2 + linear-counting
    * estimator, whose mid-range error exceeded the reference's +-2%
    * golden tolerance. */
  private def compositeEstimate: Double = {
    var curMin = 64
    var numAtCurMin = 0
    var i = 0
    while (i < k) {
      val v = regs(i) & 0xff
      if (v <= curMin) {
        if (v < curMin) { curMin = v; numAtCurMin = 1 } else numAtCurMin += 1
      }
      i += 1
    }
    interop.DataSketchesHll.compositeEstimate(lgK, kxq, curMin, numAtCurMin)
  }

  /** Closed-form relative standard error (reference: hll/utils.go:51-54). */
  def rse: Double =
    (if (outOfOrder) 1.0390 else 0.8326) / math.sqrt(k.toDouble)

  def lowerBound(numStdDev: Int): Double = {
    require(numStdDev >= 1 && numStdDev <= 3)
    if (!isDense) {
      // coupon-mode bounds (hll/coupon.go:92-101): interval around the
      // interpolated estimate, floored at the coupon count — returning the
      // bare estimate put LB above the true count whenever the mapping
      // rounds up (estimate(200 coupons) ≈ 200.003 > n = 200)
      val c = sparse.size
      return math.max(estimate / (1.0 + numStdDev * CouponRse), c.toDouble)
    }
    estimate / (1.0 + numStdDev * rse)
  }

  def upperBound(numStdDev: Int): Double = {
    require(numStdDev >= 1 && numStdDev <= 3)
    if (!isDense) {
      val c = sparse.size
      return math.max(estimate / (1.0 - numStdDev * CouponRse), c.toDouble)
    }
    estimate / (1.0 - numStdDev * rse)
  }

  // ---- merge ---------------------------------------------------------------

  /** Downsample in place to a smaller lgK. Valid because both the coupon
    * slot address and the dense slot index take the LOW bits of the same
    * 26-bit hash field, and the register value (leading-zero count of the
    * other hash word) is lgK-independent: newReg[s & (k'-1)] = max over
    * folded slots is exactly the sketch that direct updates at lgK' would
    * have produced, register for register. HIP does not survive a fold →
    * out-of-order composite estimation afterwards. */
  def downsample(targetLgK: Int): HllSketch = {
    require(targetLgK >= 4 && targetLgK <= _lgK,
      s"can only downsample: $targetLgK vs ${_lgK}")
    if (targetLgK == _lgK) return this
    if (!isDense) {
      _lgK = targetLgK // coupons are lgK-independent; threshold shrinks
      if (sparse.size > (k >> 2)) promote()
      return this
    }
    val k2 = 1 << targetLgK
    val folded = new Array[Byte](k2)
    var i = 0
    while (i < k) {
      val s2 = i & (k2 - 1)
      if ((regs(i) & 0xff) > (folded(s2) & 0xff)) folded(s2) = regs(i)
      i += 1
    }
    _lgK = targetLgK
    regs = folded
    kxq = k2.toDouble
    i = 0
    while (i < k2) {
      val v = folded(i) & 0xff
      if (v > 0) kxq += invPow2(v) - 1.0
      i += 1
    }
    outOfOrder = true
    hipAccum = 0.0
    this
  }

  /** In-place union. lgK mismatches resolve to the SMALLER lgK (upstream
    * union semantics — the branches the fork left unimplemented,
    * hll/union.go:273,289,303): the larger side is slot-folded down. */
  def merge(other0: HllSketch): HllSketch = {
    if (other0.lgK < _lgK) downsample(other0.lgK)
    val other =
      if (other0.lgK > _lgK) other0.copy().downsample(_lgK) else other0
    if (!other.isDense) {
      val it = other.sparse.iterator()
      if (!isDense && sparse.size + other.sparse.size <= (k >> 2)) {
        while (it.hasNext) sparse.add(it.next()) // set-union keeps exactness
      } else {
        outOfOrder = true
        while (it.hasNext) couponUpdate(it.next())
      }
    } else {
      if (!isDense) promote()
      outOfOrder = true
      var i = 0
      while (i < k) {
        val ov = other.regs(i) & 0xff
        val mv = regs(i) & 0xff
        if (ov > mv) {
          kxq += invPow2(ov) - invPow2(mv)
          regs(i) = ov.toByte
        }
        i += 1
      }
    }
    this
  }

  // ---- serialize -----------------------------------------------------------

  /** Compact little-endian image (own layout, 8-byte preamble in the spirit
    * of hll/preamble_utils.go:27-90): canonical — sparse coupons sorted. */
  def serialize(): Array[Byte] = {
    if (!isDense) {
      val coupons = new Array[Int](sparse.size)
      val it = sparse.iterator()
      var i = 0
      while (it.hasNext) { coupons(i) = it.next(); i += 1 }
      java.util.Arrays.sort(coupons)
      val bb = ByteBuffer.allocate(8 + 4 + 4 * coupons.length).order(ByteOrder.LITTLE_ENDIAN)
      putPreamble(bb, mode = 0)
      bb.putInt(coupons.length)
      coupons.foreach(bb.putInt)
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(8 + 8 + 8 + k).order(ByteOrder.LITTLE_ENDIAN)
      putPreamble(bb, mode = 1)
      bb.putDouble(hipAccum)
      bb.putDouble(kxq)
      bb.put(regs)
      bb.array()
    }
  }

  private def putPreamble(bb: ByteBuffer, mode: Int): Unit = {
    bb.put(Magic)             // 0: magic
    bb.put(1.toByte)          // 1: serVer
    bb.put(FamilyHll)         // 2: family id 7 (internal/family.go:31-44 convention)
    bb.put(lgK.toByte)        // 3: lgK
    bb.put(mode.toByte)       // 4: mode 0=sparse 1=dense
    bb.put((if (outOfOrder) 1 else 0).toByte) // 5: flags
    bb.putShort(0)            // 6-7: pad
  }

  def copy(): HllSketch = HllSketch.deserialize(serialize())

  /** H21 — (key, value) pair iteration over the current representation
    * (hll/pair_iterator.go:20-95, hll/hll_pair_iterator.go:20-52).
    *
    * Sparse mode iterates the stored coupons with `intArrayPairIterator`'s
    * decoding: key = low 26 bits of the coupon, value = high 6 bits,
    * slot = key & (k-1). Dense mode follows `hllPairIterator`: one pair
    * per register with key = slot = index and value = the register.
    *
    * `validOnly = true` is `nextValid` (empty cells skipped); `false` is
    * `nextAll`. Our sparse store is a hash set rather than the reference's
    * open-addressing int array, so sparse `nextAll` has no empty physical
    * cells to visit and equals `nextValid` — the same documented deviation
    * as the Frequencies map (F8). */
  def pairIterator(validOnly: Boolean = true): Iterator[HllSketch.Pair] =
    if (!isDense) {
      val mask = k - 1
      scala.jdk.CollectionConverters.IteratorHasAsScala(sparse.iterator())
        .asScala.zipWithIndex.map { case (c, i) =>
          val key = c.intValue() & SlotMask26
          HllSketch.Pair(i, key, (c.intValue() >>> ValueShift) & 0x3f, key & mask)
        }
    } else {
      Iterator.range(0, k).map { i =>
        HllSketch.Pair(i, i, regs(i) & 0xff, i)
      }.filter(p => !validOnly || p.value != 0)
    }

  /** Export as an Apache DataSketches-format compact image (write-side
    * cross-language compat), mirroring upstream mode selection:
    *  - ≤ 8 coupons → LIST image (the reference libraries reject SET mode
    *    for lgK ≤ 7 — coupon_hash_set.go:198 requires lgConfigK > 7 — and
    *    upstream keeps small sketches in LIST mode anyway);
    *  - more coupons with lgK > 7 → SET image;
    *  - more coupons with lgK ≤ 7 → densified first (upstream promotes
    *    LIST straight to HLL below lgK 8), emitted as an HLL image;
    *  - dense → HLL image in the requested target encoding (HLL8 default;
    *    HLL4 = nibbles + curMin offset + aux exception map, HLL6 = 6-bit
    *    packing — hll/to_slice_impl.go:108-168, hll/hll_4array.go:128-175,
    *    hll/hll_6array.go:144-171) with recomputed curMin/numAtCurMin and
    *    split KxQ0/KxQ1.
    * Round-trips through interop.DataSketchesHll.read and is readable by
    * the Java/C++/Go libraries (layouts per hll/preamble_utils.go:27-90). */
  def toDataSketchesImage: Array[Byte] = toDataSketchesImage(HllSketch.TgtHll8)

  def toDataSketchesImage(tgtType: Int): Array[Byte] =
    toDataSketchesImage(tgtType, compact = true)

  /** UPDATABLE-form export (`ToUpdatableSlice`, hll/to_slice_impl.go:25-93):
    * same preambles with the compact flag CLEAR; LIST/SET write the full
    * 2^lgArr coupon array (SET coupons at their open-addressing probe
    * positions — the reference's updatable read path raw-copies the array,
    * coupon_hash_set.go:239-246, so placement must match findCoupon);
    * HLL4 writes the full 2^lgAuxArrInts aux array (re-inserted on read,
    * aux_hash_map.go:80-93, so any nonzero placement is legal — probe
    * placement used anyway). A consumer can continue in-place updates. */
  def toDataSketchesUpdatableImage(tgtType: Int = HllSketch.TgtHll8): Array[Byte] =
    toDataSketchesImage(tgtType, compact = false)

  def toDataSketchesImage(tgtType: Int, compact: Boolean): Array[Byte] = {
    require(tgtType >= 0 && tgtType <= 2, s"tgtType must be 0 (HLL4), 1 (HLL6) or 2 (HLL8)")
    val emptyFlag = 4; val compactFlag = 8; val oooFlag = 16
    val cFlag = if (compact) compactFlag else 0
    val ListCap = 8 // upstream LIST capacity before SET/HLL promotion
    if (!isDense) {
      val coupons = new Array[Int](sparse.size)
      val it = sparse.iterator()
      var i = 0
      while (it.hasNext) { coupons(i) = it.next(); i += 1 }
      java.util.Arrays.sort(coupons)
      if (coupons.length <= ListCap) {
        // LIST image: preInts 2, count byte at offset 6. Updatable form
        // writes the full 8-slot array (lgInitListSize = 3); the LIST
        // probe is a linear scan from 0, so front-packed coupons are
        // exactly what continued updates expect (coupon_list.go:64-84).
        val slots = if (compact) coupons.length else 1 << 3
        val bb = ByteBuffer.allocate(8 + 4 * slots).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(2.toByte)  // preInts (LIST)
        bb.put(1.toByte)  // serVer
        bb.put(FamilyHll)
        bb.put(lgK.toByte)
        bb.put(3.toByte)  // lgArr (LIST starts at 8 slots)
        bb.put((cFlag | (if (coupons.isEmpty) emptyFlag else 0)).toByte)
        bb.put(coupons.length.toByte)
        bb.put(((tgtType << 2) | 0).toByte) // modeByte: curMode LIST
        coupons.foreach(bb.putInt)
        bb.array()
      } else if (lgK > 7 && 4 * coupons.length <= 3 * (1 << (lgK - 3))) {
        if (compact) {
          val bb = ByteBuffer.allocate(12 + 4 * coupons.length).order(ByteOrder.LITTLE_ENDIAN)
          bb.put(3.toByte)  // preInts (SET)
          bb.put(1.toByte)  // serVer
          bb.put(FamilyHll)
          bb.put(lgK.toByte)
          bb.put(5.toByte)  // lgArr (informational for compact images)
          bb.put(compactFlag.toByte)
          bb.put(0.toByte)  // unused (set count lives at int 8)
          bb.put(((tgtType << 2) | 1).toByte) // modeByte: curMode SET
          bb.putInt(coupons.length)
          coupons.foreach(bb.putInt)
          bb.array()
        } else {
          // updatable SET: open-addressing array at the reference's load
          // factor (grow while 4·count > 3·2^lgArr, lgInitSetSize = 5,
          // promoted to HLL beyond lgK-3 — coupon_hash_set.go:113-125),
          // coupons at their findCoupon probe positions
          var lgArr = 5
          while (4 * coupons.length > 3 * (1 << lgArr) && lgArr < lgK - 3) lgArr += 1
          val n = 1 << lgArr
          val mask = n - 1
          val arr = new Array[Int](n)
          val keyMask26 = (1 << 26) - 1
          coupons.foreach { c =>
            var probe = c & mask
            while (arr(probe) != 0) {
              val stride = ((c & keyMask26) >>> lgArr) | 1
              probe = (probe + stride) & mask
            }
            arr(probe) = c
          }
          val bb = ByteBuffer.allocate(12 + 4 * n).order(ByteOrder.LITTLE_ENDIAN)
          bb.put(3.toByte); bb.put(1.toByte); bb.put(FamilyHll); bb.put(lgK.toByte)
          bb.put(lgArr.toByte)
          bb.put(0.toByte)  // flags: not compact
          bb.put(0.toByte)
          bb.put(((tgtType << 2) | 1).toByte)
          bb.putInt(coupons.length)
          arr.foreach(bb.putInt)
          bb.array()
        }
      } else {
        // No legal sparse image: lgK ≤ 7 with an over-LIST coupon count
        // (upstream promotes LIST→HLL directly), OR a coupon count beyond
        // the reference SET capacity 3/4·2^(lgK−3) (its hash set promotes
        // to HLL instead of growing past lgArr = lgK−3,
        // coupon_hash_set.go:113-125). Our sparse phase holds up to k/4
        // coupons — twice that capacity — so mid-size sketches DO land
        // here; emitting SET anyway would be an image no upstream
        // lifecycle produces (and the updatable open-addressing insert
        // above would spin on a full array). Densify a copy and emit HLL.
        val dense = copy()
        dense.promote()
        dense.toDataSketchesImage(tgtType, compact)
      }
    } else {
      var curMin = 64
      var numAtCurMin = 0
      var kxq0 = k.toDouble
      var kxq1 = 0.0
      var i = 0
      while (i < k) {
        val v = regs(i) & 0xff
        if (v > 0) {
          val inv = invPow2(v)
          if (v < 32) kxq0 += inv - 1.0 else kxq1 += inv - 1.0
        }
        if (v <= curMin) {
          if (v < curMin) { curMin = v; numAtCurMin = 1 } else numAtCurMin += 1
        }
        i += 1
      }
      // register payload in the target encoding
      val (arr, auxPairs) = tgtType match {
        case HllSketch.TgtHll8 => (regs.clone(), Array.emptyIntArray)
        case HllSketch.TgtHll6 =>
          val out = new Array[Byte](((k * 3) >>> 2) + 1)
          var s = 0
          while (s < k) {
            val v = regs(s) & 0x3f
            val startBit = s * 6
            val byteIdx = startBit >>> 3
            val shift = startBit & 7
            val cur = (out(byteIdx) & 0xff) | ((out(byteIdx + 1) & 0xff) << 8)
            val merged = cur | (v << shift)
            out(byteIdx) = (merged & 0xff).toByte
            out(byteIdx + 1) = ((merged >>> 8) & 0xff).toByte
            s += 1
          }
          (out, Array.emptyIntArray)
        case _ => // HLL4: nibble = v - curMin capped at 14; 15 → aux holds v
          val out = new Array[Byte](k >>> 1)
          val aux = scala.collection.mutable.ArrayBuffer.empty[Int]
          var s = 0
          while (s < k) {
            val v = regs(s) & 0xff
            val rel = v - curMin
            val nib =
              if (rel < 15) rel
              else { aux += ((v << 26) | (s & ((1 << 26) - 1))); 15 }
            if ((s & 1) == 0) out(s >>> 1) = (out(s >>> 1) | nib).toByte
            else out(s >>> 1) = (out(s >>> 1) | (nib << 4)).toByte
            s += 1
          }
          (out, aux.toArray)
      }
      // updatable HLL4 writes the FULL open-addressing aux array — even
      // when empty (to_slice_impl.go:27-41: auxBytes = 4 << lgAuxArrInts
      // for HLL4 with no aux map); pairs sit at their findAuxHashMap
      // probe positions (slotNo-keyed, aux_hash_map.go:197-217)
      val isHll4 = tgtType == HllSketch.TgtHll4
      val (auxOut, lgAux) =
        if (compact || !isHll4) (auxPairs, 0)
        else {
          var lg = HllSketch.lgAuxArrInts(lgK)
          while (4 * auxPairs.length > 3 * (1 << lg) && lg < lgK - 1) lg += 1
          val n = 1 << lg
          val full = new Array[Int](n)
          val mask = n - 1
          auxPairs.foreach { p =>
            val slotNo = p & (k - 1)
            var probe = slotNo & mask
            while (full(probe) != 0) {
              probe = (probe + ((slotNo >>> lg) | 1)) & mask
            }
            full(probe) = p
          }
          (full, lg)
        }
      val bb = ByteBuffer.allocate(40 + arr.length + 4 * auxOut.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(10.toByte) // preInts (HLL)
      bb.put(1.toByte)  // serVer
      bb.put(FamilyHll)
      bb.put(lgK.toByte)
      bb.put(lgAux.toByte) // lgArr: aux array size for updatable HLL4, else 0
      bb.put((cFlag | (if (outOfOrder) oooFlag else 0)).toByte)
      bb.put(curMin.toByte)
      bb.put(((tgtType << 2) | 2).toByte) // modeByte: curMode HLL
      bb.putDouble(if (outOfOrder) 0.0 else hipAccum)
      bb.putDouble(kxq0)
      bb.putDouble(kxq1)
      bb.putInt(numAtCurMin)
      bb.putInt(auxPairs.length)
      bb.put(arr)
      auxOut.foreach(bb.putInt)
      bb.array()
    }
  }
}

object HllSketch {
  final val Magic: Byte = 'G'
  final val FamilyHll: Byte = 7
  final val DefaultLgK = 12

  // DataSketches target-encoding ids (TgtHllType convention)
  final val TgtHll4 = 0
  final val TgtHll6 = 1
  final val TgtHll8 = 2

  // coupon layout: [valueShift..] 6-bit value | 26-bit slot address
  final val SlotMask26: Int = (1 << 26) - 1
  final val ValueShift: Int = 26

  /** H21 iteration element: the reference `pairIterator`'s getIndex /
    * getKey / getValue / getSlot, with `packed` = getPair (key in the low
    * 26 bits, value above — hll/pair_iterator.go:52-55). */
  final case class Pair(index: Int, key: Int, value: Int, slot: Int) {
    def packed: Int = key | (value << ValueShift)
  }

  /** coupon from a 128-bit hash (convention per hll/hll_sketch.go:338-343). */
  def coupon(lo: Long, hi: Long): Int = {
    val addr = (lo & SlotMask26).toInt
    val value = math.min(java.lang.Long.numberOfLeadingZeros(hi), 62) + 1
    (value << ValueShift) | addr
  }

  /** Coupon-mode RSE at the transition point (hll/utils.go:43-44). */
  final val CouponRse: Double = 0.409 / (1 << 13)

  /** Log2 aux-array sizes by lgK (published constants, hll/utils.go:99-106). */
  private[sketch] val lgAuxArrInts: Array[Int] = Array(
    0, 2, 2, 2, 2, 2, 2, 3, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16, 17, 18)

  private val InvPow2Table: Array[Double] = Array.tabulate(64)(i => math.pow(2.0, -i))
  @inline def invPow2(v: Int): Double = InvPow2Table(v)

  /** Import an Apache DataSketches HLL image (any mode, any encoding —
    * Java/C++/Go) into the engine's sketch: coupon modes map directly (the
    * (value<<26)|slot pair encoding is shared), HLL4/6/8 registers all land
    * in our byte registers — the H17 "convert" semantics, and the bridge
    * that lets externally-generated sketches union with Spark aggregates. */
  def fromDataSketchesImage(bytes: Array[Byte]): HllSketch = {
    val img = graft.sketch.interop.DataSketchesHll.read(bytes)
    if (img.mode != 2) {
      val set = new java.util.HashSet[Integer](math.max(16, img.coupons.length * 2))
      img.coupons.foreach(c => if (c != 0) set.add(c))
      new HllSketch(img.lgK, set, null, 0.0, 0.0, img.outOfOrder)
    } else {
      val k = 1 << img.lgK
      val regs = new Array[Byte](k)
      var kxq = k.toDouble
      var i = 0
      while (i < k) {
        val v = img.slots(i)
        regs(i) = v.toByte
        if (v > 0) kxq += invPow2(v) - 1.0
        i += 1
      }
      val hipValid = !img.outOfOrder && !img.rebuildFlags && img.hipAccum > 0.0
      new HllSketch(img.lgK, null, regs, img.hipAccum, kxq, !hipValid)
    }
  }

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == Magic, "bad magic")
    require(bb.get() == 1, "bad serVer")
    require(bb.get() == FamilyHll, "bad family")
    val lgK = bb.get().toInt
    val mode = bb.get().toInt
    val flags = bb.get().toInt
    bb.getShort()
    if (mode == 0) {
      val n = bb.getInt()
      val set = new java.util.HashSet[Integer](math.max(16, n * 2))
      var i = 0
      while (i < n) { set.add(bb.getInt()); i += 1 }
      new HllSketch(lgK, set, null, 0.0, 0.0, (flags & 1) == 1)
    } else {
      val hip = bb.getDouble()
      val kxq = bb.getDouble()
      val regs = new Array[Byte](1 << lgK)
      bb.get(regs)
      new HllSketch(lgK, null, regs, hip, kxq, (flags & 1) == 1)
    }
  }
}
