package graft.sketch.interop

/** Reader for Apache DataSketches HLL images (Java/C++/Go `.sk` files) —
  * the cross-language serde surface the reference tests against 92 golden
  * fixtures (hll/hll_sketch_serialization_test.go:68-176). This is a
  * READ-side implementation: it parses all three modes (LIST / SET / HLL)
  * and all three encodings (HLL4 + aux map, HLL6, HLL8), reproduces the
  * reference estimator chain (HIP accumulator when in-order, composite
  * cubic-interpolation estimator with linear-counting crossover otherwise,
  * coupon-mapping estimator for the sparse modes), and can import the
  * register state into the engine's own HLL sketch for further unions.
  *
  * Layout per hll/preamble_utils.go:27-120 and hll/to_slice_impl.go:25-168;
  * estimators per hll/hll_estimator.go:26-113, hll/coupon.go:75-79,
  * hll/cubic_interpolation.go:23-144. Written independently against those
  * specs; only the numeric tables (HllXTables) are transcribed.
  */
object DataSketchesHll {

  final case class Image(
      lgK: Int,
      mode: Int,          // 0 LIST, 1 SET, 2 HLL
      tgtType: Int,       // 0 HLL4, 1 HLL6, 2 HLL8
      empty: Boolean,
      outOfOrder: Boolean,
      /** slot values for HLL mode (length 2^lgK); empty otherwise */
      slots: Array[Int],
      /** raw coupons for LIST/SET modes; empty otherwise */
      coupons: Array[Int],
      hipAccum: Double,
      rebuildFlags: Boolean) {
    def estimate: Double = DataSketchesHll.estimate(this)
  }

  // --- preamble field offsets (hll/preamble_utils.go:27-67) ---------------
  private val LgKByte = 3
  private val LgArrByte = 4
  private val FlagsByte = 5
  private val ListCountByte = 6
  private val CurMinByte = 6
  private val ModeByte = 7
  private val ListArrStart = 8
  private val SetCountInt = 8
  private val SetArrStart = 12
  private val HipAccumDouble = 8
  private val CurMinCountInt = 32
  private val AuxCountInt = 36
  private val HllArrStart = 40

  private val EmptyFlag = 4
  private val CompactFlag = 8
  private val OooFlag = 16
  private val RebuildFlag = 32

  private val KeyMask26 = (1 << 26) - 1

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def i32(b: Array[Byte], i: Int): Int =
    (u8(b, i)) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def f64(b: Array[Byte], i: Int): Double = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (u8(b, i + j).toLong & 0xffL); j -= 1 }
    java.lang.Double.longBitsToDouble(v)
  }

  def read(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8, s"image too short: ${bytes.length}")
    val serVer = u8(bytes, 1)
    val family = u8(bytes, 2)
    require(serVer == 1, s"unsupported HLL serVer $serVer")
    require(family == 7, s"not an HLL image (family $family)")
    val lgK = u8(bytes, LgKByte)
    val flags = u8(bytes, FlagsByte)
    val empty = (flags & EmptyFlag) != 0
    val compact = (flags & CompactFlag) != 0
    val ooo = (flags & OooFlag) != 0
    val rebuild = (flags & RebuildFlag) != 0
    val mode = u8(bytes, ModeByte) & 3
    val tgt = (u8(bytes, ModeByte) & 12) >> 2

    mode match {
      case 0 => // LIST
        val count = if (empty) 0 else u8(bytes, ListCountByte)
        val coupons =
          if (compact) Array.tabulate(count)(i => i32(bytes, ListArrStart + 4 * i))
          else { // updatable: 2^lgArr slots, zeros are empty
            val n = 1 << u8(bytes, LgArrByte)
            (0 until n).map(i => i32(bytes, ListArrStart + 4 * i)).filter(_ != 0).toArray
          }
        Image(lgK, mode, tgt, empty, ooo, Array.emptyIntArray, coupons, 0.0, rebuild)
      case 1 => // SET
        val count = i32(bytes, SetCountInt)
        val coupons =
          if (compact) Array.tabulate(count)(i => i32(bytes, SetArrStart + 4 * i))
          else {
            val n = 1 << u8(bytes, LgArrByte)
            (0 until n).map(i => i32(bytes, SetArrStart + 4 * i)).filter(_ != 0).toArray
          }
        Image(lgK, mode, tgt, empty, ooo, Array.emptyIntArray, coupons, 0.0, rebuild)
      case 2 => // HLL
        val k = 1 << lgK
        val curMin = u8(bytes, CurMinByte)
        val hip = f64(bytes, HipAccumDouble)
        val auxCount = i32(bytes, AuxCountInt)
        val arrBytes = tgt match {
          case 0 => k >>> 1                 // HLL4: nibbles
          case 1 => ((k * 3) >>> 2) + 1     // HLL6: 6-bit packed
          case _ => k                       // HLL8
        }
        val slots = new Array[Int](k)
        tgt match {
          case 2 =>
            var i = 0
            while (i < k) { slots(i) = u8(bytes, HllArrStart + i); i += 1 }
          case 1 =>
            var i = 0
            while (i < k) {
              val startBit = i * 6
              val byteIdx = HllArrStart + (startBit >>> 3)
              val shift = startBit & 7
              val short = u8(bytes, byteIdx) | (u8(bytes, byteIdx + 1) << 8)
              slots(i) = (short >>> shift) & 0x3f
              i += 1
            }
          case 0 =>
            // nibble + curMin, with value 15 = exception -> aux map
            val aux = new java.util.HashMap[Integer, Integer]()
            val auxStart = HllArrStart + arrBytes
            if (auxCount > 0) {
              if (compact) {
                var i = 0
                while (i < auxCount) {
                  val pair = i32(bytes, auxStart + 4 * i)
                  aux.put(pair & KeyMask26, pair >>> 26)
                  i += 1
                }
              } else {
                val n = 1 << u8(bytes, LgArrByte)
                var i = 0
                while (i < n) {
                  val pair = i32(bytes, auxStart + 4 * i)
                  if (pair != 0) aux.put(pair & KeyMask26, pair >>> 26)
                  i += 1
                }
              }
            }
            var i = 0
            while (i < k) {
              val b = u8(bytes, HllArrStart + (i >>> 1))
              val nib = if ((i & 1) == 0) b & 0x0f else (b >>> 4) & 0x0f
              slots(i) =
                if (nib == 0x0f) {
                  val v = aux.get(i)
                  require(v != null, s"HLL4 aux exception missing for slot $i")
                  v.intValue()
                } else nib + curMin
              i += 1
            }
        }
        Image(lgK, mode, tgt, empty, ooo, slots, Array.emptyIntArray, hip, rebuild)
      case m => throw new IllegalArgumentException(s"bad curMode $m")
    }
  }

  /** Reference estimator chain. */
  def estimate(img: Image): Double = {
    if (img.empty) return 0.0
    if (img.mode != 2) {
      // coupon modes: cubic interpolation over the coupon mapping
      val c = if (img.mode == 0) img.coupons.count(_ != 0) else img.coupons.length
      val est = cubicWithTables(HllXTables.couponMappingX, HllXTables.couponMappingY, c.toDouble)
      return math.max(est, c.toDouble)
    }
    // HLL mode: recompute KxQ/curMin/numAtCurMin from registers (robust to
    // stale preamble values after gadget unions — union.go:310-363 logic)
    val k = 1 << img.lgK
    var kxq0 = k.toDouble
    var kxq1 = 0.0
    var curMin = 64
    var numAtCurMin = 0
    var i = 0
    while (i < k) {
      val v = img.slots(i)
      if (v > 0) {
        val inv = java.lang.Math.scalb(1.0, -v)
        if (v < 32) kxq0 += inv - 1.0 else kxq1 += inv - 1.0
      }
      if (v <= curMin) {
        if (v < curMin) { curMin = v; numAtCurMin = 1 } else numAtCurMin += 1
      }
      i += 1
    }
    if (!img.outOfOrder && !img.rebuildFlags && img.hipAccum > 0.0) img.hipAccum
    else compositeEstimate(img.lgK, kxq0 + kxq1, curMin, numAtCurMin)
  }

  /** hll_estimator.go:26-77 — raw HLL + cubic bias tables + linear
    * counting crossover. */
  def compositeEstimate(lgK: Int, kxqSum: Double, curMin: Int, numAtCurMin: Int): Double = {
    val k = 1 << lgK
    val correction =
      if (lgK == 4) 0.673
      else if (lgK == 5) 0.697
      else if (lgK == 6) 0.709
      else 0.7213 / (1.0 + 1.079 / k)
    val rawEst = correction * k.toDouble * k.toDouble / kxqSum

    val xArr = HllXTables.xArrs(lgK - 4)
    val yStride = HllXTables.yStrides(lgK - 4)
    val m1 = xArr.length - 1
    if (rawEst < xArr(0)) return 0.0
    val adjEst =
      if (rawEst > xArr(m1)) rawEst * (yStride * m1 / xArr(m1))
      else cubicWithStride(xArr, yStride, rawEst)
    if (adjEst > (3L << lgK).toDouble) return adjEst

    val linEst = bitMapEstimate(lgK, curMin, numAtCurMin)
    val avg = (adjEst + linEst) / 2.0
    val crossover =
      if (lgK == 4) 0.718 else if (lgK == 5) 0.672 else 0.64
    if (avg > crossover * k) adjEst else linEst
  }

  /** Coupon-collector estimator for small n (hll_estimator.go:81-95). */
  def bitMapEstimate(lgK: Int, curMin: Int, numAtCurMin: Int): Double = {
    val k = 1 << lgK
    val numUnhit = if (curMin == 0) numAtCurMin else 0
    if (numUnhit == 0) return k * math.log(k / 0.5)
    val numHit = k - numUnhit
    k * (harmonic(k) - harmonic(k - numHit))
  }

  private def harmonic(n: Int): Double = {
    val tbl = HllXTables.exactHarmonicNumbers
    if (n < tbl.length) return tbl(n)
    val x = n.toDouble
    val invSq = 1.0 / (x * x)
    var sum = math.log(x) + 0.577215664901532860606512090082 + 1.0 / (2.0 * x)
    var pow = invSq
    sum -= pow / 12.0; pow *= invSq
    sum += pow / 120.0; pow *= invSq
    sum -= pow / 252.0; pow *= invSq
    sum += pow / 240.0
    sum
  }

  // --- Lagrange cubic interpolation (cubic_interpolation.go:23-144) -------

  private def cubic(x0: Double, y0: Double, x1: Double, y1: Double,
                    x2: Double, y2: Double, x3: Double, y3: Double, x: Double): Double = {
    val t0 = y0 * ((x - x1) * (x - x2) * (x - x3)) / ((x0 - x1) * (x0 - x2) * (x0 - x3))
    val t1 = y1 * ((x - x0) * (x - x2) * (x - x3)) / ((x1 - x0) * (x1 - x2) * (x1 - x3))
    val t2 = y2 * ((x - x0) * (x - x1) * (x - x3)) / ((x2 - x0) * (x2 - x1) * (x2 - x3))
    val t3 = y3 * ((x - x0) * (x - x1) * (x - x2)) / ((x3 - x0) * (x3 - x1) * (x3 - x2))
    t0 + t1 + t2 + t3
  }

  /** Index of the largest xArr value <= x (binary search). */
  private def straddle(xArr: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = xArr.length - 1
    while (lo + 1 < hi) {
      val mid = lo + (hi - lo) / 2
      if (xArr(mid) <= x) lo = mid else hi = mid
    }
    lo
  }

  private def pickOffset(len: Int, offset: Int): Int =
    if (offset == 0) 0
    else if (offset == len - 2) offset - 2
    else offset - 1

  def cubicWithTables(xArr: Array[Double], yArr: Array[Double], x: Double): Double = {
    require(x >= xArr(0) && x <= xArr(xArr.length - 1), s"X out of range: $x")
    if (x == xArr(xArr.length - 1)) return yArr(yArr.length - 1)
    val o = pickOffset(xArr.length, straddle(xArr, x))
    cubic(xArr(o), yArr(o), xArr(o + 1), yArr(o + 1),
      xArr(o + 2), yArr(o + 2), xArr(o + 3), yArr(o + 3), x)
  }

  def cubicWithStride(xArr: Array[Double], yStride: Double, x: Double): Double = {
    require(x >= xArr(0) && x <= xArr(xArr.length - 1), s"X out of range: $x")
    if (x == xArr(xArr.length - 1)) return yStride * (xArr.length - 1)
    val o = pickOffset(xArr.length, straddle(xArr, x))
    cubic(xArr(o), yStride * o, xArr(o + 1), yStride * (o + 1),
      xArr(o + 2), yStride * (o + 2), xArr(o + 3), yStride * (o + 3), x)
  }
}
