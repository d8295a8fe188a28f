package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

class MediaCodecSpec extends AnyFunSuite {

  private def pixels(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * bpp)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + 7) & 0xff).toByte; i += 1 }
    px
  }

  test("PNG: encode → header + full pixel decode roundtrip (gray/RGB/RGBA)") {
    for (bpp <- Seq(1, 3, 4)) {
      val (w, h) = (13, 7) // odd dims: exercises stride arithmetic
      val px = pixels(w, h, bpp)
      val png = MediaCodec.pngEncode(w, h, bpp, px)
      val hdr = MediaCodec.decodeHeader(png).get
      assert(hdr.format === "png" && hdr.width === w && hdr.height === h && hdr.nFrames === 1)
      val Some((dw, dh, dbpp, dpx)) = MediaCodec.pngDecodePixels(png)
      assert(dw === w && dh === h && dbpp === bpp)
      assert(dpx.sameElements(px))
    }
  }

  /** Build a PNG whose scanlines use a CHOSEN filter per row (our encoder
    * only emits filter 0; a standards decoder must reverse all five). */
  private def pngWithFilters(w: Int, h: Int, bpp: Int, px: Array[Byte],
                             filterOf: Int => Int): Array[Byte] = {
    val stride = w * bpp
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      val f = filterOf(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val v = px(y * stride + x) & 0xff
        val a = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(ByteBuffer.allocate(4).putInt(data.length).array())
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32; crc.update(tb); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val colorType = bpp match { case 1 => 0 case 3 => 2 case 4 => 6 }
    chunk("IHDR", ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zb = new Array[Byte](raw.length + 64)
    val zo = new java.io.ByteArrayOutputStream()
    while (!d.finished()) zo.write(zb, 0, d.deflate(zb))
    d.end()
    chunk("IDAT", zo.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("PNG: all five scanline filters unfiltered correctly") {
    val (w, h, bpp) = (9, 10, 3)
    val px = pixels(w, h, bpp)
    // row y uses filter y % 5 → every filter appears twice
    val png = pngWithFilters(w, h, bpp, px, y => y % 5)
    val Some((_, _, _, dpx)) = MediaCodec.pngDecodePixels(png)
    assert(dpx.sameElements(px))
  }

  test("PNG: corrupt IHDR CRC and truncated IDAT rejected, not thrown") {
    val png = MediaCodec.pngEncode(5, 5, 3, pixels(5, 5, 3))
    val badCrc = png.clone(); badCrc(8 + 8 + 13) = (badCrc(8 + 8 + 13) ^ 0x5a).toByte
    assert(MediaCodec.decodeHeader(badCrc).isEmpty)
    val truncated = java.util.Arrays.copyOf(png, png.length - 16)
    assert(MediaCodec.decodeHeader(truncated).isDefined) // header intact...
    assert(MediaCodec.pngDecodePixels(truncated).isEmpty) // ...pixels are not
  }

  test("PNG: nearest-neighbor resize picks real source pixels") {
    val (w, h) = (8, 6)
    val px = pixels(w, h, 3)
    val png = MediaCodec.pngEncode(w, h, 3, px)
    val out = MediaCodec.pngResizeNearest(png, 0.5).get
    val Some((nw, nh, _, npx)) = MediaCodec.pngDecodePixels(out)
    assert(nw === 4 && nh === 3)
    for (y <- 0 until nh; x <- 0 until nw; c <- 0 until 3) {
      val sx = (x.toLong * w / nw).toInt; val sy = (y.toLong * h / nh).toInt
      assert(npx((y * nw + x) * 3 + c) === px((sy * w + sx) * 3 + c))
    }
    // upscale works too
    val up = MediaCodec.pngResizeNearest(png, 2.0).get
    assert(MediaCodec.decodeHeader(up).get.width === 16)
  }

  test("JPEG: SOF dimensions found through APP0/SOS, 0xff-stuffed body safe") {
    val body = Array.tabulate[Byte](300)(i => if (i % 7 == 0) 0xff.toByte else (i * 13).toByte)
    val jpg = MediaCodec.jpegBuild(640, 480, body)
    val hdr = MediaCodec.decodeHeader(jpg).get
    assert(hdr.format === "jpeg" && hdr.width === 640 && hdr.height === 480)
    // truncation before SOF → clean None
    assert(MediaCodec.decodeHeader(java.util.Arrays.copyOf(jpg, 10)).isEmpty)
  }

  test("GIF: logical screen dims, frame count, per-frame payload roundtrip") {
    val frames = (0 until 5).map(i => Array.tabulate[Byte](300 + i)(j => (i * 31 + j).toByte))
    val gif = MediaCodec.gifBuild(320, 200, frames)
    val hdr = MediaCodec.decodeHeader(gif).get
    assert(hdr.format === "gif" && hdr.width === 320 && hdr.height === 200 && hdr.nFrames === 5)
    val got = MediaCodec.gifFrames(gif).get
    assert(got.size === 5)
    got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // missing trailer → structural corruption → None
    assert(MediaCodec.gifFrames(java.util.Arrays.copyOf(gif, gif.length - 1)).isEmpty)
  }

  test("WAV: sample rate from fmt chunk, odd-length data chunk padded") {
    val wav = MediaCodec.wavBuild(22050, Array.tabulate[Byte](101)(_.toByte))
    val hdr = MediaCodec.decodeHeader(wav).get
    assert(hdr.format === "wav" && hdr.sampleRate === 22050 && hdr.width === 0)
  }

  test("sniffing: garbage, empty and null-ish payloads are None") {
    assert(MediaCodec.decodeHeader(null).isEmpty)
    assert(MediaCodec.decodeHeader(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeHeader(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.decodeHeader(Array.fill[Byte](64)(0x42)).isEmpty)
  }

  /** Patch an IHDR field in a real PNG and re-sign the chunk CRC so the
    * payload reaches the dimension/flag guards instead of the CRC check. */
  private def patchIhdr(png: Array[Byte], off: Int, bytes: Array[Byte]): Array[Byte] = {
    val p = png.clone()
    System.arraycopy(bytes, 0, p, off, bytes.length)
    val crc = new CRC32; crc.update(p, 12, 4 + 13)
    ByteBuffer.wrap(p, 8 + 8 + 13, 4).putInt(crc.getValue.toInt)
    p
  }

  test("PNG: hostile IHDR dimensions are rejected, never a negative/huge allocation") {
    val png = MediaCodec.pngEncode(3, 2, 3, pixels(3, 2, 3))
    // h = 2^29 with w = 3, bpp 3: h * (stride + 1) int-overflows negative —
    // the pre-allocation Long guard must return None, not throw
    val hugeH = patchIhdr(png, 20, ByteBuffer.allocate(4).putInt(1 << 29).array())
    assert(MediaCodec.decodeHeader(hugeH).exists(_.height === (1 << 29))) // header itself parses
    assert(MediaCodec.pngDecodePixels(hugeH).isEmpty)
    // non-overflowing but over-budget (20000 x 20000 RGB ≈ 1.2 GB)
    val bigWh = patchIhdr(patchIhdr(png, 16,
      ByteBuffer.allocate(4).putInt(20000).array()), 20,
      ByteBuffer.allocate(4).putInt(20000).array())
    assert(MediaCodec.pngDecodePixels(bigWh).isEmpty)
  }

  test("PNG: interlaced / nonzero compression / filter-method rejected, not misdecoded") {
    val png = MediaCodec.pngEncode(5, 4, 3, pixels(5, 4, 3))
    for (off <- Seq(26, 27, 28)) { // compression, filter method, interlace
      val bad = patchIhdr(png, off, Array[Byte](1))
      assert(MediaCodec.decodeHeader(bad).exists(_.format === "png"))
      assert(MediaCodec.pngDecodePixels(bad).isEmpty, s"IHDR byte $off = 1 must not decode")
    }
  }

  test("PNG: resize with hostile scale returns None instead of overflowing") {
    val png = MediaCodec.pngEncode(8, 8, 3, pixels(8, 8, 3))
    assert(MediaCodec.pngResizeNearest(png, 1e18).isEmpty)
    assert(MediaCodec.pngResizeNearest(png, Double.PositiveInfinity).isEmpty)
    assert(MediaCodec.pngResizeNearest(png, Double.NaN).isEmpty)
    // sane scales still work
    assert(MediaCodec.pngResizeNearest(png, 0.5).flatMap(MediaCodec.decodeHeader)
      .exists(h => h.width === 4 && h.height === 4))
  }
}
