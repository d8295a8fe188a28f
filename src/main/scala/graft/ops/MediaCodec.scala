package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media codecs: real container/header parsing for PNG, JPEG,
  * GIF and WAV, plus a full PNG pixel codec (inflate → unfilter →
  * resample → refilter → deflate) — no dependencies beyond `java.util.zip`.
  *
  * This retires the round-1..4 `decodeStub`: the multimodal plumbing in
  * [[Multimodal]] now runs against genuine byte formats. Scope is the
  * header/pixel layer a training-data pipeline needs for media stats,
  * dimension filters, frame-level dedup keys and thumbnailing; full
  * JPEG entropy decode and GIF LZW expansion stay out of scope (their
  * *containers* are parsed for dimensions/frames, which is what the
  * 100 TB health queries read).
  *
  * All parsers are defensive: any malformed length/offset returns None
  * instead of throwing — at 10^12 rows poison payloads are a certainty
  * and a task-killing header parse is an outage.
  */
object MediaCodec {

  /** Decoded container metadata. `format` is sniffed from the payload
    * magic, never trusted from row metadata. */
  final case class Header(format: String, width: Int, height: Int,
                          nFrames: Int, sampleRate: Int)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def decodeHeader(p: Array[Byte]): Option[Header] = {
    if (p == null || p.length < 4) return None
    try {
      if (p.length >= 8 && PngSig.indices.forall(i => p(i) == PngSig(i))) pngHeader(p)
      else if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) jpegHeader(p)
      else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') gifHeader(p)
      else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
               p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') wavHeader(p)
      else None
    } catch { case _: IndexOutOfBoundsException | _: ArithmeticException => None }
  }

  // ---- PNG ----------------------------------------------------------------
  // Layout: 8-byte signature, then chunks of (len u32BE, type 4cc, data,
  // crc32BE over type+data). IHDR must come first: width u32BE, height
  // u32BE, bitDepth, colorType, compression, filter, interlace.

  private def be32(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
  private def be16(p: Array[Byte], o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
  private def le16(p: Array[Byte], o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) | ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

  private def pngHeader(p: Array[Byte]): Option[Header] = {
    if (p.length < 8 + 8 + 13 + 4) return None
    if (be32(p, 8) != 13) return None // IHDR data length
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) return None
    val crc = new CRC32; crc.update(p, 12, 4 + 13)
    if (crc.getValue.toInt != be32(p, 8 + 8 + 13)) return None // corrupt header
    val w = be32(p, 16); val h = be32(p, 20)
    if (w <= 0 || h <= 0) return None
    Some(Header("png", w, h, 1, 0))
  }

  /** Decoded-pixel budget: IHDR dimensions arrive from untrusted bytes, so
    * every buffer size is computed in Long and capped here BEFORE any
    * allocation — a hostile 3×2^29 header must return None, not throw
    * NegativeArraySizeException (int overflow) or attempt a multi-GB
    * allocation. 256 MB covers any thumbnail/feature-extract input this
    * layer is scoped for. */
  val MaxDecodedBytes: Long = 1L << 28

  /** Full PNG pixel decode for the 8-bit formats (gray / RGB / RGBA):
    * concatenate IDAT, inflate, reverse per-scanline filters 0–4.
    * Returns (width, height, bytesPerPixel, pixels row-major). */
  def pngDecodePixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    // cheap sniff first: a non-PNG payload (e.g. a GIF, whose header parse
    // is a full block walk) must cost 8 byte compares here, not a
    // decodeHeader pass it immediately discards
    if (p == null || p.length < 8 + 8 + 13 + 4 ||
        !PngSig.indices.forall(i => p(i) == PngSig(i))) return None
    val hdr = pngHeader(p) match {
      case Some(h) => h
      case _ => return None
    }
    try {
      val bitDepth = p(24) & 0xff
      val colorType = p(25) & 0xff
      if (bitDepth != 8) return None
      val bpp = colorType match {
        case 0 => 1 case 2 => 3 case 6 => 4 case _ => return None
      }
      // compression 0 (deflate) and filter method 0 are the only defined
      // values; interlace 1 (Adam7) lays scanlines out in 7 passes — the
      // sequential unfilter below would decode plausible garbage, so it is
      // rejected, not misread
      if ((p(26) & 0xff) != 0 || (p(27) & 0xff) != 0 || (p(28) & 0xff) != 0) return None
      // raw = h filtered scanlines of (stride + 1) bytes — the largest buffer
      if (hdr.height.toLong * (hdr.width.toLong * bpp + 1) > MaxDecodedBytes)
        return None
      // walk chunks, concatenating IDAT
      val idat = new java.io.ByteArrayOutputStream()
      var o = 8
      var done = false
      while (!done && o + 8 <= p.length) {
        val len = be32(p, o)
        if (len < 0 || o + 12 + len > p.length) return None
        val t = new String(p, o + 4, 4, "US-ASCII")
        if (t == "IDAT") idat.write(p, o + 8, len)
        if (t == "IEND") done = true
        o += 12 + len
      }
      val w = hdr.width; val h = hdr.height
      val stride = w * bpp
      val raw = new Array[Byte](h * (stride + 1))
      val inf = new Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated
        got += n
      }
      inf.end()
      if (got < raw.length) return None
      // unfilter in place into out
      val out = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        val rowIn = y * (stride + 1) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val rawB = raw(rowIn + x) & 0xff
          val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0 // left
          val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0 // up
          val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
          val v = f match {
            case 0 => rawB
            case 1 => rawB + a
            case 2 => rawB + b
            case 3 => rawB + ((a + b) >> 1)
            case 4 => // Paeth predictor
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
              rawB + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          out(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, bpp, out))
    } catch { case _: IndexOutOfBoundsException | _: java.util.zip.DataFormatException => None }
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32; crc.update(tb); crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode 8-bit pixels (bpp 1/3/4) as a PNG: filter 0 scanlines,
    * single deflated IDAT. */
  def pngEncode(w: Int, h: Int, bpp: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * bpp, s"pixels ${pixels.length} != $w*$h*$bpp")
    val colorType = bpp match {
      case 1 => 0 case 3 => 2 case 4 => 6
      case _ => throw new IllegalArgumentException(s"bpp $bpp")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    pngChunk(out, "IHDR", ihdr.array())
    val stride = w * bpp
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = 0 // filter: none
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val def_ = new Deflater(Deflater.BEST_SPEED)
    def_.setInput(raw); def_.finish()
    val zBuf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) zOut.write(zBuf, 0, def_.deflate(zBuf))
    def_.end()
    pngChunk(out, "IDAT", zOut.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Real nearest-neighbor PNG resize: decode pixels, resample, re-encode.
    * None for malformed input OR a target exceeding [[MaxDecodedBytes]]
    * (a huge `scale` must not int-overflow into a negative allocation). */
  def pngResizeNearest(p: Array[Byte], scale: Double): Option[Array[Byte]] =
    pngDecodePixels(p).flatMap { case (w, h, bpp, px) =>
      // clamp BEFORE toLong: a huge scale saturates toLong at Long.MaxValue
      // and the nwL * nhL * bpp product below would wrap past the guard
      val nwL = math.max(1L, math.min(w * scale, 1e9).toLong)
      val nhL = math.max(1L, math.min(h * scale, 1e9).toLong)
      if (!java.lang.Double.isFinite(scale) || nwL * nhL * bpp > MaxDecodedBytes) None
      else {
        val nw = nwL.toInt; val nh = nhL.toInt
        val out = new Array[Byte](nw * nh * bpp)
        var y = 0
        while (y < nh) {
          val sy = math.min(h - 1, (y.toLong * h / nh).toInt)
          var x = 0
          while (x < nw) {
            val sx = math.min(w - 1, (x.toLong * w / nw).toInt)
            var c = 0
            while (c < bpp) {
              out((y * nw + x) * bpp + c) = px((sy * w + sx) * bpp + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Some(pngEncode(nw, nh, bpp, out))
      }
    }

  // ---- JPEG ---------------------------------------------------------------
  // Marker walk to the first SOFn segment (C0–CF except C4/C8/CC):
  // dimensions live at precision(1) height(2,BE) width(2,BE) after the
  // segment length.

  private def jpegHeader(p: Array[Byte]): Option[Header] = {
    var o = 2
    while (o + 4 <= p.length) {
      if ((p(o) & 0xff) != 0xff) return None // lost sync
      val marker = p(o + 1) & 0xff
      if (marker == 0xff) { o += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) o += 2 // standalone
      else if (marker == 0xd9) return None // EOI before SOF
      else {
        val len = be16(p, o + 2)
        if (len < 2 || o + 2 + len > p.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          val h = be16(p, o + 5); val w = be16(p, o + 7)
          if (w <= 0 || h <= 0) return None
          return Some(Header("jpeg", w, h, 1, 0))
        }
        if (marker == 0xda) return None // entropy stream w/o SOF
        o += 2 + len
      }
    }
    None
  }

  /** Minimal structurally-valid JPEG: SOI, JFIF APP0, SOF0 (3 components),
    * an opaque entropy body, EOI — enough container for any header parser;
    * the entropy data is arbitrary bytes (test/synthetic use). */
  def jpegBuild(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    out.write(app0)
    val sof = ByteBuffer.allocate(19)
    sof.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort)
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(1.toByte).put(0x22.toByte).put(0.toByte)
      .put(2.toByte).put(0x11.toByte).put(1.toByte)
      .put(3.toByte).put(0x11.toByte).put(1.toByte)
    out.write(sof.array())
    // SOS header then body with 0xff bytes stuffed so the marker walk
    // cannot misfire inside the entropy stream
    out.write(Array[Byte](0xff.toByte, 0xda.toByte, 0, 8, 1, 1, 0, 0, 63, 0))
    body.foreach { b =>
      out.write(b)
      if ((b & 0xff) == 0xff) out.write(0)
    }
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  // ---- GIF ----------------------------------------------------------------
  // Logical screen descriptor for dimensions; a full block walk counts
  // image descriptors (frames) and can hand out each frame's LZW payload
  // (the frame-level dedup key source).

  private def gifHeader(p: Array[Byte]): Option[Header] = {
    if (p.length < 13) return None
    val v = new String(p, 3, 3, "US-ASCII")
    if (v != "87a" && v != "89a") return None
    val w = le16(p, 6); val h = le16(p, 8)
    if (w <= 0 || h <= 0) return None
    gifFrames(p).map(frames => Header("gif", w, h, frames.size, 0))
  }

  /** Walk the GIF block structure; returns each frame's concatenated LZW
    * sub-block data (compressed — content-identity, which is all a dedup
    * key needs). None on structural corruption. */
  def gifFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
    try {
      var o = 13
      val packed = p(10) & 0xff
      if ((packed & 0x80) != 0) o += 3 * (1 << ((packed & 7) + 1)) // global color table
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def subBlocks(collect: Boolean): Option[Array[Byte]] = {
        val acc = if (collect) new java.io.ByteArrayOutputStream() else null
        var len = p(o) & 0xff; o += 1
        while (len != 0) {
          if (o + len > p.length) return None
          if (collect) acc.write(p, o, len)
          o += len
          if (o >= p.length) return None
          len = p(o) & 0xff; o += 1
        }
        Some(if (collect) acc.toByteArray else Array.emptyByteArray)
      }
      while (o < p.length) {
        (p(o) & 0xff) match {
          case 0x3b => return Some(frames.toSeq) // trailer
          case 0x21 => // extension: introducer, label, sub-blocks
            o += 2
            if (subBlocks(collect = false).isEmpty) return None
          case 0x2c => // image descriptor
            o += 1
            if (o + 9 > p.length) return None
            val lp = p(o + 8) & 0xff
            o += 9
            if ((lp & 0x80) != 0) o += 3 * (1 << ((lp & 7) + 1)) // local color table
            if (o >= p.length) return None
            o += 1 // LZW minimum code size
            subBlocks(collect = true) match {
              case Some(d) => frames += d
              case None => return None
            }
          case _ => return None
        }
      }
      None // ran off the end without a trailer
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Build an animated GIF89a with the given frame payloads (stored as the
    * LZW data sub-blocks verbatim — opaque content, valid container). */
  def gifBuild(w: Int, h: Int, frameData: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    val lsd = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
    lsd.putShort(w.toShort).putShort(h.toShort)
      .put(0.toByte).put(0.toByte).put(0.toByte) // no global color table
    out.write(lsd.array())
    frameData.foreach { d =>
      out.write(0x2c)
      val desc = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
      desc.putShort(0.toShort).putShort(0.toShort)
        .putShort(w.toShort).putShort(h.toShort).put(0.toByte)
      out.write(desc.array())
      out.write(8) // LZW min code size
      var i = 0
      while (i < d.length) {
        val n = math.min(255, d.length - i)
        out.write(n); out.write(d, i, n)
        i += n
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ---- WAV ----------------------------------------------------------------

  private def wavHeader(p: Array[Byte]): Option[Header] = {
    var o = 12
    while (o + 8 <= p.length) {
      val id = new String(p, o, 4, "US-ASCII")
      val size = le32(p, o + 4)
      if (size < 0 || o + 8 + size > p.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val rate = le32(p, o + 8 + 4)
        if (rate <= 0) return None
        return Some(Header("wav", 0, 0, 0, rate))
      }
      o += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    None
  }

  /** Minimal PCM WAV: RIFF/WAVE, fmt (mono 16-bit), data chunk. */
  def wavBuild(sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    val dataLen = data.length + (data.length & 1)
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }
}
