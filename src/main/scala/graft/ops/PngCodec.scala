package graft.ops

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/**
 * Pure-JVM PNG PIXEL codec for the subset a training pipeline's
 * synthetic/feature path needs: 8-bit truecolor (color type 2),
 * non-interlaced — decoded all the way to raw RGB via
 * `java.util.zip.Inflater` plus the five standard scanline filters
 * (None/Sub/Up/Average/Paeth, RFC 2083 §6). No codec library: zlib IS
 * in the JVM, and unfiltering is integer math. This moves the most
 * common image format from header-only ([[ImageHeaders]]) to real pixel
 * math; the remaining codec boundary is JPEG entropy decode and video.
 *
 * Decoded images reuse [[RawImage.Ppm]], so resize and feature
 * extraction compose unchanged.
 *
 * Malformed-input contract: None on bad signature, chunk overruns, CRC
 * mismatch, unsupported IHDR (bit depth ≠ 8, color type ≠ 2,
 * interlaced), truncated or trailing IDAT data, or an unknown filter
 * byte — never an exception. A pixel-count cap bounds decompression
 * (zip bombs decode to None, not an OOM).
 */
object PngCodec {

  private val Sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Default decode cap: 2^24 pixels (= 48 MiB of RGB). */
  val DefaultMaxPixels: Long = 1L << 24

  // ----------------------------------------------------------------
  // Encode
  // ----------------------------------------------------------------

  /** Full PNG encoder (8-bit RGB, one IDAT, real CRCs): each scanline
    * is FILTERED by `filterFor(y)` (default cycles through all five
    * types, so a round-trip exercises every unfilter path), then the
    * whole filtered stream is zlib-deflated. */
  def encode(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int),
      filterFor: Int => Int = _ % 5): Array[Byte] = {
    require(w > 0 && h > 0, "PNG dimensions must be positive")
    val stride = 3 * w
    val raw = new Array[Byte](h * stride) // unfiltered scanlines
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(x, y)
        val i = y * stride + 3 * x
        raw(i) = r.toByte; raw(i + 1) = g.toByte; raw(i + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    val filtered = new Array[Byte](h * (1 + stride))
    y = 0
    while (y < h) {
      val ft = filterFor(y) % 5
      filtered(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = raw(y * stride + i) & 0xff
        val left = if (i >= 3) raw(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) raw((y - 1) * stride + i - 3) & 0xff
                 else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        filtered(y * (1 + stride) + 1 + i) = f.toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream(zbuf.size() + 64)
    out.write(Sig, 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zbuf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Decode
  // ----------------------------------------------------------------

  def decode(b: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[RawImage.Ppm] = {
    if (b.length < 8 + 25 || !b.startsWith(Sig)) return None
    // ---- chunk walk: IHDR, IDAT* (concatenated), IEND ----
    var i = 8
    var ihdr: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      if (i + 12 > b.length) return None // truncated chunk header
      val len = be32(b, i)
      // Long-widened bound: len near Int.MaxValue would overflow an Int
      // sum, slip past the guard, and crash CRC32 — the never-throw
      // contract needs the comparison, not the crash
      if (len < 0 || i.toLong + 12L + len > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(b, i + 4, 4 + len)
      if (crc.getValue != (be32(b, i + 8 + len).toLong & 0xffffffffL))
        return None // corrupt chunk
      typ match {
        case "IHDR" =>
          if (ihdr != null || len != 13) return None
          ihdr = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + 13)
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => ended = true
        case _      => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    if (ihdr == null) return None
    val w = be32(ihdr, 0)
    val h = be32(ihdr, 4)
    if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
    // supported subset: 8-bit RGB, default compression/filter, no
    // interlace — anything else is a declared None, not a wrong decode
    if (ihdr(8) != 8 || ihdr(9) != 2 || ihdr(10) != 0 ||
        ihdr(11) != 0 || ihdr(12) != 0) return None

    // ---- inflate to exactly h·(1+3w) filtered bytes ----
    // Long math throughout: a caller-raised maxPixels could push 3·w or
    // h·(1+3w) past Int.MaxValue — that is a None (unallocatable), not
    // an overflow-driven NegativeArraySizeException
    val expectL = h.toLong * (1L + 3L * w)
    if (expectL > Int.MaxValue) return None
    val stride = 3 * w
    val expect = expectL.toInt
    val filtered = new Array[Byte](expect)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, expect - got)
        if (n == 0 && inflater.needsInput()) return None // truncated
        got += n
      }
      if (got < expect) return None
      // stream must END here: trailing pixel data means the IHDR lied
      val probe = new Array[Byte](1)
      if (!inflater.finished() && inflater.inflate(probe) > 0) return None
    } catch {
      case _: DataFormatException => return None
    } finally inflater.end()

    // ---- unfilter (RFC 2083 §6.2–6.6), bpp = 3 ----
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = filtered(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= 3) raw(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) raw((y - 1) * stride + x - 3) & 0xff
                 else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }
        raw(y * stride + x) = v.toByte
        x += 1
      }
      y += 1
    }
    Some(RawImage.Ppm(w, h, raw))
  }

  /** Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4)
    putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }
}
