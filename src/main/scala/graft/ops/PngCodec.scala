package graft.ops

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/**
 * Pure-JVM PNG PIXEL codec — the COMPLETE still-image decode matrix of
 * RFC 2083: all five color types (0 grayscale, 2 truecolor, 3 palette,
 * 4 gray+alpha, 6 RGBA), every legal bit depth (1/2/4/8/16 gray,
 * 1/2/4/8 palette, 8/16 for the multi-channel types), the five
 * scanline filters (None/Sub/Up/Average/Paeth, §6) at the correct
 * per-pixel byte offset, and Adam7 interlacing (§8.2) with per-pass
 * geometry and empty-pass handling. No codec library: zlib IS in the
 * JVM (`java.util.zip.Inflater`), and unfiltering, bit-unpacking and
 * pass placement are integer math.
 *
 * Output is [[RawImage.Ppm]] (8-bit RGB), so resize and feature
 * extraction compose unchanged. Sample normalization: sub-8-bit gray
 * scales by 255/(2^d−1) (the exact PNG sample expansion), 16-bit takes
 * the high byte, palette indices look up PLTE. The alpha channel is
 * parsed and range-checked but DROPPED (pixels reported as stored, not
 * composited) — the feature path treats images as opaque; compositing
 * policy belongs to the caller.
 *
 * The encoder emits any supported (colorType, bitDepth, interlace)
 * combination with real CRCs and per-scanline filter choice (default
 * cycles all five types), so round-trips exercise every unfilter ×
 * geometry × unpacking path fixture-free. Gray depths quantize by
 * round(v·(2^d−1)/255) — values of the form 255k/(2^d−1) round-trip
 * bit-exactly; 16-bit samples are v·257 so the high byte is exact.
 *
 * Malformed-input contract: None on bad signature, chunk overruns, CRC
 * mismatch, illegal IHDR combinations, missing/short PLTE,
 * out-of-range palette index, truncated or trailing IDAT data, or an
 * unknown filter byte — never an exception. A pixel-count cap bounds
 * decompression (zip bombs decode to None, not an OOM).
 */
object PngCodec {

  private val Sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Default decode cap: 2^24 pixels (= 48 MiB of RGB). */
  val DefaultMaxPixels: Long = 1L << 24

  /** Adam7 pass geometry: (xStart, yStart, xStep, yStep), §8.2. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => -1
  }

  private def legalDepth(colorType: Int, d: Int): Boolean = colorType match {
    case 0 => d == 1 || d == 2 || d == 4 || d == 8 || d == 16
    case 3 => d == 1 || d == 2 || d == 4 || d == 8
    case 2 | 4 | 6 => d == 8 || d == 16
    case _ => false
  }

  // ----------------------------------------------------------------
  // Encode
  // ----------------------------------------------------------------

  /** 8-bit truecolor encoder (the original API): each scanline is
    * FILTERED by `filterFor(y)` (default cycles through all five
    * types, so a round-trip exercises every unfilter path), then the
    * whole filtered stream is zlib-deflated. */
  def encode(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int),
      filterFor: Int => Int = _ % 5): Array[Byte] =
    encodeFull(w, h, pixel, colorType = 2, bitDepth = 8,
      interlaced = false, filterFor = filterFor)

  /** Full-matrix encoder: any legal (colorType, bitDepth), optional
    * Adam7 interlace. Gray types take the RED channel as the gray
    * sample and quantize to depth; palette type builds PLTE from
    * first-seen distinct colors (must fit 2^depth entries); alpha
    * channels take `alpha(x, y)` (default opaque). */
  def encodeFull(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int),
      colorType: Int = 2, bitDepth: Int = 8, interlaced: Boolean = false,
      alpha: (Int, Int) => Int = (_, _) => 255,
      filterFor: Int => Int = _ % 5): Array[Byte] = {
    require(w > 0 && h > 0, "PNG dimensions must be positive")
    require(legalDepth(colorType, bitDepth),
      s"illegal colorType=$colorType bitDepth=$bitDepth")
    val ch = channelsOf(colorType)

    // palette: first-seen distinct colors
    val palette = new java.util.LinkedHashMap[Int, Int]()
    if (colorType == 3) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pixel(x, y)
          val key = (r << 16) | (g << 8) | b
          if (!palette.containsKey(key))
            palette.put(key, palette.size())
          x += 1
        }
        y += 1
      }
      require(palette.size() <= (1 << bitDepth),
        s"${palette.size()} distinct colors exceed depth-$bitDepth palette")
    }
    val maxD = (1 << bitDepth) - 1

    /** Depth-domain samples of one pixel: 8-bit inputs quantized to
      * depth d (16-bit via ×257, so the decoder's high byte is exact). */
    def samples(x: Int, y: Int): Array[Int] = {
      val (r, g, b) = pixel(x, y)
      def q(v: Int): Int =
        if (bitDepth == 16) v * 257
        else if (bitDepth == 8) v
        else math.round(v * maxD / 255.0f)
      colorType match {
        case 0 => Array(q(r))
        case 2 => Array(q(r), q(g), q(b))
        case 3 => Array(palette.get((r << 16) | (g << 8) | b))
        case 4 => Array(q(r), q(alpha(x, y)))
        case 6 => Array(q(r), q(g), q(b), q(alpha(x, y)))
      }
    }

    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced) Adam7 else Array((0, 0, 1, 1))
    val fu = math.max(1, ch * bitDepth / 8) // filter unit, bytes
    val filteredAll = new java.io.ByteArrayOutputStream()
    var globalRow = 0
    for ((x0, y0, dx, dy) <- passes) {
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val rowBytes = (wp.toLong * ch * bitDepth + 7).toInt / 8
        var prev: Array[Byte] = null
        var j = 0
        while (j < hp) {
          val row = new Array[Byte](rowBytes)
          // pack this pass row's samples
          var bitPos = 0
          var i = 0
          while (i < wp) {
            val s = samples(x0 + i * dx, y0 + j * dy)
            var c = 0
            while (c < s.length) {
              val v = s(c)
              if (bitDepth == 16) {
                row(bitPos >> 3) = (v >> 8).toByte
                row((bitPos >> 3) + 1) = v.toByte
                bitPos += 16
              } else if (bitDepth == 8) {
                row(bitPos >> 3) = v.toByte
                bitPos += 8
              } else { // 1/2/4: MSB-first packing
                val shift = 8 - bitDepth - (bitPos & 7)
                row(bitPos >> 3) =
                  (row(bitPos >> 3) | ((v & maxD) << shift)).toByte
                bitPos += bitDepth
              }
              c += 1
            }
            i += 1
          }
          // filter
          val ft = filterFor(globalRow) % 5
          filteredAll.write(ft)
          var i2 = 0
          while (i2 < rowBytes) {
            val cur = row(i2) & 0xff
            val left = if (i2 >= fu) row(i2 - fu) & 0xff else 0
            val up = if (prev != null) prev(i2) & 0xff else 0
            val ul = if (prev != null && i2 >= fu) prev(i2 - fu) & 0xff
                     else 0
            val f = ft match {
              case 0 => cur
              case 1 => cur - left
              case 2 => cur - up
              case 3 => cur - (left + up) / 2
              case 4 => cur - paeth(left, up, ul)
            }
            filteredAll.write(f & 0xff)
            i2 += 1
          }
          prev = row
          globalRow += 1
          j += 1
        }
      }
    }

    val filtered = filteredAll.toByteArray
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
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = if (interlaced) 1 else 0
    writeChunk(out, "IHDR", ihdr)
    if (colorType == 3) {
      val plte = new Array[Byte](3 * palette.size())
      val it = palette.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey; val idx = e.getValue
        plte(3 * idx) = (k >> 16).toByte
        plte(3 * idx + 1) = (k >> 8).toByte
        plte(3 * idx + 2) = k.toByte
      }
      writeChunk(out, "PLTE", plte)
    }
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
    // ---- chunk walk: IHDR, PLTE?, IDAT* (concatenated), IEND ----
    var i = 8
    var ihdr: Array[Byte] = null
    var plte: Array[Byte] = null
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
        case "PLTE" =>
          if (plte != null || len == 0 || len % 3 != 0 || len > 768)
            return None
          plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
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
    val depth = ihdr(8) & 0xff
    val colorType = ihdr(9) & 0xff
    val interlace = ihdr(12) & 0xff
    // legality: depth×type combos of §4.1.1; compression/filter method
    // 0; interlace 0 or 1 — anything else is a declared None
    if (!legalDepth(colorType, depth) || ihdr(10) != 0 ||
        ihdr(11) != 0 || interlace > 1) return None
    if (colorType == 3 && plte == null) return None
    val ch = channelsOf(colorType)
    val fu = math.max(1, ch * depth / 8)

    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 1) Adam7 else Array((0, 0, 1, 1))
    // pass geometry + expected inflated size (Long math: a caller-
    // raised maxPixels must not overflow into a negative allocation)
    var expectL = 0L
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val rowBytes = (wp.toLong * ch * depth + 7) / 8
        expectL += hp.toLong * (1L + rowBytes)
      }
      (wp, hp)
    }
    if (expectL > Int.MaxValue || expectL == 0) return None
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

    // ---- per pass: unfilter, unpack samples, place pixels ----
    val rgb = new Array[Byte](w * h * 3)
    val grayScale = if (depth >= 8) 1 else 255 / ((1 << depth) - 1)
    var off = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (wp, hp) = passDims(pi)
      if (wp > 0 && hp > 0) {
        val rowBytes = ((wp.toLong * ch * depth + 7) / 8).toInt
        var prev: Array[Byte] = null
        var j = 0
        while (j < hp) {
          val ft = filtered(off) & 0xff
          if (ft > 4) return None
          off += 1
          val row = new Array[Byte](rowBytes)
          var x = 0
          while (x < rowBytes) {
            val f = filtered(off + x) & 0xff
            val left = if (x >= fu) row(x - fu) & 0xff else 0
            val up = if (prev != null) prev(x) & 0xff else 0
            val ul = if (prev != null && x >= fu) prev(x - fu) & 0xff
                     else 0
            val v = ft match {
              case 0 => f
              case 1 => f + left
              case 2 => f + up
              case 3 => f + (left + up) / 2
              case 4 => f + paeth(left, up, ul)
            }
            row(x) = v.toByte
            x += 1
          }
          off += rowBytes
          // unpack this row's pixels into the output grid
          var i2 = 0
          while (i2 < wp) {
            val px = x0 + i2 * dx
            val py = y0 + j * dy
            var r = 0; var g = 0; var bl = 0
            if (depth < 8) { // gray 1/2/4 or palette 1/2/4
              val bitPos = i2 * depth
              val v = ((row(bitPos >> 3) & 0xff) >>
                (8 - depth - (bitPos & 7))) & ((1 << depth) - 1)
              if (colorType == 3) {
                if (3 * v + 2 >= plte.length) return None
                r = plte(3 * v) & 0xff; g = plte(3 * v + 1) & 0xff
                bl = plte(3 * v + 2) & 0xff
              } else { r = v * grayScale; g = r; bl = r }
            } else {
              val step = if (depth == 16) 2 else 1
              val base = i2 * ch * step
              def samp(c: Int): Int = row(base + c * step) & 0xff // hi byte
              colorType match {
                case 0 => r = samp(0); g = r; bl = r
                case 2 => r = samp(0); g = samp(1); bl = samp(2)
                case 3 =>
                  val v = samp(0)
                  if (3 * v + 2 >= plte.length) return None
                  r = plte(3 * v) & 0xff; g = plte(3 * v + 1) & 0xff
                  bl = plte(3 * v + 2) & 0xff
                case 4 => r = samp(0); g = r; bl = r // alpha dropped
                case 6 => r = samp(0); g = samp(1); bl = samp(2)
              }
            }
            val o = (py * w + px) * 3
            rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = bl.toByte
            i2 += 1
          }
          prev = row
          j += 1
        }
      }
      pi += 1
    }
    Some(RawImage.Ppm(w, h, rgb))
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
