package graft.ops

import graft.ops.RawImage.Ppm

/**
 * Pure-JVM GIF PIXEL codec (GIF87a/GIF89a): logical-screen descriptor,
 * global and local color tables, full LZW decompression (variable code
 * width 3–12 bits, clear/EOI codes, dictionary rebuild), the GIF
 * four-pass row interlace, sub-block reassembly, and extension-block
 * skipping (graphic control, comment, application). Completes the
 * still-image matrix: PNG, JPEG (baseline + progressive), PPM and GIF
 * all decode to raw pixels with zero codec libraries.
 *
 * Scope: the FIRST image frame, composed at its (left, top) offset
 * onto the logical screen filled with the background color — the
 * feature path treats a GIF as a still; animation policy (frame
 * iteration) follows [[AviCodec]]'s shape if ever needed. Transparency
 * (GCE bit) is parsed and DROPPED (pixels reported as stored), the
 * same opacity policy as [[PngCodec]]'s alpha.
 *
 * The encoder emits a real GIF89a — global color table from first-seen
 * distinct colors (≤256), genuine LZW compression with dictionary
 * growth and clear-on-full, optional interlace — so round-trips are
 * fixture-free and, GIF being lossless, bit-exact.
 *
 * Malformed-input contract: None on bad signature, truncated
 * descriptors or sub-blocks, out-of-range color indices, LZW code
 * overruns or a first code that is not a literal — never an
 * exception. A pixel cap bounds decode memory.
 */
object GifCodec {

  /** Default decode cap: 2^24 pixels (= 48 MiB of RGB). */
  val DefaultMaxPixels: Long = 1L << 24

  /** GIF interlace passes: (start row, step). */
  private val Interlace = Array((0, 8), (4, 8), (2, 4), (1, 2))

  // ----------------------------------------------------------------
  // Encode
  // ----------------------------------------------------------------

  /** GIF89a encoder: ≤256 distinct colors, real LZW. The palette is
    * first-seen order; `interlaced` emits the four-pass row order. */
  def encode(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int),
      interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "GIF dimensions must be positive")
    val palette = new java.util.LinkedHashMap[Int, Int]()
    val idx = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(x, y)
        val key = (r << 16) | (g << 8) | b
        var i = palette.getOrDefault(key, -1)
        if (i < 0) { i = palette.size(); palette.put(key, i) }
        idx(y * w + x) = i
        x += 1
      }
      y += 1
    }
    require(palette.size() <= 256,
      s"${palette.size()} distinct colors exceed GIF's 256")
    // color-table size: the smallest 2^(n+1) ≥ palette size, n ≥ 1
    var gctBits = 1
    while ((1 << gctBits) < palette.size()) gctBits += 1
    if (gctBits < 1) gctBits = 1
    val minCode = math.max(2, gctBits) // LZW minimum code size

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    out.write(0x80 | ((gctBits - 1) << 4) | (gctBits - 1)) // GCT present
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    val it = palette.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val k = it.next()
      out.write((k >> 16) & 0xff); out.write((k >> 8) & 0xff)
      out.write(k & 0xff)
      written += 1
    }
    while (written < (1 << gctBits)) { // pad table to declared size
      out.write(0); out.write(0); out.write(0); written += 1
    }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0) // no LCT
    out.write(minCode)

    // ---- LZW compress the index stream in row order ----
    val rows: Seq[Int] =
      if (interlaced) Interlace.toSeq.flatMap { case (s, st) =>
        s until h by st
      } else 0 until h
    val stream = new Array[Int](w * h)
    var si = 0
    for (ry <- rows) { var x = 0; while (x < w) {
      stream(si) = idx(ry * w + x); si += 1; x += 1 } }

    val clear = 1 << minCode
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCode + 1
    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dictionary: (prefixCode << 8 | byte) → code
    var dict = new java.util.HashMap[Int, Integer]()
    var nextCode = eoi + 1
    putCode(clear)
    var prefix = -1
    var i = 0
    while (i < stream.length) {
      val k = stream(i)
      if (prefix < 0) prefix = k
      else {
        val key = (prefix << 8) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          putCode(prefix)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
            // widen AFTER the add: codes up to nextCode−1 may be
            // emitted next (the decoder widens at the mirror point)
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12)
              codeSize += 1
          } else { // dict full: clear and restart (decoder mirrors)
            putCode(clear)
            dict = new java.util.HashMap[Int, Integer]()
            nextCode = eoi + 1
            codeSize = minCode + 1
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) putCode(prefix)
    putCode(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    // sub-block the LZW stream
    val z = data.toByteArray
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      out.write(n); out.write(z, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Decode
  // ----------------------------------------------------------------

  def decode(b: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[Ppm] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(p: Int): Int =
      if (p + 1 >= b.length) -1
      else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > maxPixels) return None
    val flags = b(10) & 0xff
    val bgIndex = b(11) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (pos + n > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
    }

    // fill screen with background color (or black without a GCT)
    val rgb = new Array[Byte](sw * sh * 3)
    if (gct != null && 3 * bgIndex + 2 < gct.length) {
      var i = 0
      while (i < sw * sh) {
        rgb(3 * i) = gct(3 * bgIndex); rgb(3 * i + 1) = gct(3 * bgIndex + 1)
        rgb(3 * i + 2) = gct(3 * bgIndex + 2)
        i += 1
      }
    }

    // block walk to the first image descriptor
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label + sub-blocks, all skipped
          pos += 2
          var n = if (pos < b.length) b(pos) & 0xff else -1
          while (n > 0) {
            pos += 1 + n
            n = if (pos < b.length) b(pos) & 0xff else -1
          }
          if (n < 0) return None
          pos += 1 // terminator
        case 0x2C =>
          if (pos + 10 > b.length) return None
          val left = u16(pos + 1); val top = u16(pos + 3)
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val iflags = b(pos + 9) & 0xff
          pos += 10
          if (iw <= 0 || ih <= 0 || left < 0 || top < 0 ||
            left + iw > sw || top + ih > sh) return None
          var table = gct
          if ((iflags & 0x80) != 0) { // local color table
            val n = 3 * (1 << ((iflags & 7) + 1))
            if (pos + n > b.length) return None
            table = java.util.Arrays.copyOfRange(b, pos, pos + n)
            pos += n
          }
          if (table == null) return None
          val interlaced = (iflags & 0x40) != 0
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 11) return None
          // reassemble sub-blocks
          val z = new java.io.ByteArrayOutputStream()
          var n = if (pos < b.length) b(pos) & 0xff else -1
          while (n > 0) {
            if (pos + 1 + n > b.length) return None
            z.write(b, pos + 1, n)
            pos += 1 + n
            n = if (pos < b.length) b(pos) & 0xff else -1
          }
          if (n < 0) return None
          pos += 1 // consume the 0x00 block terminator
          val idx = lzwDecode(z.toByteArray, minCode, iw * ih)
          if (idx == null) return None
          // place pixels (interlace passes or sequential)
          val rowOrder: Seq[Int] =
            if (interlaced) Interlace.toSeq.flatMap { case (s, st) =>
              s until ih by st
            } else 0 until ih
          var si = 0
          for (ry <- rowOrder) {
            var x = 0
            while (x < iw) {
              val ci = idx(si); si += 1
              if (3 * ci + 2 >= table.length) return None
              val o = ((top + ry) * sw + left + x) * 3
              rgb(o) = table(3 * ci); rgb(o + 1) = table(3 * ci + 1)
              rgb(o + 2) = table(3 * ci + 2)
              x += 1
            }
          }
          // the stream must continue validly after the frame: trailer,
          // extension, or another frame (animation) — a cut right
          // after the pixel data is a truncation, not a GIF
          if (pos >= b.length) return None
          val nb = b(pos) & 0xff
          if (nb != 0x3B && nb != 0x21 && nb != 0x2C) return None
          return Some(Ppm(sw, sh, rgb))
        case _ => return None
      }
    }
    None
  }

  /** LZW decompress exactly `expect` indices; null on any malformed
    * condition (bad first code, overrun, missing data). */
  private def lzwDecode(z: Array[Byte], minCode: Int,
      expect: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix, suffix) pairs; codes < clear are roots
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Int](4096)
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    val out = new Array[Int](expect)
    var outN = 0
    var bitPos = 0
    def readCode(): Int = {
      if (bitPos + codeSize > z.length * 8) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if ((z(p >> 3) & (1 << (p & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    val stack = new Array[Int](4096)
    /** Append the string for `code` to out; its first char, or -1. */
    def emit(code: Int): Int = {
      var c = code
      var sp = 0
      while (c >= clear) { // composite entry: walk to the root
        if (sp >= 4096) return -1
        stack(sp) = suffixOf(c); sp += 1
        c = prefixOf(c)
      }
      if (outN + sp + 1 > expect) return -1 // more pixels than declared
      out(outN) = c; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      c
    }
    def add(prefix: Int, first: Int): Unit =
      if (nextCode < 4096) {
        prefixOf(nextCode) = prefix; suffixOf(nextCode) = first
        nextCode += 1
        // widen BEFORE the next read: the encoder may emit code
        // nextCode−1 (or the KwKwK nextCode) at the wider size
        if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    var prev = -1
    while (true) {
      val code = readCode()
      if (code < 0) return null // ran out of data before EOI
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == expect) out else null
      } else if (prev < 0) {
        if (code >= clear || outN >= expect) return null
        out(outN) = code; outN += 1
        prev = code
      } else if (code < nextCode) {
        val first = emit(code)
        if (first < 0) return null
        add(prev, first)
        prev = code
      } else if (code == nextCode && nextCode < 4096) {
        // KwKwK: string = prev's string + its own first char
        var c = prev
        while (c >= clear) c = prefixOf(c)
        add(prev, c)
        if (emit(code) < 0) return null
        prev = code
      } else return null // code beyond the dictionary
    }
    null // unreachable
  }
}
