package graft.ops

import graft.ops.RawImage.Ppm

/**
 * Pure-JVM baseline JPEG PIXEL codec — the entropy-decode boundary that
 * [[PngCodec]]'s scaladoc declared as the remaining gap. Implements the
 * baseline sequential DCT process of ITU T.81: Huffman entropy coding
 * (arbitrary DHT tables, canonical BITS/HUFFVAL construction), 8- and
 * 16-bit DQT tables, restart markers, 1- or 3-component scans with
 * sampling factors 1–2 (4:4:4, 4:2:2, 4:2:0), separable IDCT, nearest
 * chroma upsampling and JFIF YCbCr→RGB. PROGRESSIVE (SOF2) decode is
 * fully supported (round 5): spectral-selection bands, successive
 * approximation (DC/AC first + refinement scans, T.81 G.2), EOB runs
 * and restart markers, with coefficients accumulated across scans and
 * reconstructed at EOI. Arithmetic coding, lossless and 12-bit
 * precision are refused (None), not mis-decoded.
 *
 * The encoder exists to make the decoder testable end-to-end without
 * binary fixtures: it emits valid baseline JPEGs (flat 8-bit canonical
 * Huffman tables — legal DHT, trivially correct) at any quality,
 * optionally 4:2:0-subsampled. At quality 100 every quantizer is 1, and
 * for images that are (a) grayscale in content (r=g=b) and (b) uniform
 * within each aligned 8×8 block, the round-trip is EXACT: such blocks
 * carry a single integer DC coefficient (8·(v−128)), the IDCT
 * reconstructs the constant exactly (0.25·C₀²·8 = 1 in double), and
 * Cb=Cr=128 makes the color transform the identity. The `m_jpeg`
 * driver query builds on that theorem; lossy paths are spec-tested with
 * error tolerances instead.
 *
 * Decoded images reuse [[RawImage.Ppm]], so resize and feature
 * extraction compose unchanged. Malformed-input contract: None on
 * truncation, bad markers, missing tables, overruns or unsupported
 * modes — never an exception. A pixel cap bounds decode memory.
 */
object JpegCodec {

  /** Default decode cap: 2^24 pixels (= 48 MiB of RGB). */
  val DefaultMaxPixels: Long = 1L << 24

  // ---- shared constants --------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K base quantization tables (luminance, chrominance). */
  private val BaseQLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val BaseQChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg quality scaling; quality 100 → every quantizer is 1. */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
  }

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(x*8+u) = cos((2x+1)uπ/16)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ==================================================================
  // Encoder
  // ==================================================================

  /** DC/AC symbols in ascending order, each coded with 8 bits — a flat
    * canonical table (BITS[8]=n). Legal (≤255 codes, all-ones unused)
    * and trivially correct; compression ratio is not the encoder's job
    * here. DC: categories 0..11. AC: EOB, (run,size) run 0..15 size
    * 1..10, ZRL. */
  private val DcSymbols: Array[Int] = (0 to 11).toArray
  private val AcSymbols: Array[Int] =
    (0x00 +: 0xF0 +: (for (run <- 0 to 15; size <- 1 to 10)
      yield (run << 4) | size)).toArray.sorted
  /** Progressive AC alphabet additionally needs every EOBn symbol
    * (run 0..14, size 0) — 176 symbols, still a legal flat table. */
  private val AcSymbolsProg: Array[Int] =
    (for (run <- 0 to 15; size <- 0 to 10) yield (run << 4) | size)
      .toArray.sorted

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  /** Magnitude category: smallest `size` with |v| < 2^size. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private def fdctQuant(block: Array[Double], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          val cx = CosTable(x * 8 + u)
          while (y < 8) {
            sum += block(y * 8 + x) * cx * CosTable(y * 8 + v)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        val coef = 0.25 * cu * cv * sum
        out(v * 8 + u) = math.round(coef / q(v * 8 + u)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** Encode one quantized block: DC diff + AC run-length, flat tables. */
  private def writeBlock(bw: BitWriter, coefs: Array[Int], dcPred: Int,
      dcCode: Int => (Int, Int), acCode: Int => (Int, Int)): Int = {
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) { zz(i) = coefs(ZigZag(i)); i += 1 }
    val diff = zz(0) - dcPred
    val s = category(diff)
    val (dcBits, dcLen) = dcCode(s)
    bw.put(dcBits, dcLen)
    if (s > 0)
      bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var run = 0
    i = 1
    while (i < 64) {
      if (zz(i) == 0) run += 1
      else {
        while (run > 15) { val (b, l) = acCode(0xF0); bw.put(b, l); run -= 16 }
        val sz = category(zz(i))
        val (b, l) = acCode((run << 4) | sz)
        bw.put(b, l)
        bw.put(if (zz(i) >= 0) zz(i) else zz(i) + (1 << sz) - 1, sz)
        run = 0
      }
      i += 1
    }
    if (run > 0) { val (b, l) = acCode(0x00); bw.put(b, l) } // EOB
    zz(0)
  }

  /** RGB → planar YCbCr at full resolution (shared by both encoders). */
  private def toPlanes(w: Int, h: Int,
      pixel: (Int, Int) => (Int, Int, Int))
      : (Array[Double], Array[Double], Array[Double]) = {
    val yP = new Array[Double](w * h)
    val cbP = new Array[Double](w * h)
    val crP = new Array[Double](w * h)
    var yy = 0
    while (yy < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(x, yy)
        val i = yy * w + x
        yP(i) = math.rint(0.299 * r + 0.587 * g + 0.114 * b)
        cbP(i) = math.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        crP(i) = math.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        x += 1
      }
      yy += 1
    }
    (yP, cbP, crP)
  }

  /** Level-shifted 8×8 sample block (step=1 direct, step=2 the 2×2
    * box-average of 4:2:0 chroma), clamp-to-edge padded (shared by
    * both encoders). */
  private def sampleBlock(plane: Array[Double], w: Int, h: Int,
      bx: Int, by: Int, step: Int): Array[Double] = {
    val blk = new Array[Double](64)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        var sum = 0.0
        var n = 0
        var dy = 0
        while (dy < step) {
          var dx = 0
          while (dx < step) {
            val px = bx * 8 * step + i * step + dx
            val py = by * 8 * step + j * step + dy
            val cx = math.min(px, w - 1)
            val cy = math.min(py, h - 1)
            sum += plane(cy * w + cx); n += 1
            dx += 1
          }
          dy += 1
        }
        blk(j * 8 + i) = math.rint(sum / n) - 128.0
        i += 1
      }
      j += 1
    }
    blk
  }

  /** Full baseline encoder; `subsample420` averages chroma 2×2;
    * `restartInterval` > 0 emits DRI + RSTn every that many MCUs. */
  def encode(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int),
      quality: Int = 90, subsample420: Boolean = false,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "JPEG dimensions must be positive")
    val qL = scaledQ(BaseQLuma, quality)
    val qC = scaledQ(BaseQChroma, quality)
    val (yP, cbP, crP) = toPlanes(w, h, pixel)

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }

    marker(0xD8) // SOI
    for ((tq, id) <- Seq((qL, 0), (qC, 1))) { // DQT, 8-bit precision
      marker(0xDB); u16(2 + 1 + 64); out.write(id)
      var i = 0
      while (i < 64) { out.write(tq(ZigZag(i))); i += 1 }
    }
    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    marker(0xC0) // SOF0: baseline sequential
    u16(8 + 3 * 3); out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((hY << 4) | vY); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    // DHT ×4: flat canonical tables (all codes 8 bits)
    for ((tcTh, syms) <- Seq((0x00, DcSymbols), (0x10, AcSymbols),
        (0x01, DcSymbols), (0x11, AcSymbols))) {
      marker(0xC4); u16(2 + 1 + 16 + syms.length); out.write(tcTh)
      for (len <- 1 to 16) out.write(if (len == 8) syms.length else 0)
      syms.foreach(out.write)
    }
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA) // SOS
    u16(6 + 2 * 3); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss/Se/Ah-Al

    // flat canonical code for symbol s = its index among the table's
    // symbols, 8 bits
    val dcIdx = DcSymbols.zipWithIndex.toMap
    val acIdx = AcSymbols.zipWithIndex.toMap
    def dcCode(s: Int): (Int, Int) = (dcIdx(s), 8)
    def acCode(s: Int): (Int, Int) = (acIdx(s), 8)

    val bw = new BitWriter(out)
    def blockAt(plane: Array[Double], bx: Int, by: Int, step: Int)
        : Array[Double] = sampleBlock(plane, w, h, bx, by, step)

    var dcY = 0; var dcCb = 0; var dcCr = 0
    val mcusX = (w + 8 * hY - 1) / (8 * hY)
    val mcusY = (h + 8 * vY - 1) / (8 * vY)
    val nMcus = mcusX * mcusY
    var mcuIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 &&
          mcuIdx % restartInterval == 0) {
          bw.flush() // byte-align, then RSTn; DC predictors reset
          marker(0xD0 + ((mcuIdx / restartInterval - 1) % 8))
          dcY = 0; dcCb = 0; dcCr = 0
        }
        var by = 0
        while (by < vY) {
          var bx = 0
          while (bx < hY) {
            dcY = writeBlock(bw,
              fdctQuant(blockAt(yP, mx * hY + bx, my * vY + by, 1), qL),
              dcY, dcCode, acCode)
            bx += 1
          }
          by += 1
        }
        val cStep = if (subsample420) 2 else 1
        dcCb = writeBlock(bw, fdctQuant(blockAt(cbP, mx, my, cStep), qC),
          dcCb, dcCode, acCode)
        dcCr = writeBlock(bw, fdctQuant(blockAt(crP, mx, my, cStep), qC),
          dcCr, dcCode, acCode)
        mcuIdx += 1
        mx += 1
      }
      my += 1
    }
    require(mcuIdx == nMcus)
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /**
   * Progressive (SOF2) encoder — exists, like the baseline encoder, to
   * make the decoder testable fixture-free. Emits the classic 10-scan
   * successive-approximation script (DC first Al=1 → AC bands at
   * Al=1..2 → AC/DC refinements down to Al=0), which exercises every
   * progressive decode procedure: interleaved DC first + refinement,
   * AC first with spectral bands, EOB-run accumulation, ZRL inside
   * refinement and buffered correction bits. Because successive
   * approximation is bit-exact in the COEFFICIENT domain, decoding the
   * progressive stream must yield the identical coefficient array —
   * and therefore identical pixels — as decoding `encode(...)` of the
   * same image at the same quality (spec-asserted for every tested
   * image, subsampled or not).
   */
  def encodeProgressive(w: Int, h: Int,
      pixel: (Int, Int) => (Int, Int, Int), quality: Int = 90,
      subsample420: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "JPEG dimensions must be positive")
    val qL = scaledQ(BaseQLuma, quality)
    val qC = scaledQ(BaseQChroma, quality)
    val (yP, cbP, crP) = toPlanes(w, h, pixel)
    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    val mcusX = (w + 8 * hY - 1) / (8 * hY)
    val mcusY = (h + 8 * vY - 1) / (8 * vY)
    val cStep = if (subsample420) 2 else 1
    // per-component geometry: padded (MCU) grid + T.81 A.1.1 grid
    val planesIn = Array(yP, cbP, crP)
    val steps = Array(1, cStep, cStep)
    val qT = Array(qL, qC, qC)
    val bW = Array(mcusX * hY, mcusX, mcusX) // padded block grids
    val bH = Array(mcusY * vY, mcusY, mcusY)
    val cbw = Array((w + 7) / 8,
      ((w + cStep - 1) / cStep + 7) / 8, ((w + cStep - 1) / cStep + 7) / 8)
    val cbh = Array((h + 7) / 8,
      ((h + cStep - 1) / cStep + 7) / 8, ((h + cStep - 1) / cStep + 7) / 8)
    // quantize every block up front (padded grid)
    val coef: Array[Array[Array[Int]]] = (0 until 3).map { ci =>
      val blocks = new Array[Array[Int]](bW(ci) * bH(ci))
      var by = 0
      while (by < bH(ci)) {
        var bx = 0
        while (bx < bW(ci)) {
          blocks(by * bW(ci) + bx) = fdctQuant(
            sampleBlock(planesIn(ci), w, h, bx, by, steps(ci)), qT(ci))
          bx += 1
        }
        by += 1
      }
      blocks
    }.toArray

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)
    for ((tq, id) <- Seq((qL, 0), (qC, 1))) {
      marker(0xDB); u16(2 + 1 + 64); out.write(id)
      var i = 0
      while (i < 64) { out.write(tq(ZigZag(i))); i += 1 }
    }
    marker(0xC2) // SOF2: progressive
    u16(8 + 3 * 3); out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((hY << 4) | vY); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    for ((tcTh, syms) <- Seq((0x00, DcSymbols), (0x10, AcSymbolsProg),
        (0x01, DcSymbols), (0x11, AcSymbolsProg))) {
      marker(0xC4); u16(2 + 1 + 16 + syms.length); out.write(tcTh)
      for (len <- 1 to 16) out.write(if (len == 8) syms.length else 0)
      syms.foreach(out.write)
    }
    val dcIdx = DcSymbols.zipWithIndex.toMap
    val acIdx = AcSymbolsProg.zipWithIndex.toMap
    val bw = new BitWriter(out)
    def emitDc(tbl: Int, s: Int): Unit = bw.put(dcIdx(s), 8)
    def emitAc(tbl: Int, s: Int): Unit = bw.put(acIdx(s), 8)
    def msb(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

    def sosHeader(cs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)
        : Unit = {
      marker(0xDA); u16(6 + 2 * cs.length); out.write(cs.length)
      cs.foreach { ci =>
        out.write(ci + 1) // component ids are 1, 2, 3
        val t = if (ci == 0) 0 else 1
        out.write((t << 4) | t)
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    /** Interleaved DC scan, first (ah=0) or refinement. */
    def dcScan(ah: Int, al: Int): Unit = {
      sosHeader(Seq(0, 1, 2), 0, 0, ah, al)
      val pred = new Array[Int](3)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < 3) {
          val ch = if (ci == 0) hY else 1
          val cv = if (ci == 0) vY else 1
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              val c0 = coef(ci)(
                (my * cv + by) * bW(ci) + mx * ch + bx)(0)
              if (ah == 0) {
                val t = c0 >> al // arithmetic shift: the DC point transform
                val diff = t - pred(ci)
                pred(ci) = t
                val s = category(diff)
                emitDc(ci, s)
                if (s > 0)
                  bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
              } else bw.put((c0 >> al) & 1, 1)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      bw.flush()
    }

    /** Single-component AC scan, first pass (ah=0). */
    def acFirstScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Seq(ci), ss, se, 0, al)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val t = msb(eobrun)
        emitAc(ci, t << 4)
        if (t > 0) bw.put(eobrun - (1 << t), t)
        eobrun = 0
      }
      var b = 0
      val n = cbw(ci) * cbh(ci)
      while (b < n) {
        val blk = coef(ci)((b / cbw(ci)) * bW(ci) + b % cbw(ci))
        var r = 0
        var k = ss
        while (k <= se) {
          val v = blk(ZigZag(k))
          val t = math.abs(v) >> al // AC point transform: /2^Al toward 0
          if (t == 0) r += 1
          else {
            flushEob()
            while (r > 15) { emitAc(ci, 0xF0); r -= 16 }
            val nb = category(t)
            emitAc(ci, (r << 4) | nb)
            bw.put(if (v >= 0) t else (1 << nb) - 1 - t, nb)
            r = 0
          }
          k += 1
        }
        if (r > 0) {
          eobrun += 1
          if (eobrun == 0x7FFF) flushEob()
        }
        b += 1
      }
      flushEob()
      bw.flush()
    }

    /** Single-component AC refinement scan (ah = al + 1). */
    def acRefineScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Seq(ci), ss, se, al + 1, al)
      var eobrun = 0
      val beBuf = scala.collection.mutable.ArrayBuffer.empty[Int] // run bits
      val brBuf = scala.collection.mutable.ArrayBuffer.empty[Int] // block bits
      def flushEob(): Unit = if (eobrun > 0) {
        val t = msb(eobrun)
        emitAc(ci, t << 4)
        if (t > 0) bw.put(eobrun - (1 << t), t)
        eobrun = 0
        beBuf.foreach(bit => bw.put(bit, 1))
        beBuf.clear()
      }
      def flushBr(): Unit = {
        brBuf.foreach(bit => bw.put(bit, 1))
        brBuf.clear()
      }
      var b = 0
      val n = cbw(ci) * cbh(ci)
      while (b < n) {
        val blk = coef(ci)((b / cbw(ci)) * bW(ci) + b % cbw(ci))
        // last band position whose shifted magnitude is exactly 1 —
        // beyond it everything folds into the EOB run
        var lastNew = ss - 1
        var k = ss
        while (k <= se) {
          if ((math.abs(blk(ZigZag(k))) >> al) == 1) lastNew = k
          k += 1
        }
        var r = 0
        k = ss
        while (k <= se) {
          val v = blk(ZigZag(k))
          val t = math.abs(v) >> al
          if (t == 0) r += 1
          else {
            // any nonzero: emit run-16 codes first, but only if they
            // cannot fold into the trailing EOB run (k ≤ lastNew)
            while (r > 15 && k <= lastNew) {
              flushEob()
              emitAc(ci, 0xF0)
              r -= 16
              flushBr()
            }
            if (t > 1) brBuf += (t & 1) // history coef: correction bit
            else {
              // newly-nonzero: pending EOB run, (r, size=1), sign,
              // then the correction bits buffered since the last code
              flushEob()
              emitAc(ci, (r << 4) | 1)
              bw.put(if (v >= 0) 1 else 0, 1)
              flushBr()
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || brBuf.nonEmpty) {
          eobrun += 1
          beBuf ++= brBuf
          brBuf.clear()
          if (eobrun == 0x7FFF || beBuf.length > 900) flushEob()
        }
        b += 1
      }
      flushEob()
      bw.flush()
    }

    // the classic progressive script: every decode procedure exercised
    dcScan(0, 1)
    acFirstScan(0, 1, 5, 2)
    acFirstScan(1, 1, 63, 1)
    acFirstScan(2, 1, 63, 1)
    acFirstScan(0, 6, 63, 2)
    acRefineScan(0, 1, 63, 1) // Ah=2 → Al=1
    dcScan(1, 0)
    acRefineScan(1, 1, 63, 0) // Ah=1 → Al=0
    acRefineScan(2, 1, 63, 0)
    acRefineScan(0, 1, 63, 0)
    marker(0xD9)
    out.toByteArray
  }

  // ==================================================================
  // Decoder
  // ==================================================================

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode via min/max code per length (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    /** Decode one symbol; -1 on invalid code / truncation. */
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
  }

  /** Entropy-segment reader: unstuffs 0xFF00, stops at markers. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false
    /** Next bit, or -1 at a marker / end of data. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) return -1
        val b = data(pos) & 0xFF
        if (b == 0xFF) {
          if (pos + 1 >= data.length) return -1
          val b2 = data(pos + 1) & 0xFF
          if (b2 == 0x00) { pos += 2; acc = 0xFF }
          else { hitMarker = true; return -1 } // RST/EOI/next marker
        } else { pos += 1; acc = b }
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    /** `n` additional bits as unsigned; -1 on truncation. */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def byteAlign(): Unit = nBits = 0
  }

  /** Extend an `s`-bit magnitude to its signed value (T.81 F.2.2.1). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def idct(coefs: Array[Int], q: Array[Int]): Array[Int] = {
    // dequant + separable 2-D IDCT (rows then columns)
    val tmp = new Array[Double](64)
    val deq = new Array[Double](64)
    var i = 0
    while (i < 64) { deq(i) = coefs(i).toDouble * q(i); i += 1 }
    var y = 0
    while (y < 8) { // 1-D over rows
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          sum += cu * deq(y * 8 + u) * CosTable(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = sum * 0.5
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) { // 1-D over columns
      var yy = 0
      while (yy < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          sum += cv * tmp(v * 8 + x) * CosTable(yy * 8 + v)
          v += 1
        }
        out(yy * 8 + x) = clamp255(math.rint(sum * 0.5).toInt + 128)
        yy += 1
      }
      x += 1
    }
    out
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0 // DC table, set by SOS
    var ta = 0 // AC table
  }

  /** Baseline JPEG → RGB pixels; None on anything malformed or
    * unsupported (progressive, arithmetic, 12-bit, >2 sampling). */
  def decode(data: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[Ppm] = {
    try decodeImpl(data, maxPixels)
    catch { case _: RuntimeException => None } // belt over the braces
  }

  private def decodeImpl(data: Array[Byte],
      maxPixels: Long): Option[Ppm] = {
    if (data.length < 4 || (data(0) & 0xFF) != 0xFF ||
      (data(1) & 0xFF) != 0xD8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    // progressive state: coefficients accumulate across scans, pixels
    // materialize at EOI
    var progressive = false
    var sawScan = false
    var coefStore: Array[Array[Int]] = null
    var blocksW: Array[Int] = null // MCU-padded block grid per comp
    var blocksH: Array[Int] = null
    var compBW: Array[Int] = null  // non-padded grid (T.81 A.1.1) —
    var compBH: Array[Int] = null  // the grid non-interleaved scans code

    def u16(p: Int): Int =
      if (p + 1 >= data.length) -1
      else ((data(p) & 0xFF) << 8) | (data(p + 1) & 0xFF)

    while (pos + 2 <= data.length) {
      if ((data(pos) & 0xFF) != 0xFF) return None
      val m = data(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD9 => // EOI: progressive reconstructs here
          return if (progressive && sawScan)
            assembleProgressive(comps, width, height, quant,
              coefStore, blocksW, blocksH)
          else None // baseline: EOI before any scan decoded
        case 0x01 => // TEM: bare marker, no segment
        case rst if rst >= 0xD0 && rst <= 0xD7 => // RSTn: bare
        case _ =>
          val len = u16(pos)
          if (len < 2 || pos + len > data.length) return None
          val seg = pos + 2
          val segEnd = pos + len
          var resumeAt = -1 // progressive SOS sets the post-scan pos
          m match {
            case 0xDB => // DQT: one or more tables
              var p = seg
              while (p < segEnd) {
                val pq = (data(p) & 0xFF) >> 4
                val tq = data(p) & 0x0F
                if (tq > 3 || pq > 1) return None
                val n = if (pq == 0) 64 else 128
                if (p + 1 + n > segEnd) return None
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) {
                  val v = if (pq == 0) data(p + 1 + i) & 0xFF
                    else ((data(p + 1 + 2 * i) & 0xFF) << 8) |
                      (data(p + 2 + 2 * i) & 0xFF)
                  t(ZigZag(i)) = v
                  i += 1
                }
                quant(tq) = t
                p += 1 + n
              }
            case 0xC4 => // DHT: one or more tables
              var p = seg
              while (p < segEnd) {
                val tc = (data(p) & 0xFF) >> 4
                val th = data(p) & 0x0F
                if (tc > 1 || th > 3 || p + 17 > segEnd) return None
                val bits = (1 to 16).map(i => data(p + i) & 0xFF).toArray
                val n = bits.sum
                if (n == 0 || n > 256 || p + 17 + n > segEnd) return None
                val vals = (0 until n).map(i => data(p + 17 + i) & 0xFF)
                  .toArray
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                p += 17 + n
              }
            case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 baseline (extended
              // sequential shares the baseline path for 8-bit Huffman
              // scans) or SOF2 progressive (multi-scan coefficient
              // accumulation)
              if (seg + 6 > segEnd) return None
              if ((data(seg) & 0xFF) != 8) return None // 12-bit → refuse
              progressive = m == 0xC2
              height = u16(seg + 1); width = u16(seg + 3)
              val nc = data(seg + 5) & 0xFF
              if (width <= 0 || height <= 0) return None
              if (width.toLong * height > maxPixels) return None
              if (nc != 1 && nc != 3) return None
              if (seg + 6 + 3 * nc > segEnd) return None
              comps = (0 until nc).map { i =>
                val b = seg + 6 + 3 * i
                val hv = data(b + 1) & 0xFF
                Component(data(b) & 0xFF, hv >> 4, hv & 0x0F,
                  data(b + 2) & 0x0F)
              }.toArray
              if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 ||
                c.v > 2 || c.tq > 3)) return None
            case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
                0xCB | 0xCD | 0xCE | 0xCF =>
              return None // lossless / arithmetic / hierarchical
            case 0xDD => // DRI
              if (len != 4) return None
              restartInterval = u16(seg)
            case 0xDA if !progressive => // baseline SOS — decode + finish
              if (comps == null) return None
              val ns = data(seg) & 0xFF
              if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd)
                return None
              var i = 0
              while (i < ns) {
                val cid = data(seg + 1 + 2 * i) & 0xFF
                val cOpt = comps.find(_.id == cid)
                if (cOpt.isEmpty) return None
                val c = cOpt.get
                c.td = (data(seg + 2 + 2 * i) & 0xFF) >> 4
                c.ta = data(seg + 2 + 2 * i) & 0x0F
                if (c.td > 3 || c.ta > 3) return None
                i += 1
              }
              return decodeScan(data, segEnd, comps, width, height,
                quant, dcTables, acTables, restartInterval)
            case 0xDA => // progressive SOS — one of many scans
              if (comps == null) return None
              val ns = data(seg) & 0xFF
              if (ns < 1 || ns > comps.length ||
                seg + 1 + 2 * ns + 3 > segEnd) return None
              val scanComps = new Array[Int](ns)
              var i = 0
              while (i < ns) {
                val cid = data(seg + 1 + 2 * i) & 0xFF
                val cIdx = comps.indexWhere(_.id == cid)
                if (cIdx < 0) return None
                scanComps(i) = cIdx
                comps(cIdx).td = (data(seg + 2 + 2 * i) & 0xFF) >> 4
                comps(cIdx).ta = data(seg + 2 + 2 * i) & 0x0F
                if (comps(cIdx).td > 3 || comps(cIdx).ta > 3) return None
                i += 1
              }
              val ss = data(seg + 1 + 2 * ns) & 0xFF
              val se = data(seg + 2 + 2 * ns) & 0xFF
              val ahal = data(seg + 3 + 2 * ns) & 0xFF
              val ah = ahal >> 4
              val al = ahal & 0x0F
              // band/approximation legality (T.81 G.1.1.1.1): DC scans
              // are the 0..0 band (may be interleaved); AC scans are a
              // single component; refinement lowers Al by exactly one
              if (ss > 63 || se > 63 || ss > se) return None
              if (ss == 0 && se != 0) return None
              if (ss > 0 && ns != 1) return None
              if (ah != 0 && ah != al + 1) return None
              if (al > 13) return None
              if (coefStore == null) {
                val maxH = comps.map(_.h).max
                val maxV = comps.map(_.v).max
                val mX = (width + 8 * maxH - 1) / (8 * maxH)
                val mY = (height + 8 * maxV - 1) / (8 * maxV)
                blocksW = comps.map(c => mX * c.h)
                blocksH = comps.map(c => mY * c.v)
                compBW = comps.map(c =>
                  ((width * c.h + maxH - 1) / maxH + 7) / 8)
                compBH = comps.map(c =>
                  ((height * c.v + maxV - 1) / maxV + 7) / 8)
                coefStore = comps.indices.map(ci =>
                  new Array[Int](blocksW(ci) * blocksH(ci) * 64)).toArray
              }
              val next = decodeProgScan(data, segEnd, comps, scanComps,
                ss, se, ah, al, coefStore, blocksW, blocksH,
                compBW, compBH, dcTables, acTables, restartInterval)
              if (next < 0) return None
              sawScan = true
              resumeAt = next
            case _ => // APPn / COM / others: skip
          }
          pos = if (resumeAt >= 0) resumeAt else segEnd
      }
    }
    None // no SOS reached (baseline) / EOI missing (progressive)
  }

  private def decodeScan(data: Array[Byte], start: Int,
      comps: Array[Component], width: Int, height: Int,
      quant: Array[Array[Int]], dcTables: Array[HuffTable],
      acTables: Array[HuffTable], restartInterval: Int): Option[Ppm] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    for (c <- comps) {
      if (quant(c.tq) == null || dcTables(c.td) == null ||
        acTables(c.ta) == null) return None
    }
    // per-component plane at its own sampled resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.zipWithIndex.map { case (c, i) =>
      new Array[Int](planeW(i) * mcusY * 8 * c.v)
    }
    val br = new BitReader(data, start)
    val dcPred = new Array[Int](comps.length)
    val coefs = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // RSTn between intervals: align, consume marker, reset DC
        br.byteAlign()
        if (br.pos + 1 >= data.length ||
          (data(br.pos) & 0xFF) != 0xFF ||
          (data(br.pos + 1) & 0xFF) < 0xD0 ||
          (data(br.pos + 1) & 0xFF) > 0xD7) return None
        br.pos += 2
        br.hitMarker = false
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coefs, 0)
            val s = dcTables(c.td).decode(br)
            if (s < 0 || s > 11) return None
            val diffBits = if (s == 0) 0 else br.bits(s)
            if (diffBits < 0) return None
            dcPred(ci) += extend(diffBits, s)
            coefs(0) = dcPred(ci)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acTables(c.ta).decode(br)
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return None
                val v = br.bits(size)
                if (v < 0) return None
                coefs(ZigZag(k)) = extend(v, size)
                k += 1
              }
            }
            val px = idct(coefs, quant(c.tq))
            // place the block into the component plane
            val bxAbs = (mx * c.h + bx) * 8
            val byAbs = (my * c.v + by) * 8
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                planes(ci)((byAbs + j) * planeW(ci) + bxAbs + i) =
                  px(j * 8 + i)
                i += 1
              }
              j += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // the stream must close with EOI (fill bytes allowed) — a scan cut
    // after the last MCU is still a truncated file, like PNG's
    // missing-IEND contract
    br.byteAlign()
    var p = br.pos
    while (p + 1 < data.length && (data(p) & 0xFF) == 0xFF &&
      (data(p + 1) & 0xFF) == 0xFF) p += 1
    if (p + 1 >= data.length || (data(p) & 0xFF) != 0xFF ||
      (data(p + 1) & 0xFF) != 0xD9) return None

    Some(toRgb(planes, planeW, comps, width, height))
  }

  /** Component planes → RGB with nearest upsampling + JFIF color
    * transform — shared by the baseline and progressive paths. */
  private def toRgb(planes: Array[Array[Int]], planeW: Array[Int],
      comps: Array[Component], width: Int, height: Int): Ppm = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val out = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        def sample(ci: Int): Int = {
          val c = comps(ci)
          val sx = x * c.h / maxH
          val sy = y * c.v / maxV
          planes(ci)(sy * planeW(ci) + sx)
        }
        val o = 3 * (y * width + x)
        if (comps.length == 1) {
          val g = sample(0)
          out(o) = g.toByte; out(o + 1) = g.toByte; out(o + 2) = g.toByte
        } else {
          val yv = sample(0)
          val cb = sample(1) - 128
          val cr = sample(2) - 128
          out(o) = clamp255(math.rint(yv + 1.402 * cr).toInt).toByte
          out(o + 1) = clamp255(math.rint(
            yv - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          out(o + 2) = clamp255(math.rint(yv + 1.772 * cb).toInt).toByte
        }
        x += 1
      }
      y += 1
    }
    Ppm(width, height, out)
  }

  // ==================================================================
  // Progressive decode (T.81 annex G, Huffman SOF2)
  // ==================================================================

  /** Decode one progressive scan's entropy segment into `coefStore`.
    * Returns the position of the next marker's 0xFF, or -1 on any
    * malformed condition. Coefficient semantics (G.2): first scans
    * (Ah=0) deposit `value << Al`; refinement scans (Ah=Al+1) OR in
    * the next lower magnitude bit per coefficient. */
  private def decodeProgScan(data: Array[Byte], start: Int,
      comps: Array[Component], scanComps: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      coefStore: Array[Array[Int]],
      blocksW: Array[Int], blocksH: Array[Int],
      compBW: Array[Int], compBH: Array[Int],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      restartInterval: Int): Int = {
    val br = new BitReader(data, start)
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0

    // per-scan table presence (tables may arrive between scans)
    var si = 0
    while (si < scanComps.length) {
      val c = comps(scanComps(si))
      if (ss == 0 && ah == 0 && dcTables(c.td) == null) return -1
      if (ss > 0 && acTables(c.ta) == null) return -1
      si += 1
    }

    def restart(mcu: Int): Boolean = {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.byteAlign()
        if (br.pos + 1 >= data.length ||
          (data(br.pos) & 0xFF) != 0xFF ||
          (data(br.pos + 1) & 0xFF) < 0xD0 ||
          (data(br.pos + 1) & 0xFF) > 0xD7) return false
        br.pos += 2
        br.hitMarker = false
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }
      true
    }

    /** DC of one block at coefStore offset `base`. */
    def dcBlock(ci: Int, base: Int): Boolean = {
      val blk = coefStore(ci)
      if (ah == 0) {
        val s = dcTables(comps(ci).td).decode(br)
        if (s < 0 || s > 11) return false
        val v = if (s == 0) 0 else br.bits(s)
        if (v < 0) return false
        dcPred(ci) += extend(v, s)
        blk(base) = dcPred(ci) << al
      } else {
        val b = br.bit()
        if (b < 0) return false
        if (b == 1) blk(base) |= (1 << al)
      }
      true
    }

    /** AC first scan (Ah=0) for one block. */
    def acFirst(ci: Int, base: Int): Boolean = {
      val blk = coefStore(ci)
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      var done = false
      while (k <= se && !done) {
        val rs = acTables(comps(ci).ta).decode(br)
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = 1 << r
            if (r > 0) {
              val eb = br.bits(r)
              if (eb < 0) return false
              eobrun += eb
            }
            eobrun -= 1 // this block is the run's first member
            done = true
          }
        } else {
          k += r
          if (k > se) return false
          val v = br.bits(s)
          if (v < 0) return false
          blk(base + ZigZag(k)) = extend(v, s) << al
          k += 1
        }
      }
      true
    }

    /** AC refinement scan (Ah=Al+1) for one block — the correction-bit
      * procedure of T.81 G.2 / figure G.7 (libjpeg's arrangement). */
    def acRefine(ci: Int, base: Int): Boolean = {
      val blk = coefStore(ci)
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (k <= se && !done) {
          val rs = acTables(comps(ci).ta).decode(br)
          if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 0x0F
          var newVal = 0
          if (s != 0) {
            if (s != 1) return false // only size-1 codes in refinement
            val b = br.bit()
            if (b < 0) return false
            newVal = if (b == 1) p1 else m1
          } else if (r != 15) {
            eobrun = 1 << r
            if (r > 0) {
              val eb = br.bits(r)
              if (eb < 0) return false
              eobrun += eb
            }
            done = true // tail refinement below handles this block
          }
          if (!done) {
            // advance over the band: refine nonzero-history coefs,
            // count down r zero-history positions, then (s≠0) place
            // newVal at the target zero — consuming it either way
            var placed = false
            while (k <= se && !placed) {
              val idx = base + ZigZag(k)
              if (blk(idx) != 0) {
                val b = br.bit()
                if (b < 0) return false
                if (b == 1 && (blk(idx) & p1) == 0)
                  blk(idx) += (if (blk(idx) >= 0) p1 else m1)
                k += 1
              } else if (r == 0) {
                if (s != 0) blk(idx) = newVal
                k += 1
                placed = true
              } else { r -= 1; k += 1 }
            }
            if (s != 0 && !placed) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        // refine the rest of this block, then consume one run member
        while (k <= se) {
          val idx = base + ZigZag(k)
          if (blk(idx) != 0) {
            val b = br.bit()
            if (b < 0) return false
            if (b == 1 && (blk(idx) & p1) == 0)
              blk(idx) += (if (blk(idx) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    if (ss == 0) {
      // DC scan: interleaved (MCU walk, all scan comps) or single-comp
      if (scanComps.length > 1 || comps.length == 1) {
        val mcusX = blocksW(0) / comps(0).h // = padded width in MCUs
        val mcusY = blocksH(0) / comps(0).v
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (!restart(mcu)) return -1
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var i = 0
          while (i < scanComps.length) {
            val ci = scanComps(i)
            val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val b = (my * c.v + by) * blocksW(ci) + (mx * c.h + bx)
                if (!dcBlock(ci, b * 64)) return -1
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          mcu += 1
        }
      } else {
        val ci = scanComps(0)
        var b = 0
        val n = compBW(ci) * compBH(ci)
        while (b < n) {
          if (!restart(b)) return -1
          val bx = b % compBW(ci)
          val by = b / compBW(ci)
          if (!dcBlock(ci, (by * blocksW(ci) + bx) * 64)) return -1
          b += 1
        }
      }
    } else {
      // AC scan: always non-interleaved, over the comp's own grid
      val ci = scanComps(0)
      var b = 0
      val n = compBW(ci) * compBH(ci)
      while (b < n) {
        if (!restart(b)) return -1
        val bx = b % compBW(ci)
        val by = b / compBW(ci)
        val base = (by * blocksW(ci) + bx) * 64
        val ok = if (ah == 0) acFirst(ci, base) else acRefine(ci, base)
        if (!ok) return -1
        b += 1
      }
    }

    // entropy data must end at a marker (fill 0xFF bytes allowed)
    br.byteAlign()
    var p = br.pos
    while (p + 1 < data.length && (data(p) & 0xFF) == 0xFF &&
      (data(p + 1) & 0xFF) == 0xFF) p += 1
    if (p + 1 >= data.length || (data(p) & 0xFF) != 0xFF ||
      (data(p + 1) & 0xFF) == 0x00) return -1
    p
  }

  /** Dequantize + IDCT every accumulated block and assemble pixels —
    * the progressive path's EOI step. */
  private def assembleProgressive(comps: Array[Component],
      width: Int, height: Int, quant: Array[Array[Int]],
      coefStore: Array[Array[Int]],
      blocksW: Array[Int], blocksH: Array[Int]): Option[Ppm] = {
    for (c <- comps) if (quant(c.tq) == null) return None
    val planeW = comps.indices.map(ci => blocksW(ci) * 8).toArray
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * blocksH(ci) * 8)).toArray
    val block = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).tq)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          System.arraycopy(coefStore(ci),
            (by * blocksW(ci) + bx) * 64, block, 0, 64)
          val px = idct(block, q)
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              planes(ci)((by * 8 + j) * planeW(ci) + bx * 8 + i) =
                px(j * 8 + i)
              i += 1
            }
            j += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    Some(toRgb(planes, planeW, comps, width, height))
  }
}
