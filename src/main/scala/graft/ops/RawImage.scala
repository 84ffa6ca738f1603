package graft.ops

/**
 * Raw-bitmap image ops over PPM (P6, maxval 255) — the one public image
 * format whose PIXELS are plain bytes, so decode / resize /
 * feature-extract are REAL pixel math with no codec library: the
 * training-pipeline "resize" operation the compressed formats
 * (PNG/JPEG, [[ImageHeaders]]) keep behind the codec boundary.
 *
 * All parsers follow the malformed-input contract: None on garbage or
 * truncation, never an exception.
 */
object RawImage {

  final case class Ppm(width: Int, height: Int, pixels: Array[Byte]) {
    /** (r, g, b) of pixel (x, y), each 0..255. */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val i = 3 * (y * width + x)
      ((pixels(i) & 0xff), (pixels(i + 1) & 0xff), (pixels(i + 2) & 0xff))
    }
  }

  /** Binary PPM: `P6\n<w> <h>\n255\n` + w·h RGB triplets. */
  def buildPpm(w: Int, h: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, "PPM dimensions must be positive")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(x, y)
        out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  def parsePpm(b: Array[Byte]): Option[Ppm] = {
    // header: magic, two dims, maxval — whitespace-separated ASCII
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def token(): Option[Int] = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      val start = i
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    val parsed = for {
      w <- token(); h <- token(); maxv <- token()
      if w > 0 && h > 0 && maxv == 255 && i < b.length
    } yield (w, h)
    parsed.flatMap { case (w, h) =>
      // the single whitespace terminator after maxval (accept a CRLF
      // pair as one terminator — consuming only the '\r' would shift
      // every pixel byte by one, a silently wrong decode)
      val ws = b(i)
      if (ws != ' ' && ws != '\n' && ws != '\r' && ws != '\t') None
      else {
        i += (if (ws == '\r' && i + 1 < b.length && b(i + 1) == '\n') 2
              else 1)
        // compare in Long with no product of two full Int ranges:
        // w·h ≤ (2^31)^2 fits a Long, 3·(2^31)^2 would not
        if (w.toLong * h > (b.length - i).toLong / 3) None
        else Some(Ppm(w, h,
          java.util.Arrays.copyOfRange(b, i, i + 3 * w * h)))
      }
    }
  }

  /** Nearest-neighbor resize — real pixel resampling: output pixel
    * (x, y) takes source pixel (x·srcW / outW, y·srcH / outH). */
  def resizeNearest(img: Ppm, outW: Int, outH: Int): Ppm = {
    require(outW > 0 && outH > 0, "resize dimensions must be positive")
    val out = new Array[Byte](3 * outW * outH)
    var y = 0
    while (y < outH) {
      // Long products: x·width overflows Int for legitimately parseable
      // very wide images (3·w·h fits an array at w ≈ 7·10^8)
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val si = 3 * (sy * img.width + sx)
        val di = 3 * (y * outW + x)
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Ppm(outW, outH, out)
  }

  /** Decode ANY supported still image by magic-byte sniffing: PNG
    * (full IHDR matrix via [[PngCodec]]), JPEG (baseline + progressive
    * via [[JpegCodec]]), GIF (LZW via [[GifCodec]]), or binary PPM
    * ("P6"). The single entry point a mixed-format image column needs —
    * callers never branch on format, and an unrecognized or malformed
    * payload is None, not a crash. */
  def decodeImage(b: Array[Byte],
      maxPixels: Long = PngCodec.DefaultMaxPixels): Option[Ppm] = {
    if (b.length < 8) None
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') PngCodec.decode(b, maxPixels)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegCodec.decode(b, maxPixels)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      GifCodec.decode(b, maxPixels)
    else if (b(0) == 'P' && b(1) == '6')
      parsePpm(b).filter(p => p.width.toLong * p.height <= maxPixels)
    else None
  }

  /** Per-channel mean over all pixels — the feature-extract step. */
  def meanRgb(img: Ppm): (Double, Double, Double) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < img.pixels.length) {
      sr += img.pixels(i) & 0xff
      sg += img.pixels(i + 1) & 0xff
      sb += img.pixels(i + 2) & 0xff
      i += 3
    }
    val n = (img.width.toLong * img.height).toDouble
    (sr / n, sg / n, sb / n)
  }
}
