package graft.ops

/**
 * Pure-JVM image header parsing — real decode of the dimension metadata
 * from PNG / JPEG / GIF payload bytes, no native or external codec
 * libraries. This replaces the stubbed dimensions for `image` rows;
 * full pixel decode (and audio/video) still needs a codec library and
 * stays behind the [[MediaDecoder]] boundary.
 *
 * Formats (all public container specs):
 *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
 *    big-endian u32 at offsets 16/20.
 *  - JPEG: SOI marker, then a walk over FF-prefixed segments (each with
 *    a big-endian u16 length that includes itself) until a SOF_n frame
 *    header (C0–CF except C4/C8/CC), which carries height/width as
 *    big-endian u16 after the precision byte.
 *  - GIF: "GIF87a"/"GIF89a" signature, width/height little-endian u16
 *    at offsets 6/8.
 */
object ImageHeaders {

  final case class Dims(format: String, width: Int, height: Int)

  def parse(bytes: Array[Byte]): Option[Dims] =
    parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseGif(bytes))

  // ----------------------------------------------------------------
  // PNG
  // ----------------------------------------------------------------

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def parsePng(b: Array[Byte]): Option[Dims] =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(Dims("png", be32(b, 16), be32(b, 20)))
    else None

  // ----------------------------------------------------------------
  // JPEG
  // ----------------------------------------------------------------

  def parseJpeg(b: Array[Byte]): Option[Dims] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None // corrupt segment stream
      var marker = u8(b, i + 1)
      // fill bytes: consecutive FFs before a marker are legal padding
      var j = i + 1
      while (marker == 0xff && j + 1 < b.length) { j += 1; marker = u8(b, j) }
      if (marker == 0xff) return None // trailing fill bytes, no marker
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS first
      if (j + 3 > b.length) return None // length bytes out of range
      val segLen = be16(b, j + 1)
      if (segLen < 2 || j + 1 + segLen > b.length) return None
      if (isSof(marker)) {
        // segment: len(2) precision(1) height(2) width(2) ...
        if (segLen < 7) return None
        return Some(Dims("jpeg", be16(b, j + 6), be16(b, j + 4)))
      }
      i = j + 1 + segLen
    }
    None
  }

  /** SOF0–SOF15 minus DHT (C4), JPG (C8), DAC (CC). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  // ----------------------------------------------------------------
  // GIF
  // ----------------------------------------------------------------

  def parseGif(b: Array[Byte]): Option[Dims] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(Dims("gif", le16(b, 6), le16(b, 8)))
    else None

  // ----------------------------------------------------------------
  // Deterministic minimal builders (synthetic corpora + tests). The
  // emitted headers are spec-valid, so the parsers above are exercised
  // on exactly the byte layout a real encoder writes.
  // ----------------------------------------------------------------

  /** Minimal structurally-valid PNG: signature + IHDR (8-bit RGB, real
    * CRC32) + empty IEND. Always 45 bytes. */
  def buildPng(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(45)
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type truecolor
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal JPEG header stream: SOI + APP0/JFIF + SOF0 (3-component
    * baseline). Always 39 bytes — SOI(2) + APP0(2+16) + SOF0(2+17),
    * sized exactly: trailing buffer slack would be garbage bytes where
    * a stricter segment walker expects an 0xFF marker prefix. No scan
    * data (parsers that only read headers never need it). */
  def buildJpeg(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(39)
    b.putShort(0xffd8.toShort)                       // SOI
    b.putShort(0xffe0.toShort).putShort(16)          // APP0, len 16
    b.put("JFIF".getBytes("US-ASCII")).put(0.toByte) // identifier
    b.putShort(0x0101.toShort)                       // version 1.1
    b.put(0.toByte)                                  // aspect-ratio units
    b.putShort(1.toShort).putShort(1.toShort)        // x/y density
    b.put(0.toByte).put(0.toByte)                    // no thumbnail
    b.putShort(0xffc0.toShort).putShort(17)          // SOF0, len 17
    b.put(8.toByte)                                  // precision
    b.putShort(height.toShort).putShort(width.toShort)
    b.put(3.toByte)                                  // 3 components
    for (c <- 1 to 3) {
      b.put(c.toByte).put(0x11.toByte).put(0.toByte)
    }
    b.array()
  }

  private def writeChunk(
      out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4)
    putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }
}
