package graft.ops

import graft.ops.RawImage.Ppm

/**
 * Pure-JVM MJPEG-in-AVI video codec — the video-pixel-decode step of
 * the multimodal pipeline, end to end: RIFF-AVI container parse →
 * frame chunk addressing → per-frame baseline-JPEG entropy decode via
 * [[JpegCodec]]. No codec libraries; every byte is walked here.
 *
 * Container (public spec: the AVI RIFF form, `RIFF('AVI ' ...)`):
 *  - `LIST('hdrl')` holds `avih` (56-byte main header: µs/frame,
 *    total frames, width, height at fixed offsets) and one
 *    `LIST('strl')` per stream (`strh` with fccType/fccHandler,
 *    `strf` with a BITMAPINFOHEADER for video).
 *  - `LIST('movi')` holds the frame chunks: `00dc`/`00db` (compressed /
 *    uncompressed frame of stream 0), each 2-byte aligned.
 * MJPEG stores one complete baseline JPEG per `00dc` chunk, so the
 * pixel path is exactly the still-image decoder per frame.
 *
 * Like every parser in this package: malformed or truncated input →
 * None, never an exception. Reference behavior: mirrors the decode /
 * feature-extract step of the multimodal pipeline family
 * (see Multimodal.scala) at the video level.
 */
object AviCodec {

  /** Parsed container: geometry + timing from `avih`, and the frame
    * chunk table (byteOffset, size) addressing each `00dc`/`00db`
    * payload inside `movi` — real frame-level access, decode on
    * demand. `fps` is derived from µs/frame (0 if unset). */
  final case class AviInfo(
      width: Int, height: Int, nFrames: Int, fps: Double,
      frames: Seq[(Int, Int)])

  // -- parse --------------------------------------------------------

  def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI "))
      return None
    var width, height, nFrames = 0
    var usPerFrame = 0L
    var sawAvih = false
    val frames = Seq.newBuilder[(Int, Int)]

    // Walk one LIST's children in [from, to); recurse into sub-LISTs.
    // Chunk lengths are UNSIGNED 32-bit — kept in Long so a crafted
    // length >= 2^31 can't zero or negate the step (same hardening as
    // the WAV walker, MediaContainers.parseWav).
    def walk(from: Long, to: Long): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val at = i.toInt
        val len = le32(b, at + 4).toLong & 0xffffffffL
        if (len > to - i - 8) return false // chunk overruns its parent
        if (tag(b, at, "LIST")) {
          if (len < 4) return false
          if (!walk(i + 12, i + 8 + len)) return false
        } else if (tag(b, at, "avih")) {
          if (len < 40) return false
          sawAvih = true
          usPerFrame = le32(b, at + 8).toLong & 0xffffffffL
          nFrames = le32(b, at + 8 + 16)
          width = le32(b, at + 8 + 32)
          height = le32(b, at + 8 + 36)
        } else if ((tag(b, at, "00dc") || tag(b, at, "00db")) &&
            len <= Int.MaxValue) {
          frames += ((at + 8, len.toInt))
        }
        i += 8L + len + (len & 1L) // chunks are 2-byte aligned
      }
      true
    }
    if (!walk(12L, b.length.toLong) || !sawAvih) return None
    if (width <= 0 || height <= 0 || nFrames < 0) return None
    val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
    Some(AviInfo(width, height, nFrames, fps, frames.result()))
  }

  /** Decode every `stride`-th frame to pixels: (frameIdx, image).
    * Frames that fail JPEG decode are skipped (a truncated tail frame
    * degrades the sample, it doesn't kill the video) — callers that
    * need the strict contract can compare counts. */
  def decodeFrames(b: Array[Byte], info: AviInfo, stride: Int,
      maxPixels: Long = JpegCodec.DefaultMaxPixels): Seq[(Int, Ppm)] = {
    if (stride < 1) return Nil
    info.frames.indices.collect {
      case i if i % stride == 0 =>
        val (off, len) = info.frames(i)
        if (off < 0 || len < 0 || off.toLong + len > b.length) None
        else JpegCodec.decode(
          java.util.Arrays.copyOfRange(b, off, off + len), maxPixels)
          .map((i, _))
    }.flatten
  }

  // -- build (for fixture-free end-to-end testing) ------------------

  /** Minimal valid MJPEG AVI: `hdrl(avih + strl(strh,strf))` +
    * `movi` with one `00dc` chunk per encoded-JPEG frame. */
  def buildAvi(width: Int, height: Int, usPerFrame: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, "AVI dimensions must be positive")
    val strhSz = 8 + 56
    val strfSz = 8 + 40
    val strlSz = 12 + strhSz + strfSz
    val avihSz = 8 + 56
    val hdrlSz = 12 + avihSz + strlSz
    val moviBody = jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSz = 12 + moviBody
    val total = 12 + hdrlSz + moviSz
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))

    fourcc("RIFF"); buf.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSz - 8); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(usPerFrame)
    buf.putInt(0)                       // maxBytesPerSec
    buf.putInt(0)                       // paddingGranularity
    buf.putInt(0x10)                    // flags: AVIF_HASINDEX off, HASDATA
    buf.putInt(jpegFrames.length)       // totalFrames
    buf.putInt(0)                       // initialFrames
    buf.putInt(1)                       // streams
    buf.putInt(0)                       // suggestedBufferSize
    buf.putInt(width); buf.putInt(height)
    for (_ <- 0 until 4) buf.putInt(0)  // reserved
    fourcc("LIST"); buf.putInt(strlSz - 8); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    buf.putInt(0); buf.putInt(0)        // flags, prio+lang
    buf.putInt(0)                       // initialFrames
    buf.putInt(1)                       // scale
    buf.putInt(if (usPerFrame > 0) (1000000L / usPerFrame).toInt else 0)
    buf.putInt(0)                       // start
    buf.putInt(jpegFrames.length)       // length (in frames)
    buf.putInt(0); buf.putInt(-1)       // suggestedBufferSize, quality
    buf.putInt(0)                       // sampleSize
    buf.putShort(0.toShort); buf.putShort(0.toShort) // rcFrame l,t
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    fourcc("strf"); buf.putInt(40)      // BITMAPINFOHEADER
    buf.putInt(40)
    buf.putInt(width); buf.putInt(height)
    buf.putShort(1.toShort)             // planes
    buf.putShort(24.toShort)            // bitCount
    fourcc("MJPG")                      // biCompression
    buf.putInt(width * height * 3)      // sizeImage (nominal)
    buf.putInt(0); buf.putInt(0)        // ppm x/y
    buf.putInt(0); buf.putInt(0)        // clrUsed, clrImportant
    fourcc("LIST"); buf.putInt(moviSz - 8); fourcc("movi")
    jpegFrames.foreach { f =>
      fourcc("00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  // -- helpers ------------------------------------------------------
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
}
