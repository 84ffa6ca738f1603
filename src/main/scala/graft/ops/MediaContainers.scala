package graft.ops

/**
 * Pure-JVM audio/video container header parsing — real decode of the
 * timing/layout metadata from WAV (RIFF) and MP4 (ISO-BMFF) payload
 * bytes, no codec libraries. Sample DATA decode (PCM frames, video
 * pictures) still needs codecs and stays behind [[MediaDecoder]].
 *
 * Formats (public container specs):
 *  - WAV: "RIFF" + u32le size + "WAVE", then chunks `[4cc][u32le len]`;
 *    the `fmt ` chunk carries format/channels/sampleRate/byteRate and
 *    the `data` chunk's length over byteRate gives the duration.
 *  - MP4: a box tree `[u32be size][4cc]`; `moov/mvhd` (version 0)
 *    carries a u32be timescale and u32be duration at fixed offsets.
 */
object MediaContainers {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      durationMs: Long)

  /** Decoded PCM frame statistics: real SAMPLE decode (16-bit LE PCM is
    * plain bytes — no codec library needed), not just header fields. */
  final case class WavPcm(
      nFrames: Long, rms: Double, peak: Int)

  /** `frameSizes`/`mdatOffset` are populated when the container carries
    * a sample table (`stsz`) and media data (`mdat`): enough for real
    * frame-level access — offsets are cumulative from `mdatOffset` —
    * without any codec. Empty/-1 for header-only containers. */
  final case class Mp4Info(
      timescaleHz: Int,
      durationMs: Long,
      frameSizes: Seq[Int] = Nil,
      mdatOffset: Int = -1)

  // ----------------------------------------------------------------
  // WAV (RIFF)
  // ----------------------------------------------------------------

  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return None
    // Cursor and step stay Long: chunk lengths are UNSIGNED 32-bit, so a
    // malformed length >= 2^31 truncated to Int would make the step zero
    // or negative and the walk would never terminate.
    var i = 12L
    var rate, chans, bits, byteRate = 0
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val len = le32(b, at + 4).toLong & 0xffffffffL
      if (len > b.length - i - 8) return None // chunk overruns payload
      if (tag(b, at, "fmt ")) {
        if (at + 8 + 16 > b.length) return None
        chans = le16(b, at + 10)
        rate = le32(b, at + 12)
        byteRate = le32(b, at + 16)
        bits = le16(b, at + 22)
      } else if (tag(b, at, "data")) {
        dataLen = len
      }
      i += 8L + len + (len & 1L) // chunks are 2-byte aligned
    }
    if (rate <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some(WavInfo(rate, chans, bits, dataLen * 1000L / byteRate))
  }

  /** Minimal PCM WAV: 44-byte canonical header + data sized for the
    * requested duration. Deterministic length: 44 + byteRate·ms/1000.
    * `amplitude` = 0 writes silence; > 0 (16-bit only) writes a square
    * wave alternating ±amplitude per frame on every channel, so the
    * decoded RMS and peak both equal `amplitude` exactly — a
    * closed-form PCM oracle. */
  def buildWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      durationMs: Long, amplitude: Int = 0): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val dataLen = (byteRate * durationMs / 1000L).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort)                       // PCM
    buf.putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
    buf.putShort((channels * bitsPerSample / 8).toShort)
    buf.putShort(bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    if (amplitude > 0 && bitsPerSample == 16) {
      require(amplitude <= Short.MaxValue, "amplitude exceeds 16-bit PCM")
      val frames = dataLen / (channels * 2)
      var f = 0
      while (f < frames) {
        val v = (if (f % 2 == 0) amplitude else -amplitude).toShort
        var c = 0
        while (c < channels) { buf.putShort(v); c += 1 }
        f += 1
      }
    }
    buf.array() // with amplitude 0 the data bytes stay zero (silence)
  }

  /** Decode the PCM frames of a 16-bit WAV: frame count, RMS and peak
    * over all samples. Returns None for non-PCM / non-16-bit payloads
    * or malformed containers — never throws. */
  def parseWavPcm(b: Array[Byte]): Option[WavPcm] = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return None
    var i = 12L
    var fmtCode, chans, bits = 0
    var dataAt = -1
    var dataLen = 0L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val len = le32(b, at + 4).toLong & 0xffffffffL
      if (len > b.length - i - 8) return None
      if (tag(b, at, "fmt ")) {
        if (at + 8 + 16 > b.length) return None
        fmtCode = le16(b, at + 8)
        chans = le16(b, at + 10)
        bits = le16(b, at + 22)
      } else if (tag(b, at, "data")) {
        dataAt = at + 8
        dataLen = len
      }
      i += 8L + len + (len & 1L)
    }
    if (fmtCode != 1 || bits != 16 || chans <= 0 || dataAt < 0) return None
    val nSamples = dataLen / 2
    if (nSamples == 0) return Some(WavPcm(0L, 0.0, 0))
    var s = 0
    var sumSq = 0.0
    var peak = 0
    while (s < nSamples) {
      val v = (le16(b, dataAt + 2 * s) << 16) >> 16 // sign-extend
      sumSq += v.toDouble * v
      val a = math.abs(v)
      if (a > peak) peak = a
      s += 1
    }
    Some(WavPcm(nSamples / chans, math.sqrt(sumSq / nSamples), peak))
  }

  // ----------------------------------------------------------------
  // MP4 (ISO base media)
  // ----------------------------------------------------------------

  /** Find the first box tagged `t` among the children of [from, to). */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      t: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(b, i)
      if (size < 8 || i.toLong + size > to) return None
      if (tag(b, i + 4, t)) return Some((i, size))
      i += size
    }
    None
  }

  def parseMp4(b: Array[Byte]): Option[Mp4Info] = {
    val moov = findBox(b, 0, b.length, "moov").getOrElse(return None)
    val (mi, msz) = moov
    val mvhd = findBox(b, mi + 8, mi + msz, "mvhd").getOrElse(return None)
    val j = mvhd._1
    // bounds BEFORE any read — a crafted 8-byte mvhd at buffer end must
    // parse to None, never throw (the tested garbage/truncation contract)
    if (j + 32 > b.length) return None
    val version = b(j + 8) & 0xff
    if (version != 0) return None
    val timescale = be32(b, j + 8 + 12)
    val duration = be32(b, j + 8 + 16).toLong & 0xffffffffL
    if (timescale <= 0) return None
    // sample table (frame sizes): moov > trak > mdia > minf > stbl > stsz
    val frames = for {
      (ti, tsz) <- findBox(b, mi + 8, mi + msz, "trak")
      (di, dsz) <- findBox(b, ti + 8, ti + tsz, "mdia")
      (ni, nsz) <- findBox(b, di + 8, di + dsz, "minf")
      (si, ssz) <- findBox(b, ni + 8, ni + nsz, "stbl")
      (zi, zsz) <- findBox(b, si + 8, si + ssz, "stsz")
      // stsz v0: ver+flags(4), sample_size(4), sample_count(4), sizes.
      // Guard order matters: the header must fit before reading n, n
      // must be non-negative and fit before reading sizes, and every
      // size must be non-negative (a crafted negative size would
      // otherwise drive sampleFrames to a negative offset).
      if zsz >= 20 && be32(b, zi + 12) == 0
      n = be32(b, zi + 16)
      if n >= 0 && zsz >= 20 + 4L * n
      sizes = (0 until n).map(k => be32(b, zi + 20 + 4 * k))
      if sizes.forall(_ >= 0)
    } yield sizes
    val mdatOff = findBox(b, 0, b.length, "mdat").map(_._1 + 8)
    Some(Mp4Info(timescale, duration * 1000L / timescale,
      frames.getOrElse(Nil),
      if (frames.exists(_.nonEmpty)) mdatOff.getOrElse(-1) else -1))
  }

  /** Uniform-stride frame sampling over a parsed container — the
    * training-pipeline "frame-sample" op at the byte level (no codec:
    * real offsets and bytes, decode-to-pixels stays behind the codec
    * boundary). Returns (frameIdx, byteOffset, size, firstByte) for
    * every `stride`-th frame. */
  def sampleFrames(b: Array[Byte], info: Mp4Info,
      stride: Int): Seq[(Int, Int, Int, Int)] = {
    if (info.mdatOffset < 0 || info.frameSizes.isEmpty || stride < 1)
      return Nil
    // Long cumulative offsets: a crafted size table must not wrap Int
    // and index negatively — out-of-range frames are skipped, not thrown
    val offs = info.frameSizes.scanLeft(info.mdatOffset.toLong)(_ + _)
    info.frameSizes.indices.collect {
      case i if i % stride == 0 && info.frameSizes(i) >= 0 &&
          offs(i) >= 0 && offs(i) + info.frameSizes(i) <= b.length =>
        (i, offs(i).toInt, info.frameSizes(i), b(offs(i).toInt) & 0xff)
    }
  }

  /** Minimal MP4: `ftyp` + `moov(mvhd v0)` — 132 bytes with no frames.
    * With `frameSizes`, a real sample table and media data are added
    * (`moov` gains `trak/mdia/minf/stbl/stsz`, plus a top-level `mdat`
    * whose frame `i` is filled with `frameByte(i)`), so frame-level
    * parsing has actual bytes to address. */
  def buildMp4(durationMs: Long, timescaleHz: Int = 1000,
      frameSizes: Seq[Int] = Nil,
      frameByte: Int => Int = _ => 0): Array[Byte] = {
    val n = frameSizes.length
    val stszSz = 20 + 4 * n
    val trakSz = if (n == 0) 0 else 32 + stszSz // trak+mdia+minf+stbl hdrs
    val moovSz = 8 + 108 + trakSz
    val mdatSz = if (n == 0) 0 else 8 + frameSizes.sum
    val buf = java.nio.ByteBuffer.allocate(16 + moovSz + mdatSz)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
    buf.put("isom".getBytes("US-ASCII")).putInt(0x200)
    buf.putInt(moovSz).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
    buf.putInt(0)                                 // version 0 + flags
    buf.putInt(0).putInt(0)                       // ctime, mtime
    buf.putInt(timescaleHz)
    buf.putInt((durationMs * timescaleHz / 1000L).toInt)
    buf.putInt(0x00010000)                        // rate 1.0
    buf.putShort(0x0100.toShort)                  // volume 1.0
    buf.putShort(0.toShort).putInt(0).putInt(0)   // reserved
    for (v <- Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
      buf.putInt(v)                               // identity matrix
    for (_ <- 0 until 6) buf.putInt(0)            // pre-defined
    buf.putInt(2)                                 // next track id
    if (n > 0) {
      buf.putInt(trakSz).put("trak".getBytes("US-ASCII"))
      buf.putInt(trakSz - 8).put("mdia".getBytes("US-ASCII"))
      buf.putInt(trakSz - 16).put("minf".getBytes("US-ASCII"))
      buf.putInt(trakSz - 24).put("stbl".getBytes("US-ASCII"))
      buf.putInt(stszSz).put("stsz".getBytes("US-ASCII"))
      buf.putInt(0)                               // version + flags
      buf.putInt(0)                               // sample_size: per-entry
      buf.putInt(n)
      frameSizes.foreach(buf.putInt)
      buf.putInt(mdatSz).put("mdat".getBytes("US-ASCII"))
      frameSizes.zipWithIndex.foreach { case (sz, i) =>
        val fill = (frameByte(i) & 0xff).toByte
        buf.put(Array.fill(sz)(fill))
      }
    }
    buf.array()
  }

  // -- helpers ------------------------------------------------------
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
}
