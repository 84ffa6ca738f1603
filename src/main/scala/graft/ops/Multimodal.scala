package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.{functions => F}

/** A multimodal asset row: media payloads are opaque binary columns with
  * typed metadata — the schema contract for image/audio/video tables. */
final case class MediaRow(
    doc_id: String,
    media_type: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    meta: Map[String, String])

/** Extracted features for one asset (decode output). `sample_rate`,
  * `channels` and `rms` are audio-only (0 otherwise); `rms` comes from
  * REAL PCM frame decode ([[MediaContainers.parseWavPcm]]), not header
  * fields. `frames_sampled`/`frame_mean` are video-only: when the
  * container carries a sample table, every 2nd frame is actually
  * addressed in the media data ([[MediaContainers.sampleFrames]]) and
  * `frame_mean` is the mean first byte of the sampled frames — real
  * byte-level frame sampling; pixel decode stays behind the codec
  * boundary. */
final case class MediaFeatures(
    doc_id: String,
    media_type: String,
    byte_len: Int,
    width: Int,
    height: Int,
    duration_ms: Long,
    frames_sampled: Int,
    sample_rate: Int,
    channels: Int,
    rms: Double,
    frame_mean: Double,
    payload_hash: Long)

/**
 * Decoder boundary. The real image/audio libraries are NOT in this
 * container, so the shipped implementation is [[StubDecoder]] — a
 * clearly-marked deterministic fake. Everything AROUND the decoder is
 * real and tested: the binary-column schema, the per-partition batching
 * (one decoder instance per partition, amortizing model/codec init — the
 * same shape a Pandas-UDF/mapInPandas batch has in PySpark), and the
 * downstream typed feature schema.
 */
trait MediaDecoder extends Serializable {
  def decode(row: MediaRow): MediaFeatures
}

/**
 * The shipped decoder: REAL pure-JVM header decode for all three
 * modalities — PNG/JPEG/GIF dimensions ([[ImageHeaders]]), WAV
 * sample-rate/channels/duration and MP4 duration
 * ([[MediaContainers]]) — actual byte parsing, no stubs. Sample-DATA
 * decode (pixels, PCM frames) needs a codec library this container
 * doesn't have; [[StubDecoder]] remains the fallback for payloads in
 * other containers. Unparseable payloads yield -1 dimensions / the
 * stub's pseudo-features — a violation-shaped outcome, never a task
 * failure.
 */
final class HeaderDecoder extends MediaDecoder {
  private val stub = new StubDecoder
  override def decode(r: MediaRow): MediaFeatures = {
    def h = r.payload.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
    r.media_type match {
      case "image" => ImageHeaders.parse(r.payload) match {
        case Some(d) => MediaFeatures(r.doc_id, r.media_type,
          r.payload.length, d.width, d.height, 0L, 1, 0, 0, 0.0, 0.0, h)
        case None => MediaFeatures(r.doc_id, r.media_type,
          r.payload.length, -1, -1, 0L, 1, 0, 0, 0.0, 0.0, h)
      }
      case "audio" => MediaContainers.parseWav(r.payload) match {
        case Some(w) =>
          // real PCM frame decode: RMS over the 16-bit samples (0.0
          // for non-16-bit/non-PCM payloads — the header fields still
          // come through)
          val rms = MediaContainers.parseWavPcm(r.payload)
            .map(_.rms).getOrElse(0.0)
          MediaFeatures(r.doc_id, r.media_type,
            r.payload.length, 0, 0, w.durationMs, 0, w.sampleRate,
            w.channels, rms, 0.0, h)
        case None => stub.decode(r)
      }
      case "video" => MediaContainers.parseMp4(r.payload) match {
        case Some(m) if m.frameSizes.nonEmpty =>
          // REAL frame sampling: every 2nd frame addressed via the
          // stsz offsets; frame_mean = mean first byte of the sampled
          // frames (pixel decode stays behind the codec boundary)
          val sampled = MediaContainers.sampleFrames(r.payload, m, 2)
          val mean =
            if (sampled.isEmpty) 0.0
            else sampled.map(_._4).sum.toDouble / sampled.size
          MediaFeatures(r.doc_id, r.media_type,
            r.payload.length, 0, 0, m.durationMs, sampled.size, 0, 0,
            0.0, math.rint(mean * 1e6) / 1e6, h)
        // header-only container: frames_sampled is the sampling PLAN
        // (8 uniformly spaced frames), nothing to address yet
        case Some(m) => MediaFeatures(r.doc_id, r.media_type,
          r.payload.length, 0, 0, m.durationMs, 8, 0, 0, 0.0, 0.0, h)
        case None => stub.decode(r)
      }
      case _ => stub.decode(r)
    }
  }
}

/** STUB: derives deterministic pseudo-features from the payload bytes.
  * Still used for audio/video (no codec libs in this container); images
  * go through [[HeaderDecoder]]'s real byte parsing. */
final class StubDecoder extends MediaDecoder {
  override def decode(r: MediaRow): MediaFeatures = {
    val h = r.payload.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
    val w = 64 + math.abs(h % 1024).toInt
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      byte_len = r.payload.length,
      width = w,
      height = 64 + math.abs((h >> 16) % 1024).toInt,
      duration_ms =
        if (r.media_type == "image") 0L else math.abs(h % 600000L),
      frames_sampled = if (r.media_type == "video") 8 else 1,
      sample_rate = 0,
      channels = 0,
      rms = 0.0,
      frame_mean = 0.0,
      payload_hash = h)
  }
}

object Multimodal {
  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Feature extraction: mapPartitions so the decoder is constructed once
    * per task (codec/model init amortized over the whole batch), the
    * Scala analogue of `mapInPandas` batch shape. Partition sizing for
    * binary payloads: repartition upstream so a task's payloads fit in
    * memory (`spark.sql.files.maxPartitionBytes` governs the scan side). */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = new HeaderDecoder): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // per-partition decoder init happens here (once per task)
      it.map(decoder.decode)
    }

  /** Read a binary-payload table from a DataFrame with the media schema. */
  def asMedia(df: DataFrame): Dataset[MediaRow] = df.as[MediaRow]

  /** Deterministic synthetic media table for tests/benches. */
  def synthetic(spark: org.apache.spark.sql.SparkSession, n: Long,
      numPartitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, numPartitions).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload =
        if (kind == "image") {
          // real PNG/JPEG header bytes with doc-derived dimensions, so
          // the HeaderDecoder's actual parsers run on every image row
          val w = 16 + (i % 64).toInt
          val h = 16 + ((i * 7) % 64).toInt
          if (i % 2 == 0) ImageHeaders.buildPng(w, h)
          else ImageHeaders.buildJpeg(w, h)
        } else if (kind == "audio") {
          // real WAV header + silence, duration/channels doc-derived
          MediaContainers.buildWav(8000, 1 + (i % 2).toInt, 16,
            10 + (i % 50))
        } else {
          // real MP4 with sample table + media data, all doc-derived
          val nf = (5 + i % 10).toInt
          MediaContainers.buildMp4(1000L + (i % 60) * 250L,
            frameSizes = (0 until nf).map(k => (10 + (i + k) % 20).toInt),
            frameByte = k => ((i * 31 + 7 * k) % 251).toInt)
        }
      val codec = kind match {
        case "image" => if (i % 2 == 0) "png" else "jpeg"
        case "audio" => "wav"
        case _       => "mp4"
      }
      MediaRow(f"media-$i%08d", kind, payload, Map("codec" -> codec))
    }
  }

  /** Per-type size/feature stats over the extracted features — the
    * aggregation a data-quality report over a multimodal corpus needs. */
  def featureStats(feats: Dataset[MediaFeatures]): DataFrame =
    feats.toDF().groupBy("media_type").agg(
      F.count(F.lit(1)).as("n"),
      F.avg("byte_len").as("avg_bytes"),
      F.min("width").as("min_width"),
      F.max("width").as("max_width"),
      F.avg("duration_ms").as("avg_duration_ms"))
}
