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

/** Extracted features for one asset (decode output). */
final case class MediaFeatures(
    doc_id: String,
    media_type: String,
    byte_len: Int,
    width: Int,
    height: Int,
    duration_ms: Long,
    frames_sampled: Int,
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
 * The shipped decoder: REAL pure-JVM header decode for images (PNG /
 * JPEG / GIF dimensions via [[ImageHeaders]] — actual byte parsing, no
 * stub), stub-derived features for audio/video (those genuinely need a
 * codec library this container doesn't have; only this branch changes
 * when one is available). Unparseable image payloads yield width/height
 * -1 — a violation-shaped outcome, never a task failure.
 */
final class HeaderDecoder extends MediaDecoder {
  private val stub = new StubDecoder
  override def decode(r: MediaRow): MediaFeatures =
    if (r.media_type == "image") {
      val h = r.payload.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
      ImageHeaders.parse(r.payload) match {
        case Some(d) => MediaFeatures(r.doc_id, r.media_type,
          r.payload.length, d.width, d.height, 0L, 1, h)
        case None => MediaFeatures(r.doc_id, r.media_type,
          r.payload.length, -1, -1, 0L, 1, h)
      }
    } else stub.decode(r)
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
        } else {
          val len = 32 + (i % 256).toInt
          Array.tabulate[Byte](len)(j => ((i * 31 + j) % 127).toByte)
        }
      MediaRow(f"media-$i%08d", kind, payload,
        Map("codec" -> (if (kind == "image")
          (if (i % 2 == 0) "png" else "jpeg") else "opus")))
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
