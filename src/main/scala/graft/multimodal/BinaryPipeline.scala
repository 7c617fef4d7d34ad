package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: opaque payload bytes + typed metadata, the schema a
  * multimodal (image/audio/video) column carries through the engine.
  */
final case class MediaRecord(
    media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

/** Decoded features for one media record. The decode itself is a
  * deterministic stand-in (this container has no image/audio codecs); the
  * Spark-side plumbing — binary column, typed Dataset, per-partition
  * batched decode, output schema — is the real, tested part.
  */
final case class MediaFeatures(
    media_id: Long, width: Int, height: Int, channels: Int,
    byte_mean_x1000: Long, byte_crc: Long)

/** One sampled frame of a media payload: 1→N expansion of a video-like
  * record into fixed-size chunks.
  */
final case class MediaFrame(
    media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** Multimodal binary-column handling: treat image/audio/video as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * as a per-partition batch operation.
  *
  * Scale shape: `mapPartitions` keeps the decode columnar-adjacent — one
  * decoder init per partition (in production: one codec context / model
  * handle per task, reused across the partition's records), records stream
  * through without materializing the partition. Payload bytes never shuffle;
  * only the small feature rows do if a downstream agg needs it.
  */
object BinaryPipeline {

  /** documents -> media records: utf8 payload bytes standing in for image
    * bytes; schema and batching identical to the real thing.
    */
  def mediaRecords(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a null text row has no payload — it is NOT a media record, and
    // letting it through would deserialize null into MediaRecord's
    // primitive n_bytes (a runtime failure that kills the decode job)
    docs.filter(col("text").isNotNull).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Deterministic fake decode of one payload. Stands in for an image
    * decode; downstream code only sees the MediaFeatures schema, so
    * swapping in a real codec changes nothing but this function.
    */
  def decodeOne(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var crc = 0L
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      crc = (crc * 31 + (bytes(i) & 0xff)) % 2147483647L
      i += 1
    }
    val mean1000 = if (bytes.length == 0) 0L else sum * 1000 / bytes.length
    MediaFeatures(
      media_id = r.media_id,
      width = (crc % 1280).toInt + 64,
      height = (crc % 720).toInt + 64,
      channels = (bytes.length % 3) + 1,
      byte_mean_x1000 = mean1000,
      byte_crc = crc)
  }

  /** Batched decode: one "decoder" per partition, records streamed. */
  def decode(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // production: init codec/model once per partition here
      it.map(decodeOne)
    }
  }

  /** "Resize": rescale the decoded dimensions to fit a bounding box,
    * aspect preserved (integer arithmetic — deterministic). In production
    * the pixel resample happens beside the decode, inside the same
    * per-partition batch; the plumbing — features in, features out, no
    * payload reshuffle — is identical.
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int)
      : Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val num = math.min(maxW.toLong * f.height, maxH.toLong * f.width)
      val den = f.width.toLong * f.height
      if (num >= den) f // already fits
      else f.copy(
        width = math.max(1, (f.width * num / den).toInt),
        height = math.max(1, (f.height * num / den).toInt))
    }
  }

  /** Frame sampling: each payload splits into fixed-size frames and every
    * `stride`-th one is emitted — the 1→N video shape. The expansion is a
    * streamed flatMap inside the partition: no row ever holds more than one
    * frame's bytes beyond the source record, and frames of one record stay
    * in one task (no shuffle) until a downstream op asks for one.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameSize: Int,
      stride: Int): Dataset[MediaFrame] = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = (r.payload.length + frameSize - 1) / frameSize
        Iterator.range(0, nFrames, stride).map { f =>
          val from = f * frameSize
          val until = math.min(from + frameSize, r.payload.length)
          MediaFrame(r.media_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }
}
