package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction / resize / frame-sample run as partition-local functions
  * over those bytes.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[StubCodec]] derives deterministic fake dimensions/features from the
  * bytes. The Spark-side plumbing — schema, encoders, partition-local
  * batching, feature column shape (`Array[Float]`, ready for
  * [[Similarity]] ops) — is real and tested. Swapping in a real codec
  * touches only [[StubCodec]].
  *
  * Scale notes: media bytes never pass through a shuffle here — decode is
  * a narrow `mapPartitions` directly over the scan, so the 100 TB plan is
  * scan → decode → project(features), with bytes dropped as early as
  * possible. Feature vectors (small) are what joins/aggregations see.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime: String, content: Array[Byte])

  case class ImageMeta(media_id: Long, width: Int, height: Int,
                       channels: Int, n_bytes: Long)

  case class MediaFeature(media_id: Long, feature: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, offset_bytes: Long)

  /** The codec boundary. Every function is deterministic in the payload
    * bytes so tests and oracles are stable; replace with a real decoder
    * (JPEG/PNG/ffmpeg) without touching any Spark plumbing.
    */
  object StubCodec {
    def decodeImage(r: MediaRow): ImageMeta = {
      val h = java.util.Arrays.hashCode(r.content)
      ImageMeta(r.media_id, math.abs(h % 640) + 1,
        math.abs((h / 640) % 480) + 1, 3, r.content.length.toLong)
    }

    /** Fake embedding: 8 floats folded from the byte stream. */
    def featurize(r: MediaRow, dim: Int = 8): MediaFeature = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < r.content.length) {
        acc(i % dim) += (r.content(i) & 0xff) / 255.0f
        i += 1
      }
      MediaFeature(r.media_id, acc)
    }

    /** Frame sampling: every `stride` bytes stands in for a video frame. */
    def sampleFrames(r: MediaRow, stride: Int): Iterator[Frame] =
      (0 until r.content.length by stride).iterator.zipWithIndex
        .map { case (off, idx) => Frame(r.media_id, idx, off.toLong) }

    /** Resize: deterministic downsample — every k-th byte of the payload
      * where k preserves the aspect of `targetW×targetH` vs the fake
      * decoded dims. A real codec resamples pixels; the plumbing contract
      * (payload in → smaller payload out, metadata updated) is identical.
      */
    def resize(r: MediaRow, targetW: Int, targetH: Int): MediaRow = {
      require(targetW > 0 && targetH > 0,
        s"target dimensions must be positive, got ${targetW}x$targetH")
      val meta = decodeImage(r)
      val ratio = math.max(1.0,
        (meta.width.toDouble * meta.height) / (targetW.toDouble * targetH))
      val step = math.max(1, math.round(ratio).toInt)
      val out = r.content.indices.collect {
        case i if i % step == 0 => r.content(i)
      }.toArray
      MediaRow(r.media_id, r.mime, out)
    }
  }

  /** Attach a binary content column to any table (here: utf-8 bytes of a
    * text column — the stand-in for reading real media files).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("media_id"), lit("application/octet-stream").as("mime"),
      col(payloadCol).cast("binary").as("content")).as[MediaRow]
  }

  /** Decode: partition-local, no shuffle — mapPartitions keeps the codec
    * init (expensive for real codecs) once per partition, not per row.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: initialize codec here, once per partition
      it.map(StubCodec.decodeImage)
    }
  }

  def featurize(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubCodec.featurize(_, dim)))
  }

  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(StubCodec.sampleFrames(_, stride)))
  }

  /** Resize every payload toward a target resolution (stub downsample);
    * output rows are smaller MediaRows — run this before any shuffle so
    * the wire carries resized bytes.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubCodec.resize(_, targetW, targetH)))
  }
}
