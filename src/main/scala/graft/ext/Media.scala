package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `BINARY` columns with a typed metadata struct; decode / feature-extract
 * run as batched per-partition passes.
 *
 * The decode step itself is STUBBED (no image/audio codecs ship in this
 * environment): [[stubDecode]] derives deterministic fake dimensions and a
 * byte-histogram "feature" from the raw bytes. Everything around it — the
 * schema, the `mapPartitions` batch shape, partition sizing, the typed
 * output — is the real plumbing a codec would drop into.
 *
 * Scale design (100 TB): payload columns dominate row size, so feature
 * extraction must be a single narrow pass — `mapPartitions` (no shuffle),
 * with `spark.sql.files.maxPartitionBytes` bounding the per-task working
 * set. Outputs are small scalar features, so the expensive bytes are read
 * once and dropped before any shuffle. Never collect payloads to the driver.
 */
object Media {

  /** One media row: id + opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      content_md5: String,
      width: Int,    // stub-decoded
      height: Int,   // stub-decoded
      mean_byte: Double)

  /** Synthesize a media table from the documents table (UTF-8 text bytes as
   *  the opaque payload) — stands in for reading real image/audio files. */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("kind"),
      col("text").cast("binary").as("content")).as[MediaRow]
  }

  /** Deterministic fake decode: a real implementation would parse the codec
   *  header; the stub derives plausible dims from the byte length. */
  def stubDecode(bytes: Array[Byte]): (Int, Int) =
    (bytes.length % 640 + 1, bytes.length % 480 + 1)

  /** Batched per-partition feature extraction — the `mapPartitions` pass a
   *  real decoder plugs into. One narrow stage, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (a real codec would allocate its context here)
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.content).map("%02x".format(_)).mkString
        val (w, h) = stubDecode(r.content)
        val mean =
          if (r.content.isEmpty) 0.0
          else r.content.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / r.content.length
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, digest, w, h, mean)
      }
    }
  }

  /** Column-only equivalent of the md5/length features (no mapPartitions) —
   *  used by the oracle-compared query and to cross-check the typed path. */
  def featureColumns(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("content")).cast("long").as("byte_len"),
      md5(col("content")).as("content_md5"))

  /** One resized "image" row: stub pixels are a deterministic function of
   *  the source bytes + target dims (a real codec would decode + resample). */
  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int, thumb: Array[Byte])

  /** Resize pass — same mapPartitions batch shape as [[extractFeatures]];
   *  output payload is WxH "pixels" (bounded size per row, so downstream
   *  shuffles move thumbnails, never source bytes). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // stub resample: cycle source bytes into the target raster
        val out = Array.tabulate[Byte](w * h)(i =>
          if (r.content.isEmpty) 0 else r.content(i % r.content.length))
        ResizedMedia(r.media_id, r.kind, w, h, out)
      }
    }
  }

  /** One sampled "frame": a fixed-size byte window at a deterministic
   *  offset — the plumbing shape of video frame sampling (a real decoder
   *  would seek keyframes). */
  final case class MediaFrame(
      media_id: Long, frame_no: Int, offset: Long, frame: Array[Byte])

  /** Sample up to `nFrames` evenly-spaced fixed-size windows per payload.
   *  flatMap shape: one input row → few bounded rows, no shuffle. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int,
      frameBytes: Int = 16): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = math.min(nFrames, math.max(1, r.content.length / frameBytes))
      (0 until n).map { i =>
        val off = (r.content.length.toLong * i) / n
        val end = math.min(off + frameBytes, r.content.length.toLong).toInt
        MediaFrame(r.media_id, i, off, r.content.slice(off.toInt, end))
      }
    }
  }
}
