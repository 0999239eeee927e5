package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side plumbing (schema, partition-wise batched iteration,
  * output shape) is real and tested; the actual byte decode is a
  * clearly-marked STUB (`stubDecode`) — codec libraries are not in this
  * container. In production the stub body is replaced by the real
  * decoder; nothing else changes: `mapPartitions` already gives the
  * batch-per-executor-core shape a vectorized (Arrow/pandas-style)
  * decode needs, and partitioning/metadata flow are identical.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      head_byte: Int, checksum: Long, feature: Array[Float])

  private def mediaBytes(r: MediaRow): Array[Byte] =
    Option(r.media).getOrElse(Array.emptyByteArray)

  private def hexMd5(md: java.security.MessageDigest, bytes: Array[Byte], len: Int): String = {
    md.reset()
    md.update(bytes, 0, len)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Wrap a text table as a media table: bytes + typed metadata.
    * (In production the binary column comes straight from the lake.)
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("media"))

  /** STUB decode: deterministic fake "feature extraction" from raw
    * bytes. Replace with a real codec (image resize / audio frames /
    * video frame-sample) in production — signature and batching stay.
    */
  private def stubDecode(bytes: Array[Byte]): Array[Float] = {
    // ??? <- real decoder goes here; deterministic fake for tests:
    val dims = 4
    val acc = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) { acc(i % dims) += (bytes(i) & 0xff); i += 1 }
    acc.map(v => if (bytes.length == 0) 0f else (v.toDouble / bytes.length).toFloat)
  }

  final case class MediaFrames(
      doc_id: Long, mime: String, n_frames: Long, first_frame_md5: String)

  /** Frame sampling over the binary column — the video/audio analogue of
    * the decode stub: deterministic byte windows of `frameSize` bytes
    * taken every `stride` bytes stand in for decoded frames (a real
    * codec replaces the window slicing; the per-partition batching,
    * schema, and output shape are the production plumbing). Returns the
    * sampled-frame count and an md5 of the first frame for verification.
    */
  def frameSample(media: DataFrame, frameSize: Int = 256, stride: Int = 512): Dataset[MediaFrames] = {
    require(frameSize > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val bytes = mediaBytes(r)
          val n = if (bytes.isEmpty) 0L else (bytes.length + stride - 1L) / stride
          val first =
            if (bytes.isEmpty) null
            else hexMd5(md, bytes, math.min(frameSize, bytes.length))
          MediaFrames(r.doc_id, r.mime, n, first)
        }
      }
  }

  final case class MediaResampled(
      doc_id: Long, mime: String, n_bytes: Int, resampled_md5: String)

  /** Resize/resample stand-in: nearest-neighbor byte resampling to a
    * fixed target length — the 1-D analogue of an image resize, with the
    * same plumbing a real resize needs (per-partition batches over the
    * binary column, fixed-size output). Index rule `(i * len) / target`
    * is pure integer arithmetic, so the output is reproducible anywhere.
    * Empty media resamples to null.
    */
  def resample(media: DataFrame, target: Int = 64): Dataset[MediaResampled] = {
    require(target > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val bytes = mediaBytes(r)
          val digest =
            if (bytes.isEmpty) null
            else {
              val out = new Array[Byte](target)
              var i = 0
              while (i < target) {
                out(i) = bytes(((i.toLong * bytes.length) / target).toInt)
                i += 1
              }
              hexMd5(md, out, out.length)
            }
          MediaResampled(r.doc_id, r.mime, bytes.length, digest)
        }
      }
  }

  /** Partition-wise batched feature extraction over the binary column.
    * One pass, no shuffle; executor-side only.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = mediaBytes(r)
          val crc = new java.util.zip.CRC32
          crc.update(bytes)
          MediaFeatures(
            r.doc_id, r.mime, bytes.length,
            if (bytes.isEmpty) -1 else bytes(0) & 0xff,
            crc.getValue,
            stubDecode(bytes))
        }
      }
  }
}
