package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * IMAGE decode is REAL: [[decodeImages]] uses the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF ship with the JRE — no external
  * codec needed) to produce dimensions, channel count, and exact pixel
  * statistics, with undecodable bytes degrading to a typed
  * `decoded=false` row instead of failing the job. AUDIO decode is
  * REAL too: [[decodeAudio]] uses `javax.sound.sampled` (WAV/PCM ships
  * with the JRE) for frame/channel/rate metadata and exact amplitude
  * sums. Only VIDEO remains a stand-in (`frameSample`/`resample` — no
  * video codec exists in the JDK or this container): the
  * `mapPartitions` batching, schema, and output shape are the
  * production plumbing either way; swapping in a real video codec
  * changes only the per-row body.
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

  final case class ImageMeta(
      doc_id: Long, mime: String, n_bytes: Int, decoded: Boolean,
      width: Int, height: Int, channels: Int, pixel_sum: Long, pixel_md5: String)

  /** REAL image decode over the binary column via the JDK's ImageIO
    * (PNG/JPEG/BMP/GIF). Per row: dimensions, raster channel count, the
    * exact sum of (r+g+b) over all pixels, and an md5 over the
    * row-major 3-byte-per-pixel RGB stream — enough to pin a lossless
    * round-trip bit-for-bit (the multimodal_decode gate does exactly
    * that against a pure-arithmetic DuckDB oracle). Non-image mimes,
    * empty payloads, and bytes no installed reader accepts yield a
    * typed `decoded=false` row — one poison blob must not fail a
    * 100-TB scan. One pass, no shuffle; decode cost is linear in pixel
    * count and stays on the executor.
    */
  def decodeImages(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        // no ImageIO tmp-file spill on executors; a few-MB image decodes
        // straight from the heap byte array
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val bytes = mediaBytes(r)
          def undecoded = ImageMeta(r.doc_id, r.mime, bytes.length,
            decoded = false, -1, -1, -1, -1L, null)
          if (r.mime == null || !r.mime.startsWith("image/") || bytes.isEmpty) undecoded
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) undecoded // no registered reader for these bytes
            else {
              val w = img.getWidth
              val h = img.getHeight
              val channels = img.getRaster.getNumBands
              md.reset()
              var sum = 0L
              val rowBuf = new Array[Int](w)
              val rowBytes = new Array[Byte](w * 3)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w) // bulk row fetch, sRGB-normalized
                var x = 0
                while (x < w) {
                  val p = rowBuf(x)
                  val rr = (p >> 16) & 0xff
                  val gg = (p >> 8) & 0xff
                  val bb = p & 0xff
                  sum += rr + gg + bb
                  rowBytes(x * 3) = rr.toByte
                  rowBytes(x * 3 + 1) = gg.toByte
                  rowBytes(x * 3 + 2) = bb.toByte
                  x += 1
                }
                md.update(rowBytes)
                y += 1
              }
              ImageMeta(r.doc_id, r.mime, bytes.length, decoded = true,
                w, h, channels, sum, md.digest().map("%02x".format(_)).mkString)
            }
          } catch { case scala.util.control.NonFatal(_) => undecoded }
        }
      }
  }

  /** Deterministic tiny-PNG plant for the decode gate: each doc_id maps
    * to a `(2 + id%6) x (2 + id%4)` RGB image whose pixel channels are
    * pure arithmetic in (id, x, y) —
    * `r=(31·id+7x+13y)%256, g=(17·id+5x+11y)%256, b=(29·id+3x+19y)%256`
    * — encoded through the JDK PNG writer. PNG is lossless, so decoding
    * the planted bytes back through [[decodeImages]] must reproduce the
    * rule's dimensions and pixel sums EXACTLY, which a DuckDB oracle can
    * verify from the arithmetic alone without any image library.
    */
  def plantPngTable(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (2 + Math.floorMod(id, 6L)).toInt
        val h = (2 + Math.floorMod(id, 4L)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rr = Math.floorMod(31L * id + 7L * x + 13L * y, 256L).toInt
            val gg = Math.floorMod(17L * id + 5L * x + 11L * y, 256L).toInt
            val bb = Math.floorMod(29L * id + 3L * x + 19L * y, 256L).toInt
            img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream(256)
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image/png", bos.toByteArray)
      }
    }.toDF()
  }

  final case class AudioMeta(
      doc_id: Long, mime: String, n_bytes: Int, decoded: Boolean,
      n_frames: Long, channels: Int, sample_rate: Int, amplitude_sum: Long)

  /** REAL audio decode over the binary column via the JDK's
    * `javax.sound.sampled` (WAV/PCM ships with the JRE, like ImageIO's
    * PNG — no external codec). Per row: frame count, channel count,
    * sample rate, and the EXACT sum of all signed 16-bit sample values
    * (channels interleaved) — enough to pin a lossless PCM round-trip
    * bit-for-bit (the multimodal_audio gate replays the plant rule's
    * arithmetic in DuckDB with no audio library). Non-audio mimes,
    * empty payloads, bytes no installed reader accepts, and non-16-bit
    * or non-PCM encodings yield a typed `decoded=false` row — one
    * poison blob must not fail a 100-TB scan. One pass, no shuffle;
    * decode cost is linear in sample count and stays on the executor.
    * Video codecs remain genuinely absent from the JDK — [[frameSample]]
    * stays the documented stand-in for that modality only.
    */
  def decodeAudio(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = mediaBytes(r)
          def undecoded = AudioMeta(r.doc_id, r.mime, bytes.length,
            decoded = false, -1L, -1, -1, -1L)
          if (r.mime == null || !r.mime.startsWith("audio/") || bytes.isEmpty) undecoded
          else try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = in.getFormat
              val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16
              if (!ok) undecoded
              else {
                val pcm = in.readAllBytes()
                var sum = 0L
                var i = 0
                if (fmt.isBigEndian) {
                  while (i + 1 < pcm.length) {
                    sum += ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort; i += 2
                  }
                } else {
                  while (i + 1 < pcm.length) {
                    sum += ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort; i += 2
                  }
                }
                AudioMeta(r.doc_id, r.mime, bytes.length, decoded = true,
                  in.getFrameLength, fmt.getChannels, fmt.getSampleRate.toInt, sum)
              }
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => undecoded }
        }
      }
  }

  /** Deterministic WAV plant for the audio-decode gate (the audio twin
    * of [[plantPngTable]]): each doc_id maps to a 16-bit signed PCM WAV
    * with `channels = 1 + id%2`, `frames = 16 + id%32`, sample rate
    * 8000, and interleaved sample values that are pure arithmetic in
    * (id, frame, channel):
    * `s(id,t,ch) = (37·id + 257·t + 101·ch) % 65536 - 32768`.
    * WAV PCM is lossless, so decoding the planted bytes back through
    * [[decodeAudio]] must reproduce the rule's frame/channel counts and
    * amplitude sums EXACTLY, which a DuckDB oracle verifies from the
    * arithmetic alone.
    */
  def plantWavTable(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val channels = (1 + Math.floorMod(id, 2L)).toInt
        val frames = (16 + Math.floorMod(id, 32L)).toInt
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, channels, true /* signed */, false /* little-endian */)
        val pcm = new Array[Byte](frames * channels * 2)
        var t = 0
        while (t < frames) {
          var ch = 0
          while (ch < channels) {
            val v = (Math.floorMod(37L * id + 257L * t + 101L * ch, 65536L) - 32768L).toInt
            val off = (t * channels + ch) * 2
            pcm(off) = (v & 0xff).toByte
            pcm(off + 1) = ((v >> 8) & 0xff).toByte
            ch += 1
          }
          t += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream(pcm.length + 64)
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio/wav", bos.toByteArray)
      }
    }.toDF()
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
