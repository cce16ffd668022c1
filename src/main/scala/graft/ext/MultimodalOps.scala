package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing (north-star extension): image/audio/video
  * as opaque BINARY columns with typed metadata, processed per-partition
  * in batches.
  *
  * The image codec is REAL — JDK-builtin `javax.imageio` PNG encode and
  * decode (no external dependency, works offline): [[decodeImages]]
  * reads actual pixels out of actual PNG bytes, [[resizeImages]] is a
  * real nearest-neighbor scaler over decoded pixels, [[sampleFrames]]
  * decodes a frame-strip image and slices true frames out of it. Video
  * CONTAINER parsing is the one thing the JDK cannot do, so the frame
  * fixture models a video as a vertically-stacked strip PNG (one frame
  * per `frameH` rows) — the decode, batching and one-to-many explode are
  * all real; only the container demux is out of scope.
  *
  * Everything runs inside `mapPartitions` (not a per-row UDF) so the
  * codec works batch-at-a-time per partition — the Spark idiom for
  * heavyweight decode: at 100 TB the payload column never reaches the
  * driver, partitions decode independently, and the feature output is
  * columnar and tiny compared to the media bytes.
  *
  * Determinism contract for the oracle: fixture PNGs are synthesized
  * from a pixel FORMULA of (doc_id, x, y) ([[pixelR]]/[[pixelG]]/
  * [[pixelB]]); PNG is lossless 8-bit RGB, so decoded pixels equal the
  * formula exactly and DuckDB can hash-check real decode output by
  * evaluating the same formula — a fake decoder cannot pass.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata, the storage shape for
    * binary modalities in a parquet lake. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded image features: geometry + exact per-channel pixel sums
    * (integer-exact, so both engines agree bit-for-bit). */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           n_pixels: Long, sum_r: Long, sum_g: Long,
                           sum_b: Long)

  /** One sampled frame's features (one-to-many decode output). */
  case class FrameFeatures(doc_id: Long, frame_idx: Int, sum_r: Long,
                           sum_g: Long, sum_b: Long)

  /** Nearest-neighbor resize output: target geometry + exact channel
    * sums of the RESIZED pixels. */
  case class ResizedFeatures(doc_id: Long, out_w: Int, out_h: Int,
                             sum_r: Long, sum_g: Long, sum_b: Long)

  // deterministic fixture pixel formula — shared (via the generated
  // oracle SQL) with DuckDB; all moduli of non-negative values
  private[graft] def pixelR(id: Long, x: Int, y: Int): Int =
    ((id * 7 + x * 13 + y * 31) % 256).toInt
  private[graft] def pixelG(id: Long, x: Int, y: Int): Int =
    ((id * 11 + x * 3 + y * 17) % 256).toInt
  private[graft] def pixelB(id: Long, x: Int, y: Int): Int =
    ((id * 5 + x * 19 + y * 23) % 256).toInt

  private def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelR(id, x, y) << 16) | (pixelG(id, x, y) << 8) | pixelB(id, x, y))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    // ImageIO defaults to DISK-backed stream caches (a temp file per
    // encode/decode) guarded by a synchronized plugin registry — measured
    // here as cross-task contention (widening the codec stages to 32
    // concurrent tasks tripled the decode query; see PERF.md r10). All
    // payloads are in-memory byte arrays, so file caching buys nothing.
    // Scoped PER CALL (an explicit memory-cache stream) rather than via the
    // process-global ImageIO.setUseCache(false): the global toggle would
    // silently change behavior for every other ImageIO user sharing the
    // driver/executor JVM when this library is embedded.
    val ios = new MemoryCacheImageOutputStream(out)
    // close() in finally (ADVICE r11): it both releases the stream and
    // FLUSHES the memory cache into `out` — a skipped close would leak
    // the stream on an ImageIO.write throw, and any non-throwing path
    // that missed it would silently return a truncated PNG payload
    try ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  /** Fixture builder: one REAL PNG per document, geometry a function of
    * doc_id (w = id%5+1, h = id%4+1), pixels from the shared formula.
    * Encoded executor-side in batches — the write half of the codec
    * round trip. */
  def imagesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        MediaRow(id, "image",
          synthPng(id, (id % 5).toInt + 1, (id % 4).toInt + 1))
      }
    }
  }

  /** Fixture builder for frame strips: a "video" of `nFrames = id%3+2`
    * frames, each `w`×`frameH`, stacked vertically into one PNG. */
  def stripsFromDocuments(spark: SparkSession, docs: DataFrame,
                          w: Int = 4, frameH: Int = 3): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val nFrames = (id % 3).toInt + 2
        MediaRow(id, "video", synthPng(id, w, frameH * nFrames))
      }
    }
  }

  private def readImage(payload: Array[Byte]): BufferedImage = {
    // memory-cache stream scoped per call (see synthPng); ImageIO.read
    // closes the ImageInputStream it is handed
    val img = ImageIO.read(
      new MemoryCacheImageInputStream(new ByteArrayInputStream(payload)))
    require(img != null, "payload is not a decodable image")
    img
  }

  private def channelSums(img: BufferedImage, x0: Int, y0: Int,
                          w: Int, h: Int): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = y0
    while (y < y0 + h) {
      var x = x0
      while (x < x0 + w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** REAL batched image decode: `javax.imageio` per partition, exact
    * geometry + channel sums out. This is the feature-extraction shape
    * of an image-curation pipeline (aesthetic scoring, NSFW filtering,
    * dedup hashing all start from exactly this decoded-pixel access). */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = readImage(r.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val (sr, sg, sb) = channelSums(img, 0, 0, w, h)
        ImageFeatures(r.doc_id, w, h, w.toLong * h, sr, sg, sb)
      }
    }
  }

  case class PHash(doc_id: Long, phash: Long)

  /** Average-hash (aHash) perceptual fingerprint from the REAL decoded
    * pixels: NN-downsample to a grid×grid thumbnail (same source-pixel
    * mapping as [[resizeImages]]: (i·w) / grid), per-cell gray =
    * r+g+b, bit k set when the cell is brighter than the thumbnail
    * mean — evaluated as gray·grid² > total (cross-multiplied
    * integers, no floating mean, so the HASH is bit-stable and the
    * formula-replay oracle can recompute it). Identical images hash
    * equal; near-identical images land in the same or adjacent
    * hamming buckets — the image-dedup fingerprint every visual
    * curation pipeline keys on. */
  def perceptualHash(spark: SparkSession, media: Dataset[MediaRow],
                     grid: Int): Dataset[PHash] = {
    import spark.implicits._
    // the hash is a Long bitmap: grid*grid cells beyond 64 would wrap 1L << k
    require(grid > 0 && grid * grid <= 64,
      s"grid*grid must be in [1,64] (got grid=$grid)")
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = readImage(r.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val grays = new Array[Long](grid * grid)
        var j = 0
        while (j < grid) {
          var i = 0
          while (i < grid) {
            val rgb = img.getRGB(i * w / grid, j * h / grid)
            grays(j * grid + i) =
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
            i += 1
          }
          j += 1
        }
        val total = grays.sum
        var bits = 0L
        var k = 0
        while (k < grays.length) {
          if (grays(k) * grid * grid > total) bits |= 1L << k
          k += 1
        }
        PHash(r.doc_id, bits)
      }
    }
  }

  /** Frame sampling over a frame-strip "video": decode once, slice every
    * `everyN`-th `frameH`-row frame, emit per-frame channel sums — the
    * one-to-many (UDTF-shaped) multimodal op, partition-batched. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   frameH: Int = 3, everyN: Int = 2): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(frameH > 0 && everyN > 0, "frameH and everyN must be > 0")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img = readImage(r.payload)
        val nFrames = img.getHeight / frameH
        (0 until nFrames by everyN).iterator.map { fi =>
          val (sr, sg, sb) =
            channelSums(img, 0, fi * frameH, img.getWidth, frameH)
          FrameFeatures(r.doc_id, fi, sr, sg, sb)
        }
      }
    }
  }

  /** REAL nearest-neighbor resize over decoded pixels:
    * `src(x·inW/outW, y·inH/outH)` (floor division — the canonical NN
    * sampling, chosen over Graphics2D interpolation because it is
    * bit-deterministic and therefore oracle-checkable). Emits the
    * resized image's exact channel sums. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
                   outW: Int, outH: Int): Dataset[ResizedFeatures] = {
    import spark.implicits._
    require(outW > 0 && outH > 0, "target geometry must be positive")
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = readImage(r.payload)
        val (inW, inH) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            val rgb = img.getRGB(x * inW / outW, y * inH / outH)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ResizedFeatures(r.doc_id, outW, outH, sr, sg, sb)
      }
    }
  }

  /** Decoded audio features: format geometry + exact integer sample
    * sums (amplitude and absolute amplitude — the loudness/DC-offset
    * inputs of an audio-curation filter). */
  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                           sum_amp: Long, sum_abs: Long)

  /** Deterministic fixture sample formula (signed 16-bit range),
    * shared with the DuckDB oracle. */
  private[graft] def audioSample(id: Long, i: Int): Int =
    (((id * 31 + i * 17) % 2003) - 1001).toInt

  private def synthWav(id: Long): Array[Byte] = {
    val n = (id % 50).toInt + 20
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = audioSample(id, i)
      data(2 * i) = (v & 0xff).toByte // little-endian signed 16-bit PCM
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Fixture builder: one REAL RIFF/WAVE file per document (8 kHz mono
    * 16-bit PCM, `id%50+20` samples from the shared formula), encoded
    * executor-side with JDK `javax.sound.sampled`. */
  def wavsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "audio", synthWav(id)))
    }
  }

  /** REAL batched audio decode: `AudioSystem.getAudioInputStream`
    * parses the WAV container and format per row inside mapPartitions;
    * PCM is lossless, so the emitted integer sample sums must equal the
    * generating formula exactly — a decoder that does not truly parse
    * frames cannot match the oracle. */
  def decodeAudio(spark: SparkSession, media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian, s"unexpected PCM layout: $fmt")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var (sum, sabs) = (0L, 0L)
          var i = 0
          while (i < n) {
            val v = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
            sum += v; sabs += math.abs(v)
            i += 1
          }
          AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, n.toLong, sum, sabs)
        } finally ais.close()
      }
    }
  }

  case class AudioFp(doc_id: Long, n_samples: Long, afp: Long)

  /** Energy-band audio fingerprint from the REAL decoded PCM: the
    * sample stream splits into `bands` equal windows (band of sample i
    * = (i·bands)/n, the NN mapping), per-band energy = Σ|amplitude|,
    * bit k set when the band is louder than the clip mean —
    * E_k·bands > total (cross-multiplied integers, bit-stable) — the
    * audio twin of [[perceptualHash]]: clips with the same loudness
    * shape bucket together, the first stage of audio dedup. */
  def audioFingerprint(spark: SparkSession, media: Dataset[MediaRow],
                       bands: Int): Dataset[AudioFp] = {
    import spark.implicits._
    // Long-bitmap fingerprint: more than 64 bands would wrap 1L << k
    require(bands > 0 && bands <= 64, s"bands must be in [1,64] (got $bands)")
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian, s"unexpected PCM layout: $fmt")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val energy = new Array[Long](bands)
          var total = 0L
          var i = 0
          while (i < n) {
            val v = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
            val a = math.abs(v).toLong
            // long band index: i*bands overflows Int past ~2^31/bands samples
            energy((i.toLong * bands / n).toInt.min(bands - 1)) += a
            total += a
            i += 1
          }
          var bits = 0L
          var k = 0
          while (k < bands) {
            if (energy(k) * bands > total) bits |= 1L << k
            k += 1
          }
          AudioFp(r.doc_id, n.toLong, bits)
        } finally ais.close()
      }
    }
  }

  /** The audio formula's channel sums as SQL (columns `doc_id`, `i`). */
  private[graft] val audioSumSql: String =
    "sum((doc_id * 31 + i * 17) % 2003 - 1001)"
  private[graft] val audioAbsSumSql: String =
    "sum(abs((doc_id * 31 + i * 17) % 2003 - 1001))"

  /** Opaque-payload builder from the documents table (text bytes as
    * payload) — the storage-plumbing fixture for sinks/sources that
    * treat media as bytes without decoding. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
        .as("media_type"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  // ---------- generated oracle fragments ----------

  /** The pixel formula as SQL — generated beside the Scala so both
    * engines evaluate the identical arithmetic. `id`, `x`, `y` are
    * column names in scope at the call site. */
  private[graft] def pixelSumSql(chan: Char): String = chan match {
    case 'r' => "sum((doc_id * 7 + x * 13 + y * 31) % 256)"
    case 'g' => "sum((doc_id * 11 + x * 3 + y * 17) % 256)"
    case 'b' => "sum((doc_id * 5 + x * 19 + y * 23) % 256)"
  }
}
