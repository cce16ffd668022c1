package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video as
  * opaque BINARY columns with typed metadata, processed per-partition in
  * batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, `mapPartitions` signature; only the codec call is a STUB
  * (the image/audio libraries are not in this container). On a real
  * cluster you swap [[stubDecode]] for the codec and nothing else changes.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata, the storage shape for
    * binary modalities in a parquet lake. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (decode output). */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, checksum: Long)

  /** STUB decode: deterministic fake features derived from the bytes.
    * Real implementation would call the image/audio codec here (???), e.g.
    * javax.imageio / ffmpeg bindings; the rest of the pipeline is agnostic
    * to what runs inside. */
  def stubDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    // deterministic fake geometry + additive checksum (stand-in for a
    // decoded frame's dimensions)
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(r.doc_id, r.media_type, n,
      width = (sum % 640).toInt + 1, height = (sum % 480).toInt + 1,
      checksum = sum)
  }

  /** Batched per-partition feature extraction. `mapPartitions` (not a
    * per-row UDF) so a real decoder can amortize codec init per partition
    * and process batches — the Spark idiom for heavyweight decode. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows => rows.map(stubDecode) }
  }

  /** Build a MediaRow dataset from the documents table, treating the text
    * bytes as an opaque payload (the container has no real media files;
    * payload content is irrelevant to the plumbing under test). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
        .as("media_type"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** A sampled frame: one-to-many decode output (the UDTF-shaped
    * multimodal op — one video row explodes into its kept frames). */
  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int,
                   head_code: Int, tail_code: Int)

  /** Frame sampling: chunk the payload into fixed-size pseudo-frames and
    * keep every `everyN`-th — the video-curation primitive (STUB codec:
    * a real decoder would emit decoded frames; the partition-batched
    * one-to-many plumbing is what's under test, and the stub's byte
    * arithmetic keeps it oracle-checkable). */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   frameBytes: Int = 256, everyN: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    require(frameBytes > 0 && everyN > 0, "frameBytes and everyN must be > 0")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % everyN == 0 =>
            Frame(r.doc_id, idx, chunk.length,
              chunk.head & 0xff, chunk.last & 0xff)
        }
      }
    }
  }

  /** Resize output: target geometry + the byte budget actually kept. */
  case class ResizedMedia(doc_id: Long, media_type: String,
                          out_w: Int, out_h: Int, n_bytes_out: Long)

  /** STUB resize: cap the payload at the target pixel budget (w×h bytes)
    * — stand-in for a real scaler; per-partition batching as above. */
  def stubResize(spark: SparkSession, media: Dataset[MediaRow],
                 w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    val budget = w.toLong * h
    media.mapPartitions { rows =>
      rows.map(r => ResizedMedia(r.doc_id, r.media_type, w, h,
        math.min(r.payload.length.toLong, budget)))
    }
  }
}
