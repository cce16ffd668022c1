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
}
