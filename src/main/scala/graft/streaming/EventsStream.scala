package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.11). The reference is batch;
  * its streaming-adjacent trait is the incremental per-parent SQL append
  * during the crawl (`web_spider_oo.py:123-128`) — micro-batch-shaped
  * output. This module covers the capability as an honest extension:
  * watermarked tumbling-window aggregation over the `events` fixture with
  * a memory sink for synchronous local verification (`foreachBatch` would
  * be the JDBC-append analog of K1 in production).
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked 5-minute tumbling-window counts per event_type.
    * State-bounding note: the watermark evicts window state in
    * append/update output modes (the production path via foreachBatch);
    * the bounded local demos below use complete mode, where every window
    * is retained and recomputed — fine for a finite fixture, never for
    * an unbounded stream. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      // decimal-exact sum (value is a 2-decimal measure): associative and
      // order-independent, so the micro-batch partial aggregation is
      // bit-identical to any batch engine — the cross-engine parity rule
      .agg(count("*").as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Run the streaming query over a parquet directory (file source, one
    * micro-batch per file batch), into a named memory sink; returns the
    * started query. Call `processAllAvailable()` then read
    * `spark.table(queryName)`. */
  def start(spark: SparkSession, sourceDir: String,
            queryName: String): StreamingQuery = {
    val src = spark.readStream.schema(eventsSchema).parquet(sourceDir)
    windowedCounts(src).writeStream
      .outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
  }

  /** The production sink shape for the reference's incremental per-parent
    * SQL append (K1, `web_spider_oo.py:123-128`): `foreachBatch` gives
    * each micro-batch to a batch writer — here an append-mode parquet
    * write stamped with the batch id; swapping the write for
    * `format("jdbc").option("dbtable", ...)` (Sinks.jdbcAppend) is the
    * literal K1 and changes nothing else. Update output mode + watermark
    * bound the emitted and retained state; the batch id enables
    * idempotent replay (dedup on (batch_id, key) downstream). */
  def startIncrementalAppend(spark: SparkSession, sourceDir: String,
                             outDir: String): StreamingQuery = {
    val src = spark.readStream.schema(eventsSchema).parquet(sourceDir)
    windowedCounts(src).writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** Same, for the driver fixture whose `ts` is stored as raw INT64
    * (TIMESTAMP(NANOS) read as long via
    * spark.sql.legacy.parquet.nanosAsLong, or TIMESTAMP(MICROS)
    * physical int64): read it as long and convert to a microsecond
    * timestamp before the watermark. The unit is probed from the batch
    * schema of the same path (streaming schemas can't infer). */
  def startOverNanosFixture(spark: SparkSession, path: String,
                            queryName: String): StreamingQuery =
    windowedCounts(sourceOverNanosFixture(spark, path)).writeStream
      .outputMode("complete")
      .format("memory").queryName(queryName)
      .start()

  /** The raw streaming source over the nanos fixture (ts normalized to
    * a microsecond timestamp) — shared by the windowed demo above and
    * the DSv2 streaming-sink query. */
  def sourceOverNanosFixture(spark: SparkSession, path: String): DataFrame = {
    val nanosSchema = StructType(eventsSchema.map {
      case f if f.name == "ts" => f.copy(dataType = LongType)
      case f => f
    })
    val tsDiv = spark.read.parquet(path).schema("ts").dataType match {
      case LongType => 1000L // nanos under the legacy conf
      case _ => 1L // TIMESTAMP(MICROS) physical int64
    }
    spark.readStream.schema(nanosSchema).parquet(path)
      .withColumn("ts", timestamp_micros(expr(s"ts div $tsDiv")))
  }
}
