package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming observability + ingestion throttling:
  *
  *  - the state-store DATA SOURCE (`spark.read.format("statestore")`)
  *    reads a checkpointed query's operator state as a batch DataFrame —
  *    how production answers "which keys are stuck in state / how big is
  *    state really" without instrumenting the job;
  *  - `maxFilesPerTrigger` paces a file-source backlog into bounded
  *    micro-batches — the streaming analog of the reference's politeness
  *    rate limit (one page per 40-90 s sleep, web_spider_oo.py:183):
  *    throughput is capped at the source, not by sleeping in user code.
  */
class StateSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("t", TimestampType)))

  test("statestore source reads windowed-agg state as a batch DataFrame") {
    val in = Files.createTempDirectory("graft_sts_in").toString
    val ckpt = Files.createTempDirectory("graft_sts_ckpt").toString
    val t0 = 1700000100L // 5-minute aligned window containment not needed
    def ts(off: Long) = new Timestamp((t0 + off) * 1000L)
    // three events across two 5-minute windows
    Seq((1L, ts(0)), (2L, ts(30)), (3L, ts(400)))
      .toDF("k", "t").coalesce(1).write.mode("append").parquet(in)

    val q = spark.readStream.schema(schema).parquet(in)
      .withWatermark("t", "10 minutes")
      .groupBy(window(col("t"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_sts_out")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop()

    // the checkpoint IS the queryable artifact: state rows come back as
    // (key, value, partition_id) — two windows, counts 2 and 1
    val state = spark.read.format("statestore").load(ckpt)
    assert(state.columns.contains("key") && state.columns.contains("value"))
    val rows = state
      .select(unix_micros(col("key.window.start")).as("ws"),
        col("value").getField(state.select(col("value.*")).columns.head)
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 2, s"expected 2 windows in state, got $rows")
    assert(rows.values.toSeq.sorted == Seq(1L, 2L),
      s"expected window counts 1 and 2, got $rows")
  }

  test("maxFilesPerTrigger bounds each micro-batch (source-side rate limit)") {
    val in = Files.createTempDirectory("graft_mft_in").toString
    // three single-file appends = a 3-file backlog
    for (i <- 1 to 3)
      Seq((i.toLong, new Timestamp(1700000000L * 1000L)))
        .toDF("k", "t").coalesce(1).write.mode("append").parquet(in)

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
      .writeStream.format("memory").queryName("graft_mft_out")
      .start()
    q.processAllAvailable()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(spark.table("graft_mft_out").count() == 3)
    assert(dataBatches == 3,
      s"3-file backlog at 1 file/trigger should take 3 batches, took $dataBatches")
  }
}
