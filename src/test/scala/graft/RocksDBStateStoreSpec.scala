package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The production state backend: RocksDB state store. The default
  * HDFS-backed store keeps every key on the JVM heap — at 100 TB/day a
  * windowed aggregation's state OOMs executors long before the data is
  * the problem. RocksDB spills state to local SSD with bounded memory,
  * changelog checkpointing, and snapshot upload; this spec proves the
  * engine's streaming queries run unmodified on that provider and that
  * state survives a restart through the checkpoint. */
class RocksDBStateStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  private def withRocksDB[T](body: => T): T =
    graft.core.Tables.withRocksDbStateStore(spark)(body)

  test("windowed aggregation state lives in RocksDB and survives restart") {
    withRocksDB {
      val in = Files.createTempDirectory("graft_rocks_in").toString
      val out = Files.createTempDirectory("graft_rocks_out").toString
      val ckpt = Files.createTempDirectory("graft_rocks_ckpt").toString

      def mkBatch(ids: Range, hour: Int): Unit =
        ids.map(i => (i.toLong,
            java.sql.Timestamp.valueOf(f"2026-01-01 $hour%02d:10:00")))
          .toDF("user_id", "ts")
          .coalesce(1).write.mode("append").parquet(in)

      def runOnce(): Unit = {
        val q = spark.readStream.schema(schema).parquet(in)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("ws"), col("user_id"), col("n"))
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
        assert(!q.isActive)
      }

      mkBatch(0 until 20, hour = 1)
      runOnce()
      // advance event time far enough that the watermark closes hour-1
      // windows; their state must be read back from RocksDB via the
      // checkpoint on this SECOND run
      mkBatch(0 until 10, hour = 6)
      runOnce()
      mkBatch(0 until 5, hour = 12)
      runOnce()

      val rows = spark.read.parquet(out)
      // hour-1 and hour-6 windows are closed (watermark passed); each
      // user counted once per window
      val h1 = rows.filter(col("ws") === "2026-01-01 01:00:00").count()
      val h6 = rows.filter(col("ws") === "2026-01-01 06:00:00").count()
      assert(h1 == 20, s"hour-1 windows: $h1")
      assert(h6 == 10, s"hour-6 windows: $h6")
      assert(rows.filter(col("n") =!= 1).isEmpty)
    }
  }
}
