package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateV2

/** transformWithState (state API v2): the RunningTotals processor's
  * cross-batch state — ValueState survives micro-batch boundaries,
  * MapState counts each distinct event type once no matter how many
  * batches repeat it, and Update-mode emissions are per-(key, batch)
  * so `finalTotals` must recover exactly the batch aggregate. */
class StateV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRocksDB[T](body: => T): T =
    graft.core.Tables.withRocksDbStateStore(spark)(body)

  /** (event_id, user_id, value, event_type) rows → one parquet file in dir. */
  private def writeBatch(dir: String,
      rows: Seq[(Long, Long, Double, String)]): Unit =
    rows.toDF("event_id", "user_id", "value", "event_type")
      .coalesce(1).write.mode("append").parquet(dir)

  test("ValueState and MapState persist across micro-batches; finalTotals == batch aggregate") {
    withRocksDB {
      val in = Files.createTempDirectory("graft_tws_in").toString
      val ckpt = Files.createTempDirectory("graft_tws_ckpt").toString
      // batch 1: user 1 twice (types a, a), user 2 once (type b)
      writeBatch(in, Seq((1L, 1L, 1.50, "a"), (2L, 1L, 2.25, "a"),
        (3L, 2L, 10.0, "b")))

      val src = spark.readStream
        .schema("event_id LONG, user_id LONG, value DOUBLE, event_type STRING")
        .option("maxFilesPerTrigger", "1") // one staged file per micro-batch
        .parquet(in)
      val q = StateV2.runningTotals(spark, src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("tws_spec_out").start()
      q.processAllAvailable()
      // batch 2: user 1 again with a REPEATED type (map state must not
      // double-count) and a new type; user 3 appears fresh
      writeBatch(in, Seq((4L, 1L, 0.25, "a"), (5L, 1L, 1.00, "c"),
        (6L, 3L, 5.0, "a")))
      q.processAllAvailable()
      q.stop()

      val perBatch = spark.table("tws_spec_out")
      // user 1 emitted once per batch it appeared in, with running n
      val u1 = perBatch.where($"user_id" === 1).orderBy("n")
        .as[(Long, Long, Long, Long)].collect()
      assert(u1.map(_._2).toSeq == Seq(2L, 4L)) // n after each batch
      assert(u1.last == ((1L, 4L, 500L, 2L)))   // 5.00 in cents, types {a,c}

      val fin = StateV2.finalTotals(perBatch).orderBy("user_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(fin == Seq((1L, 4L, 500L, 2L), (2L, 1L, 1000L, 1L),
        (3L, 1L, 500L, 1L)))
    }
  }

  test("warm start: initial-state seeds fold with streamed rows; repeated seed types dedup") {
    withRocksDB {
      val in = Files.createTempDirectory("graft_tws_ws_in").toString
      // user 1: seeded (n=3, 1000 cents, types {a,b}); streams one more
      // 'a' (map state must not double-count) and one 'c'.
      // user 2: seeded but silent — must NOT appear in Update output.
      // user 3: unseeded cold start.
      writeBatch(in, Seq((10L, 1L, 0.50, "a"), (11L, 1L, 1.00, "c"),
        (12L, 3L, 2.00, "z")))
      val seeds = Seq((1L, 3L, 1000L, Seq("a", "b")),
        (2L, 9L, 9000L, Seq("x")))
        .toDF("user_id", "n", "cents", "types")
      val src = spark.readStream
        .schema("event_id LONG, user_id LONG, value DOUBLE, event_type STRING")
        .parquet(in)
      val q = StateV2.runningTotalsWarmStart(spark, src, seeds)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_ws_out").start()
      q.processAllAvailable()
      q.stop()
      val fin = StateV2.finalTotals(spark.table("tws_ws_out"))
        .orderBy("user_id").as[(Long, Long, Long, Long)].collect().toSeq
      assert(fin == Seq((1L, 5L, 1150L, 3L), (3L, 1L, 200L, 1L)))
    }
  }

  test("idle flush: timer re-parks while a key stays active, fires once on idle") {
    withRocksDB {
      val in = Files.createTempDirectory("graft_tws_tm_in").toString
      def mkBatch(rows: Seq[(Long, String)]): Unit =
        rows.map { case (uid, ts) => (uid, java.sql.Timestamp.valueOf(ts)) }
          .toDF("user_id", "ts")
          .coalesce(1).write.mode("append").parquet(in)
      // batch 1: user 5 twice within the gap
      mkBatch(Seq((5L, "2026-01-01 10:00:00"), (5L, "2026-01-01 10:00:30")))
      val src = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
      val q = StateV2.idleFlush(spark, src, gapMs = 60000L,
          watermarkDelay = "0 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_tm_out").start()
      q.processAllAvailable()
      // still within gap of the re-parked timer: nothing emitted yet
      assert(spark.table("tws_tm_out").count() == 0)
      // batch 2: user 5 again (re-park), then a sentinel far past the
      // idle horizon forces the flush — ONE row, total n = 3
      mkBatch(Seq((5L, "2026-01-01 10:01:00"), (99L, "2026-01-01 12:00:00")))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("tws_tm_out").where($"user_id" === 5).count() < 1 &&
          System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      q.stop()
      val got = spark.table("tws_tm_out").where($"user_id" === 5)
        .as[(Long, Long, Long)].collect().toSeq
      val lastUs = java.sql.Timestamp.valueOf("2026-01-01 10:01:00").getTime * 1000
      assert(got == Seq((5L, 3L, lastUs)))
    }
  }

  test("transformWithState state survives a query restart through the checkpoint") {
    withRocksDB {
      val in = Files.createTempDirectory("graft_tws_rs_in").toString
      val ckpt = Files.createTempDirectory("graft_tws_rs_ckpt").toString
      val out = Files.createTempDirectory("graft_tws_rs_out").toString

      def runOnce(): Unit = {
        val src = spark.readStream
          .schema("event_id LONG, user_id LONG, value DOUBLE, event_type STRING")
          .parquet(in)
        val q = StateV2.runningTotals(spark, src)
          .writeStream.outputMode("append") // parquet sink; Update not supported
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", out)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
      }
      // run 1: user 9 twice
      writeBatch(in, Seq((1L, 9L, 1.00, "a"), (2L, 9L, 2.00, "b")))
      runOnce()
      // run 2 (fresh query, same checkpoint): one more event — the fold
      // must CONTINUE from n=2, not restart from zero
      writeBatch(in, Seq((3L, 9L, 4.00, "a")))
      runOnce()
      val rows = spark.read.parquet(out).orderBy("n")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows == Seq((9L, 2L, 300L, 2L), (9L, 3L, 700L, 2L)))
    }
  }

  test("cents quantization floors like the oracle (negative values too)") {
    withRocksDB {
      val in = Files.createTempDirectory("graft_tws_in2").toString
      // floor(-1.011*100) = floor(-101.1) = -102, floor(2.999*100) = 299
      writeBatch(in, Seq((1L, 7L, -1.011, "x"), (2L, 7L, 2.999, "x")))
      val src = spark.readStream
        .schema("event_id LONG, user_id LONG, value DOUBLE, event_type STRING")
        .parquet(in)
      val q = StateV2.runningTotals(spark, src)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_spec_out2").start()
      q.processAllAvailable()
      q.stop()
      val fin = StateV2.finalTotals(spark.table("tws_spec_out2"))
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(fin == Seq((7L, 2L, 197L, 1L)))
    }
  }
}
