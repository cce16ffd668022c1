package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.MinHashAgg
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{SessEvent, SessState, SessionOut}

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val gapUs = 30L * 60 * 1000000 // 30 min

  test("batch sessions split on >gap, carry within gap") {
    val m = 60L * 1000000
    val events = Seq(
      // user 1: two sessions (gap 40min between #2 and #3)
      (1L, 1L, 0L * m), (2L, 1L, 10L * m), (3L, 1L, 50L * m), (4L, 1L, 60L * m),
      // user 2: single event
      (5L, 2L, 5L * m)
    ).map { case (eid, uid, us) =>
      (eid, uid, new java.sql.Timestamp(us / 1000))
    }.toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, 30)
      .select("user_id", "session_seq", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("flatMapGroupsWithState update fn: fold, emit on gap, flush on timeout") {
    val f = Sessionize.updateSessions(gapUs) _
    // batch 1: events 0min and 10min -> open session, nothing emitted
    val s1 = TestGroupState.create[SessState](
      optionalState = org.apache.spark.api.java.Optional.empty[SessState](), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1L)),
      hasTimedOut = false)
    val out1 = f(1L, Iterator(SessEvent(1L, 0L), SessEvent(1L, 600L * 1000000)), s1).toSeq
    assert(out1.isEmpty && s1.get == SessState(0L, 600L * 1000000, 2))
    // batch 2: event at 60min -> gap broken, first session emitted
    val s2 = TestGroupState.create[SessState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1L)),
      hasTimedOut = false)
    val out2 = f(1L, Iterator(SessEvent(1L, 3600L * 1000000)), s2).toSeq
    assert(out2 == Seq(SessionOut(1L, 0L, 600L * 1000000, 2)))
    assert(s2.get == SessState(3600L * 1000000, 3600L * 1000000, 1))
    // timeout: open session flushed, state removed
    val s3 = TestGroupState.create[SessState](
      optionalState = org.apache.spark.api.java.Optional.of(s2.get), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 3000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(999999999L)),
      hasTimedOut = true)
    val out3 = f(1L, Iterator.empty, s3).toSeq
    assert(out3 == Seq(SessionOut(1L, 3600L * 1000000, 3600L * 1000000, 1)))
    assert(s3.isRemoved)
  }

  test("cross-batch out-of-order event never regresses session bounds") {
    val f = Sessionize.updateSessions(gapUs) _
    // open session [10min, 20min]; a late (within-watermark) event at 5min
    // arrives in the next batch — must extend start, not regress end
    val m = 60L * 1000000
    val s = TestGroupState.create[SessState](
      optionalState = org.apache.spark.api.java.Optional.of(SessState(10L * m, 20L * m, 2)),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1L)),
      hasTimedOut = false)
    val out = f(1L, Iterator(SessEvent(1L, 5L * m)), s).toSeq
    assert(out.isEmpty && s.get == SessState(5L * m, 20L * m, 3))
  }

  test("late event more than gap before the open session forms its own session") {
    val f = Sessionize.updateSessions(gapUs) _
    val m = 60L * 1000000
    // open session [100min, 110min]; a within-watermark event at 10min is
    // > gap before its start — it must NOT merge (that would bridge a real
    // gap); it becomes its own, immediately-closed session
    val s = TestGroupState.create[SessState](
      optionalState = org.apache.spark.api.java.Optional.of(SessState(100L * m, 110L * m, 2)),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1L)),
      hasTimedOut = false)
    val out = f(1L, Iterator(SessEvent(1L, 10L * m)), s).toSeq
    assert(out == Seq(SessionOut(1L, 10L * m, 10L * m, 1)))
    assert(s.get == SessState(100L * m, 110L * m, 2))
  }

  test("streamingSessions starts and runs with event-time timeout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00")))
      .toDF("user_id", "ts").write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP").parquet(dir)
    val q = Sessionize.streamingSessions(spark, src, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    // user 1's first session closes on the 02:00 gap; user 2's session
    // flushes via event-time timeout once the watermark (02:00 - 30min)
    // passes its end + gap (00:05 + 30min)
    val got = spark.table("sess_out")
      .select("user_id", "n").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L)))
  }

  test("MinHashAgg: dup docs identical, near docs mostly equal, merge assoc") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "totally different content with other words here"),
      (3L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      explode(graft.ext.TextOps.wordNgrams(col("text"), 3)).as("sh"))
      .as[(Long, String)]
    val sigs = sh.groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAgg(16).toColumn.name("sig"))
      .collect().toMap
    assert(sigs(0L) == sigs(3L))
    val near = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val far = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(near > far)
    assert(sigs(0L).forall(v => v >= 0 && v <= 0xffffffffL))
  }
}
