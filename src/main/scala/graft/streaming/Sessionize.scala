package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: split each user's event stream into sessions separated
  * by inactivity gaps — in two forms:
  *
  *  - [[sessions]]: batch, pure window functions (lag -> gap flag ->
  *    running session counter), one shuffle by user; all arithmetic on
  *    truncated epoch-microsecond integers so a DuckDB oracle matches
  *    bit-exactly despite the fixture's nanosecond timestamps.
  *  - [[updateSessions]]: the streaming `flatMapGroupsWithState` update
  *    function (custom state, SURVEY.md §2.11 extension) — emits a
  *    session whenever a new event breaks the gap, carries the open
  *    session in GroupState, flushes on event-time timeout. Unit-tested
  *    with `TestGroupState`.
  */
object Sessionize {

  /** Batch sessionize. Input needs (user_id, event_id, ts TIMESTAMP).
    * @return (user_id, session_seq, start_us, end_us, n) */
  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        (col("prev_us").isNull || (col("us") - col("prev_us")) > gapUs).cast("int"))
      .withColumn("session_seq",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy("user_id", "session_seq")
      .agg(min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).cast("long").as("n"))
  }

  /** `ts` kept alongside the epoch-micros `us` so the event-time
    * watermark column survives into the grouped Dataset. */
  case class SessEvent(user_id: Long, us: Long,
                       ts: java.sql.Timestamp = new java.sql.Timestamp(0))
  case class SessState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n: Long)

  /** flatMapGroupsWithState update function: fold this batch's events
    * into the open session, emitting every session closed by a gap;
    * flush the open session when the group times out (watermark passed
    * end + gap). */
  def updateSessions(gapUs: Long)(
      user: Long, evs: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[SessionOut] = {
    val out = scala.collection.mutable.Buffer.empty[SessionOut]
    if (state.hasTimedOut) {
      state.getOption.foreach(s => out += SessionOut(user, s.start, s.end, s.n))
      state.remove()
    } else {
      // interval merge: the open session is just another interval among
      // this batch's events — sorting by start and merging on the gap rule
      // handles cross-batch disorder in BOTH directions (a within-watermark
      // event > gap before the open session's start forms its own session
      // instead of bridging into it)
      val all = (state.getOption.toList ++
        evs.map(e => SessState(e.us, e.us, 1L))).sortBy(s => (s.start, s.end))
      val merged = scala.collection.mutable.Buffer.empty[SessState]
      all.foreach { s =>
        if (merged.nonEmpty && s.start - merged.last.end <= gapUs) {
          val p = merged.last
          merged(merged.size - 1) =
            SessState(p.start, math.max(p.end, s.end), p.n + s.n)
        } else merged += s
      }
      // every interval but the last is definitively closed (a later one
      // exists more than gap after it); the last stays open in state
      merged.init.foreach(s => out += SessionOut(user, s.start, s.end, s.n))
      merged.lastOption.foreach { s =>
        state.update(s)
        // always register the flush timeout — sessions opened before the
        // first watermark advance must still time out eventually; clamp
        // above the current watermark (setTimeoutTimestamp requires it)
        state.setTimeoutTimestamp(math.max(
          s.end / 1000 + gapUs / 1000, state.getCurrentWatermarkMs() + 1))
      }
    }
    out.iterator
  }

  /** Streaming sessionize: attach the event-time watermark (required for
    * EventTimeTimeout), then fold per-user state. Input needs
    * (user_id, ts TIMESTAMP). */
  def streamingSessions(spark: SparkSession, events: DataFrame,
                        gapMinutes: Int,
                        watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateSessions(gapUs))
  }
}
