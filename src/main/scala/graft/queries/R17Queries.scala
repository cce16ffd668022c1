package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventeenth wave — closing the custom-state v1 loop:
  *
  *  - `q_stream_sessionize`: [[graft.streaming.Sessionize]]'s
  *    `flatMapGroupsWithState` path (interval-merge state + event-time
  *    timeout) run END-TO-END as a stream and hash-checked against the
  *    batch lag/gap sessionization oracle. Until now this path was
  *    unit-tested (TestGroupState) while only its batch twin
  *    (`q_sessionize`) and the native `session_window` form
  *    (`q_stream_session_window`) were oracle-checked; this pins the
  *    hand-rolled state machine itself. A far-future sentinel advances
  *    the watermark so every real session times out and flushes; the
  *    sentinel's own open session is the terminal 1-row state.
  */
object R17Queries {

  val qStreamSessionize = QueryDef("q_stream_sessionize",
    (s, dir) => Tables.withShufflePartitions(s, 4) {
      val stage = Tables.tmpPath("graft_ssz_src", dir)
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val sentinel = s.range(1)
        .select(lit(-1L).as("user_id"),
          lit("2025-07-01 00:00:00").cast("timestamp").as("ts"))
      ev.union(sentinel).write.mode("overwrite").parquet(stage)
      val src = s.readStream.schema("user_id LONG, ts TIMESTAMP")
        .parquet(stage)
      val q = graft.streaming.Sessionize
        .streamingSessions(s, src, gapMinutes = 30, watermarkDelay = "1 hour")
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_ssz_out").start()
      q.processAllAvailable()
      // drain until only the sentinel's open session remains in state
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def stateRows: Long = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(Long.MaxValue)
      while (stateRows > 1 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      q.stop()
      s.table("graft_ssz_out").where(col("user_id") >= 0)
        .orderBy("user_id", "start_us")
    },
    Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |x AS (SELECT user_id, us,
        |        lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
        |      FROM e),
        |y AS (SELECT user_id, us,
        |        CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |      FROM x),
        |z AS (SELECT user_id, us,
        |        CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us) AS BIGINT) AS session_seq
        |      FROM y)
        |SELECT user_id, min(us) AS start_us, max(us) AS end_us,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM z GROUP BY user_id, session_seq
        |ORDER BY user_id, start_us""".stripMargin))

  val all: Seq[QueryDef] = Seq(qStreamSessionize)
}
