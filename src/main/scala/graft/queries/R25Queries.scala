package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Twenty-fifth wave — event-type-aware sessions and dedup reporting.
  *
  *  - `q_session_dynamic`: session windows with a PER-EVENT gap
  *    (`session_window(ts, gapExpr)`) — a view keeps a session alive
  *    briefly, a purchase much longer; fixed-gap sessionization (the
  *    q_sessionize family) cannot express engagement-dependent
  *    timeouts. Oracle is the interval-merge sweep (running max of
  *    per-event window ends), which is exactly the merge semantics the
  *    native operator implements.
  *  - `q_dedup_report`: per-source exact-dedup accounting — the
  *    corpus-health report run before/after a dedup pass. The
  *    duplication rate is emitted in integer BASIS POINTS (floor
  *    division), so the hash never touches a rounded double.
  */
object R25Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_session_dynamic ----------

  /** Dynamic-gap sessions: view/click extend a session 20 minutes,
    * heavier events (purchase/signup/error) 40. Each event contributes
    * the window [ts, ts+gap); overlapping windows merge; the merged
    * session ends at the MAX contributed end (not last-event + fixed
    * gap). Same one-shuffle-per-key scale shape as fixed-gap
    * session_window — the gap expression is evaluated map-side. */
  val qSessionDynamic = QueryDef("q_session_dynamic",
    (s, dir) => {
      val gap = when(col("event_type").isin("view", "click"), "20 minutes")
        .otherwise("40 minutes")
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), gap))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"), col("n"))
        .orderBy("user_id", "start_us")
    },
    Some(
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN event_type IN ('view', 'click')
        |         THEN 1200000000 ELSE 2400000000 END AS gap
        |  FROM events
        |), x AS (
        |  SELECT user_id, us, gap,
        |    max(us + gap) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM e
        |), y AS (
        |  SELECT user_id, us, gap,
        |    CASE WHEN prevmax IS NULL OR us > prevmax THEN 1 ELSE 0 END
        |      AS brk
        |  FROM x
        |), z AS (
        |  SELECT user_id, us, gap,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y
        |)
        |SELECT user_id, min(us) AS start_us, max(us + gap) AS end_us,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM z GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin))

  // ---------- q_dedup_report ----------

  /** Per-source exact-dedup accounting: total docs, distinct bodies
    * (md5 keys — the documents themselves never shuffle), and the
    * duplication rate in integer basis points via exact floor division
    * (the sign-normalized-remainder identity; inputs are non-negative
    * but the house idiom stays uniform). One map-side-combined
    * aggregate per source. */
  val qDedupReport = QueryDef("q_dedup_report",
    (s, dir) => {
      val p = (col("n_docs") - col("n_distinct")) * 10000L
      t(s, dir, "documents")
        .select(col("source"), md5(col("text")).as("k"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("k")).as("n_distinct"))
        .withColumn("dup_bp",
          ((p - ((p % col("n_docs")) + col("n_docs")) % col("n_docs"))
            / col("n_docs")).cast("long"))
        .orderBy(col("source"))
    },
    Some(
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |  CAST(((count(*) - count(DISTINCT md5(text))) * 10000
        |    - (((count(*) - count(DISTINCT md5(text))) * 10000 % count(*))
        |       + count(*)) % count(*))
        |    / count(*) AS BIGINT) AS dup_bp
        |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSessionDynamic, qDedupReport)
}
