package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Eighty-fifth wave — isotonic calibration, sample-ratio mismatch, and
  * freshness SLAs.
  *
  *  - `q_isotonic`: weighted isotonic regression (the calibration
  *    mapping behind Platt/isotonic score calibration) over 20
  *    score-ordered user bins — fitted by the MINIMAX closed form
  *    fitted(k) = max_{i≤k} min_{j≥k} avg(y over bins i..j) (Barlow et
  *    al. 1972), which turns Pool-Adjacent-Violators — usually coded
  *    as a sequential pooling loop — into three RELATIONAL steps:
  *    prefix sums → the O(B²) range-average table → a min-then-max
  *    double aggregation. B = 20, so every intermediate is
  *    dimension-sized regardless of corpus scale; the corpus itself is
  *    touched by exactly one per-bin aggregate. The spec replays
  *    textbook sequential PAV and pins equality.
  *  - `q_srm`: sample-ratio-mismatch guardrail (the first thing a
  *    trustworthy A/B platform checks): per event-day, the active-user
  *    split between arms, the χ² statistic (nₐ−n_b)²/(nₐ+n_b) against
  *    a 50/50 design, and the α = 0.05 flag decided by exact integer
  *    cross-multiplication ((nₐ−n_b)²·1000 ≥ 3841·(nₐ+n_b)) — the
  *    statistic is emitted rounded but the DECISION never touches a
  *    float. Day-sized output.
  *  - `q_freshness`: per-stream freshness SLA audit — each event
  *    type's lag behind the corpus watermark (max ts) in exact
  *    minutes, its last-day volume, and a staleness flag at the
  *    1-hour SLA. The table a pipeline health dashboard polls; one
  *    map-side-combined aggregate.
  */
object R85Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_isotonic ----------

  private val nBins = 20

  val qIsotonic = QueryDef("q_isotonic",
    (s, dir) => RewriteGlobalRankWindows.force {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
        .withColumn("b", (col("user_id") % nBins).cast("long"))
      val bins = per.groupBy("b")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("y")).cast("long").as("y"))
      // prefix sums over the 20-bin dimension (tiny global window is fine)
      val w = org.apache.spark.sql.expressions.Window.orderBy("b")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val pre = bins
        .withColumn("sy", sum(col("y")).over(w).cast("long"))
        .withColumn("sn", sum(col("n")).over(w).cast("long"))
      val lo = pre.select(col("b").as("i"),
        (col("sy") - col("y")).as("sy0"), (col("sn") - col("n")).as("sn0"))
      val hi = pre.select(col("b").as("j"), col("sy").as("sy1"),
        col("sn").as("sn1"))
      val ranges = lo.join(hi, col("i") <= col("j"))
        .select(col("i"), col("j"),
          expr("CAST(sy1 - sy0 AS DOUBLE) / CAST(sn1 - sn0 AS DOUBLE)")
            .as("avg_r"))
      val ks = bins.select(col("b").as("k"))
      val fitted = ks.join(ranges, col("i") <= col("k") && col("j") >= col("k"))
        .groupBy("k", "i").agg(min(col("avg_r")).as("inner_min"))
        .groupBy("k").agg(round(max(col("inner_min")), 6).as("fitted"))
      bins.join(fitted, col("b") === col("k"))
        .select(col("b"), col("n"), col("y"),
          round(expr("CAST(y AS DOUBLE) / CAST(n AS DOUBLE)"), 6).as("raw_rate"),
          col("fitted"))
        .orderBy("b")
    },
    Some(
      s"""WITH per AS (
         |  SELECT user_id,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
         |    CAST(user_id % $nBins AS BIGINT) AS b
         |  FROM events GROUP BY user_id),
         |bins AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS y
         |  FROM per GROUP BY b),
         |pre AS (
         |  SELECT b, n, y,
         |    CAST(sum(y) OVER wc AS BIGINT) AS sy,
         |    CAST(sum(n) OVER wc AS BIGINT) AS sn
         |  FROM bins
         |  WINDOW wc AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |ranges AS (
         |  SELECT lo.b AS i, hi.b AS j,
         |    CAST(hi.sy - (lo.sy - lo.y) AS DOUBLE)
         |      / CAST(hi.sn - (lo.sn - lo.n) AS DOUBLE) AS avg_r
         |  FROM pre lo JOIN pre hi ON lo.b <= hi.b),
         |inner_mins AS (
         |  SELECT k.b AS k, r.i, min(r.avg_r) AS inner_min
         |  FROM bins k JOIN ranges r ON r.i <= k.b AND r.j >= k.b
         |  GROUP BY 1, 2),
         |fitted AS (
         |  SELECT k, round(max(inner_min), 6) AS fitted FROM inner_mins GROUP BY k)
         |SELECT b, n, y,
         |  round(CAST(y AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate, fitted
         |FROM bins JOIN fitted ON k = b
         |ORDER BY b""".stripMargin))

  // ---------- q_srm ----------

  val qSrm = QueryDef("q_srm",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("user_id"),
          expr(s"CAST((unix_micros(ts) - unix_micros(ts) % $usPerDay) / $usPerDay AS BIGINT)")
            .as("day"))
        .distinct()
        .groupBy("day")
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).cast("long")
          .as("n_a"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).cast("long")
            .as("n_b"))
      daily
        .withColumn("d", col("n_a") - col("n_b"))
        .select(col("day"), col("n_a"), col("n_b"),
          round(expr("CAST(d * d AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"), 6)
            .as("chi2"),
          when(col("d") * col("d") * 1000L >= (col("n_a") + col("n_b")) * 3841L,
            1L).otherwise(0L).as("srm_flag"))
        .orderBy("day")
    },
    Some(
      s"""WITH active AS (
         |  SELECT DISTINCT user_id,
         |    CAST((epoch_us(ts) - epoch_us(ts) % $usPerDay) / $usPerDay AS BIGINT) AS day
         |  FROM events),
         |daily AS (
         |  SELECT day,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         |  FROM active GROUP BY day)
         |SELECT day, n_a, n_b,
         |  round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
         |    / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
         |  CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 >= (n_a + n_b) * 3841
         |    THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
         |FROM daily ORDER BY day""".stripMargin))

  // ---------- q_freshness ----------

  private val slaMinutes = 60L

  val qFreshness = QueryDef("q_freshness",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val wm = ev.agg(max(col("us")).as("wm"))
      ev.crossJoin(broadcast(wm))
        .groupBy("event_type")
        .agg(max(col("us")).as("last_us"),
          max(col("wm")).as("wm"),
          sum(when(col("us") >= col("wm") - lit(usPerDay), 1L).otherwise(0L))
            .cast("long").as("n_last_day"))
        .select(col("event_type"),
          (((col("wm") - col("last_us")) -
            (col("wm") - col("last_us")) % 60000000L) / 60000000L)
            .cast("long").as("lag_min"),
          col("n_last_day"))
        .withColumn("stale", when(col("lag_min") > slaMinutes, 1L).otherwise(0L))
        .orderBy("event_type")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT event_type, epoch_us(ts) AS us FROM events),
         |wm AS (SELECT max(us) AS wm FROM ev),
         |agg AS (
         |  SELECT event_type, max(us) AS last_us, max(wm.wm) AS w,
         |    CAST(sum(CASE WHEN us >= wm.wm - $usPerDay THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_last_day
         |  FROM ev CROSS JOIN wm GROUP BY event_type)
         |SELECT event_type,
         |  CAST(((w - last_us) - (w - last_us) % 60000000) / 60000000 AS BIGINT)
         |    AS lag_min,
         |  n_last_day,
         |  CAST(CASE WHEN ((w - last_us) - (w - last_us) % 60000000) / 60000000
         |    > $slaMinutes THEN 1 ELSE 0 END AS BIGINT) AS stale
         |FROM agg ORDER BY event_type""".stripMargin))

  val all: Seq[QueryDef] = Seq(qIsotonic, qSrm, qFreshness)
}
