package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Eighty-ninth wave — leakage-safe features, Simpson's paradox, and
  * position-bias correction.
  *
  *  - `q_feature_cutoff`: time-travel-safe feature extraction — the
  *    supervised-learning layout where features come STRICTLY from the
  *    14-day window before the cutoff T (T = watermark − 14d) and the
  *    label strictly from on-or-after T. Per user: event count, purchase
  *    count, active days, and the last-activity gap in the feature
  *    window, plus the future-purchase label. The one-sided windows
  *    make target leakage structurally impossible (the
  *    q_target_encode concern solved by TIME rather than
  *    self-exclusion); R6WaveInvariantsSpec re-derives both windows.
  *  - `q_simpson`: a Simpson's-paradox detector (Simpson 1951) over
  *    the A/B purchase-per-event rates: per user-segment the arm
  *    direction is decided by exact integer cross-multiplication, the
  *    pooled direction likewise, and the paradox flag fires only when
  *    every segment agrees on a direction the pooled rate reverses —
  *    the aggregation-bias audit that catches "B wins overall" claims
  *    built on skewed segment mixes. Segment-sized output plus one
  *    summary row (seg = -1).
  *  - `q_coec`: clicks-over-expected-clicks (the standard
  *    position-bias-corrected engagement metric): positions are each
  *    event's rank within its user-day (capped at 10), global prior
  *    CTR per position comes from one aggregate, and each user's
  *    expected clicks Σ prior(pos) divides their actual clicks. The
  *    priors are a ≤10-row broadcast; ratios are shared IEEE trees.
  */
object R89Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_feature_cutoff ----------

  val qFeatureCutoff = QueryDef("q_feature_cutoff",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val cut = ev.agg((max(col("us")) - lit(14L * usPerDay)).as("t"))
      val w = ev.crossJoin(broadcast(cut))
      val feat = w.where(col("us") >= col("t") - lit(14L * usPerDay) &&
          col("us") < col("t"))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purchases"),
          countDistinct(expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
            .cast("long").as("n_active_days"),
          max(col("us")).as("last_us"), max(col("t")).as("t"))
        .withColumn("gap_min",
          (((col("t") - col("last_us")) - (col("t") - col("last_us")) % 60000000L)
            / 60000000L).cast("long"))
      val label = w.where(col("us") >= col("t"))
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("label"))
      feat.join(label, Seq("user_id"), "left")
        .select(col("user_id"), col("n_events"), col("n_purchases"),
          col("n_active_days"), col("gap_min"),
          coalesce(col("label"), lit(0L)).as("label"))
        .orderBy("user_id")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |cut AS (SELECT max(us) - ${14L * usPerDay} AS t FROM ev),
         |feat AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_purchases,
         |    CAST(count(DISTINCT CAST((us - us % $usPerDay) / $usPerDay AS BIGINT))
         |      AS BIGINT) AS n_active_days,
         |    CAST(((max(t) - max(us)) - (max(t) - max(us)) % 60000000) / 60000000
         |      AS BIGINT) AS gap_min
         |  FROM ev CROSS JOIN cut
         |  WHERE us >= t - ${14L * usPerDay} AND us < t
         |  GROUP BY user_id),
         |label AS (
         |  SELECT user_id,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS label
         |  FROM ev CROSS JOIN cut WHERE us >= t GROUP BY user_id)
         |SELECT f.user_id, n_events, n_purchases, n_active_days, gap_min,
         |  coalesce(l.label, 0) AS label
         |FROM feat f LEFT JOIN label l ON l.user_id = f.user_id
         |ORDER BY f.user_id""".stripMargin))

  // ---------- q_simpson ----------

  val qSimpson = QueryDef("q_simpson",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select((col("user_id") % 5).cast("long").as("seg"),
          when(col("user_id") % 2 === 0, "a").otherwise("b").as("arm"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      val seg = ev.groupBy("seg")
        .agg(sum(when(col("arm") === "a", col("p")).otherwise(0L)).cast("long")
          .as("pa"),
          sum(when(col("arm") === "a", 1L).otherwise(0L)).cast("long").as("na"),
          sum(when(col("arm") === "b", col("p")).otherwise(0L)).cast("long")
            .as("pb"),
          sum(when(col("arm") === "b", 1L).otherwise(0L)).cast("long").as("nb"))
        // direction by exact cross-multiplication: +1 B wins, -1 A, 0 tie
        .withColumn("dir",
          when(col("pb") * col("na") > col("pa") * col("nb"), 1L)
            .when(col("pb") * col("na") < col("pa") * col("nb"), -1L)
            .otherwise(0L))
      val pooled = seg.agg(sum(col("pa")).cast("long").as("pa"),
        sum(col("na")).cast("long").as("na"),
        sum(col("pb")).cast("long").as("pb"),
        sum(col("nb")).cast("long").as("nb"),
        min(col("dir")).as("min_dir"), max(col("dir")).as("max_dir"))
        .withColumn("dir",
          when(col("pb") * col("na") > col("pa") * col("nb"), 1L)
            .when(col("pb") * col("na") < col("pa") * col("nb"), -1L)
            .otherwise(0L))
        // paradox: all segments agree on a nonzero direction the pooled
        // comparison reverses
        .withColumn("simpson_flag",
          when(col("min_dir") === col("max_dir") && col("min_dir") =!= 0L &&
            col("dir") === -col("min_dir"), 1L).otherwise(0L))
        .select(lit(-1L).as("seg"), col("pa"), col("na"), col("pb"), col("nb"),
          col("dir"), col("simpson_flag"))
      seg.select(col("seg"), col("pa"), col("na"), col("pb"), col("nb"),
          col("dir"), lit(0L).as("simpson_flag"))
        .unionAll(pooled)
        .orderBy("seg")
    },
    Some(
      """WITH ev AS (
        |  SELECT CAST(user_id % 5 AS BIGINT) AS seg,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events),
        |seg AS (
        |  SELECT seg,
        |    CAST(sum(CASE WHEN arm = 'a' THEN p ELSE 0 END) AS BIGINT) AS pa,
        |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN arm = 'b' THEN p ELSE 0 END) AS BIGINT) AS pb,
        |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM ev GROUP BY seg),
        |segd AS (
        |  SELECT *, CAST(CASE WHEN pb * na > pa * nb THEN 1
        |    WHEN pb * na < pa * nb THEN -1 ELSE 0 END AS BIGINT) AS dir
        |  FROM seg),
        |pooled AS (
        |  SELECT CAST(sum(pa) AS BIGINT) AS pa, CAST(sum(na) AS BIGINT) AS na,
        |    CAST(sum(pb) AS BIGINT) AS pb, CAST(sum(nb) AS BIGINT) AS nb,
        |    CAST(min(dir) AS BIGINT) AS min_dir, CAST(max(dir) AS BIGINT) AS max_dir
        |  FROM segd),
        |pooledd AS (
        |  SELECT pa, na, pb, nb,
        |    CAST(CASE WHEN pb * na > pa * nb THEN 1
        |      WHEN pb * na < pa * nb THEN -1 ELSE 0 END AS BIGINT) AS dir,
        |    min_dir, max_dir
        |  FROM pooled)
        |SELECT seg, pa, na, pb, nb, dir, CAST(0 AS BIGINT) AS simpson_flag
        |FROM segd
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), pa, na, pb, nb, dir,
        |  CAST(CASE WHEN min_dir = max_dir AND min_dir <> 0 AND dir = -min_dir
        |    THEN 1 ELSE 0 END AS BIGINT)
        |FROM pooledd
        |ORDER BY seg""".stripMargin))

  // ---------- q_coec ----------

  private val maxPos = 10L

  val qCoec = QueryDef("q_coec",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("click"))
        .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
      val w = Window.partitionBy("user_id", "day").orderBy("us", "event_id")
      val positioned = ev
        .withColumn("pos", least(row_number().over(w).cast("long"), lit(maxPos)))
      val prior = positioned.groupBy("pos")
        .agg(sum(col("click")).cast("long").as("ck"),
          count(lit(1)).cast("long").as("n"))
      positioned.join(broadcast(prior), "pos")
        .groupBy("user_id")
        .agg(sum(col("click")).cast("long").as("n_clicks"),
          round(expr("sum(CAST(ck AS DOUBLE) / CAST(n AS DOUBLE))"), 6)
            .as("expected"),
          // divide by the UNROUNDED expectation — the oracle does too
          round(expr("CAST(sum(click) AS DOUBLE)" +
            " / sum(CAST(ck AS DOUBLE) / CAST(n AS DOUBLE))"), 6).as("coec"))
        .orderBy("user_id")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS click,
         |    CAST((epoch_us(ts) - epoch_us(ts) % $usPerDay) / $usPerDay AS BIGINT) AS day
         |  FROM events),
         |positioned AS (
         |  SELECT user_id, click,
         |    least(row_number() OVER (PARTITION BY user_id, day
         |      ORDER BY us, event_id), $maxPos) AS pos
         |  FROM ev),
         |prior AS (
         |  SELECT pos, CAST(sum(click) AS BIGINT) AS ck,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM positioned GROUP BY pos)
         |SELECT user_id, CAST(sum(click) AS BIGINT) AS n_clicks,
         |  round(sum(CAST(ck AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS expected,
         |  round(CAST(sum(click) AS DOUBLE)
         |    / sum(CAST(ck AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS coec
         |FROM positioned p JOIN prior USING (pos)
         |GROUP BY user_id ORDER BY user_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qFeatureCutoff, qSimpson, qCoec)
}
