package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Seventy-fifth wave — higher-order sequence models, burstiness, and
  * max-min fair allocation.
  *
  *  - `q_markov2`: second-order event-type transitions — per-user
  *    ordered triples from two partitioned lead windows (never a
  *    self-join on positions), trigram counts with exact conditional
  *    probabilities in basis points given the (e1, e2) context; the
  *    n ≥ 3 support floor mirrors real sequence-model pruning. The
  *    higher-order companion of q_markov_transitions.
  *  - `q_burstiness`: per-user Fano factor (index of dispersion) of
  *    daily event counts — n·Σx² − (Σx)² over n·Σx, entirely in
  *    integer arithmetic with a floor basis-point export: the
  *    regular-vs-bursty traffic classifier behind rate-limit tuning.
  *  - `q_water_filling`: max-min fair (water-filling) allocation of a
  *    capacity budget (half the total) across per-user demands — the
  *    level lands via ONE distinct-value sweep with a virtual
  *    zero-demand run so an infeasible lowest run still yields the
  *    C/n level (measured: without it the query returned nothing),
  *    then every user takes min(demand, level). Exact integers; the
  *    quota/rate-limit allocation every multi-tenant scheduler runs.
  */
object R75Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_markov2 ----------

  val qMarkov2 = QueryDef("q_markov2",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val seq = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("e1"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .withColumn("e3", lead(col("e1"), 2).over(w))
        .where(col("e3").isNotNull)
      val tri = seq.groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).cast("long").as("n"))
      val ctx = tri.groupBy("e1", "e2")
        .agg(sum(col("n")).cast("long").as("cn"))
      val p = col("n") * 10000L
      tri.join(ctx, Seq("e1", "e2"))
        .where(col("n") >= 3)
        .select(col("e1"), col("e2"), col("e3"), col("n"),
          ((p - ((p % col("cn")) + col("cn")) % col("cn")) / col("cn"))
            .cast("long").as("p_bp"))
        .orderBy("e1", "e2", "e3")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e3
        |  FROM ev),
        |tri AS (
        |  SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE e3 IS NOT NULL GROUP BY e1, e2, e3),
        |ctx AS (SELECT e1, e2, CAST(sum(n) AS BIGINT) AS cn FROM tri GROUP BY e1, e2)
        |SELECT t.e1, t.e2, t.e3, t.n,
        |  CAST((t.n * 10000 - ((t.n * 10000 % c.cn) + c.cn) % c.cn) / c.cn AS BIGINT) AS p_bp
        |FROM tri t JOIN ctx c ON t.e1 = c.e1 AND t.e2 = c.e2
        |WHERE t.n >= 3
        |ORDER BY t.e1, t.e2, t.e3""".stripMargin))

  // ---------- q_burstiness ----------

  val qBurstiness = QueryDef("q_burstiness",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("user_id"),
          ((unix_micros(col("ts")) -
            ((unix_micros(col("ts")) % usPerDay) + usPerDay) % usPerDay) /
            usPerDay).cast("long").as("day"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).cast("long").as("x"))
      val stats = daily.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("x") * col("x")).cast("long").as("sxx"))
      val num = (col("n") * col("sxx") - col("sx") * col("sx")) * 10000L
      val den = col("n") * col("sx")
      stats.where(col("sx") > 0)
        .select(col("user_id"), col("n"), col("sx"), col("sxx"),
          ((num - ((num % den) + den) % den) / den).cast("long").as("fano_bp"))
        .orderBy("user_id")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day
        |  FROM events),
        |daily AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS x
        |  FROM ev GROUP BY user_id, day),
        |stats AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY user_id)
        |SELECT user_id, n, sx, sxx,
        |  CAST(((n * sxx - sx * sx) * 10000
        |        - (((n * sxx - sx * sx) * 10000 % (n * sx)) + n * sx) % (n * sx))
        |    / (n * sx) AS BIGINT) AS fano_bp
        |FROM stats WHERE sx > 0 ORDER BY user_id""".stripMargin))

  // ---------- q_water_filling ----------

  val qWaterFilling = QueryDef("q_water_filling",
    (s, dir) => RewriteGlobalRankWindows.force {
      val demand = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("d"))
      val cap = demand.agg(
        ((sum(col("d")) - sum(col("d")) % 2) / 2).cast("long").as("c"))
      // virtual zero run: keeps a C/n fallback level when even the
      // lowest real demand run overfills the capacity
      val zeroRun = s.range(1).select(lit(0L).as("d"), lit(0L).as("cnt"))
      val vals = demand.groupBy("d").agg(count(lit(1)).cast("long").as("cnt"))
        .union(zeroRun)
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val sweep = vals
        .withColumn("n_le", sum(col("cnt")).over(w))
        .withColumn("s_le", sum(col("d") * col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(tot).cast("long"))
      val feas = sweep.crossJoin(broadcast(cap))
        .withColumn("filled_at_d",
          col("s_le") - col("d") * col("cnt") +
            (col("n") - (col("n_le") - col("cnt"))) * col("d"))
      val below = feas.where(col("filled_at_d") <= col("c"))
        .agg(max(col("d")).as("dmax"))
      val lvl = feas.join(broadcast(below), col("d") === col("dmax"))
        .select(col("c"), col("s_le").as("s_below"),
          (col("n") - col("n_le")).as("n_above"))
      val level = lvl.select(col("c"),
        when(col("n_above") === 0, lit(null).cast("long"))
          .otherwise((((col("c") - col("s_below")) -
            (col("c") - col("s_below")) % col("n_above")) / col("n_above"))
            .cast("long")).as("level_floor"))
      demand.crossJoin(broadcast(level))
        .select(col("user_id"), col("d").as("demand"),
          when(col("level_floor").isNull || col("d") <= col("level_floor"),
            col("d")).otherwise(col("level_floor")).cast("long").as("alloc"))
        .orderBy("user_id").limit(200)
    },
    Some(
      """WITH demand AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS d FROM events GROUP BY user_id),
        |cap AS (SELECT CAST(sum(d) AS BIGINT) AS total,
        |               CAST((sum(d) - (sum(d) % 2)) / 2 AS BIGINT) AS c FROM demand),
        |vals AS (
        |  SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM demand GROUP BY d
        |  UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |sweep AS (
        |  SELECT d, cnt,
        |    sum(cnt) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le,
        |    sum(d * cnt) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_le,
        |    CAST(count(*) OVER () AS BIGINT) AS nv,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n
        |  FROM vals),
        |feas AS (
        |  SELECT s.*, cp.c,
        |    s.s_le - s.d * s.cnt + (s.n - (s.n_le - s.cnt)) * s.d AS filled_at_d
        |  FROM sweep s CROSS JOIN cap cp),
        |below AS (SELECT max(d) AS dmax FROM feas WHERE filled_at_d <= c),
        |lvl AS (
        |  SELECT f.c, f.s_le AS s_below, f.n - f.n_le AS n_above
        |  FROM feas f JOIN below b ON f.d = b.dmax),
        |level AS (
        |  SELECT c, s_below, n_above,
        |    CASE WHEN n_above = 0 THEN NULL
        |         ELSE CAST(((c - s_below) - ((c - s_below) % n_above)) / n_above AS BIGINT)
        |    END AS level_floor
        |  FROM lvl)
        |SELECT dm.user_id, dm.d AS demand,
        |  CAST(CASE WHEN l.level_floor IS NULL OR dm.d <= l.level_floor THEN dm.d
        |            ELSE l.level_floor END AS BIGINT) AS alloc
        |FROM demand dm CROSS JOIN level l
        |ORDER BY dm.user_id LIMIT 200""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMarkov2, qBurstiness, qWaterFilling)
}
