package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Hundred-fourth wave — Welch's t, extreme values, and influence
  * diagnostics.
  *
  *  - `q_welch_t`: Welch's unequal-variance t (Welch 1947) on per-user
  *    spend between the A/B arms — the canonical two-sample mean test
  *    the suite's chi-square (q_ab_test) and rank (q_perm_test /
  *    q_wilcoxon) procedures bracket: exact BIGINT moments per arm,
  *    the statistic and Welch–Satterthwaite degrees of freedom in one
  *    shared tree.
  *  - `q_block_maxima`: extreme-value analysis by block maxima —
  *    weekly revenue maxima fit to a Gumbel law by the method of
  *    moments (σ̂ = s·√6/π, μ̂ = x̄ − γ·σ̂, Euler γ as a shared literal)
  *    plus the 52-block return level μ̂ − σ̂·ln(−ln(1−1/52)). The
  *    tail-risk companion to q_hill_tail: what's the worst week a
  *    year should bring? Block-count-sized arithmetic.
  *  - `q_influence`: regression influence diagnostics for the daily
  *    revenue-on-day OLS line — per day the residual, leverage
  *    hᵢ = 1/n + (xᵢ−x̄)²/Sxx, and Cook's distance, flagging points
  *    with D > 4/n. The audit that says WHICH days drive
  *    q_regr_exact's fit — and what q_theil_sen is protecting
  *    against. Exact integer moments; per-point shared trees.
  */
object R104Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_welch_t ----------

  val qWelchT = QueryDef("q_welch_t",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).cast("long")
          .as("v"))
        .withColumn("arm", when(col("user_id") % 2 === 0, 0L).otherwise(1L))
      val arms = per.groupBy("arm")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("v")).cast("long").as("sv"),
          sum(col("v") * col("v")).cast("long").as("svv"))
      val wide = arms.agg(
        max(when(col("arm") === 0, col("n"))).as("n0"),
        max(when(col("arm") === 0, col("sv"))).as("s0"),
        max(when(col("arm") === 0, col("svv"))).as("q0"),
        max(when(col("arm") === 1, col("n"))).as("n1"),
        max(when(col("arm") === 1, col("sv"))).as("s1"),
        max(when(col("arm") === 1, col("svv"))).as("q1"))
      // vr_i = s_i²/n_i with s_i² the sample variance — shared subtree
      val vr0 = "((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE))"
      val vr1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE))"
      wide.select(col("n0").cast("long").as("n0"), col("n1").cast("long").as("n1"),
        round(expr(
          s"(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt($vr0 + $vr1)"), 6)
          .as("t_stat"),
        round(expr(
          s"($vr0 + $vr1) * ($vr0 + $vr1) / ($vr0 * $vr0 / (CAST(n0 AS DOUBLE) - 1.0) + $vr1 * $vr1 / (CAST(n1 AS DOUBLE) - 1.0))"), 4)
          .as("df"))
    },
    Some {
      val vr0 = "((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE))"
      val vr1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE))"
      s"""WITH per AS (
         |  SELECT user_id,
         |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS v,
         |    CAST(user_id % 2 AS BIGINT) AS arm
         |  FROM events GROUP BY user_id),
         |arms AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
         |    CAST(sum(v * v) AS BIGINT) AS svv
         |  FROM per GROUP BY arm),
         |wide AS (
         |  SELECT
         |    max(CASE WHEN arm = 0 THEN n END) AS n0,
         |    max(CASE WHEN arm = 0 THEN sv END) AS s0,
         |    max(CASE WHEN arm = 0 THEN svv END) AS q0,
         |    max(CASE WHEN arm = 1 THEN n END) AS n1,
         |    max(CASE WHEN arm = 1 THEN sv END) AS s1,
         |    max(CASE WHEN arm = 1 THEN svv END) AS q1
         |  FROM arms)
         |SELECT n0, n1,
         |  round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt($vr0 + $vr1), 6)
         |    AS t_stat,
         |  round(($vr0 + $vr1) * ($vr0 + $vr1)
         |    / ($vr0 * $vr0 / (CAST(n0 AS DOUBLE) - 1.0)
         |     + $vr1 * $vr1 / (CAST(n1 AS DOUBLE) - 1.0)), 4) AS df
         |FROM wide""".stripMargin
    })

  // ---------- q_block_maxima ----------

  val qBlockMaxima = QueryDef("q_block_maxima",
    (s, dir) => {
      val days = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
          expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
            "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
            .as("usd"))
        .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
        .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))
      val weekly = days
        .withColumn("wk", expr("CAST((day - day % 7) / 7 AS BIGINT)"))
        .groupBy("wk").agg(max(col("v")).cast("long").as("mx"))
      val mom = weekly.agg(count(lit(1)).cast("long").as("nb"),
        sum(col("mx")).cast("long").as("sm"),
        sum(col("mx") * col("mx")).cast("long").as("qm"))
      val sigma =
        "sqrt((CAST(qm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) * sqrt(6.0) / pi()"
      val mu = s"CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE) - 0.5772156649015329 * ($sigma)"
      mom.select(col("nb"),
        round(expr(mu), 4).as("gumbel_mu"),
        round(expr(sigma), 4).as("gumbel_sigma"),
        round(expr(s"($mu) - ($sigma) * ln(-ln(CAST(51 AS DOUBLE) / CAST(52 AS DOUBLE)))"), 4)
          .as("return_level_52"))
    },
    Some {
      val sigma =
        "sqrt((CAST(qm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) * sqrt(6.0) / pi()"
      val mu = s"CAST(sm AS DOUBLE) / CAST(nb AS DOUBLE) - 0.5772156649015329 * ($sigma)"
      s"""WITH days AS (
         |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
         |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % $usPerDay)
         |      / $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
         |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |weekly AS (
         |  SELECT CAST((day - day % 7) / 7 AS BIGINT) AS wk,
         |    CAST(max(v) AS BIGINT) AS mx
         |  FROM days GROUP BY 1),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS nb, CAST(sum(mx) AS BIGINT) AS sm,
         |    CAST(sum(mx * mx) AS BIGINT) AS qm
         |  FROM weekly)
         |SELECT nb,
         |  round($mu, 4) AS gumbel_mu,
         |  round($sigma, 4) AS gumbel_sigma,
         |  round(($mu) - ($sigma) * ln(-ln(CAST(51 AS DOUBLE) / CAST(52 AS DOUBLE))), 4)
         |    AS return_level_52
         |FROM mom""".stripMargin
    })

  // ---------- q_influence ----------

  val qInfluence = QueryDef("q_influence",
    (s, dir) => {
      val days = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
          expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
            "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
            .as("usd"))
        .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
        .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))
      val mom = days.agg(count(lit(1)).cast("long").as("n"),
        sum(col("day")).cast("long").as("sx"),
        sum(col("v")).cast("long").as("sy"),
        sum(col("day") * col("v")).cast("long").as("sxy"),
        sum(col("day") * col("day")).cast("long").as("sxx"))
      val beta = "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
      val alpha = s"(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - ($beta) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      val sxxC = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      val scored = days.crossJoin(broadcast(mom))
        .withColumn("resid", expr(
          s"CAST(v AS DOUBLE) - ($alpha) - ($beta) * CAST(day AS DOUBLE)"))
        .withColumn("lev", expr(
          s"1.0 / CAST(n AS DOUBLE) + (CAST(day AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))" +
            s" * (CAST(day AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / ($sxxC)"))
      val mse = scored.agg(
        expr("sum(resid * resid)").as("sse"), max(col("n")).as("nn"))
      scored.crossJoin(broadcast(mse))
        .withColumn("s2", expr("sse / (CAST(nn AS DOUBLE) - 2.0)"))
        .withColumn("cooks_d", expr(
          "resid * resid / (2.0 * s2) * lev / ((1.0 - lev) * (1.0 - lev))"))
        .where(expr("cooks_d > 4.0 / CAST(nn AS DOUBLE)"))
        .select(col("day"), col("v"), round(col("resid"), 2).as("resid"),
          round(col("lev"), 6).as("lev"), round(col("cooks_d"), 6).as("cooks_d"))
        .orderBy("day")
    },
    Some {
      val beta = "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
      val alpha = s"(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - ($beta) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      val sxxC = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      s"""WITH days AS (
         |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
         |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % $usPerDay)
         |      / $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
         |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(day) AS BIGINT) AS sx,
         |    CAST(sum(v) AS BIGINT) AS sy, CAST(sum(day * v) AS BIGINT) AS sxy,
         |    CAST(sum(day * day) AS BIGINT) AS sxx
         |  FROM days),
         |scored AS (
         |  SELECT day, v,
         |    CAST(v AS DOUBLE) - ($alpha) - ($beta) * CAST(day AS DOUBLE) AS resid,
         |    1.0 / CAST(n AS DOUBLE)
         |      + (CAST(day AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(day AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / ($sxxC)
         |      AS lev,
         |    n AS nn
         |  FROM days CROSS JOIN mom),
         |mse AS (SELECT sum(resid * resid) AS sse, max(nn) AS nn FROM scored)
         |SELECT day, v, round(resid, 2) AS resid, round(lev, 6) AS lev,
         |  round(resid * resid / (2.0 * (sse / (CAST(mse.nn AS DOUBLE) - 2.0)))
         |    * lev / ((1.0 - lev) * (1.0 - lev)), 6) AS cooks_d
         |FROM scored CROSS JOIN mse
         |WHERE resid * resid / (2.0 * (sse / (CAST(mse.nn AS DOUBLE) - 2.0)))
         |    * lev / ((1.0 - lev) * (1.0 - lev)) > 4.0 / CAST(mse.nn AS DOUBLE)
         |ORDER BY day""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qWelchT, qBlockMaxima, qInfluence)
}
