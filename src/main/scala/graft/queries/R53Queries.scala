package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fifty-third wave — experimentation analytics.
  *
  *  - `q_ab_test`: the A/B readout end to end — DETERMINISTIC
  *    hash-bucket assignment (md5 of user id, the reproducible
  *    randomization every experiment platform uses), the 2×2
  *    conversion contingency table, and the chi-square statistic
  *    computed as n·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) — every factor an
  *    exact BIGINT/DECIMAL product, ONE final IEEE division. Group
  *    rates ride exact divisions; nothing in the decision statistic
  *    depends on summation order.
  *  - `q_funnel_time`: time-to-convert quantiles — p50/p90 of the
  *    view→purchase delay per user, selected by exact rank arithmetic
  *    over the |distinct delays|-sized aggregate (the q_auc_exact
  *    discipline; no corpus-wide rank window).
  *
  * Scale design: assignment is map-side; the contingency table is a
  * 2-row aggregate. Funnel delays need one user-keyed join (per-user
  * event lists are bounded) and the quantile windows ride the
  * distinct-delay aggregate.
  */
object R53Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_ab_test ----------

  /** md5-hex-fold of column `h` — verbatim on both engines. */
  private val hexVal: String = (1 to 6).map(i =>
    s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * " +
      s"${1L << (4 * (6 - i))}").mkString(" + ")

  val qAbTest = QueryDef("q_ab_test",
    (s, dir) => {
      // "converted" = purchase share above the 20% base rate — an
      // SF-invariant per-user proportion (a has-any-purchase flag
      // saturates to 1 for every user once events-per-user grows,
      // zeroing two contingency margins)
      val users = t(s, dir, "events")
        .groupBy("user_id")
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) * 5 > count(lit(1)), 1L).otherwise(0L)
          .as("converted"))
        .withColumn("h", md5(concat(lit("exp1:"), col("user_id").cast("string"))))
        .withColumn("grp", expr(s"CASE WHEN ($hexVal) % 2 = 0 THEN 'A' ELSE 'B' END"))
      val cells = users.groupBy("grp")
        .agg(sum(col("converted")).as("conv"),
          (count(lit(1)) - sum(col("converted"))).as("nonconv"))
      val wide = cells.agg(
        max(when(col("grp") === "A", col("conv"))).as("a"),
        max(when(col("grp") === "A", col("nonconv"))).as("b"),
        max(when(col("grp") === "B", col("conv"))).as("c"),
        max(when(col("grp") === "B", col("nonconv"))).as("d"))
      wide.selectExpr(
        "CAST(a AS BIGINT) AS a", "CAST(b AS BIGINT) AS b",
        "CAST(c AS BIGINT) AS c", "CAST(d AS BIGINT) AS d",
        "CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS rate_a",
        "CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS rate_b",
        "round(CAST(CAST((a + b + c + d) * (a * d - b * c) * (a * d - b * c) AS DECIMAL(38,0)) AS DOUBLE)" +
          " / CAST(CAST((a + b) * (c + d) * (a + c) * (b + d) AS DECIMAL(38,0)) AS DOUBLE), 4) AS chi2")
    },
    Some(
      s"""WITH users AS (SELECT user_id,
         |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
         |           > count(*) THEN 1 ELSE 0 END AS converted
         |  FROM events GROUP BY user_id),
         |hashed AS (SELECT converted,
         |    md5('exp1:' || CAST(user_id AS VARCHAR)) AS h
         |  FROM users),
         |assigned AS (SELECT converted,
         |    CASE WHEN ($hexVal) % 2 = 0 THEN 'A' ELSE 'B' END AS grp
         |  FROM hashed),
         |cells AS (SELECT grp, CAST(sum(converted) AS BIGINT) AS conv,
         |    CAST(count(*) - sum(converted) AS BIGINT) AS nonconv
         |  FROM assigned GROUP BY grp),
         |wide AS (SELECT
         |    max(CASE WHEN grp = 'A' THEN conv END) AS a,
         |    max(CASE WHEN grp = 'A' THEN nonconv END) AS b,
         |    max(CASE WHEN grp = 'B' THEN conv END) AS c,
         |    max(CASE WHEN grp = 'B' THEN nonconv END) AS d
         |  FROM cells)
         |SELECT a, b, c, d,
         |  CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS rate_a,
         |  CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS rate_b,
         |  round(CAST(CAST((a + b + c + d) * (a * d - b * c) * (a * d - b * c) AS DECIMAL(38,0)) AS DOUBLE)
         |    / CAST(CAST((a + b) * (c + d) * (a + c) * (b + d) AS DECIMAL(38,0)) AS DOUBLE), 4) AS chi2
         |FROM wide""".stripMargin))

  // ---------- q_funnel_time ----------

  val qFunnelTime = QueryDef("q_funnel_time",
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = Tables.events(s, dir)
      val firstView = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("v_us"))
      val firstPurch = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("p_us"))
      val delays = firstView.join(firstPurch, "user_id")
        .where(col("p_us") > col("v_us"))
        .selectExpr("(p_us - v_us) div 1000000 AS delay_s")
      val g = delays.groupBy("delay_s").agg(count(lit(1)).cast("long").as("c"))
      val w = Window.orderBy("delay_s")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy(lit(1))).cast("long"))
      cum.agg(
          max(col("n")).as("n_converted"),
          min(when(col("cum") * 2 >= col("n"), col("delay_s"))).as("p50_s"),
          min(when(col("cum") * 10 >= col("n") * 9, col("delay_s"))).as("p90_s"))
        .selectExpr("CAST(n_converted AS BIGINT) AS n_converted",
          "p50_s", "p90_s")
    },
    Some(
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT user_id, min(epoch_us(ts)) AS p_us
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |delays AS (SELECT CAST((p_us - v_us) // 1000000 AS BIGINT) AS delay_s
        |           FROM v JOIN p USING (user_id) WHERE p_us > v_us),
        |g AS (SELECT delay_s, CAST(count(*) AS BIGINT) AS c
        |      FROM delays GROUP BY 1),
        |cum AS (SELECT delay_s, c,
        |    CAST(sum(c) OVER (ORDER BY delay_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM g)
        |SELECT max(n) AS n_converted,
        |  min(CASE WHEN cum * 2 >= n THEN delay_s END) AS p50_s,
        |  min(CASE WHEN cum * 10 >= n * 9 THEN delay_s END) AS p90_s
        |FROM cum""".stripMargin))

  val all: Seq[QueryDef] = Seq(qAbTest, qFunnelTime)
}
