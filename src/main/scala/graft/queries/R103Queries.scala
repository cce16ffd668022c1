package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.GraphOps
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Hundred-third wave — trend significance, randomness, and community
  * conductance.
  *
  *  - `q_mann_kendall`: the Mann–Kendall trend test (Mann 1945) over
  *    the trailing-120-day revenue series — S = Σ sign pairs is an
  *    exact BIGINT, the tie-corrected variance n(n−1)(2n+5)/18 −
  *    Σt(t−1)(2t+5)/18 stays on the ×18 integer scale, and the
  *    continuity-corrected z rides one shared tree. The SIGNIFICANCE
  *    companion to q_theil_sen's slope magnitude: is the trend real?
  *  - `q_runs_test`: the Wald–Wolfowitz runs test of the daily
  *    revenue's above/below-median sequence — run count, the exact
  *    expectation 2·n₊·n₋/n + 1, and the z score; too FEW runs means
  *    sticky regimes, too many means oscillation. The randomness
  *    audit q_seasonal_residuals' flagged days should pass AFTER
  *    deseasonalization.
  *  - `q_conductance`: per-community conductance φ = cut/(min(vol,
  *    vol̄)) of the nation partition over the capped co-purchase graph
  *    — the per-community quality that q_modularity's single Q
  *    averages away: which nations are genuinely cohesive and which
  *    just big. Exact integer cut/volume counts; community-sized
  *    output.
  */
object R103Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
        expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
          "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
          .as("usd"))
      .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
      .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))

  private val dailySql =
    s"""days AS (
       |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
       |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % $usPerDay)
       |      / $usPerDay AS BIGINT) AS day,
       |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
       |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
       |      AS BIGINT) AS v
       |  FROM orders GROUP BY 1)""".stripMargin

  // ---------- q_mann_kendall ----------

  val qMannKendall = QueryDef("q_mann_kendall",
    (s, dir) => {
      val days = dailyRevenue(s, dir)
      val dmax = days.agg(max(col("day")).as("dm"))
      val win = days.crossJoin(broadcast(dmax))
        .where(col("day") > col("dm") - 120L).drop("dm")
      val a = win.select(col("day").as("d1"), col("v").as("v1"))
      val b = win.select(col("day").as("d2"), col("v").as("v2"))
      val sStat = a.join(b, col("d1") < col("d2"))
        .agg(sum(when(col("v2") > col("v1"), 1L)
          .when(col("v2") < col("v1"), -1L).otherwise(0L)).cast("long").as("s"))
      val ties = win.groupBy("v").agg(count(lit(1)).cast("long").as("tc"))
        .agg(sum(col("tc") * (col("tc") - 1L) * (lit(2L) * col("tc") + 5L))
          .cast("long").as("tie18"),
          sum(col("tc")).cast("long").as("n"))
      sStat.crossJoin(broadcast(ties))
        .withColumn("var18",
          col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) - col("tie18"))
        .select(col("n"), col("s"), col("var18"),
          round(expr(
            "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)" +
              " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)" +
              " ELSE 0.0 END"), 6).as("z"))
    },
    Some(
      s"""WITH $dailySql,
         |dmax AS (SELECT max(day) AS dm FROM days),
         |win AS (SELECT day, v FROM days CROSS JOIN dmax WHERE day > dm - 120),
         |sstat AS (
         |  SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
         |    ELSE 0 END) AS BIGINT) AS s
         |  FROM win a JOIN win b ON a.day < b.day),
         |ties AS (
         |  SELECT CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie18,
         |    CAST(sum(tc) AS BIGINT) AS n
         |  FROM (SELECT v, CAST(count(*) AS BIGINT) AS tc FROM win GROUP BY v)),
         |agg AS (
         |  SELECT n, s, n * (n - 1) * (2 * n + 5) - tie18 AS var18
         |  FROM sstat CROSS JOIN ties)
         |SELECT n, s, CAST(var18 AS BIGINT) AS var18,
         |  round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |    WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |    ELSE 0.0 END, 6) AS z
         |FROM agg""".stripMargin))

  // ---------- q_runs_test ----------

  val qRunsTest = QueryDef("q_runs_test",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val days = dailyRevenue(s, dir)
      // exact lower median of v
      val wv = Window.orderBy("v", "day")
      val med = days
        .withColumn("rk", row_number().over(wv).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))).cast("long"))
        .where(col("rk") === expr("CAST((n + 1 - (n + 1) % 2) / 2 AS BIGINT)"))
        .select(col("v").as("med"))
      val signed = days.crossJoin(broadcast(med))
        .where(col("v") =!= col("med")) // drop exact-median days
        .withColumn("above", when(col("v") > col("med"), 1L).otherwise(0L))
      val w = Window.orderBy("day")
      val runs = signed
        .withColumn("prev", lag(col("above"), 1).over(w))
        .withColumn("new_run",
          when(col("prev").isNull || col("prev") =!= col("above"), 1L)
            .otherwise(0L))
      runs.agg(sum(col("new_run")).cast("long").as("n_runs"),
          sum(col("above")).cast("long").as("n_pos"),
          sum(lit(1L) - col("above")).cast("long").as("n_neg"))
        .select(col("n_runs"), col("n_pos"), col("n_neg"),
          round(expr(
            "(CAST(n_runs AS DOUBLE) - (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)" +
              " / (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)) + 1.0))" +
              " / sqrt(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)" +
              " * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)" +
              " - CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))" +
              " / ((CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))" +
              " * (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))" +
              " * (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE) - 1.0)))"), 6)
            .as("z"))
    },
    Some(
      s"""WITH $dailySql,
         |med AS (
         |  SELECT v AS med FROM (
         |    SELECT v, row_number() OVER (ORDER BY v, day) AS rk,
         |      count(*) OVER () AS n
         |    FROM days)
         |  WHERE rk = CAST((n + 1 - (n + 1) % 2) / 2 AS BIGINT)),
         |signed AS (
         |  SELECT day, CASE WHEN v > med THEN 1 ELSE 0 END AS above
         |  FROM days CROSS JOIN med WHERE v <> med),
         |runs AS (
         |  SELECT above,
         |    CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
         |      OR lag(above) OVER (ORDER BY day) <> above THEN 1 ELSE 0 END AS new_run
         |  FROM signed),
         |agg AS (
         |  SELECT CAST(sum(new_run) AS BIGINT) AS n_runs,
         |    CAST(sum(above) AS BIGINT) AS n_pos,
         |    CAST(sum(1 - above) AS BIGINT) AS n_neg
         |  FROM runs)
         |SELECT n_runs, n_pos, n_neg,
         |  round((CAST(n_runs AS DOUBLE) - (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
         |      / (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)) + 1.0))
         |    / sqrt(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
         |      * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
         |      - CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))
         |      / ((CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
         |      * (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
         |      * (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE) - 1.0))), 6) AS z
         |FROM agg""".stripMargin))

  // ---------- q_conductance ----------

  val qConductance = QueryDef("q_conductance",
    (s, dir) => {
      val nations = t(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_nationkey").cast("long").as("nat"))
      // shared capped co-purchase graph (graft.ext.GraphOps) — no
      // forced broadcast of the fact-sized orders map; AQE decides
      val edges = Queries.pin(GraphOps.coPurchaseEdges(
          t(s, dir, "lineitem"), t(s, dir, "orders"))
        .join(broadcast(nations.select(col("ck").as("a"), col("nat").as("na"))), "a")
        .join(broadcast(nations.select(col("ck").as("b"), col("nat").as("nb"))), "b"))
      val m2 = edges.agg((count(lit(1)) * 2L).cast("long").as("vol_total"))
      val sides = edges.select(col("na").as("nat"),
          when(col("na") === col("nb"), 0L).otherwise(1L).as("cut"))
        .unionAll(edges.select(col("nb").as("nat"),
          when(col("na") === col("nb"), 0L).otherwise(1L).as("cut")))
      val per = sides.groupBy("nat")
        .agg(count(lit(1)).cast("long").as("vol"),
          sum(col("cut")).cast("long").as("cut"))
      per.crossJoin(broadcast(m2))
        .withColumn("vol_other", col("vol_total") - col("vol"))
        .where(col("vol") > 0 && col("vol_other") > 0)
        .select(col("nat"), col("vol"), col("cut"),
          round(expr("CAST(cut AS DOUBLE) / CAST(least(vol, vol_other) AS DOUBLE)"), 6)
            .as("phi"))
        .orderBy("nat")
    },
    Some(
      """WITH li AS (
        |  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |capped AS (
        |  SELECT pk, ck, row_number() OVER (PARTITION BY pk ORDER BY ck) AS rn
        |  FROM li QUALIFY rn <= 4),
        |raw_edges AS (
        |  SELECT DISTINCT x.ck AS a, y.ck AS b
        |  FROM capped x JOIN capped y ON x.pk = y.pk AND x.ck < y.ck),
        |edges AS (
        |  SELECT a, b, CAST(cna.c_nationkey AS BIGINT) AS na,
        |    CAST(cnb.c_nationkey AS BIGINT) AS nb
        |  FROM raw_edges
        |  JOIN customer cna ON cna.c_custkey = a
        |  JOIN customer cnb ON cnb.c_custkey = b),
        |m2 AS (SELECT CAST(count(*) * 2 AS BIGINT) AS vol_total FROM edges),
        |sides AS (
        |  SELECT na AS nat, CASE WHEN na = nb THEN 0 ELSE 1 END AS cut FROM edges
        |  UNION ALL
        |  SELECT nb, CASE WHEN na = nb THEN 0 ELSE 1 END FROM edges),
        |per AS (
        |  SELECT nat, CAST(count(*) AS BIGINT) AS vol, CAST(sum(cut) AS BIGINT) AS cut
        |  FROM sides GROUP BY nat)
        |SELECT nat, vol, cut,
        |  round(CAST(cut AS DOUBLE)
        |    / CAST(least(vol, vol_total - vol) AS DOUBLE), 6) AS phi
        |FROM per CROSS JOIN m2
        |WHERE vol > 0 AND vol_total - vol > 0
        |ORDER BY nat""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMannKendall, qRunsTest, qConductance)
}
