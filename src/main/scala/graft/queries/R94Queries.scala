package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.GraphOps
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninety-fourth wave — graph assortativity, uplift curves, and
  * propensity stratification.
  *
  *  - `q_assortativity`: degree assortativity (Newman 2002) of the
  *    customer co-purchase graph (customers linked when they share a
  *    part, capped fan-out) — the Pearson correlation of endpoint
  *    degrees over the edge list, from exact BIGINT moment sums with
  *    ONE shared IEEE tree at the end (the q_corr_exact discipline on
  *    graph structure). Positive r = hubs buy with hubs; the mixing
  *    diagnostic that decides whether degree-based partitioning will
  *    skew.
  *  - `q_qini`: the Qini/uplift curve (Radcliffe 2007) — users ranked
  *    by pre-period activity score, and per decile the INCREMENTAL
  *    conversions treated−control scaled to the treated count:
  *    cumulative uplift in exact integer cross-multiplied form
  *    (u·n_t,c-scaled) plus the shared-double per-decile curve. Where
  *    q_lift_curve grades a classifier, Qini grades a TARGETING
  *    policy under an experiment.
  *  - `q_psm_att`: stratified propensity matching — the
  *    average-treatment-effect-on-treated estimated by exact
  *    stratification on activity-quintile "propensity" bins:
  *    ATT = Σ_bins (n_t,b/N_t)·(ȳ_t,b − ȳ_c,b), integer sums per
  *    cell, one shared tree for the weighted sum, bins with no
  *    control dropped exactly on both engines. The workhorse causal
  *    adjustment when treatment isn't randomized.
  */
object R94Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_assortativity ----------

  val qAssortativity = QueryDef("q_assortativity",
    (s, dir) => {
      // shared capped co-purchase graph (graft.ext.GraphOps) — no
      // forced broadcast of the fact-sized orders map; AQE decides
      val edges = Queries.pin(GraphOps.coPurchaseEdges(
          t(s, dir, "lineitem"), t(s, dir, "orders")))
        // referenced by the degree table AND both endpoint joins —
        // pinned once instead of re-deriving the graph three times
      val deg = edges.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1)).cast("long").as("d"))
      val withDeg = edges
        .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      // symmetrization folds into ONE pass: for mirrored pairs
      // m2 = 2m, sx = sy = Σ(da+db), sxy = 2Σda·db, sxx = syy = Σ(da²+db²)
      // — the union form scans the whole graph twice (measured 2×)
      val pairs = withDeg.agg(
          (count(lit(1)) * 2L).cast("long").as("m2"),
          sum(col("da") + col("db")).cast("long").as("sx"),
          sum(col("da") + col("db")).cast("long").as("sy"),
          (sum(col("da") * col("db")) * 2L).cast("long").as("sxy"),
          sum(col("da") * col("da") + col("db") * col("db")).cast("long").as("sxx"),
          sum(col("da") * col("da") + col("db") * col("db")).cast("long").as("syy"))
      pairs
        .select(col("m2"),
          round(expr(
            "(CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
              " / (sqrt(CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
              " * sqrt(CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"), 6)
            .as("assortativity"))
    },
    Some(
      """WITH li AS (
        |  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |capped AS (
        |  SELECT pk, ck, row_number() OVER (PARTITION BY pk ORDER BY ck) AS rn
        |  FROM li QUALIFY rn <= 4),
        |edges AS (
        |  SELECT DISTINCT x.ck AS a, y.ck AS b
        |  FROM capped x JOIN capped y ON x.pk = y.pk AND x.ck < y.ck),
        |deg AS (
        |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT a AS n FROM edges UNION ALL SELECT b FROM edges)
        |  GROUP BY n),
        |pairs AS (
        |  SELECT da.d AS x, db.d AS y
        |  FROM edges JOIN deg da ON da.n = a JOIN deg db ON db.n = b
        |  UNION ALL
        |  SELECT db.d, da.d
        |  FROM edges JOIN deg da ON da.n = a JOIN deg db ON db.n = b),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m2,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pairs)
        |SELECT m2,
        |  round((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * sqrt(CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS assortativity
        |FROM agg""".stripMargin))

  // ---------- q_qini ----------

  private val usPerDay = 86400000000L

  val qQini = QueryDef("q_qini",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val mid = ev.agg(expr(
        "CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT) AS m"))
      val per = ev.crossJoin(broadcast(mid)).groupBy("user_id")
        .agg(sum(when(col("us") < col("m"), 1L).otherwise(0L)).cast("long")
          .as("score"),
          max(when(col("us") >= col("m") && col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("y"))
        .withColumn("treat", when(col("user_id") % 2 === 1, 1L).otherwise(0L))
      // r13 (VERDICT r12 task 1): the global score rank routes through
      // GlobalRank, the user count through zero-shuffle GlobalFrameAgg,
      // and the cumulative decile sums below through GlobalRunningAgg —
      // the ENTITY whitelist entry is retired. row_number is tie-exact
      // here (the order ends on the unique user_id).
      val w = Window.orderBy(col("score").desc, col("user_id"))
      val ranked = RewriteGlobalRankWindows.force(per
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("nn", count(lit(1)).over().cast("long"))
        .withColumn("decile",
          least(lit(9L), ((col("rk") - 1L) * 10L -
            ((col("rk") - 1L) * 10L) % col("nn")) / col("nn")).cast("long")))
      val cells = ranked.groupBy("decile")
        .agg(sum(col("treat")).cast("long").as("nt"),
          sum(lit(1L) - col("treat")).cast("long").as("nc"),
          sum(col("treat") * col("y")).cast("long").as("yt"),
          sum((lit(1L) - col("treat")) * col("y")).cast("long").as("yc"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // all four cumulative sums in ONE select → one analyzed Window
      // node → ONE GlobalRunningAgg (stacked withColumns would each
      // carry their own node; the operators would still share the one
      // range exchange, but one node is the plan PlanShapeSpec pins)
      RewriteGlobalRankWindows.force(cells
        .select(col("decile"), col("nt"), col("nc"), col("yt"), col("yc"),
          sum(col("nt")).over(wc).cast("long").as("cnt"),
          sum(col("nc")).over(wc).cast("long").as("cnc"),
          sum(col("yt")).over(wc).cast("long").as("cyt"),
          sum(col("yc")).over(wc).cast("long").as("cyc"))
        .select(col("decile"), col("nt"), col("nc"), col("yt"), col("yc"),
          round(expr("CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)" +
            " * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)"), 6).as("qini")))
        .orderBy("decile")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |mid AS (
        |  SELECT CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT)
        |    AS m FROM ev),
        |per AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < m THEN 1 ELSE 0 END) AS BIGINT) AS score,
        |    CAST(max(CASE WHEN us >= m AND event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    CAST(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS treat
        |  FROM ev CROSS JOIN mid GROUP BY user_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, user_id) AS rk,
        |    count(*) OVER () AS nn
        |  FROM per),
        |binned AS (
        |  SELECT *, CAST(least(9, ((rk - 1) * 10 - ((rk - 1) * 10) % nn) / nn)
        |    AS BIGINT) AS decile
        |  FROM ranked),
        |cells AS (
        |  SELECT decile,
        |    CAST(sum(treat) AS BIGINT) AS nt,
        |    CAST(sum(1 - treat) AS BIGINT) AS nc,
        |    CAST(sum(treat * y) AS BIGINT) AS yt,
        |    CAST(sum((1 - treat) * y) AS BIGINT) AS yc
        |  FROM binned GROUP BY decile)
        |SELECT decile, nt, nc, yt, yc,
        |  round(CAST(sum(yt) OVER wc AS DOUBLE) - CAST(sum(yc) OVER wc AS DOUBLE)
        |    * CAST(sum(nt) OVER wc AS DOUBLE) / CAST(sum(nc) OVER wc AS DOUBLE), 6)
        |    AS qini
        |FROM cells
        |WINDOW wc AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY decile""".stripMargin))

  // ---------- q_psm_att ----------

  val qPsmAtt = QueryDef("q_psm_att",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val mid = ev.agg(expr(
        "CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT) AS m"))
      val per = ev.crossJoin(broadcast(mid)).groupBy("user_id")
        .agg(sum(when(col("us") < col("m"), 1L).otherwise(0L)).cast("long")
          .as("act"),
          max(when(col("us") >= col("m") && col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("y"))
        .withColumn("treat", when(col("user_id") % 2 === 1, 1L).otherwise(0L))
        // coarse "propensity" strata: activity quintile by exact ranks
        .withColumn("rk", row_number().over(
          Window.orderBy(col("act"), col("user_id"))).cast("long"))
        .withColumn("nn", count(lit(1)).over().cast("long"))
        .withColumn("bin",
          least(lit(4L), ((col("rk") - 1L) * 5L -
            ((col("rk") - 1L) * 5L) % col("nn")) / col("nn")).cast("long"))
      // r13 (VERDICT r12 task 1): rank → GlobalRank, total counts →
      // zero-shuffle GlobalFrameAgg — the ENTITY whitelist entry is
      // retired (row_number tie-exact: order ends on unique user_id).
      val cells = RewriteGlobalRankWindows.force(per).groupBy("bin")
        .agg(sum(col("treat")).cast("long").as("nt"),
          sum(lit(1L) - col("treat")).cast("long").as("nc"),
          sum(col("treat") * col("y")).cast("long").as("yt"),
          sum((lit(1L) - col("treat")) * col("y")).cast("long").as("yc"))
        .where(col("nt") > 0 && col("nc") > 0)
      RewriteGlobalRankWindows.force(cells
        .withColumn("ntot", sum(col("nt")).over().cast("long")))
        .agg(count(lit(1)).cast("long").as("n_bins"),
          max(col("ntot")).as("n_treated"),
          round(expr("sum((CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)" +
            " - CAST(yc AS DOUBLE) / CAST(nc AS DOUBLE))" +
            " * CAST(nt AS DOUBLE))"), 6).as("att_num"))
        .select(col("n_bins"), col("n_treated").cast("long").as("n_treated"),
          round(expr("att_num / CAST(n_treated AS DOUBLE)"), 6).as("att"))
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |mid AS (
        |  SELECT CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT)
        |    AS m FROM ev),
        |per AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < m THEN 1 ELSE 0 END) AS BIGINT) AS act,
        |    CAST(max(CASE WHEN us >= m AND event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    CAST(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS treat
        |  FROM ev CROSS JOIN mid GROUP BY user_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY act, user_id) AS rk,
        |    count(*) OVER () AS nn
        |  FROM per),
        |binned AS (
        |  SELECT *, CAST(least(4, ((rk - 1) * 5 - ((rk - 1) * 5) % nn) / nn)
        |    AS BIGINT) AS bin
        |  FROM ranked),
        |cells AS (
        |  SELECT bin,
        |    CAST(sum(treat) AS BIGINT) AS nt,
        |    CAST(sum(1 - treat) AS BIGINT) AS nc,
        |    CAST(sum(treat * y) AS BIGINT) AS yt,
        |    CAST(sum((1 - treat) * y) AS BIGINT) AS yc
        |  FROM binned GROUP BY bin
        |  HAVING sum(treat) > 0 AND sum(1 - treat) > 0),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(sum(nt) AS BIGINT) AS n_treated,
        |    sum((CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)
        |      - CAST(yc AS DOUBLE) / CAST(nc AS DOUBLE)) * CAST(nt AS DOUBLE))
        |      AS att_num
        |  FROM cells)
        |SELECT n_bins, n_treated,
        |  round(round(att_num, 6) / CAST(n_treated AS DOUBLE), 6) AS att
        |FROM agg""".stripMargin))

  val all: Seq[QueryDef] = Seq(qAssortativity, qQini, qPsmAtt)
}
