package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninety-first wave — decision stumps, Venn cohorts, and χ² feature
  * selection.
  *
  *  - `q_stump`: the exact best decision stump (1-level tree) on the
  *    user event-count feature against the purchase label — CART's
  *    split criterion (Breiman et al. 1984) with the weighted Gini
  *    objective's numerator computed exactly in BIGINT
  *    (2p₁(n₁−p₁)n₂ + 2p₂(n₂−p₂)n₁) and the argmin ranked on the
  *    ratio over n₁·n₂·n — the denominator varies with the threshold,
  *    so ranking the numerator alone would pick the wrong split; both
  *    engines evaluate the identical IEEE ratio tree. Candidate thresholds are
  *    the distinct feature values (prefix sums over a value-sized
  *    sweep, the q_jenks machinery pointed at classification).
  *  - `q_venn`: the 7-region Venn decomposition of three behavioral
  *    cohorts (clickers / viewers / purchasers) — exact region counts
  *    from one per-user bitmask aggregate, the overlap report behind
  *    every audience-planning dashboard. Mask-sized output.
  *  - `q_chi2_select`: χ² feature screening (the classic filter
  *    method) of three categorical features (market segment, nation's
  *    region, balance sign) against the has-finalized-order label:
  *    per feature the χ² statistic from exact integer contingency
  *    counts (expected counts enter one shared IEEE tree), degrees of
  *    freedom, and the per-feature ranking. Contingency tables are
  *    dimension-sized; the corpus is touched once per feature.
  */
object R91Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_stump ----------

  val qStump = QueryDef("q_stump",
    (s, dir) => RewriteGlobalRankWindows.force {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("x"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val vals = per.groupBy("x")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("y")).cast("long").as("p"))
      val w = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val swept = vals
        .withColumn("n1", sum(col("n")).over(w).cast("long"))
        .withColumn("p1", sum(col("p")).over(w).cast("long"))
        .withColumn("nt", sum(col("n")).over(tot).cast("long"))
        .withColumn("pt", sum(col("p")).over(tot).cast("long"))
        .withColumn("n2", col("nt") - col("n1"))
        .withColumn("p2", col("pt") - col("p1"))
        .where(col("n2") > 0) // split keeps both sides non-empty
        .withColumn("gini_num",
          lit(2L) * col("p1") * (col("n1") - col("p1")) * col("n2") +
            lit(2L) * col("p2") * (col("n2") - col("p2")) * col("n1"))
      // the denominator n1·n2 varies with the threshold, so the argmin
      // MUST rank the ratio, not the integer numerator (both engines
      // evaluate the identical IEEE tree; x breaks exact ties)
      val best = swept
        .withColumn("g", expr("CAST(gini_num AS DOUBLE)" +
          " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(nt AS DOUBLE))"))
        .withColumn("rk", row_number().over(Window.orderBy(col("g"), col("x"))))
        .where(col("rk") === 1)
      best.select(col("x").as("threshold"), col("n1"), col("p1"),
          col("n2"), col("p2"), col("gini_num"),
          round(expr("CAST(gini_num AS DOUBLE)" +
            " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(nt AS DOUBLE))"), 6)
            .as("gini"))
    },
    Some(
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY user_id),
        |vals AS (
        |  SELECT x, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
        |  FROM per GROUP BY x),
        |swept AS (
        |  SELECT x,
        |    CAST(sum(n) OVER wc AS BIGINT) AS n1,
        |    CAST(sum(p) OVER wc AS BIGINT) AS p1,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt,
        |    CAST(sum(p) OVER () AS BIGINT) AS pt
        |  FROM vals
        |  WINDOW wc AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |scored AS (
        |  SELECT x, n1, p1, nt - n1 AS n2, pt - p1 AS p2, nt,
        |    2 * p1 * (n1 - p1) * (nt - n1) + 2 * (pt - p1) * ((nt - n1) - (pt - p1)) * n1
        |      AS gini_num
        |  FROM swept WHERE nt - n1 > 0),
        |best AS (
        |  SELECT *, row_number() OVER (ORDER BY CAST(gini_num AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(nt AS DOUBLE)), x)
        |    AS rk
        |  FROM scored)
        |SELECT x AS threshold, n1, p1, n2, p2, CAST(gini_num AS BIGINT) AS gini_num,
        |  round(CAST(gini_num AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(nt AS DOUBLE)), 6)
        |    AS gini
        |FROM best WHERE rk = 1""".stripMargin))

  // ---------- q_venn ----------

  val qVenn = QueryDef("q_venn",
    (s, dir) => {
      // cohorts chosen to actually decompose at every sf: big-ticket
      // users (any event ≥ $250), high-value purchasers (≥ $100), and
      // recently-active users (last 2 days before the watermark)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("c"))
      val wm = ev.agg(max(col("us")).as("wm"))
      val masks = ev.crossJoin(broadcast(wm))
        .groupBy("user_id")
        .agg((max(when(col("c") >= 25000L, 1L).otherwise(0L)) +
          max(when(col("event_type") === "purchase" && col("c") >= 10000L, 2L)
            .otherwise(0L)) +
          max(when(col("us") >= col("wm") - lit(2L * 86400000000L), 4L)
            .otherwise(0L))).as("mask"))
      masks.where(col("mask") > 0)
        .groupBy("mask")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .select(col("mask").cast("long").as("mask"),
          when(col("mask").bitwiseAND(1) > 0, 1L).otherwise(0L).as("big_ticket"),
          when(col("mask").bitwiseAND(2) > 0, 1L).otherwise(0L).as("hv_purchaser"),
          when(col("mask").bitwiseAND(4) > 0, 1L).otherwise(0L).as("recent"),
          col("n_users"))
        .orderBy("mask")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    CAST(round(value * 100.0) AS BIGINT) AS c
        |  FROM events),
        |wm AS (SELECT max(us) AS wm FROM ev),
        |masks AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN c >= 25000 THEN 1 ELSE 0 END)
        |      + max(CASE WHEN event_type = 'purchase' AND c >= 10000 THEN 2 ELSE 0 END)
        |      + max(CASE WHEN us >= wm.wm - 172800000000 THEN 4 ELSE 0 END) AS BIGINT)
        |      AS mask
        |  FROM ev CROSS JOIN wm GROUP BY user_id)
        |SELECT mask,
        |  CAST(CASE WHEN mask & 1 > 0 THEN 1 ELSE 0 END AS BIGINT) AS big_ticket,
        |  CAST(CASE WHEN mask & 2 > 0 THEN 1 ELSE 0 END AS BIGINT) AS hv_purchaser,
        |  CAST(CASE WHEN mask & 4 > 0 THEN 1 ELSE 0 END AS BIGINT) AS recent,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM masks WHERE mask > 0
        |GROUP BY mask ORDER BY mask""".stripMargin))

  // ---------- q_chi2_select ----------

  /** (feature name, category SQL) — shared verbatim; label = customer
    * has at least one finalized ('F') order. */
  private val features: Seq[(String, String)] = Seq(
    ("mktsegment", "c_mktsegment"),
    ("region", "CAST(CAST(c_nationkey AS BIGINT) % 5 AS STRING)"),
    ("bal_sign", "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END"))

  val qChi2Select = QueryDef("q_chi2_select",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val y = t(s, dir, "orders").groupBy("o_custkey")
        .agg(max(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("y0"))
      val cust = t(s, dir, "customer")
        .join(y.withColumnRenamed("o_custkey", "c_custkey"),
          Seq("c_custkey"), "left")
        .withColumn("y", coalesce(col("y0"), lit(0L)))
      val perFeature = features.map { case (name, catSql) =>
        val cells = cust.select(expr(catSql).as("cat"), col("y"))
          .groupBy("cat")
          .agg(count(lit(1)).cast("long").as("n_c"),
            sum(col("y")).cast("long").as("p_c"))
        val tot = Window.partitionBy(lit(1))
        cells
          .withColumn("n", sum(col("n_c")).over(tot).cast("long"))
          .withColumn("p", sum(col("p_c")).over(tot).cast("long"))
          // χ² over the 2×k table: Σ_cells (obs−exp)²/exp, one shared tree
          .withColumn("term", expr(
            "(CAST(p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(p AS DOUBLE) / CAST(n AS DOUBLE))" +
              " * (CAST(p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(p AS DOUBLE) / CAST(n AS DOUBLE))" +
              " / (CAST(n_c AS DOUBLE) * CAST(p AS DOUBLE) / CAST(n AS DOUBLE))" +
              " + (CAST(n_c - p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))" +
              " * (CAST(n_c - p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))" +
              " / (CAST(n_c AS DOUBLE) * CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))"))
          .agg(count(lit(1)).cast("long").as("n_cats"),
            round(sum(col("term")), 6).as("chi2"))
          .select(lit(name).as("feature"), col("n_cats"),
            (col("n_cats") - 1L).as("dof"), col("chi2"))
      }
      perFeature.reduce(_ unionAll _).orderBy("feature")
    },
    Some {
      val cellUnions = features.map { case (name, catSql) =>
        s"""SELECT '$name' AS feature, $catSql AS cat,
           |  CAST(count(*) AS BIGINT) AS n_c, CAST(sum(y) AS BIGINT) AS p_c
           |FROM cust GROUP BY 1, 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH y AS (
         |  SELECT o_custkey,
         |    CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS y0
         |  FROM orders GROUP BY o_custkey),
         |cust AS (
         |  SELECT c.*, coalesce(y0, 0) AS y
         |  FROM customer c LEFT JOIN y ON o_custkey = c_custkey),
         |cells AS (
         |$cellUnions),
         |tots AS (
         |  SELECT feature, CAST(sum(n_c) AS BIGINT) AS n, CAST(sum(p_c) AS BIGINT) AS p
         |  FROM cells GROUP BY feature),
         |terms AS (
         |  SELECT c.feature,
         |    (CAST(p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n_c AS DOUBLE) * CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
         |    + (CAST(n_c - p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(n_c - p_c AS DOUBLE) - CAST(n_c AS DOUBLE) * CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n_c AS DOUBLE) * CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE)) AS term
         |  FROM cells c JOIN tots t ON t.feature = c.feature)
         |SELECT feature, CAST(count(*) AS BIGINT) AS n_cats,
         |  CAST(count(*) - 1 AS BIGINT) AS dof, round(sum(term), 6) AS chi2
         |FROM terms GROUP BY feature ORDER BY feature""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qStump, qVenn, qChi2Select)
}
