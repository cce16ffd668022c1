package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Eighty-third wave — permutation inference, leak-free target
  * encoding, and weight-of-evidence scoring.
  *
  *  - `q_perm_test`: a permutation test (Fisher 1935) of the A/B
  *    difference in per-user purchase totals — but with HASH-DERIVED
  *    pseudo-permutations (user × permutation-index mixer mod 2), so
  *    the full test is deterministic and ORACLE-HASHED end to end:
  *    observed |ΣB − ΣA|, 200 reassigned statistics, the exceedance
  *    count, and the add-one p in basis points, all exact integers.
  *    The corpus cost is one explode to |users|·200 partial terms with
  *    map-side combine — no per-permutation pass.
  *  - `q_target_encode`: leave-one-out target encoding with additive
  *    smoothing (the Micci-Barreca 2001 scheme): each customer's
  *    mktsegment is encoded as (Σy_seg − y_self + m·prior)/(n_seg − 1
  *    + m) with m = 10 — self-exclusion kills the target leak that a
  *    naive group mean injects into training features. Integer sums
  *    throughout; the final ratio is ONE shared IEEE expression tree
  *    rounded at 6 (the q_cuped discipline). Segment stats are a
  *    |segments|-sized broadcast back onto the rows.
  *  - `q_woe_iv`: weight-of-evidence / information-value scoring
  *    (the standard credit-risk binning audit): per nation,
  *    WOE = ln((good+½)/G ÷ (bad+½)/B) with Laplace half-counts, the
  *    per-bin IV contribution, and the running total IV — which bins
  *    separate defaulters (negative balance) from the rest and how
  *    much predictive power the feature carries. Dimension-sized
  *    sweep; ln on exact integer ratios is engine-parity by the
  *    q_theil_index precedent.
  */
object R83Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_perm_test ----------

  private val nPerms = 200

  /** Pseudo-permutation bit for (user_id, perm i) — shared verbatim. */
  private val permBitSql =
    "(user_id * 2654435761 + i * 40503 + user_id * i * 104729) % 2"

  val qPermTest = QueryDef("q_perm_test",
    (s, dir) => {
      val per = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("long").as("y"))
      val obs = per.agg(abs(
        sum(when(col("user_id") % 2 === 1, col("y")).otherwise(-col("y"))))
        .cast("long").as("t_obs"))
      val perms = per
        .withColumn("i", explode(sequence(lit(0), lit(nPerms - 1))))
        .withColumn("i", col("i").cast("long"))
        .withColumn("signed",
          when(expr(permBitSql) === 1, col("y")).otherwise(-col("y")))
        .groupBy("i")
        .agg(abs(sum(col("signed"))).cast("long").as("t_perm"))
      perms.crossJoin(broadcast(obs))
        .agg(max(col("t_obs")).as("t_obs"),
          count(lit(1)).cast("long").as("n_perms"),
          sum(when(col("t_perm") >= col("t_obs"), 1L).otherwise(0L))
            .cast("long").as("n_ge"))
        .select(col("t_obs"), col("n_perms"), col("n_ge"),
          (((col("n_ge") + 1L) * 10000L -
            ((col("n_ge") + 1L) * 10000L) % (col("n_perms") + 1L)) /
            (col("n_perms") + 1L)).cast("long").as("p_bp"))
    },
    Some(
      s"""WITH per AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
         |  FROM events GROUP BY user_id),
         |obs AS (
         |  SELECT CAST(abs(sum(CASE WHEN user_id % 2 = 1 THEN y ELSE -y END)) AS BIGINT)
         |    AS t_obs
         |  FROM per),
         |perms AS (
         |  SELECT i, CAST(abs(sum(CASE WHEN $permBitSql = 1 THEN y ELSE -y END)) AS BIGINT)
         |    AS t_perm
         |  FROM per CROSS JOIN (SELECT unnest(generate_series(0, ${nPerms - 1})) AS i)
         |  GROUP BY i),
         |agg AS (
         |  SELECT max(t_obs) AS t_obs, CAST(count(*) AS BIGINT) AS n_perms,
         |    CAST(sum(CASE WHEN t_perm >= t_obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
         |  FROM perms CROSS JOIN obs)
         |SELECT CAST(t_obs AS BIGINT) AS t_obs, n_perms, n_ge,
         |  CAST(((n_ge + 1) * 10000 - ((n_ge + 1) * 10000) % (n_perms + 1))
         |    / (n_perms + 1) AS BIGINT) AS p_bp
         |FROM agg""".stripMargin))

  // ---------- q_target_encode ----------

  private val smoothM = 10L

  val qTargetEncode = QueryDef("q_target_encode",
    (s, dir) => {
      val y = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("y0"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        .join(y.withColumnRenamed("o_custkey", "k"), Seq("k"), "left")
        .withColumn("y", coalesce(col("y0"), lit(0L)))
      val segStats = cust.groupBy("seg")
        .agg(count(lit(1)).cast("long").as("n_seg"),
          sum(col("y")).cast("long").as("sy_seg"))
      val gstats = cust.agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("long").as("sy"))
      cust.join(broadcast(segStats), "seg").crossJoin(broadcast(gstats))
        .select(col("k"), col("seg"), col("y"),
          round(expr(
            s"(CAST(sy_seg - y AS DOUBLE) + $smoothM * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))" +
              s" / CAST(n_seg - 1 + $smoothM AS DOUBLE)"), 6).as("enc"))
        .orderBy("k")
    },
    Some(
      s"""WITH y AS (
         |  SELECT o_custkey,
         |    CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS y0
         |  FROM orders GROUP BY o_custkey),
         |cust AS (
         |  SELECT c_custkey AS k, c_mktsegment AS seg, coalesce(y0, 0) AS y
         |  FROM customer LEFT JOIN y ON o_custkey = c_custkey),
         |seg_stats AS (
         |  SELECT seg, CAST(count(*) AS BIGINT) AS n_seg,
         |    CAST(sum(y) AS BIGINT) AS sy_seg
         |  FROM cust GROUP BY seg),
         |gstats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy FROM cust)
         |SELECT k, c.seg, CAST(y AS BIGINT) AS y,
         |  round((CAST(sy_seg - y AS DOUBLE) + $smoothM * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         |    / CAST(n_seg - 1 + $smoothM AS DOUBLE), 6) AS enc
         |FROM cust c JOIN seg_stats ss ON ss.seg = c.seg CROSS JOIN gstats
         |ORDER BY k""".stripMargin))

  // ---------- q_woe_iv ----------

  val qWoeIv = QueryDef("q_woe_iv",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val bins = t(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nat"),
          when(col("c_acctbal") < 0, 1L).otherwise(0L).as("bad"))
        .groupBy("nat")
        .agg(sum(lit(1L) - col("bad")).cast("long").as("n_good"),
          sum(col("bad")).cast("long").as("n_bad"))
      val tot = bins.agg(sum(col("n_good")).cast("long").as("g"),
        sum(col("n_bad")).cast("long").as("b"))
      val woeExpr =
        "ln(((CAST(n_good AS DOUBLE) + 0.5) / CAST(g AS DOUBLE))" +
          " / ((CAST(n_bad AS DOUBLE) + 0.5) / CAST(b AS DOUBLE)))"
      val ivExpr =
        s"((CAST(n_good AS DOUBLE) + 0.5) / CAST(g AS DOUBLE)" +
          s" - (CAST(n_bad AS DOUBLE) + 0.5) / CAST(b AS DOUBLE)) * ($woeExpr)"
      val w = Window.orderBy("nat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bins.crossJoin(broadcast(tot))
        .withColumn("woe", round(expr(woeExpr), 6))
        .withColumn("iv_part", expr(ivExpr))
        .withColumn("iv_cum", round(sum(col("iv_part")).over(w), 6))
        .select(col("nat"), col("n_good"), col("n_bad"), col("woe"),
          col("iv_cum"))
        .orderBy("nat")
    },
    Some(
      """WITH bins AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(sum(CASE WHEN c_acctbal < 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
        |    CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        |  FROM customer GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_good) AS BIGINT) AS g, CAST(sum(n_bad) AS BIGINT) AS b
        |  FROM bins),
        |scored AS (
        |  SELECT nat, n_good, n_bad,
        |    ln(((CAST(n_good AS DOUBLE) + 0.5) / CAST(g AS DOUBLE))
        |      / ((CAST(n_bad AS DOUBLE) + 0.5) / CAST(b AS DOUBLE))) AS woe_raw,
        |    ((CAST(n_good AS DOUBLE) + 0.5) / CAST(g AS DOUBLE)
        |      - (CAST(n_bad AS DOUBLE) + 0.5) / CAST(b AS DOUBLE))
        |      * (ln(((CAST(n_good AS DOUBLE) + 0.5) / CAST(g AS DOUBLE))
        |      / ((CAST(n_bad AS DOUBLE) + 0.5) / CAST(b AS DOUBLE)))) AS iv_part
        |  FROM bins CROSS JOIN tot)
        |SELECT nat, n_good, n_bad, round(woe_raw, 6) AS woe,
        |  round(sum(iv_part) OVER (ORDER BY nat
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS iv_cum
        |FROM scored ORDER BY nat""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPermTest, qTargetEncode, qWoeIv)
}
