package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Thirty-third wave — distribution drift detection (the monitoring
  * side of a training-data pipeline: has this source's distribution
  * moved since the last snapshot?).
  *
  *  - `q_ks_test`: two-sample Kolmogorov–Smirnov statistic computed
  *    EXACTLY — D = max|F₁−F₂| evaluated as max|i·m − j·n| over the
  *    merged value sequence (cross-multiplied integers; no floating
  *    CDF), reported in basis points by exact floor division.
  *  - `q_psi`: population stability index over rank-derived decile
  *    bins — bin boundaries come from exact rank arithmetic (no
  *    percentile doubles), Laplace smoothing keeps empty bins finite,
  *    and each bin's (p−q)·ln(p/q) term is DECIMAL-quantized before
  *    the total so the sum is order-independent (the q_lm_doc_score
  *    discipline).
  */
object R33Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_ks_test ----------

  /** KS over o_totalprice: open orders ('O') vs fulfilled ('F').
    * Shape: per-value counts (map-side combined), one global-order
    * cumulative window over the |distinct values| sequence, then a
    * 1-row max — the merged-CDF sweep, never a pairwise compare. */
  val qKsTest = QueryDef("q_ks_test",
    (s, dir) => RewriteGlobalRankWindows.force {
      val o = t(s, dir, "orders")
        .where(col("o_orderstatus").isin("O", "F"))
        .select(col("o_totalprice").as("v"),
          (col("o_orderstatus") === "O").cast("long").as("is_a"))
      val perValue = o.groupBy("v")
        .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val cum = perValue
        .withColumn("ia", sum(col("ca")).over(w))
        .withColumn("jb", sum(col("cb")).over(w))
        .withColumn("n", sum(col("ca")).over(tot))
        .withColumn("m", sum(col("cb")).over(tot))
        .withColumn("dnum", abs(col("ia") * col("m") - col("jb") * col("n")))
      val p = col("dnum") * 10000L
      val nm = col("n") * col("m")
      cum.withColumn("rk", row_number().over(
          Window.partitionBy(lit(1)).orderBy(col("dnum").desc, col("v"))))
        .where(col("rk") === 1)
        .select(col("n"), col("m"),
          ((p - ((p % nm) + nm) % nm) / nm).cast("long").as("d_bp"),
          col("v").as("at_value"))
    },
    Some(
      """WITH o AS (
        |  SELECT o_totalprice AS v,
        |    CAST(o_orderstatus = 'O' AS BIGINT) AS is_a
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')
        |), pv AS (
        |  SELECT v, sum(is_a) AS ca, sum(1 - is_a) AS cb
        |  FROM o GROUP BY v
        |), cum AS (
        |  SELECT v,
        |    sum(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ia,
        |    sum(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS jb,
        |    sum(ca) OVER () AS n, sum(cb) OVER () AS m
        |  FROM pv
        |), d AS (
        |  SELECT v, n, m, abs(ia * m - jb * n) AS dnum,
        |    row_number() OVER (ORDER BY abs(ia * m - jb * n) DESC, v) AS rk
        |  FROM cum
        |)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |  CAST((dnum * 10000 - ((dnum * 10000 % (n * m)) + n * m) % (n * m))
        |    / (n * m) AS BIGINT) AS d_bp,
        |  v AS at_value
        |FROM d WHERE rk = 1""".stripMargin))

  // ---------- q_psi ----------

  /** PSI of fulfilled-order totals against open-order deciles. Bin of
    * x = floor(10·|{e ≤ x}|/n) clamped to 9 — exact rank arithmetic
    * via the same per-value cumulative sweep (expected-side counts
    * windowed over the merged distinct values), so bin edges cannot
    * drift with floating percentiles. */
  val qPsi = QueryDef("q_psi",
    (s, dir) => RewriteGlobalRankWindows.force {
      val d18 = DecimalType(18, 9)
      val o = t(s, dir, "orders")
        .where(col("o_orderstatus").isin("O", "F"))
        .select(col("o_totalprice").as("v"),
          (col("o_orderstatus") === "O").cast("long").as("is_e"))
      val perValue = o.groupBy("v")
        .agg(sum(col("is_e")).as("ce"), sum(lit(1L) - col("is_e")).as("ca"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val binned = perValue
        .withColumn("cum_e", sum(col("ce")).over(w))
        .withColumn("n_e", sum(col("ce")).over(tot))
        .withColumn("bin", least(
          ((col("cum_e") * 10 -
            ((col("cum_e") * 10 % col("n_e")) + col("n_e")) % col("n_e"))
            / col("n_e")).cast("long"), lit(9L)))
      val bins = binned.groupBy("bin")
        .agg(sum(col("ce")).as("n_exp"), sum(col("ca")).as("n_act"))
      val totals = Window.partitionBy(lit(1))
      bins
        .withColumn("te", sum(col("n_exp")).over(totals))
        .withColumn("ta", sum(col("n_act")).over(totals))
        // Laplace-smoothed shares: empty bins stay finite
        .withColumn("p", (col("n_exp") + 1).cast("double") /
          (col("te") + 10).cast("double"))
        .withColumn("q", (col("n_act") + 1).cast("double") /
          (col("ta") + 10).cast("double"))
        .withColumn("term",
          ((col("p") - col("q")) * log(col("p") / col("q"))).cast(d18))
        .withColumn("psi_total",
          sum(col("term")).over(totals).cast("double"))
        .select(col("bin"), col("n_exp"), col("n_act"),
          col("term").cast("double").as("term"), col("psi_total"))
        .orderBy("bin")
    },
    Some(
      """WITH o AS (
        |  SELECT o_totalprice AS v,
        |    CAST(o_orderstatus = 'O' AS BIGINT) AS is_e
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')
        |), pv AS (
        |  SELECT v, sum(is_e) AS ce, sum(1 - is_e) AS ca
        |  FROM o GROUP BY v
        |), binned AS (
        |  SELECT v, ce, ca,
        |    least(CAST((c10 - ((c10 % ne) + ne) % ne) / ne AS BIGINT), 9)
        |      AS bin
        |  FROM (
        |    SELECT v, ce, ca,
        |      sum(ce) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10
        |        AS c10,
        |      sum(ce) OVER () AS ne
        |    FROM pv)
        |), bins AS (
        |  SELECT bin, CAST(sum(ce) AS BIGINT) AS n_exp,
        |    CAST(sum(ca) AS BIGINT) AS n_act
        |  FROM binned GROUP BY bin
        |), terms AS (
        |  SELECT bin, n_exp, n_act,
        |    CAST((CAST(n_exp + 1 AS DOUBLE) / CAST(te + 10 AS DOUBLE)
        |          - CAST(n_act + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
        |      * ln((CAST(n_exp + 1 AS DOUBLE) / CAST(te + 10 AS DOUBLE))
        |           / (CAST(n_act + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE)))
        |      AS DECIMAL(18,9)) AS term
        |  FROM (SELECT bin, n_exp, n_act, sum(n_exp) OVER () AS te,
        |          sum(n_act) OVER () AS ta
        |        FROM bins)
        |)
        |SELECT bin, n_exp, n_act, CAST(term AS DOUBLE) AS term,
        |  CAST(sum(term) OVER () AS DOUBLE) AS psi_total
        |FROM terms ORDER BY bin""".stripMargin))

  val all: Seq[QueryDef] = Seq(qKsTest, qPsi)
}
