package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Sixty-ninth wave — changepoint detection, time-decay scoring, and
  * categorical mutual information.
  *
  *  - `q_changepoint`: binary changepoint of the daily revenue series —
  *    the split maximizing the between-segment mean gap, scored as
  *    |sumL·nR − sumR·nL| so the argmax needs NO division and stays in
  *    exact integer cents (cross-multiplied mean comparison — the CUSUM
  *    family's segmentation step). One |days|-sized cumulative sweep
  *    (the q_ks_test discipline), argmax via total-ordered limit 1.
  *  - `q_decay_score`: per-user exponentially decayed activity
  *    (half-life = 1 day) — with λ = 1/2 every weight is a power of
  *    two, so the score is EXACT in Q30 fixed point
  *    (Σ cents·2^(30−age), ages > 30 days clip to zero): recency
  *    weighting with zero float drift, one map-side pass + one
  *    aggregate.
  *  - `q_mi_categorical`: mutual information between the lang and
  *    source columns — the feature-dependence screen run before
  *    stratifying or mixing corpora. Contingency cells, marginals and
  *    the total are all dimension-sized; each cell's term quantizes to
  *    DECIMAL(18,9) before the per-lang sum (the q_psi discipline) so
  *    the aggregation is order-independent.
  */
object R69Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  private def dayCol(tsCol: org.apache.spark.sql.Column) =
    (unix_micros(tsCol) -
      ((unix_micros(tsCol) % usPerDay) + usPerDay) % usPerDay)
      .divide(usPerDay).cast("long")

  // ---------- q_changepoint ----------

  val qChangepoint = QueryDef("q_changepoint",
    // r15: the day-keyed global windows route through the distributed
    // operators (CALENDAR whitelist retirement) — no unpartitioned
    // WindowExec remains
    (s, dir) => RewriteGlobalRankWindows.force {
      // o_orderdate round-trips as NTZ some rounds; UTC session makes the
      // cast instant-preserving (the Tables.events discipline)
      val daily = t(s, dir, "orders")
        .groupBy(dayCol(col("o_orderdate").cast("timestamp")).as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"))
          .cast("long").as("cents"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val sweep = daily
        .withColumn("cum", sum(col("cents")).over(w))
        .withColumn("rk", row_number().over(Window.orderBy("day")).cast("long"))
        .withColumn("tot", sum(col("cents")).over(tot).cast("long"))
        .withColumn("n", count(lit(1)).over(tot).cast("long"))
      val scored = sweep.where(col("rk") < col("n"))
        .select(col("day").as("split_day"),
          col("rk").as("n_l"), (col("n") - col("rk")).as("n_r"),
          col("cum").as("sum_l"), (col("tot") - col("cum")).as("sum_r"),
          abs(col("cum") * (col("n") - col("rk")) -
            (col("tot") - col("cum")) * col("rk")).as("score"))
      def floorDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        ((a - ((a % b) + b) % b) / b).cast("long")
      scored
        .withColumn("mean_l_floor", floorDiv(col("sum_l"), col("n_l")))
        .withColumn("mean_r_floor", floorDiv(col("sum_r"), col("n_r")))
        .select(col("split_day"), col("n_l"), col("n_r"), col("sum_l"),
          col("sum_r"), col("mean_l_floor"), col("mean_r_floor"), col("score"))
        .orderBy(col("score").desc, col("split_day"))
        .limit(1)
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST((epoch_us(o_orderdate) - ((epoch_us(o_orderdate) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |sweep AS (
        |  SELECT day, cents,
        |    sum(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY day) AS rk,
        |    CAST(sum(cents) OVER () AS BIGINT) AS tot,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM daily),
        |scored AS (
        |  SELECT day, rk, n,
        |    cum AS sum_l, tot - cum AS sum_r, rk AS n_l, n - rk AS n_r,
        |    abs(cum * (n - rk) - (tot - cum) * rk) AS score
        |  FROM sweep WHERE rk < n),
        |best AS (
        |  SELECT day, n_l, n_r, sum_l, sum_r, score,
        |    row_number() OVER (ORDER BY score DESC, day) AS brk
        |  FROM scored)
        |SELECT day AS split_day, CAST(n_l AS BIGINT) AS n_l, CAST(n_r AS BIGINT) AS n_r,
        |  CAST(sum_l AS BIGINT) AS sum_l, CAST(sum_r AS BIGINT) AS sum_r,
        |  CAST((sum_l - ((sum_l % n_l) + n_l) % n_l) / n_l AS BIGINT) AS mean_l_floor,
        |  CAST((sum_r - ((sum_r % n_r) + n_r) % n_r) / n_r AS BIGINT) AS mean_r_floor,
        |  CAST(score AS BIGINT) AS score
        |FROM best WHERE brk = 1""".stripMargin))

  // ---------- q_decay_score ----------

  val qDecayScore = QueryDef("q_decay_score",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), dayCol(col("ts")).as("day"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      val mx = ev.agg(max(col("day")).as("maxday"))
      ev.crossJoin(broadcast(mx))
        .withColumn("age", col("maxday") - col("day"))
        .withColumn("w", when(col("age") <= 30,
          col("cents") *
            expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - age AS INT))"))
          .otherwise(0L))
        .groupBy("user_id")
        .agg(sum(col("w")).cast("long").as("decay_score_q30"))
        .orderBy("user_id")
        .limit(200)
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents
        |  FROM events),
        |mx AS (SELECT CAST(max(day) AS BIGINT) AS maxday FROM ev),
        |scored AS (
        |  SELECT e.user_id,
        |    CASE WHEN mx.maxday - e.day <= 30
        |         THEN e.cents * CAST(pow(2, 30 - (mx.maxday - e.day)) AS BIGINT)
        |         ELSE 0 END AS w
        |  FROM ev e CROSS JOIN mx)
        |SELECT user_id, CAST(sum(w) AS BIGINT) AS decay_score_q30
        |FROM scored GROUP BY user_id ORDER BY user_id LIMIT 200""".stripMargin))

  // ---------- q_mi_categorical ----------

  val qMiCategorical = QueryDef("q_mi_categorical",
    (s, dir) => {
      val cells = t(s, dir, "documents").groupBy("lang", "source")
        .agg(count(lit(1)).cast("long").as("nij"))
      val rowsM = cells.groupBy("lang").agg(sum(col("nij")).cast("long").as("ni"))
      val colsM = cells.groupBy("source").agg(sum(col("nij")).cast("long").as("nj"))
      val tot = cells.agg(sum(col("nij")).cast("long").as("n"))
      cells.join(broadcast(rowsM), "lang").join(broadcast(colsM), "source")
        .crossJoin(broadcast(tot))
        .withColumn("term", expr(
          "CAST(CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)" +
          " * ln(CAST(nij AS DOUBLE) * CAST(n AS DOUBLE)" +
          " / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE))) AS DECIMAL(18,9))"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_cells"),
          sum(col("term")).cast("double").as("mi_part"))
        .orderBy("lang")
    },
    Some(
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS nij FROM documents GROUP BY lang, source),
        |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
        |rows_m AS (SELECT lang, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY lang),
        |cols_m AS (SELECT source, CAST(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY source),
        |terms AS (
        |  SELECT c.lang, c.source,
        |    CAST(CAST(c.nij AS DOUBLE) / CAST(t.n AS DOUBLE)
        |      * ln(CAST(c.nij AS DOUBLE) * CAST(t.n AS DOUBLE)
        |           / (CAST(r.ni AS DOUBLE) * CAST(s.nj AS DOUBLE)))
        |      AS DECIMAL(18,9)) AS term
        |  FROM cells c JOIN rows_m r ON c.lang = r.lang
        |    JOIN cols_m s ON c.source = s.source CROSS JOIN tot t)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(term) AS DOUBLE) AS mi_part
        |FROM terms GROUP BY lang ORDER BY lang""".stripMargin))

  val all: Seq[QueryDef] = Seq(qChangepoint, qDecayScore, qMiCategorical)
}
