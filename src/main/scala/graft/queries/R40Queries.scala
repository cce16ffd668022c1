package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fortieth wave — ranking quality, multi-touch credit, change-points.
  *
  *  - `q_ndcg`: nDCG@10 of the BM25 ranking against graded relevance
  *    (matched-query-term count) — the ranking-quality metric that
  *    closes the retrieval loop opened by `q_bm25` (score → rank →
  *    how good is the rank). Per-position gains (2^rel−1)/log2(i+1)
  *    are round(6)-quantized to DECIMAL before summing; IDCG ranks the
  *    corpus-wide relevance pool, not just the retrieved list.
  *  - `q_attribution_linear`: linear multi-touch attribution — each
  *    purchase's value split equally across its 24h-lookback touch
  *    events (the multi-touch counterpart of `q_attribution`'s
  *    last-touch rule). Per-touch credit is ONE IEEE division
  *    round(6)-quantized to DECIMAL, so per-channel totals are
  *    order-independent and engine-exact.
  *  - `q_cusum`: CUSUM change-point detection over the daily revenue
  *    series with ZERO floating point: the classic Σ(x_i − μ) statistic
  *    cross-multiplied by n onto the cent lattice — C_d = n·P_d − i·T
  *    (P prefix sum, T total, all BIGINT) — so the argmax day is
  *    bit-stable across engines and partitionings.
  *
  * Scale design: the attribution join keys on user_id (per-user event
  * lists are bounded) and the per-purchase touch count is a
  * purchase-keyed window — no corpus×corpus pair space; CUSUM's running
  * window rides the |days|-sized daily aggregate, never raw events;
  * nDCG windows order a top-k result list.
  */
object R40Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_ndcg ----------

  /** Verbatim-shared per-position gain over (rel, rk). */
  private val gainSql: String =
    "CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0) / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0)), 6) AS DECIMAL(18,6))"

  private val ndcgSelect: Seq[String] = Seq(
    "CAST(10 AS INTEGER) AS k",
    "CAST(dcg AS DOUBLE) AS dcg",
    "CAST(idcg AS DOUBLE) AS idcg",
    "CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE) AS ndcg")

  val qNdcg = QueryDef("q_ndcg",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val scored = R37Queries.bm25(s, dir)
      val ranked = scored
        .withColumn("rk",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .where(col("rk") <= 10)
        .select(col("n_terms").as("rel"), col("rk"))
      val ideal = scored
        .withColumn("rk",
          row_number().over(Window.orderBy(col("n_terms").desc, col("doc_id"))))
        .where(col("rk") <= 10)
        .select(col("n_terms").as("rel"), col("rk"))
      ranked.agg(sum(expr(gainSql)).as("dcg"))
        .crossJoin(ideal.agg(sum(expr(gainSql)).as("idcg")))
        .selectExpr(ndcgSelect: _*)
    },
    Some(
      s"""WITH ${R37Queries.bm25Sql},
         |ranked AS (SELECT n_terms AS rel,
         |             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
         |           FROM bm25 QUALIFY rk <= 10),
         |ideal AS (SELECT n_terms AS rel,
         |            row_number() OVER (ORDER BY n_terms DESC, doc_id) AS rk
         |          FROM bm25 QUALIFY rk <= 10),
         |d AS (SELECT sum($gainSql) AS dcg FROM ranked),
         |i AS (SELECT sum($gainSql) AS idcg FROM ideal)
         |SELECT ${ndcgSelect.mkString(",\n  ")}
         |FROM d CROSS JOIN i""".stripMargin))

  // ---------- q_attribution_linear ----------

  /** Verbatim-shared per-touch credit over (value, n). */
  private val creditSql: String =
    "CAST(round(value / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6))"

  val qAttributionLinear = QueryDef("q_attribution_linear",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"), col("value"))
      val tch = ev.where(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("t_ts"),
          col("event_type").as("t_type"))
      val j = p.join(tch, Seq("user_id"))
        .where(col("t_ts") < col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
      val credited = j
        .withColumn("n", count(lit(1)).over(Window.partitionBy("p_id")))
        .withColumn("credit", expr(creditSql))
      credited.groupBy("t_type")
        .agg(count(lit(1)).cast("long").as("n_touches"),
          sum(col("credit")).as("credit"))
        .select(col("t_type"), col("n_touches"),
          col("credit").cast("double").as("credit"))
        .orderBy("t_type")
    },
    Some(
      s"""WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts, value
         |           FROM events WHERE event_type = 'purchase'),
         |tch AS (SELECT user_id, ts AS t_ts, event_type AS t_type
         |        FROM events WHERE event_type IN ('view', 'click')),
         |j AS (SELECT p.p_id, p.value, tch.t_type
         |      FROM p JOIN tch ON p.user_id = tch.user_id
         |      WHERE tch.t_ts < p.p_ts
         |        AND tch.t_ts >= p.p_ts - INTERVAL 24 HOUR),
         |credited AS (SELECT t_type, $creditSql AS credit
         |             FROM (SELECT p_id, value, t_type,
         |                     CAST(count(*) OVER (PARTITION BY p_id) AS BIGINT) AS n
         |                   FROM j))
         |SELECT t_type, CAST(count(*) AS BIGINT) AS n_touches,
         |  CAST(sum(credit) AS DOUBLE) AS credit
         |FROM credited GROUP BY t_type ORDER BY t_type""".stripMargin))

  // ---------- q_cusum ----------

  val qCusum = QueryDef("q_cusum",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = Tables.events(s, dir)
      val daily = ev
        .select(to_date(col("ts")).as("day"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
        .groupBy("day").agg(sum(col("cents")).as("x"))
      val wOrd = Window.orderBy("day")
      val wAll = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val c = daily
        .withColumn("i", row_number().over(wOrd).cast("long"))
        .withColumn("p", sum(col("x")).over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("t", sum(col("x")).over(wAll))
        .withColumn("n", count(lit(1)).over(wAll).cast("long"))
        .withColumn("cusum", col("n") * col("p") - col("i") * col("t"))
      c.withColumn("mx", max(abs(col("cusum"))).over(wAll))
        .select(col("day"), col("x"), col("cusum"),
          (abs(col("cusum")) === col("mx")).as("is_changepoint"))
        .orderBy("day")
    },
    Some(
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
        |       FROM events GROUP BY 1),
        |c AS (SELECT day, x,
        |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |        CAST(sum(x) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
        |        CAST(sum(x) OVER () AS BIGINT) AS t,
        |        CAST(count(*) OVER () AS BIGINT) AS n
        |      FROM daily),
        |cu AS (SELECT day, x, n * p - i * t AS cusum FROM c)
        |SELECT day, x, cusum,
        |  abs(cusum) = max(abs(cusum)) OVER () AS is_changepoint
        |FROM cu ORDER BY day""".stripMargin))

  val all: Seq[QueryDef] = Seq(qNdcg, qAttributionLinear, qCusum)
}
