package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.DedupOps
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fifty-fourth wave — survival analysis and sketch-quality audit.
  *
  *  - `q_survival_km`: the Kaplan-Meier time-to-first-error curve with
  *    censoring — a user "dies" at the hours from their first event to
  *    their first ERROR event; users who never error are censored (the
  *    right-censoring a naive failure rate ignores). The product
  *    estimator Π(1−dᵢ/nᵢ) is made order-independent the house way:
  *    each factor's ln is round(9)-quantized to DECIMAL, the running
  *    SUM rides the &#124;distinct lifetimes&#124;-sized aggregate, and
  *    one exp at the end recovers S(t).
  *  - `q_minhash_estimate`: the estimator-quality audit for MinHash —
  *    signature-agreement Jaccard estimate (matching seeds / 12, exact
  *    basis points) vs the TRUE Jaccard for every LSH candidate pair,
  *    with the absolute error — the evidence behind the signature-width
  *    choice; estimate and truth are both integer-exact.
  *
  * Scale design: KM reduces the corpus to per-user (lifetime,
  * churned) in one pass; everything after rides per-lifetime
  * aggregates. The estimate audit joins signature rows only for LSH
  * candidate pairs (bucket-bounded, never all-pairs).
  */
object R54Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_survival_km ----------

  val qSurvivalKm = QueryDef("q_survival_km",
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val span = ev.groupBy("user_id")
        .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"),
          min(when(col("event_type") === "error", col("us"))).as("err_us"))
      val users = span
        .selectExpr(
          "CASE WHEN err_us IS NOT NULL THEN (err_us - first_us) div 3600000000" +
            " ELSE (last_us - first_us) div 3600000000 END AS dur_d",
          "CASE WHEN err_us IS NOT NULL THEN 1 ELSE 0 END AS churned")
      val g = users.groupBy("dur_d")
        .agg(count(lit(1)).cast("long").as("entering"),
          sum(col("churned")).cast("long").as("d"))
      val wDesc = Window.orderBy(col("dur_d").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAsc = Window.orderBy("dur_d")
        .rowsBetween(Window.unboundedPreceding, 0)
      val km = g
        .withColumn("n_risk", sum(col("entering")).over(wDesc))
        // d = n_risk would put ln(0) = -inf into the factor; the curve
        // is reported up to the last PARTIAL-survival event time (the
        // standard presentation when S(t) hits 0 at the boundary)
        .where(col("d") > 0 && col("d") < col("n_risk"))
        .withColumn("lnf",
          expr("CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(18,9))"))
        .withColumn("cumln", sum(col("lnf")).over(wAsc))
        .selectExpr("dur_d", "d", "CAST(n_risk AS BIGINT) AS n_risk",
          "round(exp(CAST(cumln AS DOUBLE)), 4) AS surv")
        .orderBy("dur_d")
      km
    },
    Some(
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |span AS (SELECT user_id, min(us) AS first_us, max(us) AS last_us,
        |           min(CASE WHEN event_type = 'error' THEN us END) AS err_us
        |         FROM ev GROUP BY 1),
        |users AS (SELECT
        |    CASE WHEN err_us IS NOT NULL THEN (err_us - first_us) // 3600000000
        |         ELSE (last_us - first_us) // 3600000000 END AS dur_d,
        |    CASE WHEN err_us IS NOT NULL THEN 1 ELSE 0 END AS churned
        |  FROM span),
        |g AS (SELECT dur_d, CAST(count(*) AS BIGINT) AS entering,
        |        CAST(sum(churned) AS BIGINT) AS d
        |      FROM users GROUP BY 1),
        |risk AS (SELECT dur_d, d,
        |    CAST(sum(entering) OVER (ORDER BY dur_d DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
        |  FROM g),
        |km AS (SELECT dur_d, d, n_risk,
        |    CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lnf
        |  FROM risk WHERE d > 0 AND d < n_risk)
        |SELECT dur_d, d, n_risk,
        |  round(exp(CAST(sum(lnf) OVER (ORDER BY dur_d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 4) AS surv
        |FROM km ORDER BY dur_d""".stripMargin))

  // ---------- q_minhash_estimate ----------

  val qMinhashEstimate = QueryDef("q_minhash_estimate",
    (s, dir) => {
      val sh = ExtQueries.shingled(s, dir, 200).persist()
      // signatures feed banding AND both per-seed join sides, candidate
      // pairs feed the estimate AND the exact-Jaccard verify — both are
      // model-sized; pin so the signature aggregation runs once per
      // query, not once per consuming branch (r9 lesson)
      val sig = Queries.pin(
        DedupOps.minhashSignatures(sh, "doc_id", ExtQueries.numSeeds))
      val cand = Queries.pin(DedupOps.lshCandidatePairs(
        DedupOps.lshBands(sig, "doc_id", rowsPerBand = 4), "doc_id"))
      val sa = sig.select(col("doc_id").as("a"), col("seed"),
        col("minhash").as("ma"))
      val sb = sig.select(col("doc_id").as("b"), col("seed"),
        col("minhash").as("mb"))
      val est = cand.join(sa, "a").join(sb, Seq("b", "seed"))
        .groupBy("a", "b")
        .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("m"))
        .selectExpr("a", "b",
          s"(m * 10000) div ${ExtQueries.numSeeds} AS est_bp")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val exact = cand
        .join(sh.select(col("doc_id").as("a"), col("shingle")), "a")
        .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      est.join(exact, Seq("a", "b"), "left")
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .selectExpr("a", "b", "est_bp",
          "(coalesce(inter, 0) * 10000) div (na + nb - coalesce(inter, 0)) AS exact_bp",
          "abs(est_bp - (coalesce(inter, 0) * 10000) div (na + nb - coalesce(inter, 0))) AS err_bp")
        .orderBy("a", "b")
    },
    Some(
      s"""WITH ${ExtQueries.lshBandsSql(200)},
         |sa AS (SELECT doc_id AS a, seed, minhash AS ma FROM sig),
         |sb AS (SELECT doc_id AS b, seed, minhash AS mb FROM sig),
         |est AS (SELECT c.a, c.b,
         |    (CAST(sum(CASE WHEN ma = mb THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         |      // ${ExtQueries.numSeeds} AS est_bp
         |  FROM cand c JOIN sa ON sa.a = c.a
         |  JOIN sb ON sb.b = c.b AND sb.seed = sa.seed
         |  GROUP BY c.a, c.b),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |          FROM tri GROUP BY 1),
         |inter AS (SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS inter
         |  FROM cand c
         |  JOIN tri x ON x.doc_id = c.a
         |  JOIN tri y ON y.doc_id = c.b AND y.shingle = x.shingle
         |  GROUP BY c.a, c.b)
         |SELECT e.a, e.b, est_bp,
         |  (coalesce(i.inter, 0) * 10000) // (sa.n + sb.n - coalesce(i.inter, 0)) AS exact_bp,
         |  abs(est_bp - (coalesce(i.inter, 0) * 10000) // (sa.n + sb.n - coalesce(i.inter, 0))) AS err_bp
         |FROM est e
         |LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
         |JOIN sizes sa ON sa.doc_id = e.a
         |JOIN sizes sb ON sb.doc_id = e.b
         |ORDER BY e.a, e.b""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSurvivalKm, qMinhashEstimate)
}
