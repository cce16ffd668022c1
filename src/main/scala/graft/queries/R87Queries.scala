package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Eighty-seventh wave — conformal prediction, off-policy evaluation,
  * and kNN classification.
  *
  *  - `q_conformal`: split conformal prediction (Vovk et al. 2005;
  *    the distribution-free coverage guarantee): per event type, the
  *    calibration half (even event ids) yields the ⌈0.9(n+1)⌉-th order
  *    statistic of the value scores as the 90% upper bound q̂, and the
  *    held-out half reports its EXACT empirical coverage in basis
  *    points — finite-sample valid with no distributional assumption.
  *    The rank selection is a per-group window (partitioned, bounded
  *    groups); everything is integer cents.
  *  - `q_ips_eval`: off-policy evaluation of a stochastic target
  *    policy from uniformly-logged feedback — the IPS estimator
  *    (Horvitz-Thompson 1952) Σ π(aᵢ)rᵢ/p̂(aᵢ)/n and its
  *    self-normalized SNIPS variant (Swaminathan & Joachims 2015),
  *    with empirical propensities p̂(a) = nₐ/n. All inputs are exact
  *    integer counts; the two estimates are shared IEEE expression
  *    trees (q_cuped discipline). The report that grades a new
  *    ranking policy BEFORE an online test.
  *  - `q_knn_classify`: k = 10 nearest-neighbor majority-vote
  *    classification of the held-out queries (vec_id < 20) against the
  *    labeled corpus — cosine ranking under the q_knn_cosine parity
  *    discipline, vote ties broken (count desc, label asc), per-query
  *    verdicts plus the exact accuracy in basis points. The
  *    brute-force eval that grades q_ann_ivfpq's shortlists as a
  *    CLASSIFIER, not just by recall.
  */
object R87Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_conformal ----------

  val qConformal = QueryDef("q_conformal",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("c"))
      val cal = ev.where(col("event_id") % 2 === 0)
      val w = Window.partitionBy("event_type").orderBy("c", "event_id")
      val ranked = cal
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n_cal",
          count(lit(1)).over(Window.partitionBy("event_type")).cast("long"))
        // k = ⌈0.9(n+1)⌉ via integer ceil; clamp to n (finite interval)
        .withColumn("k", least(col("n_cal"),
          expr("CAST((9 * (n_cal + 1) + 9 - (9 * (n_cal + 1) + 9) % 10) / 10 AS BIGINT)")))
      val qhat = ranked.where(col("rk") === col("k"))
        .select(col("event_type"), col("n_cal"), col("c").as("q_hat_c"))
      val test = ev.where(col("event_id") % 2 === 1)
      test.join(broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(max(col("n_cal")).as("n_cal"), max(col("q_hat_c")).as("q_hat_c"),
          count(lit(1)).cast("long").as("n_test"),
          sum(when(col("c") <= col("q_hat_c"), 1L).otherwise(0L)).cast("long")
            .as("n_covered"))
        .select(col("event_type"), col("n_cal").cast("long").as("n_cal"),
          col("q_hat_c").cast("long").as("q_hat_c"), col("n_test"),
          col("n_covered"),
          ((col("n_covered") * 10000L - (col("n_covered") * 10000L)
            % col("n_test")) / col("n_test")).cast("long").as("cover_bp"))
        .orderBy("event_type")
    },
    Some(
      """WITH ev AS (
        |  SELECT event_type, event_id, CAST(round(value * 100.0) AS BIGINT) AS c
        |  FROM events),
        |cal AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n_cal
        |  FROM ev WHERE event_id % 2 = 0),
        |qhat AS (
        |  SELECT event_type, CAST(n_cal AS BIGINT) AS n_cal, c AS q_hat_c
        |  FROM cal
        |  WHERE rk = least(n_cal,
        |    CAST((9 * (n_cal + 1) + 9 - (9 * (n_cal + 1) + 9) % 10) / 10 AS BIGINT)))
        |SELECT t.event_type, max(n_cal) AS n_cal,
        |  CAST(max(q_hat_c) AS BIGINT) AS q_hat_c,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN t.c <= q.q_hat_c THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST((sum(CASE WHEN t.c <= q.q_hat_c THEN 1 ELSE 0 END) * 10000
        |    - (sum(CASE WHEN t.c <= q.q_hat_c THEN 1 ELSE 0 END) * 10000) % count(*))
        |    / count(*) AS BIGINT) AS cover_bp
        |FROM ev t JOIN qhat q ON q.event_type = t.event_type
        |WHERE t.event_id % 2 = 1
        |GROUP BY t.event_type ORDER BY t.event_type""".stripMargin))

  // ---------- q_ips_eval ----------

  /** Target policy in tenths — one source of truth. */
  private val targetPolicy: Seq[(String, Int)] = Seq(
    ("click", 5), ("view", 3), ("signup", 2), ("error", 0), ("purchase", 0))

  private val pi10Sql: String =
    "CASE event_type " + targetPolicy.map { case (a, p) =>
      s"WHEN '$a' THEN $p" }.mkString(" ") + " ELSE 0 END"

  val qIpsEval = QueryDef("q_ips_eval",
    (s, dir) => {
      val logs = Tables.events(s, dir)
        .select(col("event_type"),
          when(expr("CAST(round(value * 100.0) AS BIGINT)") >= 5000L, 1L)
            .otherwise(0L).as("r"),
          expr(pi10Sql).cast("long").as("pi10"))
      val byAction = logs.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_a"),
          sum(col("r") * col("pi10")).cast("long").as("rp"),
          sum(col("pi10")).cast("long").as("p"))
      val n = logs.agg(count(lit(1)).cast("long").as("n"))
      // Σ π r / p̂ = Σ_a (rp_a/10) · n/n_a ; SNIPS denominator likewise
      byAction.crossJoin(broadcast(n))
        .agg(max(col("n")).as("n"),
          round(expr("sum(CAST(rp AS DOUBLE) / 10.0 * CAST(n AS DOUBLE)" +
            " / CAST(n_a AS DOUBLE)) / CAST(max(n) AS DOUBLE)"), 6).as("v_ips"),
          round(expr("sum(CAST(rp AS DOUBLE) / 10.0 * CAST(n AS DOUBLE)" +
            " / CAST(n_a AS DOUBLE)) / sum(CAST(p AS DOUBLE) / 10.0" +
            " * CAST(n AS DOUBLE) / CAST(n_a AS DOUBLE))"), 6).as("v_snips"))
        .select(col("n").cast("long").as("n"), col("v_ips"), col("v_snips"))
    },
    Some(
      s"""WITH logs AS (
         |  SELECT event_type,
         |    CASE WHEN CAST(round(value * 100.0) AS BIGINT) >= 5000 THEN 1 ELSE 0 END AS r,
         |    CAST($pi10Sql AS BIGINT) AS pi10
         |  FROM events),
         |by_action AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_a,
         |    CAST(sum(r * pi10) AS BIGINT) AS rp,
         |    CAST(sum(pi10) AS BIGINT) AS p
         |  FROM logs GROUP BY event_type),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM logs)
         |SELECT max(n) AS n,
         |  round(sum(CAST(rp AS DOUBLE) / 10.0 * CAST(n AS DOUBLE)
         |    / CAST(n_a AS DOUBLE)) / CAST(max(n) AS DOUBLE), 6) AS v_ips,
         |  round(sum(CAST(rp AS DOUBLE) / 10.0 * CAST(n AS DOUBLE)
         |    / CAST(n_a AS DOUBLE)) / sum(CAST(p AS DOUBLE) / 10.0
         |    * CAST(n AS DOUBLE) / CAST(n_a AS DOUBLE)), 6) AS v_snips
         |FROM by_action CROSS JOIN nn""".stripMargin))

  // ---------- q_knn_classify ----------

  private val knnK = 10

  val qKnnClassify = QueryDef("q_knn_classify",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label"),
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"))
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("true_label"), col("n2").as("qq"))
      val corpus = e.where(col("vec_id") >= 20)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("label").as("clabel"), col("n2").as("cc"))
      val scored = corpus.join(broadcast(q))
        .withColumn("dot", expr("aggregate(zip_with(qe, ce," +
          " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
        .withColumn("cos", round(col("dot") / (sqrt(col("qq")) * sqrt(col("cc"))), 4))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
      val votes = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= knnK)
        .groupBy("qid", "true_label", "clabel")
        .agg(count(lit(1)).cast("long").as("v"))
      val wv = Window.partitionBy("qid").orderBy(col("v").desc, col("clabel"))
      votes.withColumn("vr", row_number().over(wv))
        .where(col("vr") === 1)
        .select(col("qid"), col("true_label"), col("clabel").as("pred_label"),
          col("v").as("n_votes"),
          when(col("true_label") === col("clabel"), 1L).otherwise(0L)
            .as("correct"))
        .orderBy("qid")
    },
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, embedding, CAST(label AS BIGINT) AS label FROM embeddings),
         |dots AS (
         |  SELECT q.vec_id AS qid, q.label AS true_label,
         |    c.vec_id AS cid, c.label AS clabel,
         |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS dot,
         |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) AS qq,
         |    sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS cc
         |  FROM e q, e c, generate_series(1, 64) t(i)
         |  WHERE q.vec_id < 20 AND c.vec_id >= 20
         |  GROUP BY 1, 2, 3, 4),
         |ranked AS (
         |  SELECT qid, true_label, clabel,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 4) DESC, cid) AS rn
         |  FROM dots),
         |votes AS (
         |  SELECT qid, true_label, clabel, CAST(count(*) AS BIGINT) AS v
         |  FROM ranked WHERE rn <= $knnK GROUP BY 1, 2, 3),
         |winner AS (
         |  SELECT qid, true_label, clabel, v,
         |    row_number() OVER (PARTITION BY qid ORDER BY v DESC, clabel) AS vr
         |  FROM votes)
         |SELECT qid, true_label, clabel AS pred_label, v AS n_votes,
         |  CAST(CASE WHEN true_label = clabel THEN 1 ELSE 0 END AS BIGINT) AS correct
         |FROM winner WHERE vr = 1
         |ORDER BY qid""".stripMargin))

  val all: Seq[QueryDef] = Seq(qConformal, qIpsEval, qKnnClassify)
}
