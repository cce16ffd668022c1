package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Hundred-fifth wave — MCC, Brier decomposition, and entropy rate.
  *
  *  - `q_mcc`: the multiclass Matthews correlation (Gorodkin 2004,
  *    R_K) of the kNN classifier's confusion matrix — cΣ−Σt·p over
  *    the √ of marginal products, every term from exact BIGINT
  *    confusion counts (one shared tree). The single-number
  *    classification score that survives class imbalance where
  *    accuracy lies; grades the same predictions q_knn_classify
  *    emits row by row.
  *  - `q_brier`: the Brier score with the Murphy (1973) three-way
  *    decomposition — reliability − resolution + uncertainty — for a
  *    binned activity-based purchase forecaster: per-bin counts and
  *    positives are exact integers, each decomposition term one
  *    shared tree, and the identity REL − RES + UNC = Brier is pinned
  *    in the spec. What q_ece_calibration's single gap number hides:
  *    is the forecaster uncalibrated or just undiscriminating?
  *  - `q_entropy_rate`: the entropy rate of the 5-state behavior
  *    Markov chain — H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ with π the empirical
  *    source-state occupancy of the SAME transition table (πᵢ·pᵢⱼ
  *    collapses to the exact ratio cᵢⱼ/N), ln over exact integer
  *    ratios. The
  *    compressibility bound for behavioral sequences: how many nats
  *    per event a session model could ever save.
  */
object R105Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_mcc ----------

  val qMcc = QueryDef("q_mcc",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label"),
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"))
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("t"), col("n2").as("qq"))
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
        .where(col("rn") <= 10)
        .groupBy("qid", "t", "clabel").agg(count(lit(1)).cast("long").as("v"))
      val wv = Window.partitionBy("qid").orderBy(col("v").desc, col("clabel"))
      val preds = votes.withColumn("vr", row_number().over(wv))
        .where(col("vr") === 1)
        .select(col("qid"), col("t"), col("clabel").as("p"))
      // MCC terms from the confusion counts
      val stats = preds.agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("t") === col("p"), 1L).otherwise(0L)).cast("long").as("c"))
      val margT = preds.groupBy("t").agg(count(lit(1)).cast("long").as("tk"))
      val margP = preds.groupBy(col("p").as("t"))
        .agg(count(lit(1)).cast("long").as("pk"))
      val cross = margT.join(margP, Seq("t"), "full_outer")
        .agg(sum(coalesce(col("tk"), lit(0L)) * coalesce(col("pk"), lit(0L)))
          .cast("long").as("stp"),
          sum(coalesce(col("tk"), lit(0L)) * coalesce(col("tk"), lit(0L)))
            .cast("long").as("stt"),
          sum(coalesce(col("pk"), lit(0L)) * coalesce(col("pk"), lit(0L)))
            .cast("long").as("spp"))
      stats.crossJoin(broadcast(cross))
        .select(col("n"), col("c"), col("stp"),
          round(expr(
            "(CAST(c AS DOUBLE) * CAST(n AS DOUBLE) - CAST(stp AS DOUBLE))" +
              " / (sqrt(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(spp AS DOUBLE))" +
              " * sqrt(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(stt AS DOUBLE)))"), 6)
            .as("mcc"))
    },
    Some(
      """WITH e AS (
        |  SELECT vec_id, embedding, CAST(label AS BIGINT) AS label FROM embeddings),
        |dots AS (
        |  SELECT q.vec_id AS qid, q.label AS t, c.vec_id AS cid,
        |    c.label AS clabel,
        |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS dot,
        |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) AS qq,
        |    sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS cc
        |  FROM e q, e c, generate_series(1, 64) s(i)
        |  WHERE q.vec_id < 20 AND c.vec_id >= 20
        |  GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT qid, t, clabel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 4) DESC, cid) AS rn
        |  FROM dots),
        |votes AS (
        |  SELECT qid, t, clabel, CAST(count(*) AS BIGINT) AS v
        |  FROM ranked WHERE rn <= 10 GROUP BY 1, 2, 3),
        |preds AS (
        |  SELECT qid, t, clabel AS p FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY v DESC, clabel)
        |      AS vr
        |    FROM votes) WHERE vr = 1),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN t = p THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM preds),
        |mt AS (SELECT t, CAST(count(*) AS BIGINT) AS tk FROM preds GROUP BY t),
        |mp AS (SELECT p AS t, CAST(count(*) AS BIGINT) AS pk FROM preds GROUP BY p),
        |cross_m AS (
        |  SELECT CAST(sum(coalesce(tk, 0) * coalesce(pk, 0)) AS BIGINT) AS stp,
        |    CAST(sum(coalesce(tk, 0) * coalesce(tk, 0)) AS BIGINT) AS stt,
        |    CAST(sum(coalesce(pk, 0) * coalesce(pk, 0)) AS BIGINT) AS spp
        |  FROM mt FULL OUTER JOIN mp USING (t))
        |SELECT n, c, stp,
        |  round((CAST(c AS DOUBLE) * CAST(n AS DOUBLE) - CAST(stp AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(spp AS DOUBLE))
        |    * sqrt(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(stt AS DOUBLE))), 6)
        |    AS mcc
        |FROM stats CROSS JOIN cross_m""".stripMargin))

  // ---------- q_brier ----------

  private val brierBins = 10

  val qBrier = QueryDef("q_brier",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("act"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      // "forecast" = activity decile rank mapped to (rank+0.5)/10.
      // r13 (VERDICT r12 task 1): the global row_number routes through
      // GlobalRank and the total count through zero-shuffle
      // GlobalFrameAgg (`count(*) OVER ()` — matching the oracle's
      // form), retiring the ENTITY whitelist entry. row_number is
      // tie-exact here (ORDER BY ends on the unique user_id).
      val w = Window.orderBy(col("act"), col("user_id"))
      val binned = RewriteGlobalRankWindows.force(per
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("nn", count(lit(1)).over().cast("long"))
        .withColumn("bin",
          least(lit(brierBins - 1L), ((col("rk") - 1L) * brierBins -
            ((col("rk") - 1L) * brierBins) % col("nn")) / col("nn")).cast("long"))
        .withColumn("f", expr(s"(CAST(bin AS DOUBLE) + 0.5) / $brierBins.0")))
      val cells = binned.groupBy("bin", "f")
        .agg(count(lit(1)).cast("long").as("nb"),
          sum(col("y")).cast("long").as("pb"))
      val g = cells.agg(sum(col("nb")).cast("long").as("n"),
        sum(col("pb")).cast("long").as("p"))
      val terms = cells.crossJoin(broadcast(g))
        .withColumn("rel_t", expr(
          "CAST(nb AS DOUBLE) * (f - CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE))" +
            " * (f - CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE))"))
        .withColumn("res_t", expr(
          "CAST(nb AS DOUBLE) * (CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE)" +
            " - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))" +
            " * (CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE)" +
            " - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))"))
      terms.agg(max(col("n")).as("n"), max(col("p")).as("p"),
          sum(col("rel_t")).as("rel_s"), sum(col("res_t")).as("res_s"))
        .select(col("n").cast("long").as("n"),
          round(expr("rel_s / CAST(n AS DOUBLE)"), 6).as("reliability"),
          round(expr("res_s / CAST(n AS DOUBLE)"), 6).as("resolution"),
          round(expr(
            "CAST(p AS DOUBLE) / CAST(n AS DOUBLE)" +
              " * (1.0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))"), 6)
            .as("uncertainty"),
          round(expr(
            "rel_s / CAST(n AS DOUBLE) - res_s / CAST(n AS DOUBLE)" +
              " + CAST(p AS DOUBLE) / CAST(n AS DOUBLE)" +
              " * (1.0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))"), 6).as("brier"))
    },
    Some(
      s"""WITH per AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS act,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS y
         |  FROM events GROUP BY user_id),
         |binned AS (
         |  SELECT *, CAST(least($brierBins - 1, ((rk - 1) * $brierBins
         |      - ((rk - 1) * $brierBins) % nn) / nn) AS BIGINT) AS bin
         |  FROM (
         |    SELECT user_id, y,
         |      row_number() OVER (ORDER BY act, user_id) AS rk,
         |      count(*) OVER () AS nn
         |    FROM per)),
         |cells AS (
         |  SELECT bin, (CAST(bin AS DOUBLE) + 0.5) / $brierBins.0 AS f,
         |    CAST(count(*) AS BIGINT) AS nb, CAST(sum(y) AS BIGINT) AS pb
         |  FROM binned GROUP BY bin),
         |g AS (SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(pb) AS BIGINT) AS p
         |  FROM cells),
         |terms AS (
         |  SELECT n, p,
         |    CAST(nb AS DOUBLE) * (f - CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE))
         |      * (f - CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE)) AS rel_t,
         |    CAST(nb AS DOUBLE) * (CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE)
         |      - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE)
         |      - CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) AS res_t
         |  FROM cells CROSS JOIN g)
         |SELECT max(n) AS n,
         |  round(sum(rel_t) / CAST(max(n) AS DOUBLE), 6) AS reliability,
         |  round(sum(res_t) / CAST(max(n) AS DOUBLE), 6) AS resolution,
         |  round(CAST(max(p) AS DOUBLE) / CAST(max(n) AS DOUBLE)
         |    * (1.0 - CAST(max(p) AS DOUBLE) / CAST(max(n) AS DOUBLE)), 6)
         |    AS uncertainty,
         |  round(sum(rel_t) / CAST(max(n) AS DOUBLE)
         |    - sum(res_t) / CAST(max(n) AS DOUBLE)
         |    + CAST(max(p) AS DOUBLE) / CAST(max(n) AS DOUBLE)
         |    * (1.0 - CAST(max(p) AS DOUBLE) / CAST(max(n) AS DOUBLE)), 6) AS brier
         |FROM terms""".stripMargin))

  // ---------- q_entropy_rate ----------

  val qEntropyRate = QueryDef("q_entropy_rate",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("e1"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .where(col("e2").isNotNull)
        .groupBy("e1", "e2").agg(count(lit(1)).cast("long").as("c"))
      val rowTot = trans.groupBy("e1").agg(sum(col("c")).cast("long").as("ct"))
      // π from the SAME transition mass (empirical state occupancy of
      // transition sources — the finite-sample stationary proxy)
      val tot = rowTot.agg(sum(col("ct")).cast("long").as("n"))
      val terms = trans.join(rowTot, "e1").crossJoin(broadcast(tot))
        // π_i·p_ij·ln p_ij with exact ratios: ct/n · c/ct · ln(c/ct)
        .withColumn("term", expr(
          "CAST(c AS DOUBLE) / CAST(n AS DOUBLE)" +
            " * ln(CAST(c AS DOUBLE) / CAST(ct AS DOUBLE))"))
      terms.agg(max(col("n")).as("n"),
          round(-sum(col("term")), 6).as("entropy_rate_nats"))
        .select(col("n").cast("long").as("n_transitions"),
          col("entropy_rate_nats"),
          round(expr("entropy_rate_nats / ln(2.0)"), 6).as("entropy_rate_bits"))
    },
    Some(
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS e2
        |  FROM events),
        |trans AS (
        |  SELECT e1, e2, CAST(count(*) AS BIGINT) AS c
        |  FROM seq WHERE e2 IS NOT NULL GROUP BY 1, 2),
        |rowtot AS (SELECT e1, CAST(sum(c) AS BIGINT) AS ct FROM trans GROUP BY e1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM rowtot),
        |terms AS (
        |  SELECT n,
        |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |      * ln(CAST(c AS DOUBLE) / CAST(ct AS DOUBLE)) AS term
        |  FROM trans t JOIN rowtot r ON r.e1 = t.e1 CROSS JOIN tot)
        |SELECT max(n) AS n_transitions,
        |  round(-sum(term), 6) AS entropy_rate_nats,
        |  round(round(-sum(term), 6) / ln(2.0), 6) AS entropy_rate_bits
        |FROM terms""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMcc, qBrier, qEntropyRate)
}
