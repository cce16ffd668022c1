package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Forty-fourth wave — robust statistics and training-pair construction.
  *
  *  - `q_winsorize`: winsorized mean with EXACT rank thresholds — the
  *    robust-statistics preprocessing step (clip, don't drop, the tails
  *    before aggregating noisy values). The p01/p99 cut points come
  *    from integer rank arithmetic over the per-value count aggregate
  *    (the q_auc_exact discipline: the running window rides |distinct
  *    values| rows, never the corpus), clipping and sums stay on the
  *    integer cent lattice, and only the final mean divides.
  *  - `q_negative_sample`: deterministic negative sampling for
  *    contrastive/embedding training — per query vector, k negatives
  *    drawn from the OTHER labels by md5 priority (reproducible: rerun
  *    ⇒ byte-identical training pairs, the q_weighted_sample
  *    discipline). The label-mismatch gate is the standard "no false
  *    negatives from the positive class" guard.
  *
  * Scale design: winsorize needs ONE map-side-combined pass to the
  * per-value aggregate plus a broadcast of two scalar thresholds back
  * over that aggregate — the corpus is never globally sorted. Negative
  * sampling broadcasts the query side and scans candidates once; the
  * per-query rank window orders a candidate shortlist (at production
  * scale, pre-bucketed by hash so each query ranks a bounded slice).
  */
object R44Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_winsorize ----------

  val qWinsorize = QueryDef("q_winsorize",
    (s, dir) => RewriteGlobalRankWindows.force {
      val g = t(s, dir, "events")
        .select(expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
        .groupBy("cents").agg(count(lit(1)).cast("long").as("c"))
      val w = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g.withColumn("cum", sum(col("c")).over(w))
      val scal = cum.agg(
        sum(col("c")).as("n"),
        expr("sum(c) div 100").as("k"))
      val thr = cum.crossJoin(broadcast(scal))
        .agg(
          min(when(col("cum") >= col("k") + 1, col("cents"))).as("lo"),
          min(when(col("cum") >= col("n") - col("k"), col("cents"))).as("hi"),
          max(col("n")).as("n"), max(col("k")).as("k"))
      cum.crossJoin(broadcast(thr))
        .agg(
          max(col("n")).as("n"), max(col("k")).as("k"),
          max(col("lo")).as("lo_cents"), max(col("hi")).as("hi_cents"),
          sum(when(col("cents") < col("lo"), col("c")).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("cents") > col("hi"), col("c")).otherwise(0L))
            .as("n_clip_hi"),
          sum(col("c") * when(col("cents") < col("lo"), col("lo"))
            .when(col("cents") > col("hi"), col("hi"))
            .otherwise(col("cents"))).as("csum"))
        .selectExpr("n", "k", "lo_cents", "hi_cents", "n_clip_lo",
          "n_clip_hi",
          "CAST(csum AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS wins_mean")
    },
    Some(
      """WITH g AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS cents,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1),
        |cum AS (SELECT cents, c,
        |          CAST(sum(c) OVER (ORDER BY cents
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |        FROM g),
        |scal AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |           CAST(sum(c) // 100 AS BIGINT) AS k FROM cum),
        |thr AS (SELECT min(CASE WHEN cum >= k + 1 THEN cents END) AS lo,
        |          min(CASE WHEN cum >= n - k THEN cents END) AS hi,
        |          max(n) AS n, max(k) AS k
        |        FROM cum CROSS JOIN scal)
        |SELECT max(n) AS n, max(k) AS k,
        |  max(lo) AS lo_cents, max(hi) AS hi_cents,
        |  CAST(sum(CASE WHEN cents < lo THEN c ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(sum(CASE WHEN cents > hi THEN c ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(sum(c * CASE WHEN cents < lo THEN lo
        |                    WHEN cents > hi THEN hi
        |                    ELSE cents END) AS DOUBLE)
        |    / (CAST(max(n) AS DOUBLE) * 100.0) AS wins_mean
        |FROM cum CROSS JOIN thr""".stripMargin))

  // ---------- q_negative_sample ----------

  private val NegK = 4

  val qNegativeSample = QueryDef("q_negative_sample",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
      val cand = emb.where(col("vec_id") < 300)
        .select(col("vec_id").as("neg_id"), col("label"))
      cand.crossJoin(broadcast(q))
        .where(col("label") =!= col("qlabel"))
        .withColumn("h", md5(concat(col("query_id").cast("string"),
          lit(":"), col("neg_id").cast("string"))))
        .withColumn("rk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("h"), col("neg_id"))))
        .where(col("rk") <= NegK)
        .select(col("query_id"), col("rk"), col("neg_id"), col("label"))
        .orderBy("query_id", "rk")
    },
    Some(
      s"""WITH q AS (SELECT vec_id AS query_id, label AS qlabel
         |           FROM embeddings WHERE vec_id < 10),
         |cand AS (SELECT vec_id AS neg_id, label
         |         FROM embeddings WHERE vec_id < 300),
         |scored AS (SELECT q.query_id, c.neg_id, c.label,
         |             md5(CAST(q.query_id AS VARCHAR) || ':'
         |               || CAST(c.neg_id AS VARCHAR)) AS h
         |           FROM cand c CROSS JOIN q
         |           WHERE c.label <> q.qlabel),
         |ranked AS (SELECT query_id, neg_id, label,
         |             CAST(row_number() OVER (PARTITION BY query_id
         |               ORDER BY h, neg_id) AS INTEGER) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neg_id, label
         |FROM ranked WHERE rk <= $NegK
         |ORDER BY query_id, rk""".stripMargin))

  val all: Seq[QueryDef] = Seq(qWinsorize, qNegativeSample)
}
