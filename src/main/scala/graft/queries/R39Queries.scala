package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Thirty-ninth wave — link-graph centrality and classifier evaluation.
  *
  *  - `q_hits`: Kleinberg HITS hubs/authorities over the crawl-style
  *    link graph (the directory-vs-target split PageRank's single score
  *    conflates) — fixed-round UNNORMALIZED power iteration so every
  *    value is an exact integer (see [[graft.ext.GraphOps.hits]]);
  *    the oracle unrolls the same two rounds.
  *  - `q_auc_exact`: exact ROC AUC (Mann-Whitney U with tie-pair
  *    half-credit) for a quality-classifier label over event values —
  *    the eval every learned data-quality filter needs. Computed in
  *    rank-free form: per-score (pos, neg) counts first (ONE map-side-
  *    combined corpus aggregation), then the running-negative window
  *    rides the |distinct scores|-sized aggregate — never a global
  *    window over the corpus (a naive rank() formulation single-
  *    partitions every row). 2U and the denominator stay integers;
  *    the final AUC is one IEEE division.
  */
object R39Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_hits ----------

  val qHits = QueryDef("q_hits",
    (s, dir) => {
      val ev = t(s, dir, "events")
      // pin the (<=40x40) distinct edge set: nodes reads it twice and
      // the iterative solver several more times — without it each
      // branch re-runs the full-events distinct (r9 lesson)
      val e = Queries.pin(ev.select((col("user_id") % 40).as("src"),
        (col("event_id") % 40).as("dst"))
        .where(col("src") =!= col("dst")).distinct())
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      graft.ext.GraphOps.hits(s, e, nodes, rounds = 2)
        .select(col("node"), col("auth").cast("long").as("auth"),
          col("hub").cast("long").as("hub"))
        .orderBy("node")
    },
    Some(
      """WITH e AS (SELECT DISTINCT user_id % 40 AS src, event_id % 40 AS dst
        |           FROM events WHERE user_id % 40 <> event_id % 40),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM n),
        |a1 AS (SELECT n.node, coalesce(s.s, 0) AS a FROM n LEFT JOIN (
        |         SELECT e.dst AS node, sum(h.h) AS s
        |         FROM e JOIN h0 h ON h.node = e.src GROUP BY 1) s
        |       ON s.node = n.node),
        |h1 AS (SELECT n.node, coalesce(s.s, 0) AS h FROM n LEFT JOIN (
        |         SELECT e.src AS node, sum(a.a) AS s
        |         FROM e JOIN a1 a ON a.node = e.dst GROUP BY 1) s
        |       ON s.node = n.node),
        |a2 AS (SELECT n.node, coalesce(s.s, 0) AS a FROM n LEFT JOIN (
        |         SELECT e.dst AS node, sum(h.h) AS s
        |         FROM e JOIN h1 h ON h.node = e.src GROUP BY 1) s
        |       ON s.node = n.node),
        |h2 AS (SELECT n.node, coalesce(s.s, 0) AS h FROM n LEFT JOIN (
        |         SELECT e.src AS node, sum(a.a) AS s
        |         FROM e JOIN a2 a ON a.node = e.dst GROUP BY 1) s
        |       ON s.node = n.node)
        |SELECT n.node, CAST(a2.a AS BIGINT) AS auth, CAST(h2.h AS BIGINT) AS hub
        |FROM n JOIN a2 ON a2.node = n.node JOIN h2 ON h2.node = n.node
        |ORDER BY n.node""".stripMargin))

  // ---------- q_auc_exact ----------

  /** Verbatim-shared final projection over (u2, np, nn). */
  private val aucSelect: Seq[String] = Seq(
    "CAST(np AS BIGINT) AS n_pos",
    "CAST(nn AS BIGINT) AS n_neg",
    "CAST(u2 AS BIGINT) AS num",
    "CAST(2 * np * nn AS BIGINT) AS den",
    "CAST(u2 AS DOUBLE) / CAST(2 * np * nn AS DOUBLE) AS auc")

  val qAucExact = QueryDef("q_auc_exact",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("value").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("label"))
      val g = ev.groupBy("score").agg(
        sum(col("label")).as("cp"),
        sum(lit(1L) - col("label")).as("cn"))
      // the natural delayed-end frame routes distributed since late
      // r14: UNBOUNDED .. 1 PRECEDING composes as lag-of-running-sum
      // on one exchange (the r14 delayed/extended rewrite); the
      // VALUE-DOMAIN whitelist entry this query held is retired
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val below = RewriteGlobalRankWindows.force(
        g.withColumn("below", coalesce(sum(col("cn")).over(w), lit(0L))))
      below.agg(
          sum(col("cp") * (col("below") * 2 + col("cn"))).as("u2"),
          sum(col("cp")).as("np"),
          sum(col("cn")).as("nn"))
        .selectExpr(aucSelect: _*)
    },
    Some(
      s"""WITH ev AS (SELECT value AS score,
         |              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
         |            FROM events),
         |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS cp,
         |        CAST(sum(1 - label) AS BIGINT) AS cn
         |      FROM ev GROUP BY score),
         |w AS (SELECT cp, cn,
         |        coalesce(sum(cn) OVER (ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         |      FROM g),
         |agg AS (SELECT sum(cp * (below * 2 + cn)) AS u2,
         |          sum(cp) AS np, sum(cn) AS nn FROM w)
         |SELECT ${aucSelect.mkString(",\n  ")}
         |FROM agg""".stripMargin))

  val all: Seq[QueryDef] = Seq(qHits, qAucExact)
}
