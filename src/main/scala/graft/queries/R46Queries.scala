package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Forty-sixth wave — personalized PageRank.
  *
  * `q_ppr`: topic-sensitive rank over the crawl-style link graph with
  * restart mass pinned to a 3-node seed set
  * ([[graft.ext.GraphOps.pageRankPersonalized]]) — the focused-crawl
  * prioritizer ("which frontier pages matter from HERE"), beside the
  * global q_pagerank. Two integer-exact rounds, oracle-unrolled; nodes
  * unreachable from the seeds stay at exactly 0.
  */
object R46Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val qPpr = QueryDef("q_ppr",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val e = ev.select((col("user_id") % 40).as("src"),
        (col("event_id") % 40).as("dst"))
        .where(col("src") =!= col("dst")).distinct()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      val seeds = nodes.where(col("node") < 3)
      graft.ext.GraphOps.pageRankPersonalized(s, e, nodes, seeds,
        iterations = 2).orderBy("node")
    },
    Some(
      """WITH e AS (SELECT DISTINCT user_id % 40 AS src, event_id % 40 AS dst
        |           FROM events WHERE user_id % 40 <> event_id % 40),
        |n0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |n AS (SELECT node, CASE WHEN node < 3 THEN 1 ELSE 0 END AS is_seed
        |      FROM n0),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(is_seed * 1000000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.dst AS node, sum(r.r // d.deg) AS c
        |       FROM e JOIN r0 r ON r.node = e.src JOIN d ON d.src = e.src GROUP BY 1),
        |r1 AS (SELECT n.node,
        |         CAST(n.is_seed * 150000000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
        |       FROM n LEFT JOIN c1 c ON c.node = n.node),
        |c2 AS (SELECT e.dst AS node, sum(r.r // d.deg) AS c
        |       FROM e JOIN r1 r ON r.node = e.src JOIN d ON d.src = e.src GROUP BY 1),
        |r2 AS (SELECT n.node,
        |         CAST(n.is_seed * 150000000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
        |       FROM n LEFT JOIN c2 c ON c.node = n.node)
        |SELECT node, r AS rank_scaled FROM r2 ORDER BY node""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPpr)
}
