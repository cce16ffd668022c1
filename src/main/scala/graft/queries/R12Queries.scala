package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Twelfth wave — analyst patterns:
  *
  *  - `q_skyline`: Pareto frontier (cheapest-for-the-size parts) via a
  *    correlated NOT EXISTS dominance test — Catalyst decorrelates it
  *    to an anti-join, no per-row re-execution;
  *  - `q_mom_growth`: month-over-month revenue growth (lag window over
  *    cents-BIGINT-exact monthly sums; the percent change divides
  *    DOUBLEs with the identical expression on both engines);
  *  - `q_rfm`: RFM customer segmentation — recency/frequency/monetary
  *    quartiles by ntile over total orders with a unique tie-break
  *    (ntile is only deterministic under a total order), then segment
  *    sizes and value.
  */
object R12Queries {

  private def sqlQuery(name: String, sql: String, tables: String*): QueryDef =
    QueryDef(name,
      (s, dir) => {
        tables.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
        s.sql(sql)
      },
      Some(sql))

  private val skylineSql =
    """SELECT p_partkey, p_retailprice, p_size
      |FROM part p
      |WHERE p_partkey < 2000 AND NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_partkey < 2000
      |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_partkey""".stripMargin

  val qSkyline = sqlQuery("q_skyline", skylineSql, "part")

  // Monthly revenue accumulates on the exact cents-BIGINT lattice and
  // only the FINAL projection divides into DOUBLE — no decimal type
  // anywhere, so no engine-release decimal surface (r9: the guard's R5
  // rule bans decimal-typed hashed columns; the previous shape summed
  // DECIMAL(18,2) before the DOUBLE finalize).
  private val momSql =
    """WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      |         CAST(month(o_orderdate) AS BIGINT) AS m,
      |         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1, 2),
      |g AS (SELECT y, m, CAST(rev_c AS DOUBLE) / 100.0 AS rev,
      |        CAST(lag(rev_c) OVER (ORDER BY y, m) AS DOUBLE) / 100.0 AS prev
      |      FROM m)
      |SELECT y, m, rev,
      |  CASE WHEN prev IS NULL THEN NULL
      |       ELSE (rev - prev) / prev * 100.0 END AS pct_change
      |FROM g ORDER BY y, m""".stripMargin

  // r15: the (year, month)-keyed lag routes through the distributed
  // shift operator (CALENDAR whitelist retirement) — same SQL text on
  // both engines, force applied over the parsed plan
  val qMomGrowth = QueryDef("q_mom_growth",
    (s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      RewriteGlobalRankWindows.force(s.sql(momSql))
    },
    Some(momSql))

  private val rfmSparkSql =
    """WITH base AS (
      |  SELECT o_custkey,
      |    CAST(datediff(DATE '2001-09-01', max(CAST(o_orderdate AS DATE))) AS BIGINT) AS recency,
      |    CAST(count(*) AS BIGINT) AS frequency,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders GROUP BY 1),
      |scored AS (SELECT o_custkey, recency, frequency, CAST(monetary AS DOUBLE) AS monetary,
      |    CAST(ntile(4) OVER (ORDER BY recency, o_custkey) AS INT) AS r_score,
      |    CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
      |    CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
      |  FROM base)
      |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS segment_value
      |FROM scored GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin

  val qRfm = QueryDef("q_rfm",
    (s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      // r13 (VERDICT r12 task 1): the ENTITY-class whitelist entry is
      // retired — the three global ntile windows route through the
      // distributed GlobalRank family instead of a reviewed
      // single-partition WindowExec. ntile is tie-exact here (both
      // ORDER BYs end on the unique o_custkey), so the oracle hash is
      // unchanged.
      RewriteGlobalRankWindows.force(s.sql(rfmSparkSql))
    },
    Some(
      """WITH base AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)), DATE '2001-09-01') AS BIGINT) AS recency,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |scored AS (SELECT o_custkey, recency, frequency, CAST(monetary AS DOUBLE) AS monetary,
        |    CAST(ntile(4) OVER (ORDER BY recency, o_custkey) AS INT) AS r_score,
        |    CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
        |    CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
        |  FROM base)
        |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS segment_value
        |FROM scored GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSkyline, qMomGrowth, qRfm)
}
