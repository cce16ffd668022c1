package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Sixty-fourth wave — TPC-H suite completion: the five query shapes
  * R5Queries left out because the synthetic star schema has no
  * `partsupp` table and no shipmode/commitdate/receiptdate columns
  * (Q2, Q11, Q12, Q20, Q21). This wave closes them with documented
  * stand-ins, so every one of the 22 TPC-H shapes now has an adapted,
  * oracle-checked form:
  *
  *  - **pseudo-partsupp**: derived once from lineitem as the distinct
  *    (partkey, suppkey) pairs — `ps_availqty` = 10× the pair's
  *    lineitem count, `ps_supplycost_c` = a deterministic integer-cent
  *    formula on the keys (`(p*31 + s*17) % 10000`) — so both engines
  *    rebuild the identical table from the same scan.
  *  - Q2  min-cost supplier per part in a region: correlated scalar
  *    `min()` subquery → decorrelates to an aggregated broadcast join.
  *  - Q11 important-stock value share: two-pass aggregate with a
  *    scalar-subquery total; the >0.1% share gate rides integer
  *    cross-multiplication (`sum*1000 > total`), not a float fraction.
  *  - Q12 shipmode priority: shipmode stands in as a deterministic
  *    `l_linenumber % 3` bucket, late-delivery as `l_returnflag = 'R'`
  *    (same stand-in discipline as Q4's EXISTS).
  *  - Q20 excess-stock suppliers: nested IN + per-pair correlated
  *    half-year quantity sum, compared in DECIMAL via cross-multiply.
  *  - Q21 waiting-order suppliers: the EXISTS + NOT-EXISTS double
  *    correlation on the same fact table — the hardest decorrelation
  *    shape in the suite (other-supplier line exists, but no OTHER
  *    supplier's 'R' line).
  *
  * Nation predicates use NATION_3 / NATION_8 — present at every sf
  * (sf0.001 has only 10 suppliers; R5WaveInvariantsSpec-style
  * non-vacuity is asserted in QueriesSmokeSpec row counts at sf0.001:
  * all five return rows there).
  *
  * Same parity discipline as [[R5Queries]]: ONE SQL text for Spark and
  * DuckDB, DECIMAL-exact money arithmetic, counts/integer sums cast to
  * BIGINT (the §7.4 house rule), total ORDER BY.
  *
  * Plan shapes (pinned in PlanShapeSpec): dimension joins broadcast,
  * pseudo-partsupp builds with one lineitem shuffle, correlated
  * subqueries decorrelate — no cartesian, no sort-merge at sf0.001.
  */
object R64Queries {

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  private def sqlQuery(name: String, sql: String, tables: String*): QueryDef =
    QueryDef(name,
      (s, dir) => { views(s, dir, tables: _*); s.sql(sql) },
      Some(sql))

  /** Pseudo-partsupp CTE body — verbatim-shared between every query
    * below (one source of truth, both engines). */
  private val partsuppCte =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    CAST(count(*) * 10 AS BIGINT) AS ps_availqty,
      |    CAST((l_partkey * 31 + l_suppkey * 17) % 10000 AS BIGINT) AS ps_supplycost_c
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  private val q2Sql =
    s"""WITH $partsuppCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost_c
       |FROM part JOIN partsupp ON p_partkey = ps_partkey
       |  JOIN supplier ON s_suppkey = ps_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size BETWEEN 20 AND 30 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
       |  AND ps_supplycost_c = (
       |    SELECT min(ps.ps_supplycost_c)
       |    FROM partsupp ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
       |      JOIN nation n ON s.s_nationkey = n.n_nationkey
       |      JOIN region r ON n.n_regionkey = r.r_regionkey
       |    WHERE ps.ps_partkey = p_partkey AND r.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  val qSqlQ2 = sqlQuery("q_sql_tpch_q2", q2Sql,
    "region", "nation", "supplier", "part", "lineitem")

  private val q11Sql =
    s"""WITH $partsuppCte,
       |filt AS (
       |  SELECT ps_partkey, ps_supplycost_c * ps_availqty AS value_c
       |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
       |    JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name IN ('NATION_3', 'NATION_8'))
       |SELECT ps_partkey, CAST(sum(value_c) AS BIGINT) AS value_c
       |FROM filt GROUP BY ps_partkey
       |HAVING sum(value_c) * 1000 > (SELECT sum(value_c) FROM filt)
       |ORDER BY value_c DESC, ps_partkey""".stripMargin

  val qSqlQ11 = sqlQuery("q_sql_tpch_q11", q11Sql,
    "nation", "supplier", "lineitem")

  private val q12Sql =
    """SELECT shipmode,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE l_linenumber % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'TRUCK' END AS shipmode,
      |    l_returnflag, l_shipdate
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey) t
      |WHERE shipmode IN ('MAIL', 'SHIP') AND l_returnflag = 'R'
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY shipmode ORDER BY shipmode""".stripMargin

  val qSqlQ12 = sqlQuery("q_sql_tpch_q12", q12Sql, "orders", "lineitem")

  private val q20Sql =
    s"""WITH $partsuppCte
       |SELECT s_name, s_acctbal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_3'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
       |      AND CAST(ps_availqty AS DECIMAL(18,2)) * 2 > (
       |        SELECT coalesce(sum(CAST(l_quantity AS DECIMAL(18,2))), CAST(0.00 AS DECIMAL(18,2)))
       |        FROM lineitem
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
       |ORDER BY s_name""".stripMargin

  val qSqlQ20 = sqlQuery("q_sql_tpch_q20", q20Sql,
    "nation", "supplier", "part", "lineitem")

  private val q21Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      | JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      | JOIN orders ON o_orderkey = l1.l_orderkey
      | JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND n_name IN ('NATION_3', 'NATION_8')
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  val qSqlQ21 = sqlQuery("q_sql_tpch_q21", q21Sql,
    "nation", "supplier", "orders", "lineitem")

  val all: Seq[QueryDef] = Seq(qSqlQ2, qSqlQ11, qSqlQ12, qSqlQ20, qSqlQ21)
}
