package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Fifth wave: TPC-H SQL-surface completion. Every TPC-H query shape the
  * driver's synthetic star schema can express (no `partsupp` table, and
  * `lineitem` carries no shipmode/commitdate/receiptdate, so Q2, Q11,
  * Q12, Q20, Q21 have no faithful form) — adapted to the synthetic
  * columns where the original predicate has no counterpart:
  *
  *  - Q4  EXISTS-subquery priority count (returnflag stands in for the
  *    late-delivery commit/receipt predicate)
  *  - Q6  single-scan forecast revenue (pure filter + aggregate)
  *  - Q8  two-level market share (8-way join, double-division parity)
  *  - Q9  product profit (retailprice stands in for ps_supplycost)
  *  - Q13 customer order-count distribution (LEFT JOIN with ON-clause
  *    filter, two-level aggregate)
  *  - Q14 promo revenue share (CASE inside an aggregate ratio)
  *  - Q15 top supplier by revenue (CTE + scalar-subquery max equality)
  *  - Q16 supplier-part variety (NOT IN subquery + count DISTINCT;
  *    supplier-part pairs derived from lineitem in lieu of partsupp)
  *  - Q17 small-quantity avg (correlated scalar subquery per part)
  *  - Q19 disjunctive brand/size/quantity predicate (OR-of-ANDs pushed
  *    to one scan)
  *  - Q22 dormant high-balance customers (windowed NOT EXISTS anti-join
  *    + global-average scalar subquery; nationkey digit stands in for
  *    the phone country code)
  *
  * The SAME SQL text runs on Spark (via `spark.sql` over temp views) and
  * DuckDB — parity discipline as in [[Queries]]: DECIMAL(18,2)-exact
  * accumulation cast to DOUBLE at the end, division only between already-
  * cast DOUBLEs, counts cast to BIGINT, total ORDER BY where >1 row.
  *
  * Catalyst plans (asserted in PlanShapeSpec for Q8/Q17): dimension
  * tables broadcast; the only hash shuffles are on fact-table join/agg
  * keys; correlated subqueries decorrelate to aggregated joins — shapes
  * that survive a 100 TB lineitem.
  */
object R5Queries {

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  private def sqlQuery(name: String, sql: String, tables: String*): QueryDef =
    QueryDef(name,
      (s, dir) => { views(s, dir, tables: _*); s.sql(sql) },
      Some(sql))

  private val q4Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val qSqlQ4 = sqlQuery("q_sql_tpch_q4", q4Sql, "orders", "lineitem")

  private val q6Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  val qSqlQ6 = sqlQuery("q_sql_tpch_q6", q6Sql, "lineitem")

  private val q8Sql =
    """WITH all_sales AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |         n2.n_name AS supp_nation
      |  FROM lineitem
      |   JOIN part ON p_partkey = l_partkey
      |   JOIN supplier ON s_suppkey = l_suppkey
      |   JOIN orders ON l_orderkey = o_orderkey
      |   JOIN customer ON o_custkey = c_custkey
      |   JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |   JOIN region ON n1.n_regionkey = r_regionkey
      |   JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
      |  / CAST(sum(volume) AS DOUBLE) AS mkt_share
      |FROM all_sales GROUP BY o_year ORDER BY o_year""".stripMargin

  val qSqlQ8 = sqlQuery("q_sql_tpch_q8", q8Sql,
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  private val q9Sql =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM (
      | SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |   CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |   - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      | FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      | WHERE p_name LIKE '%blue%' ) profit
      |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin

  val qSqlQ9 = sqlQuery("q_sql_tpch_q9", q9Sql,
    "nation", "supplier", "part", "orders", "lineitem")

  private val q13Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      | GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  val qSqlQ13 = sqlQuery("q_sql_tpch_q13", q13Sql, "customer", "orders")

  private val q14Sql =
    """SELECT CAST(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |   ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
      | / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  val qSqlQ14 = sqlQuery("q_sql_tpch_q14", q14Sql, "part", "lineitem")

  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  val qSqlQ15 = sqlQuery("q_sql_tpch_q15", q15Sql, "supplier", "lineitem")

  private val q16Sql =
    """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00007%')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val qSqlQ16 = sqlQuery("q_sql_tpch_q16", q16Sql, "supplier", "part", "lineitem")

  private val q17Sql =
    """SELECT CAST(COALESCE(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23' AND p_size < 5
      |  AND l_quantity < (SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  val qSqlQ17 = sqlQuery("q_sql_tpch_q17", q17Sql, "part", "lineitem")

  private val q19Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  val qSqlQ19 = sqlQuery("q_sql_tpch_q19", q19Sql, "part", "lineitem")

  private val q22Sql =
    """WITH avg_bal AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS v
      |  FROM customer WHERE c_acctbal > 0.00 AND c_mktsegment IN ('AUTOMOBILE','MACHINERY'))
      |SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
      |  FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE','MACHINERY')
      |    AND c_acctbal > (SELECT v FROM avg_bal)
      |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |) custsale
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  val qSqlQ22 = sqlQuery("q_sql_tpch_q22", q22Sql, "customer", "orders")

  val all: Seq[QueryDef] = Seq(
    qSqlQ4, qSqlQ6, qSqlQ8, qSqlQ9, qSqlQ13, qSqlQ14, qSqlQ15, qSqlQ16,
    qSqlQ17, qSqlQ19, qSqlQ22)
}
