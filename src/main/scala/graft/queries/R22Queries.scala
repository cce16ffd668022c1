package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Twenty-second wave — the modern declarative-SQL control surface.
  *
  * The reference drives its pipeline imperatively from Python: f-string
  * SQL (`web_spider_oo.py`'s cursor.execute calls), a driver-side crawl
  * loop, and hard-coded thresholds. Spark 4's SQL surface moves each of
  * those INTO the engine, where Catalyst can see them:
  *
  *  - `q_identifier_sql`: `IDENTIFIER(:param)` — table/column names as
  *    bound parameters (injection-safe templating for identifiers; the
  *    safe twin of the reference's f-string table names);
  *  - `q_exec_immediate`: `EXECUTE IMMEDIATE ... USING` — dynamic SQL
  *    with server-side parameter binding;
  *  - `q_lateral_alias`: lateral column aliases — define-once/reuse
  *    derived columns in one projection (no stacked subqueries);
  *  - `q_sql_variables`: `DECLARE VARIABLE` / `SET VAR` — session
  *    variables computed FROM data, folded into later plans as literals;
  *  - `q_sql_script`: SQL scripting (`BEGIN ... WHILE ... END`) — the
  *    reference's imperative accumulation loop (web_spider_oo.py:97-133)
  *    run server-side, no driver round-trips;
  *  - `q_transpose`: `DataFrame.transpose()` — the row/column flip for
  *    model-sized aggregates (metric rows → metric columns).
  */
object R22Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---------- q_identifier_sql ----------

  /** Identifier parameterization: both the table and the grouping column
    * arrive as `IDENTIFIER(:param)` bindings. Unlike string-spliced SQL,
    * the binding can ONLY resolve to an identifier — `'x; DROP TABLE'`
    * cannot escape — and the plan is identical to the hand-written one
    * (full pushdown/codegen). */
  val qIdentifierSql = QueryDef("q_identifier_sql",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_idf_cust")
      s.sql(
        """SELECT IDENTIFIER(:grp) AS seg, count(*) AS n,
          |  CAST(sum(CAST(IDENTIFIER(:bal) AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total_bal
          |FROM IDENTIFIER(:tbl)
          |GROUP BY IDENTIFIER(:grp) ORDER BY seg""".stripMargin,
        Map("tbl" -> "graft_idf_cust", "grp" -> "c_mktsegment",
          "bal" -> "c_acctbal"))
    },
    Some(
      """SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY seg""".stripMargin))

  // ---------- q_exec_immediate ----------

  /** Dynamic SQL with server-side binding: the query text is data, the
    * parameter rides a `USING` clause (never spliced into the string) —
    * the production-safe form of the reference's f-string cursor calls
    * (web_spider_oo.py builds every INSERT by interpolation). */
  val qExecImmediate = QueryDef("q_exec_immediate",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_exi_ord")
      s.sql(
        """EXECUTE IMMEDIATE
          |  'SELECT o_orderpriority, count(*) AS n FROM graft_exi_ord
          |   WHERE o_orderstatus = ? GROUP BY o_orderpriority
          |   ORDER BY o_orderpriority'
          |  USING 'O'""".stripMargin)
    },
    Some(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM orders
        |WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))

  // ---------- q_lateral_alias ----------

  /** Lateral column aliases: `net` and `charged` are defined and reused
    * inside ONE projection — Catalyst inlines the chain (single codegen'd
    * Project), where the pre-3.4 workaround stacked subqueries. */
  val qLateralAlias = QueryDef("q_lateral_alias",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("graft_lat_li")
      s.sql(
        """SELECT l_orderkey, l_linenumber,
          |  CAST(l_extendedprice AS DECIMAL(18,2))
          |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS net,
          |  net * (1 + CAST(l_tax AS DECIMAL(18,2))) AS charged,
          |  CAST(charged - net AS DOUBLE) AS tax_paid
          |FROM graft_lat_li WHERE l_orderkey < 100
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("net").cast("double").as("net"),
          col("charged").cast("double").as("charged"), col("tax_paid"))
    },
    Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charged,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    * (1 + CAST(l_tax AS DECIMAL(18,2)))
        |    - CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS tax_paid
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  // ---------- q_sql_variables ----------

  /** Session variables: the threshold is COMPUTED from data (`SET VAR`
    * runs a query), then folds into the next plan as a literal — the
    * engine-side form of the reference's hard-coded Python constants.
    * max() is exact on doubles, so both engines derive bit-identical
    * cuts. */
  val qSqlVariables = QueryDef("q_sql_variables",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_var_ord")
      s.sql("DECLARE OR REPLACE VARIABLE graft_cut_v DOUBLE")
      s.sql("SET VAR graft_cut_v = " +
        "(SELECT max(o_totalprice) * 0.9 FROM graft_var_ord)")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM graft_var_ord
          |WHERE o_totalprice > graft_cut_v ORDER BY o_orderkey""".stripMargin)
    },
    Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
        |ORDER BY o_orderkey""".stripMargin))

  // ---------- q_sql_script ----------

  /** SQL scripting: the reference's imperative accumulate-over-depths
    * loop (driver-side Python `while current_level <= max_level`,
    * web_spider_oo.py:97) as a server-side `WHILE` — state lives in
    * script variables, each round is a full Catalyst-optimized query,
    * and the driver makes ONE call for the whole loop. DECIMAL
    * accumulation keeps the total order-independent and oracle-exact. */
  val qSqlScript = QueryDef("q_sql_script",
    (s, dir) => {
      s.conf.set("spark.sql.scripting.enabled", "true")
      t(s, dir, "orders").createOrReplaceTempView("graft_scr_ord")
      s.sql(
        """BEGIN
          |  DECLARE i INT DEFAULT 0;
          |  DECLARE tot DECIMAL(18,2) DEFAULT 0;
          |  WHILE i < 4 DO
          |    SET tot = tot + coalesce(
          |      (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FROM graft_scr_ord WHERE o_custkey % 5 = i), 0);
          |    SET i = i + 1;
          |  END WHILE;
          |  SELECT i AS n_iters, CAST(tot AS DOUBLE) AS total;
          |END""".stripMargin)
    },
    Some(
      """SELECT 4 AS n_iters,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_custkey % 5 < 4) AS DOUBLE) AS total
        |FROM orders""".stripMargin))

  // ---------- q_transpose ----------

  /** `DataFrame.transpose()`: flip a model-sized aggregate (3 return
    * flags × 2 metrics) so metrics become rows and groups become
    * columns — the report/feature-matrix orientation. Only ever applied
    * ABOVE a full aggregation: the input is |groups| rows, never the
    * corpus (transpose collects the index column to name the output
    * columns, so it is a driver-sized operation by construction). */
  val qTranspose = QueryDef("q_transpose",
    (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).cast("double").as("n_rows"))
        .orderBy("l_returnflag")
        .transpose()
    },
    Some(
      """SELECT 'sum_qty' AS key,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS "A",
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_returnflag = 'N') AS DOUBLE) AS "N",
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS "R"
        |FROM lineitem
        |UNION ALL
        |SELECT 'n_rows',
        |  CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS DOUBLE),
        |  CAST(count(*) FILTER (WHERE l_returnflag = 'N') AS DOUBLE),
        |  CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
        |FROM lineitem""".stripMargin))

  val all: Seq[QueryDef] = Seq(qIdentifierSql, qExecImmediate, qLateralAlias,
    qSqlVariables, qSqlScript, qTranspose)
}
