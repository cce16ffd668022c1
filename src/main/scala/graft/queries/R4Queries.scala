package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Fourth wave of operator coverage — deep ANSI-SQL surface and Spark-4
  * type-system features:
  *
  *  - three more TPC-H shapes through `spark.sql` (Q5 six-way star join,
  *    Q10 returned-item report, Q18 HAVING-subquery large-volume
  *    customers) — the same SQL text runs on both engines;
  *  - exact least-squares regression from integer-cents power sums (the
  *    `regr_slope`/`regr_r2` family re-derived deterministically);
  *  - the Spark 4 VARIANT semi-structured type (`parse_json` /
  *    `try_variant_get`) checked against DuckDB's JSON extraction;
  *  - case-insensitive grouping via Spark 4 string collations
  *    (`collate(..., 'UTF8_LCASE')`) vs the classic `lower()` oracle.
  *
  * Parity discipline unchanged: exact integer/decimal accumulation cast
  * to DOUBLE at the end, identical final-expression shape on both
  * engines, total ORDER BY with a unique tie-break.
  */
object R4Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  // ---------- TPC-H SQL surface (same text on both engines) ----------

  /** TPC-H Q5 shape: six-way region→nation→supplier⋈customer⋈orders⋈
    * lineitem star join with the local-supplier condition
    * (c_nationkey = s_nationkey). Catalyst broadcast-joins the three
    * dimension tables and shuffles only on the orders/lineitem keys —
    * the plan that survives a 100 TB fact table. */
  private val q5Sql =
    """SELECT n_name,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val qSqlQ5 = QueryDef("q_sql_tpch_q5",
    (s, dir) => {
      views(s, dir, "region", "nation", "customer", "supplier", "orders",
        "lineitem")
      s.sql(q5Sql)
    },
    Some(q5Sql))

  /** TPC-H Q10 shape (adapted to the synthetic columns): top returned-
    * revenue customers in a quarter, grouped over the customer dimension
    * and its nation. */
  private val q10Sql =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      | JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  val qSqlQ10 = QueryDef("q_sql_tpch_q10",
    (s, dir) => {
      views(s, dir, "customer", "orders", "lineitem", "nation")
      s.sql(q10Sql)
    },
    Some(q10Sql))

  /** TPC-H Q18 shape: large-volume orders via an IN (GROUP BY … HAVING)
    * subquery — Catalyst plans the subquery as a semi-join on
    * l_orderkey, reusing the fact table's shuffle key. Quantity summed
    * in DECIMAL so the HAVING threshold is exact on both engines. */
  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  val qSqlQ18 = QueryDef("q_sql_tpch_q18",
    (s, dir) => {
      views(s, dir, "customer", "orders", "lineitem")
      s.sql(q18Sql)
    },
    Some(q18Sql))

  // ---------- exact least-squares (regr_* family, deterministic) ------

  /** Exact simple linear regression (extendedprice ~ quantity) per
    * return flag, from integer-cents power sums: the `regr_slope` /
    * `regr_intercept` / `regr_r2` family re-derived so both engines
    * compute IDENTICAL doubles (native regr_* aggregates are
    * sum-order-dependent and never bit-stable across engines).
    *
    * Cents products reach ~1e14 per row; sums are accumulated in
    * DECIMAL(38,0) (BIGINT would overflow at sf≥0.1 under ANSI mode),
    * then cast once to DOUBLE for the closed-form fit. */
  private val regrSumsSql =
    """SELECT l_returnflag,
      |  CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sy,
      |  CAST(sum(CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
      |  CAST(sum(CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
      |  CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS syy
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Final fit from the six exact sums — all-DOUBLE with one expression
    * shape, so IEEE determinism gives bit equality. Slope/intercept are
    * in cents-per-cent == dollars-per-dollar (scale cancels). */
  private val regrFitSql =
    s"""WITH s AS ($regrSumsSql)
       |SELECT l_returnflag,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n / 100.0, 6) AS intercept,
       |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
       |FROM s ORDER BY l_returnflag""".stripMargin

  val qRegrExact = QueryDef("q_regr_exact",
    (s, dir) => {
      views(s, dir, "lineitem")
      s.sql(regrFitSql)
    },
    Some(regrFitSql))

  // ---------- Spark 4 VARIANT (semi-structured type) ------------------

  /** Semi-structured access through the Spark 4 VARIANT type:
    * `parse_json` once, then typed `try_variant_get` paths — the
    * shredding-friendly scale path for ragged JSON (vs per-access
    * re-parsing with get_json_object). Oracle is DuckDB's JSON
    * extraction; `try_` semantics on both sides so a malformed document
    * degrades to NULL identically. */
  val qVariant = QueryDef("q_variant",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("try_parse_json(props)").as("v"))
      .select(col("event_id"), col("user_id"),
        expr("try_variant_get(v, '$.k', 'bigint')").as("k_num"),
        expr("try_variant_get(v, '$.missing', 'string')").as("missing"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum("k_num").cast("long").as("sum_k"),
        max("k_num").cast("long").as("max_k"),
        count(col("missing")).cast("long").as("n_missing"))
      .orderBy("user_id"),
    Some(
      """WITH v AS (
        |  SELECT event_id, user_id,
        |    TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k_num,
        |    json_extract_string(TRY_CAST(props AS JSON), '$.missing') AS missing
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(k_num) AS BIGINT) AS sum_k,
        |  CAST(max(k_num) AS BIGINT) AS max_k,
        |  CAST(count(missing) AS BIGINT) AS n_missing
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin))

  // ---------- Spark 4 collations (case-insensitive grouping) ----------

  /** Case-insensitive grouping via a collated column: Spark groups on
    * `collate(brand, 'UTF8_LCASE')` natively (no lower() rewrite, so
    * the original casing stays available to aggregates); the oracle
    * lowers the key explicitly. The mixed-case column is synthesized
    * deterministically from p_partkey so both engines see identical
    * input. Output key = min(original) — deterministic under ties —
    * never the collated value itself (which engine-dependently keeps an
    * arbitrary case representative). */
  val qCollatedGroup = QueryDef("q_collated_group",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"),
        when(col("p_partkey") % 2 === 0, upper(col("p_brand")))
          .otherwise(lower(col("p_brand"))).as("brand_mixed"))
      .groupBy(expr("collate(brand_mixed, 'UTF8_LCASE')").as("brand_ci"))
      .agg(min("brand_mixed").as("brand"),
        count(lit(1)).cast("long").as("n_parts"),
        sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double")
          .as("retail_sum"))
      .drop("brand_ci")
      .orderBy("brand"),
    Some(
      """WITH m AS (
        |  SELECT p_partkey, p_retailprice,
        |    CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
        |         ELSE lower(p_brand) END AS brand_mixed
        |  FROM part)
        |SELECT min(brand_mixed) AS brand,
        |  CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_sum
        |FROM m GROUP BY lower(brand_mixed) ORDER BY brand""".stripMargin))

  /** TPC-H Q7 shape: bilateral shipping volume between a nation pair by
    * ship year — two aliased joins of the SAME dimension (supplier
    * nation vs customer nation), a disjunctive pair predicate, and
    * EXTRACT(YEAR ...) grouping. Both nation sides broadcast; the
    * orders⋈lineitem backbone shuffles on the order key only. */
  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      | CAST(sum(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier
      |   JOIN lineitem ON s_suppkey = l_suppkey
      |   JOIN orders ON o_orderkey = l_orderkey
      |   JOIN customer ON c_custkey = o_custkey
      |   JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |   JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val qSqlQ7 = QueryDef("q_sql_tpch_q7",
    (s, dir) => {
      views(s, dir, "supplier", "lineitem", "orders", "customer", "nation")
      s.sql(q7Sql)
    },
    Some(q7Sql))

  /** GROUP BY ALL / implicit grouping-key inference (same text on both
    * engines) — every non-aggregate select item becomes a key. */
  private val gbAllSql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ALL
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val qGroupByAll = QueryDef("q_groupby_all",
    (s, dir) => {
      views(s, dir, "lineitem")
      s.sql(gbAllSql)
    },
    Some(gbAllSql))

  /** Schema-evolution union: `unionByName(allowMissingColumns = true)`
    * aligns by column NAME across differently-ordered, differently-shaped
    * inputs (positional UNION would silently mis-bind). The oracle
    * spells out the aligned projection — exactly what the engine derives. */
  val qUnionByName = QueryDef("q_union_by_name",
    (s, dir) => {
      val v1 = t(s, dir, "customer").where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("key"), col("c_mktsegment").as("seg"),
          col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
      // second branch: different column order AND a missing column
      val v2 = t(s, dir, "supplier")
        .select(col("s_name").as("seg"),
          (col("s_suppkey") + 1000000L).as("key"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy("seg")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("bal").cast("double").as("bal_sum"),
          min("key").as("min_key"))
        .orderBy("seg")
    },
    Some(
      """WITH u AS (
        |  SELECT c_custkey AS key, c_mktsegment AS seg,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT s_suppkey + 1000000 AS key, s_name AS seg,
        |    NULL AS bal
        |  FROM supplier)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(bal) AS DOUBLE) AS bal_sum,
        |  min(key) AS min_key
        |FROM u GROUP BY seg ORDER BY seg""".stripMargin))

  // ---------- benchmark decontamination (LLM-pipeline op) -------------

  /** Training-corpus decontamination: drop (here: flag) every training
    * document that shares an 8-word shingle with the held-out benchmark
    * set — the CCNet/Dolma-style n-gram overlap rule. The benchmark is
    * a deterministic slice of `documents` (doc_id % 19 = 3).
    *
    * Scale shape: per-doc DISTINCT shingle hashes (md5 here for the
    * DuckDB-matched oracle; xxhash64 in the unoracled scale path) keep
    * the join key fixed-width; the benchmark gram set is tiny relative
    * to a 100 TB corpus, so Catalyst broadcasts it and contamination
    * detection is a map-side hash probe — the corpus never shuffles.
    * The inner-join form returns the contaminated doc list; production
    * flips it to left_anti with identical cost. */
  val qDecontaminate = QueryDef("q_decontaminate",
    (s, dir) => {
      val w = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("arr"))
        .where(size(col("arr")) >= 8)
      val grams = w.select(col("doc_id"), col("source"),
          explode(expr(
            "transform(sequence(1, size(arr) - 7)," +
              " i -> md5(concat_ws(' ', slice(arr, i, 8))))")).as("g"))
        .distinct()
      val evalGrams = grams.where(col("doc_id") % 19 === 3)
        .select("g").distinct()
      grams.where(col("doc_id") % 19 =!= 3)
        .join(broadcast(evalGrams), "g")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).cast("long").as("n_shared"))
        .orderBy("doc_id")
    },
    Some(
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS arr
        |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
        |g0 AS (
        |  SELECT doc_id, source, arr,
        |    unnest(generate_series(1, len(arr) - 7)) AS i
        |  FROM w),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    md5(array_to_string(arr[i:i+7], ' ')) AS g
        |  FROM g0),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 19 = 3)
        |SELECT t.doc_id, t.source, CAST(count(*) AS BIGINT) AS n_shared
        |FROM g t JOIN ev USING (g)
        |WHERE t.doc_id % 19 <> 3
        |GROUP BY t.doc_id, t.source
        |ORDER BY t.doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    qSqlQ5, qSqlQ10, qSqlQ18, qSqlQ7, qGroupByAll, qUnionByName,
    qRegrExact, qVariant, qCollatedGroup, qDecontaminate)
}
