package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Twentieth wave — pipeline guard rails and the remaining declarative
  * surface:
  *
  *  - `q_dq_audit`: a Deequ-style data-quality battery (range, domain,
  *    referential-integrity, uniqueness, non-negativity) as ONE
  *    declarative query — the admission gate a production ingest runs
  *    before data reaches training;
  *  - `q_fuzzy_join`: edit-distance-1 join via deletion-neighborhood
  *    blocking (the FastSS/SymSpell trick): candidates come from an
  *    equi-join on 1-deletion variants, never an all-pairs scan;
  *  - `q_sql_table_udf`: SQL TABLE functions (`CREATE FUNCTION ...
  *    RETURNS TABLE ... RETURN SELECT`) — parameterized, reusable
  *    relational views invoked in FROM position;
  *  - `q_xml_roundtrip`: `to_xml` → `from_xml` inverse proof (the XML
  *    WRITE path; the sitemap wave covered read-only `from_xml`).
  */
object R20Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_dq_audit ----------

  /** Data-quality audit: seven rules over four tables, one row per rule
    * with checked/violation counts and a pass flag. Rules are chosen so
    * BOTH outcomes occur on the fixture (discount cap, status domain,
    * and lang domain fail; ranges, referential integrity, uniqueness,
    * and non-negativity hold) — an all-green audit can't tell a working
    * checker from a vacuous one.
    *
    * Scale shape: each rule is one aggregate over one table — map-side
    * combined counts, no joins except the referential rule's anti-join
    * (broadcast-able key set). The union glues seven 1-row aggregates;
    * nothing is row-count-sized downstream of the scans. */
  val qDqAudit = QueryDef("q_dq_audit",
    (s, dir) => {
      val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer"); val docs = t(s, dir, "documents")
      val ev = t(s, dir, "events")
      def rule(name: String, df: DataFrame, viol: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).cast("long").as("n_checked"),
          count_if(viol).cast("long").as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
      val orphans = ord.join(cust,
        ord("o_custkey") === cust("c_custkey"), "left_anti")
        .agg(count(lit(1)).cast("long").as("n_violations"))
      val refRule = ord.agg(count(lit(1)).cast("long").as("n_checked"))
        .crossJoin(orphans)
        .select(lit("orders.fk_customer").as("rule"),
          col("n_checked"), col("n_violations"))
      val uniqRule = cust.agg(count(lit(1)).cast("long").as("n_checked"),
        (count(lit(1)) - count_distinct(col("c_custkey"))).cast("long")
          .as("n_violations"))
        .select(lit("customer.unique_key").as("rule"),
          col("n_checked"), col("n_violations"))
      rule("lineitem.quantity_range", li,
          !col("l_quantity").between(1, 50))
        .unionAll(rule("lineitem.discount_cap", li, col("l_discount") > 0.08))
        .unionAll(rule("orders.status_domain", ord,
          !col("o_orderstatus").isin("O", "F")))
        .unionAll(refRule)
        .unionAll(uniqRule)
        .unionAll(rule("documents.lang_domain", docs,
          !col("lang").isin("en", "de", "fr", "es")))
        .unionAll(rule("events.value_nonneg", ev, col("value") < 0))
        .withColumn("pass", col("n_violations") === 0)
        .orderBy("rule")
    },
    Some(
      """WITH checks(rule, n_checked, n_violations) AS (
        |  SELECT 'lineitem.quantity_range', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE NOT l_quantity BETWEEN 1 AND 50)
        |      AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.discount_cap', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE l_discount > 0.08) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.status_domain', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F'))
        |      AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'orders.fk_customer',
        |    CAST((SELECT count(*) FROM orders) AS BIGINT),
        |    CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |      (SELECT c_custkey FROM customer)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'customer.unique_key', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'documents.lang_domain', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE lang NOT IN ('en','de','fr','es'))
        |      AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'events.value_nonneg', CAST(count(*) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE value < 0) AS BIGINT) FROM events)
        |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
        |FROM checks ORDER BY rule""".stripMargin))

  // ---------- q_fuzzy_join ----------

  /** 1-deletion variant set of string column `c`: the string itself
    * plus every single-character deletion. Two strings within edit
    * distance 1 ALWAYS share a variant (equal → themselves;
    * substitution → both delete that position; insert/delete → the
    * longer's deletion equals the shorter), so the variant equi-join is
    * a complete candidate generator for distance ≤ 1. */
  private[queries] def deletionVariants(c: String): org.apache.spark.sql.Column =
    expr(s"array_union(array($c), transform(sequence(1, length($c)), " +
      s"i -> concat(substring($c, 1, i-1), substring($c, i+1, length($c)))))")

  /** Edit-distance-1 join via deletion-neighborhood blocking
    * (FastSS/SymSpell): side A is the document vocabulary, side B a
    * deterministically "typo'd" copy (even-length words lose their 2nd
    * character). Candidates come from an equi-join on 1-deletion
    * variants — shuffle volume is Σ|word|+1 keys per word, NEVER the
    * |A|×|B| cross product — then exact levenshtein verifies. The
    * DuckDB oracle brute-forces the same pairs, proving the blocking
    * loses nothing. */
  val qFuzzyJoin = QueryDef("q_fuzzy_join",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(3, 12)).distinct()
      val queries = toks.select(when(length(col("w")) % 2 === 0,
          concat(substring(col("w"), 1, 1), expr("substring(w, 3)")))
        .otherwise(col("w")).as("q")).distinct()
      val ak = toks.select(col("w"), explode(deletionVariants("w")).as("k"))
      val bk = queries.select(col("q"), explode(deletionVariants("q")).as("k"))
      ak.join(bk, "k").select("w", "q").distinct()
        .withColumn("dist", levenshtein(col("w"), col("q")))
        .where(col("dist") <= 1)
        .orderBy("w", "q")
    },
    Some(
      """WITH tok AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |a AS (SELECT w FROM tok WHERE length(w) BETWEEN 3 AND 12),
        |b AS (SELECT DISTINCT CASE WHEN length(w) % 2 = 0
        |        THEN substr(w, 1, 1) || substr(w, 3) ELSE w END AS q FROM a)
        |SELECT a.w, b.q, CAST(levenshtein(a.w, b.q) AS INTEGER) AS dist
        |FROM a, b WHERE levenshtein(a.w, b.q) <= 1
        |ORDER BY w, q""".stripMargin))

  // ---------- q_sql_table_udf ----------

  /** SQL TABLE function: a parameterized top-5 view invoked twice in
    * FROM position — reusable relational logic that stays declarative
    * (the body inlines into the calling plan, so the per-status LIMIT
    * becomes a rank pushdown, not a closure). Unique (price, key)
    * ordering keeps the LIMIT deterministic. */
  val qSqlTableUdf = QueryDef("q_sql_table_udf",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_ord_tvf")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_top_orders(st STRING) " +
        "RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE) RETURN " +
        "SELECT o_orderkey, o_totalprice FROM graft_ord_tvf " +
        "WHERE o_orderstatus = st " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5")
      s.sql(
        """SELECT 'O' AS status, * FROM graft_top_orders('O')
          |UNION ALL
          |SELECT 'F' AS status, * FROM graft_top_orders('F')
          |ORDER BY status, o_totalprice DESC, o_orderkey""".stripMargin)
    },
    Some(
      """WITH r AS (SELECT o_orderstatus AS status, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders WHERE o_orderstatus IN ('O', 'F'))
        |SELECT status, o_orderkey, o_totalprice FROM r WHERE rn <= 5
        |ORDER BY status, o_totalprice DESC, o_orderkey""".stripMargin))

  // ---------- q_xml_roundtrip ----------

  /** XML write path: rows serialize through `to_xml` and parse back
    * with `from_xml`, the recovered fields hash-checked against the
    * originals recomputed by the oracle — the inverse-pair proof that
    * the sitemap wave's read-only `from_xml` could not give. */
  val qXmlRoundtrip = QueryDef("q_xml_roundtrip",
    (s, dir) => {
      val xml = t(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          to_xml(struct(col("lang"), col("n_chars"))).as("xml"))
      val schema = StructType.fromDDL("lang STRING, n_chars BIGINT")
      xml.select(col("doc_id"),
          from_xml(col("xml"), schema).as("p"))
        .select(col("doc_id"), col("p.lang").as("lang"),
          col("p.n_chars").as("n_chars"))
        .orderBy("doc_id")
    },
    Some(
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(qDqAudit, qFuzzyJoin, qSqlTableUdf, qXmlRoundtrip)
}
