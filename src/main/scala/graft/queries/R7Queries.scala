package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventh wave — skew-safe aggregation, sequence analytics, graph
  * counting, and the full Gopher-style quality battery:
  *
  *  - salted two-phase aggregation: the 100 TB pattern for heavy-hitter
  *    group keys — partial agg on (key, salt) splits each hot key
  *    across 64 reducers, the final merge sees 64 rows per key. The
  *    result is salt-independent, so a plain GROUP BY oracle checks it
  *    exactly;
  *  - gaps-and-islands activity streaks (row_number difference trick —
  *    one shuffle on user, no self-joins);
  *  - triangle counting on a synthetic sparse graph (canonical a<b edge
  *    orientation makes each triangle count exactly once; two equi-
  *    joins, no enumeration of the O(n³) space);
  *  - Gopher quality rules via array higher-order functions (word
  *    count, mean word length, alpha ratio, stopword floor — all
  *    map-side lambda work, no explode, no shuffle before the sort);
  *  - median / percentile_disc / percentile_cont inverse-distribution
  *    aggregates (WITHIN GROUP syntax) against DuckDB's
  *    median/quantile_disc/quantile_cont.
  */
object R7Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  /** Salted two-phase aggregation. With only 3 distinct return flags,
    * every key is a heavy hitter — the salt splits each across 64
    * partial groups (map-side combine still applies), and the final
    * 3-key merge is trivial. Decimal-exact, so the plain-GROUP BY
    * oracle hash-matches regardless of salting. */
  val qTwoPhaseAgg = QueryDef("q_twophase_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("k"),
        col("l_quantity").cast(DecimalType(18, 2)).as("q"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(64))
          .as("salt"))
      li.groupBy("k", "salt")
        .agg(sum("q").as("ps"), count(lit(1)).as("pn"))
        .groupBy("k")
        .agg(sum("ps").cast("double").as("sum_qty"),
          sum("pn").cast("long").as("n"))
        .orderBy("k")
    },
    Some(
      """SELECT l_returnflag AS k,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Gaps-and-islands: per-user runs of consecutive active days. The
    * (d - row_number) anchor is constant exactly along a consecutive
    * run; one shuffle on user_id, windows and aggregation reuse it. */
  private val streaksSparkSql =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |r AS (SELECT user_id, d,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS rn FROM days),
      |g AS (SELECT user_id, d, date_sub(d, rn) AS anchor FROM r)
      |SELECT user_id, min(d) AS streak_start, CAST(count(*) AS BIGINT) AS len
      |FROM g GROUP BY user_id, anchor HAVING count(*) >= 3
      |ORDER BY user_id, streak_start""".stripMargin

  val qStreaks = QueryDef("q_streaks",
    (s, dir) => {
      // typed-ts loader: the fixture stores TIMESTAMP(NANOS)
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql(streaksSparkSql)
    },
    Some(
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |r AS (SELECT user_id, d,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS rn FROM days),
        |g AS (SELECT user_id, d, d - rn AS anchor FROM r)
        |SELECT user_id, min(d) AS streak_start, CAST(count(*) AS BIGINT) AS len
        |FROM g GROUP BY user_id, anchor HAVING count(*) >= 3
        |ORDER BY user_id, streak_start""".stripMargin))

  /** Triangle counting. Edges canonically oriented (a < b) so each
    * triangle {a,b,c} is counted exactly once as a<b<c: wedge join
    * (e1.b = e2.a) then closure check — the standard distributed
    * algorithm whose shuffle volume is edges + wedges, never the cubic
    * triple space. Same SQL text on both engines. */
  private val trianglesSql =
    """WITH e0 AS (
      |  SELECT DISTINCT CAST(o_orderkey % 200 AS BIGINT) AS u,
      |         CAST((o_orderkey * 7 + o_custkey) % 200 AS BIGINT) AS v
      |  FROM orders WHERE o_orderkey % 17 < 2),
      |ed AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e0 WHERE u <> v)
      |SELECT CAST(count(*) AS BIGINT) AS triangles
      |FROM ed e1 JOIN ed e2 ON e2.a = e1.b JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin

  val qTriangles = QueryDef("q_triangles",
    (s, dir) => { views(s, dir, "orders"); s.sql(trianglesSql) },
    Some(trianglesSql))

  /** Gopher-style quality rule battery — every per-document metric is an
    * array higher-order function (filter/array_join lambdas inside
    * codegen), so the whole battery is map-side until the final sort. */
  private val gopherSparkSql =
    """WITH d AS (SELECT doc_id, split(text, ' ') AS arr FROM documents),
      |m AS (SELECT doc_id,
      |  CAST(size(arr) AS BIGINT) AS n_words,
      |  CAST(length(array_join(arr, '')) AS DOUBLE) / CAST(size(arr) AS DOUBLE) AS mean_word_len,
      |  CAST(size(filter(arr, w -> w RLIKE '[a-z]')) AS DOUBLE) / CAST(size(arr) AS DOUBLE) AS alpha_ratio,
      |  CAST(size(filter(arr, w -> w IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) AS stop_cnt
      |FROM d)
      |SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_cnt,
      |  (n_words BETWEEN 50 AND 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |   AND alpha_ratio > 0.8 AND stop_cnt >= 2) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  val qGopherRules = QueryDef("q_gopher_rules",
    (s, dir) => { views(s, dir, "documents"); s.sql(gopherSparkSql) },
    Some(
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(arr) AS BIGINT) AS n_words,
        |  CAST(len(array_to_string(arr, '')) AS DOUBLE) / CAST(len(arr) AS DOUBLE) AS mean_word_len,
        |  CAST(len(list_filter(arr, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / CAST(len(arr) AS DOUBLE) AS alpha_ratio,
        |  CAST(len(list_filter(arr, w -> w IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) AS stop_cnt
        |FROM d)
        |SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_cnt,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |   AND alpha_ratio > 0.8 AND stop_cnt >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin))

  /** Inverse-distribution aggregates: median, discrete and continuous
    * percentiles (WITHIN GROUP). Quantities are whole numbers stored as
    * doubles, so interpolation is exact across engines. */
  val qMedianDisc = QueryDef("q_median_disc",
    (s, dir) => {
      views(s, dir, "lineitem")
      s.sql("""SELECT l_returnflag,
        |  CAST(median(l_quantity) AS DOUBLE) AS med,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS q25_disc,
        |  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS q75_cont
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },
    Some(
      """SELECT l_returnflag,
        |  CAST(median(l_quantity) AS DOUBLE) AS med,
        |  CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS q25_disc,
        |  CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS q75_cont
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    qTwoPhaseAgg, qStreaks, qTriangles, qGopherRules, qMedianDisc)
}
