package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Eighty-first wave — privacy risk audit, join-cardinality estimation,
  * and optimal 2-class binning.
  *
  *  - `q_kanon`: k-anonymity / l-diversity audit (Sweeney 2002;
  *    Machanavajjhala et al. 2006) of the customer table under the
  *    quasi-identifier (nation, mktsegment) with the $1000 balance
  *    bucket as the sensitive attribute. Emits the group count, the
  *    worst-case k and l, how many groups fall below k = 5, and the
  *    exact basis-point share of CUSTOMERS sitting in those
  *    re-identifiable groups — the report a release gate reads BEFORE
  *    publishing a 100 TB extract (the row-level sibling of
  *    q_dp_counts' noise and q_cascade_delete's deletion audit). One
  *    QI-sized aggregate.
  *  - `q_join_cardest`: end-biased-histogram join-cardinality
  *    estimation (Ioannidis/Christodoulakis-style): the true size of
  *    the partkey self-join is Σ f(p)²; the estimator keeps the top-20
  *    heavy hitters exactly and assumes the tail uniform
  *    (rest_rows²/rest_distinct). Both the ACTUAL and the ESTIMATE are
  *    exact integers from one frequency scan, with the signed error in
  *    basis points — the audit that tells the optimizer's CBO whether
  *    its histogram resolution survives this key distribution.
  *    (Statistics-sized state: 20 hitters + 2 tail counters.)
  *  - `q_jenks`: optimal 2-class "natural breaks" (Jenks; equivalently
  *    exact 1-D 2-means) over the daily-revenue series: prefix
  *    sums over the value-sorted days score every split by total
  *    within-class sum of squares; argmin with a deterministic value
  *    tie-break. The objective is DOUBLE but both engines evaluate the
  *    IDENTICAL expression tree on exact integer prefix sums (each
  *    IEEE op exactly rounded → bit-identical argmin). Dollars, not
  *    cents, keep Σx² far from the BIGINT edge at any sf. The
  *    principled alternative to q_equidepth_hist's quantile cuts when
  *    the distribution is bimodal.
  */
object R81Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_kanon ----------

  private val kThreshold = 5L

  val qKanon = QueryDef("q_kanon",
    (s, dir) => {
      val groups = t(s, dir, "customer")
        .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
          expr("CAST((CAST(round(c_acctbal * 100.0) AS BIGINT) " +
            "- CAST(round(c_acctbal * 100.0) AS BIGINT) % 100000) / 100000 AS BIGINT)")
            .as("sens"))
        .groupBy("nat", "seg")
        .agg(count(lit(1)).cast("long").as("k"),
          countDistinct(col("sens")).cast("long").as("l"))
      groups.agg(
        count(lit(1)).cast("long").as("n_groups"),
        min(col("k")).cast("long").as("min_k"),
        min(col("l")).cast("long").as("min_l"),
        sum(when(col("k") < kThreshold, 1L).otherwise(0L)).cast("long")
          .as("n_small_groups"),
        sum(when(col("k") < kThreshold, col("k")).otherwise(0L)).cast("long")
          .as("users_at_risk"),
        sum(col("k")).cast("long").as("n_users"))
        .select(col("n_groups"), col("min_k"), col("min_l"),
          col("n_small_groups"), col("users_at_risk"),
          ((col("users_at_risk") * 10000L -
            (col("users_at_risk") * 10000L) % col("n_users")) / col("n_users"))
            .cast("long").as("risk_bp"))
    },
    Some(
      s"""WITH groups AS (
         |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         |    CAST(count(*) AS BIGINT) AS k,
         |    CAST(count(DISTINCT CAST((CAST(round(c_acctbal * 100.0) AS BIGINT)
         |      - CAST(round(c_acctbal * 100.0) AS BIGINT) % 100000) / 100000 AS BIGINT))
         |      AS BIGINT) AS l
         |  FROM customer GROUP BY 1, 2),
         |summary AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         |    CAST(min(k) AS BIGINT) AS min_k, CAST(min(l) AS BIGINT) AS min_l,
         |    CAST(sum(CASE WHEN k < $kThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
         |    CAST(sum(CASE WHEN k < $kThreshold THEN k ELSE 0 END) AS BIGINT) AS users_at_risk,
         |    CAST(sum(k) AS BIGINT) AS n_users
         |  FROM groups)
         |SELECT n_groups, min_k, min_l, n_small_groups, users_at_risk,
         |  CAST((users_at_risk * 10000 - (users_at_risk * 10000) % n_users)
         |    / n_users AS BIGINT) AS risk_bp
         |FROM summary""".stripMargin))

  // ---------- q_join_cardest ----------

  private val topH = 20

  val qJoinCardest = QueryDef("q_join_cardest",
    (s, dir) => {
      val freq = t(s, dir, "lineitem").groupBy("l_partkey")
        .agg(count(lit(1)).cast("long").as("f"))
      // r13 (VERDICT r12 task 1): the global frequency rank routes
      // through GlobalRank (tie-exact — the order ends on the unique
      // l_partkey), retiring the ENTITY whitelist entry: the histogram
      // build itself now scales with |partkeys|, not one task.
      val ranked = RewriteGlobalRankWindows.force(freq.withColumn("rk",
        row_number().over(Window.orderBy(col("f").desc, col("l_partkey")))))
      val stats = ranked.agg(
        sum(col("f") * col("f")).cast("long").as("actual"),
        sum(when(col("rk") <= topH, col("f") * col("f")).otherwise(0L))
          .cast("long").as("head_sq"),
        sum(when(col("rk") > topH, col("f")).otherwise(0L)).cast("long")
          .as("rest_rows"),
        sum(when(col("rk") > topH, 1L).otherwise(0L)).cast("long")
          .as("rest_distinct"))
      stats
        .withColumn("est", col("head_sq") + when(col("rest_distinct") > 0,
          ((col("rest_rows") * col("rest_rows") -
            (col("rest_rows") * col("rest_rows")) % col("rest_distinct")) /
            col("rest_distinct")).cast("long")).otherwise(0L))
        .withColumn("d", abs(col("est") - col("actual")))
        .select(col("actual"), col("est"),
          (when(col("est") >= col("actual"), 1L).otherwise(-1L) *
            ((col("d") * 10000L - (col("d") * 10000L) % col("actual")) /
              col("actual")).cast("long")).cast("long").as("err_bp"),
          col("rest_rows"), col("rest_distinct"))
    },
    Some(
      s"""WITH freq AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS f
         |  FROM lineitem GROUP BY 1),
         |ranked AS (
         |  SELECT f, row_number() OVER (ORDER BY f DESC, l_partkey) AS rk
         |  FROM freq),
         |stats AS (
         |  SELECT CAST(sum(f * f) AS BIGINT) AS actual,
         |    CAST(sum(CASE WHEN rk <= $topH THEN f * f ELSE 0 END) AS BIGINT) AS head_sq,
         |    CAST(sum(CASE WHEN rk > $topH THEN f ELSE 0 END) AS BIGINT) AS rest_rows,
         |    CAST(sum(CASE WHEN rk > $topH THEN 1 ELSE 0 END) AS BIGINT) AS rest_distinct
         |  FROM ranked),
         |est AS (
         |  SELECT actual, rest_rows, rest_distinct,
         |    head_sq + CASE WHEN rest_distinct > 0
         |      THEN CAST((rest_rows * rest_rows
         |        - (rest_rows * rest_rows) % rest_distinct) / rest_distinct AS BIGINT)
         |      ELSE 0 END AS est
         |  FROM stats)
         |SELECT actual, est,
         |  CAST((CASE WHEN est >= actual THEN 1 ELSE -1 END)
         |    * (abs(est - actual) * 10000 - (abs(est - actual) * 10000) % actual)
         |    / actual AS BIGINT) AS err_bp,
         |  rest_rows, rest_distinct
         |FROM est""".stripMargin))

  // ---------- q_jenks ----------

  val qJenks = QueryDef("q_jenks",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val usPerDay = 86400000000L
      val days = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
          expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
            "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
            .as("usd"))
        .withColumn("day",
          expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
        .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))
      val w = Window.orderBy("v", "day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val scored = days
        .withColumn("i", count(lit(1)).over(w).cast("long"))
        .withColumn("s1", sum(col("v")).over(w).cast("long"))
        .withColumn("s2", sum(col("v") * col("v")).over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(tot).cast("long"))
        .withColumn("st", sum(col("v")).over(tot).cast("long"))
        .withColumn("s2t", sum(col("v") * col("v")).over(tot).cast("long"))
        .where(col("i") < col("n")) // split AFTER position i
        .withColumn("sse", expr(
          "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE))" +
            " + (CAST(s2t - s2 AS DOUBLE) - CAST(st - s1 AS DOUBLE) * CAST(st - s1 AS DOUBLE)" +
            " / CAST(n - i AS DOUBLE))"))
      val best = scored.withColumn("rk", row_number().over(
          Window.orderBy(col("sse"), col("v"), col("day"))))
        .where(col("rk") === 1)
      best.select(col("v").as("split_v"), col("i").as("n_lo"),
        (col("n") - col("i")).as("n_hi"),
        round(expr("CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE)"), 4).as("mean_lo"),
        round(expr("CAST(st - s1 AS DOUBLE) / CAST(n - i AS DOUBLE)"), 4)
          .as("mean_hi"),
        round(col("sse"), 4).as("sse"))
    },
    Some(
      s"""WITH days AS (
         |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
         |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % 86400000000)
         |      / 86400000000 AS BIGINT) AS day,
         |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
         |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |pre AS (
         |  SELECT day, v,
         |    CAST(row_number() OVER wv AS BIGINT) AS i,
         |    CAST(sum(v) OVER wc AS BIGINT) AS s1,
         |    CAST(sum(v * v) OVER wc AS BIGINT) AS s2,
         |    CAST(count(*) OVER () AS BIGINT) AS n,
         |    CAST(sum(v) OVER () AS BIGINT) AS st,
         |    CAST(sum(v * v) OVER () AS BIGINT) AS s2t
         |  FROM days
         |  WINDOW wv AS (ORDER BY v, day),
         |    wc AS (ORDER BY v, day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |scored AS (
         |  SELECT *,
         |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE))
         |      + (CAST(s2t - s2 AS DOUBLE) - CAST(st - s1 AS DOUBLE) * CAST(st - s1 AS DOUBLE)
         |      / CAST(n - i AS DOUBLE)) AS sse
         |  FROM pre WHERE i < n),
         |best AS (
         |  SELECT *, row_number() OVER (ORDER BY sse, v, day) AS rk FROM scored)
         |SELECT v AS split_v, i AS n_lo, n - i AS n_hi,
         |  round(CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE), 4) AS mean_lo,
         |  round(CAST(st - s1 AS DOUBLE) / CAST(n - i AS DOUBLE), 4) AS mean_hi,
         |  round(sse, 4) AS sse
         |FROM best WHERE rk = 1""".stripMargin))

  val all: Seq[QueryDef] = Seq(qKanon, qJoinCardest, qJenks)
}
