package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Seventieth wave — governance and operations audits.
  *
  *  - `q_cascade_delete`: right-to-be-forgotten propagation audit — for
  *    a deterministic subject set (customers with key ≡ 3 mod 10),
  *    per-table total / to-delete / retained counts across the
  *    referential chain (customer → orders → lineitem, plus events by
  *    user id). The subject set broadcasts; every count is one scan
  *    with a broadcast LEFT JOIN membership probe — the audit a
  *    deletion job runs BEFORE mutating 100 TB.
  *  - `q_interarrival`: per-user inter-event gap distribution in exact
  *    basis points over four operational buckets — the measurement that
  *    tunes session gaps (q_sessionize's 30 min) and watermark delays.
  *    Per-user lag window (partitioned, never global), |buckets|-sized
  *    output.
  *  - `q_coverage_p90`: corpus-mixture concentration — (lang, source)
  *    cells ranked by token mass with exact share and an in-p90 flag
  *    (cells whose PRECEDING cumulative mass is under 90%). One
  *    dimension-sized descending sweep; the report that decides which
  *    cells a mixture rebalance must touch.
  */
object R70Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_cascade_delete ----------

  val qCascadeDelete = QueryDef("q_cascade_delete",
    (s, dir) => {
      val subjects = t(s, dir, "customer")
        .where(col("c_custkey") % 10 === 3)
        .select(col("c_custkey").as("k"))
      def audit(tbl: String, df: DataFrame, keyCol: String): DataFrame =
        df.join(broadcast(subjects), df(keyCol) === col("k"), "left")
          .agg(count(lit(1)).cast("long").as("n_total"),
            sum(when(col("k").isNotNull, 1L).otherwise(0L)).cast("long")
              .as("n_deleted"))
          .select(lit(tbl).as("tbl"), col("n_total"), col("n_deleted"))
      val cust = audit("customer", t(s, dir, "customer"), "c_custkey")
      val ords = audit("orders", t(s, dir, "orders"), "o_custkey")
      val li = audit("lineitem",
        t(s, dir, "lineitem").join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")), "o_custkey")
      val ev = audit("events", Tables.events(s, dir), "user_id")
      cust.union(ords).union(li).union(ev)
        .withColumn("n_retained", col("n_total") - col("n_deleted"))
        .orderBy("tbl")
    },
    Some(
      """WITH subjects AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 10 = 3),
        |cust AS (
        |  SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN c_custkey % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
        |  FROM customer),
        |ords AS (
        |  SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN s.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
        |  FROM orders o LEFT JOIN subjects s ON o.o_custkey = s.k),
        |li AS (
        |  SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN s.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    LEFT JOIN subjects s ON o.o_custkey = s.k),
        |ev AS (
        |  SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN s.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
        |  FROM events e LEFT JOIN subjects s ON e.user_id = s.k)
        |SELECT tbl, n_total, n_deleted, n_total - n_deleted AS n_retained
        |FROM (SELECT * FROM cust UNION ALL SELECT * FROM ords
        |      UNION ALL SELECT * FROM li UNION ALL SELECT * FROM ev)
        |ORDER BY tbl""".stripMargin))

  // ---------- q_interarrival ----------

  val qInterarrival = QueryDef("q_interarrival",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gaps = ev.withColumn("prev", lag(col("us"), 1).over(w))
        .where(col("prev").isNotNull)
        .select((col("us") - col("prev")).as("gap_us"))
      val b = gaps.select(
        when(col("gap_us") < 60000000L, "a_under1m")
          .when(col("gap_us") < 300000000L, "b_1to5m")
          .when(col("gap_us") < 1800000000L, "c_5to30m")
          .otherwise("d_over30m").as("bucket"))
      val tot = gaps.agg(count(lit(1)).cast("long").as("n_gaps"))
      val cnt = b.groupBy("bucket").agg(count(lit(1)).cast("long").as("n"))
      val sh = col("n") * 10000L
      cnt.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n"),
          ((sh - ((sh % col("n_gaps")) + col("n_gaps")) % col("n_gaps")) /
            col("n_gaps")).cast("long").as("share_bp"))
        .orderBy("bucket")
    },
    Some(
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |w AS (
        |  SELECT user_id, us,
        |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM ev),
        |gaps AS (SELECT user_id, us - prev AS gap_us FROM w WHERE prev IS NOT NULL),
        |b AS (
        |  SELECT CASE WHEN gap_us < 60000000 THEN 'a_under1m'
        |              WHEN gap_us < 300000000 THEN 'b_1to5m'
        |              WHEN gap_us < 1800000000 THEN 'c_5to30m'
        |              ELSE 'd_over30m' END AS bucket
        |  FROM gaps),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gaps)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST((count(*) * 10000 - ((count(*) * 10000 % max(tot.n)) + max(tot.n)) % max(tot.n))
        |    / max(tot.n) AS BIGINT) AS share_bp
        |FROM b CROSS JOIN tot GROUP BY bucket ORDER BY bucket""".stripMargin))

  // ---------- q_coverage_p90 ----------

  val qCoverageP90 = QueryDef("q_coverage_p90",
    (s, dir) => RewriteGlobalRankWindows.force {
      val cells = t(s, dir, "documents").groupBy("lang", "source")
        .agg(sum(col("n_chars")).cast("long").as("toks"))
      val ord = Window.orderBy(col("toks").desc, col("lang"), col("source"))
      val sweep = cells
        .withColumn("cum", sum(col("toks"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot",
          sum(col("toks")).over(Window.partitionBy(lit(1))).cast("long"))
        .withColumn("rk", row_number().over(ord).cast("long"))
      val sh = col("toks") * 10000L
      sweep.select(col("lang"), col("source"), col("toks"), col("rk"),
          ((sh - ((sh % col("tot")) + col("tot")) % col("tot")) / col("tot"))
            .cast("long").as("share_bp"),
          when((col("cum") - col("toks")) * 10 < col("tot") * 9, 1L)
            .otherwise(0L).as("in_p90"))
        .orderBy("rk")
    },
    Some(
      """WITH cells AS (
        |  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS toks
        |  FROM documents GROUP BY lang, source),
        |sweep AS (
        |  SELECT lang, source, toks,
        |    sum(toks) OVER (ORDER BY toks DESC, lang, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    CAST(sum(toks) OVER () AS BIGINT) AS tot,
        |    row_number() OVER (ORDER BY toks DESC, lang, source) AS rk
        |  FROM cells)
        |SELECT lang, source, toks, CAST(rk AS BIGINT) AS rk,
        |  CAST((toks * 10000 - ((toks * 10000 % tot) + tot) % tot) / tot AS BIGINT) AS share_bp,
        |  CAST(CASE WHEN (cum - toks) * 10 < tot * 9 THEN 1 ELSE 0 END AS BIGINT) AS in_p90
        |FROM sweep ORDER BY rk""".stripMargin))

  val all: Seq[QueryDef] = Seq(qCascadeDelete, qInterarrival, qCoverageP90)
}
