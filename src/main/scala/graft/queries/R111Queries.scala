package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Hundred-eleventh wave (r13) — justified under the §7.2
  * no-new-wave-without-new-surface rule by the round's new physical
  * surface: [[graft.plans.GlobalRangeMovingAgg]], the dense-domain
  * RANGE-moving-frame tier (VERDICT r12 task 3 — previously the larger
  * documented non-rewrite: value-bounded frames kept the
  * single-partition WindowExec because boundary state in ROWS is
  * density-unbounded; shipping per-KEY partial buffers bounds it by
  * the VALUE extent instead). Queries are written with the BUILT-IN
  * window functions and routed through
  * [[RewriteGlobalRankWindows.force]], so the rewrite itself — not a
  * hand-built plan — is what the DuckDB oracle checks.
  */
object R111Queries {

  /** `q_rangemov_rewrite`: value-windowed daily revenue statistics —
    * `RANGE BETWEEN 3 PRECEDING AND 1 FOLLOWING` (and two sibling
    * frames) over a GAPPY day-number axis. The `dayn % 10 < 6` filter
    * punches 4-day holes in the calendar so RANGE frames genuinely
    * differ from ROWS frames (a dense axis would make them
    * indistinguishable and the oracle row vacuous as a RANGE check).
    * All arithmetic stays on the cents-BIGINT lattice — no floats to
    * hash. */
  val qRangemovRewrite = QueryDef("q_rangemov_rewrite",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val daily = orders
        .select(datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")).cast("long").as("dayn"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("c"))
        .where(col("dayn") % 10 < 6) // gappy: 4-day hole each decade
        .groupBy("dayn").agg(sum(col("c")).cast("long").as("cents"))
      val w31 = org.apache.spark.sql.expressions.Window
        .orderBy("dayn").rangeBetween(-3, 1)
      val w20 = org.apache.spark.sql.expressions.Window
        .orderBy("dayn").rangeBetween(-2, 0)
      val w12 = org.apache.spark.sql.expressions.Window
        .orderBy("dayn").rangeBetween(1, 2)
      RewriteGlobalRankWindows.force(daily.select(col("dayn"), col("cents"),
        sum("cents").over(w31).as("win_sum"),
        count(lit(1)).over(w20).cast("long").as("win_n"),
        min("cents").over(w12).as("fut_min")))
        .orderBy("dayn")
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |           CAST(o_orderdate AS DATE)) AS BIGINT) AS dayn,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders
        |  WHERE CAST(date_diff('day', DATE '1992-01-01',
        |          CAST(o_orderdate AS DATE)) AS BIGINT) % 10 < 6
        |  GROUP BY 1)
        |SELECT dayn, cents,
        |  CAST(sum(cents) OVER (ORDER BY dayn
        |    RANGE BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS win_sum,
        |  CAST(count(*) OVER (ORDER BY dayn
        |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_n,
        |  CAST(min(cents) OVER (ORDER BY dayn
        |    RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS BIGINT) AS fut_min
        |FROM daily ORDER BY dayn""".stripMargin))

  val all: Seq[QueryDef] = Seq(qRangemovRewrite)
}
