package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Forty-fifth wave — SQL pipe syntax and equi-depth binning.
  *
  *  - `q_pipe_syntax`: Spark 4's SQL pipe operators (`|>`) — the
  *    linear dataflow form of SQL (FROM … |> WHERE … |> AGGREGATE) that
  *    reads like the DataFrame API; Catalyst resolves it to the SAME
  *    plan as the nested form, so pushdown/codegen are untouched. The
  *    oracle runs the equivalent classic SQL — proving the two
  *    spellings are one query.
  *  - `q_equidepth_hist`: decile (equi-DEPTH) histogram — the
  *    complement of q_histogram's equi-width bins, and the binning that
  *    drift monitors (q_psi) and winsorization build on. Bin of a value
  *    = exact integer rank arithmetic ((cum−c)·10 div n) on the
  *    per-value count aggregate: a value straddling a boundary lands in
  *    its lowest rank's bin, deterministically; the corpus is never
  *    globally sorted.
  */
object R45Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_pipe_syntax ----------

  val qPipeSyntax = QueryDef("q_pipe_syntax",
    (s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """FROM orders
          ||> WHERE o_orderstatus = 'F'
          ||> AGGREGATE CAST(count(*) AS BIGINT) AS n,
          |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |   GROUP BY o_orderpriority
          ||> ORDER BY o_orderpriority""".stripMargin)
    },
    Some(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // ---------- q_equidepth_hist ----------

  val qEquidepthHist = QueryDef("q_equidepth_hist",
    (s, dir) => RewriteGlobalRankWindows.force {
      val g = t(s, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")
          .as("cents"))
        .groupBy("cents").agg(count(lit(1)).cast("long").as("c"))
      val w = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wAll))
        .withColumn("bin", expr("((cum - c) * 10) div n"))
        .groupBy("bin")
        .agg(sum(col("c")).cast("long").as("n_rows"),
          min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
        .orderBy("bin")
    },
    Some(
      """WITH g AS (SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM orders GROUP BY 1),
        |cum AS (SELECT cents, c,
        |          CAST(sum(c) OVER (ORDER BY cents
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |          CAST(sum(c) OVER () AS BIGINT) AS n
        |        FROM g)
        |SELECT ((cum - c) * 10) // n AS bin,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM cum GROUP BY 1 ORDER BY bin""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPipeSyntax, qEquidepthHist)
}
