package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.RangeJoin
import graft.queries.Queries.QueryDef

/** Forty-eighth wave — the native broadcast range join under oracle.
  *
  * `q_range_native` drives [[graft.plans.RangeJoin]] (custom
  * LogicalPlan + Strategy + SparkPlan — see RangeJoin.scala) on a
  * point-in-interval workload: event values stabbed into an
  * order-derived bracket table. Catalyst's only built-in plan for a
  * BETWEEN-only join is BroadcastNestedLoopJoin (every point × every
  * interval); the custom operator binary-searches the sorted broadcast
  * side — O(log m + k) per point. RangeJoinSpec pins
  * brute-force-equality, boundary inclusivity, the nested-interval
  * scan-stop, and the plan shape; this query puts the values under the
  * DuckDB oracle.
  */
object R48Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val qRangeNative = QueryDef("q_range_native",
    (s, dir) => {
      val ivs = t(s, dir, "orders").where(col("o_orderkey") < 300)
        .selectExpr("o_orderkey AS iid",
          "CAST(round(o_totalprice * 100.0) AS BIGINT) AS lo",
          "CAST(round(o_totalprice * 100.0) AS BIGINT)" +
            " + (o_orderkey % 50 + 1) * 200000 AS hi")
      val pts = t(s, dir, "events")
        .selectExpr("event_id AS pid",
          "CAST(round(value * 100.0) AS BIGINT) * 1000 AS p")
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi")
        .groupBy("iid")
        .agg(count(lit(1)).cast("long").as("n_points"),
          sum(col("p")).as("sum_p"))
        .selectExpr("iid", "n_points", "CAST(sum_p AS BIGINT) AS sum_p")
        .orderBy("iid")
    },
    Some(
      """WITH ivs AS (SELECT o_orderkey AS iid,
        |         CAST(round(o_totalprice * 100.0) AS BIGINT) AS lo,
        |         CAST(round(o_totalprice * 100.0) AS BIGINT)
        |           + (o_orderkey % 50 + 1) * 200000 AS hi
        |       FROM orders WHERE o_orderkey < 300),
        |pts AS (SELECT event_id AS pid,
        |          CAST(round(value * 100.0) AS BIGINT) * 1000 AS p
        |        FROM events)
        |SELECT iid, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(sum(p) AS BIGINT) AS sum_p
        |FROM pts JOIN ivs ON p BETWEEN lo AND hi
        |GROUP BY iid ORDER BY iid""".stripMargin))

  val all: Seq[QueryDef] = Seq(qRangeNative)
}
