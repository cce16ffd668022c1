package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Sixty-second wave — empirical-Bayes rate shrinkage.
  *
  * `q_eb_shrinkage`: beta-binomial smoothing of per-source purchase
  * rates — the small-sample fix every per-segment rate dashboard needs
  * (a source with 3 events should not report rate 0 or 1 at face
  * value). Method-of-moments prior: per-source raw rates quantize to
  * DECIMAL(18,9) BEFORE the mean/variance sums (order-independent over
  * the &#124;sources&#124;-row aggregate), α/β and each shrunk rate
  * (x+α)/(n+α+β) are single shared IEEE expressions. Degenerate
  * variance (v = 0 or v ≥ m(1−m)) falls back to no shrinkage via an
  * integer-decided CASE on the quantized decimals.
  */
object R62Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared prior arithmetic over (m, v) as DOUBLE columns:
    * k = m(1−m)/v − 1; α = m·k, β = (1−m)·k. */
  private val priorSql: String =
    """CASE WHEN v <= 0.0 OR v >= m * (1.0 - m) THEN NULL
      |     ELSE m * (m * (1.0 - m) / v - 1.0) END AS alpha,
      |  CASE WHEN v <= 0.0 OR v >= m * (1.0 - m) THEN NULL
      |     ELSE (1.0 - m) * (m * (1.0 - m) / v - 1.0) END AS beta""".stripMargin

  /** Shared shrinkage over (x, n, alpha, beta). */
  private val shrinkSql: String =
    """CASE WHEN alpha IS NULL THEN round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6)
      |     ELSE round((CAST(x AS DOUBLE) + alpha)
      |       / (CAST(n AS DOUBLE) + alpha + beta), 6) END""".stripMargin

  val qEbShrinkage = QueryDef("q_eb_shrinkage",
    (s, dir) => {
      val g = t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"))
        .selectExpr("user_id", "n", "CAST(x AS BIGINT) AS x",
          "CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(18,9)) AS r")
      val mom = g.agg(
          count(lit(1)).cast("long").as("k"),
          sum(col("r")).as("sr"),
          sum(col("r") * col("r")).as("srr"))
        .selectExpr(
          "CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) AS m",
          "CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)" +
            " - (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))" +
            " * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE)) AS v")
        .selectExpr(Seq("m", "v") ++ priorSql.split(",\n").toSeq: _*)
      g.crossJoin(broadcast(mom))
        .selectExpr("user_id", "n", "x",
          "CAST(r AS DOUBLE) AS raw_rate",
          s"$shrinkSql AS shrunk_rate")
        .orderBy("user_id")
    },
    Some(
      s"""WITH g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM events GROUP BY user_id),
         |r AS (SELECT user_id, n, x,
         |    CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(18,9)) AS r
         |  FROM g),
         |mom0 AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    sum(r) AS sr, sum(r * r) AS srr FROM r),
         |mv AS (SELECT CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) AS m,
         |    CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)
         |      - (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
         |      * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE)) AS v
         |  FROM mom0),
         |prior AS (SELECT m, v, $priorSql FROM mv)
         |SELECT user_id, n, x, CAST(r AS DOUBLE) AS raw_rate,
         |  $shrinkSql AS shrunk_rate
         |FROM r CROSS JOIN prior ORDER BY user_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qEbShrinkage)
}
