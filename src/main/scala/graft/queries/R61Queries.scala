package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Sixty-first wave — rolling correlation.
  *
  * `q_rolling_corr`: 7-day rolling Pearson correlation between the
  * purchase and view daily revenue series — the co-movement monitor
  * dashboards plot. The q_corr_exact discipline windowed: every frame
  * statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT sum over
  * the ROWS 6 PRECEDING frame of the &#124;days&#124;-sized aggregate,
  * the correlation is cross-multiplied integers with one final IEEE
  * expression (identical on both engines), and zero-variance frames
  * yield NULL by an integer CASE — never a floating comparison.
  */
object R61Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Verbatim-shared correlation over frame sums (n, sx, sy, sxy, sxx, syy). */
  private val corrSql: String =
    """CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
      |       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
      |END""".stripMargin

  val qRollingCorr = QueryDef("q_rolling_corr",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val daily = Tables.events(s, dir)
        .where(col("event_type").isin("purchase", "view"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          sum(when(col("event_type") === "purchase",
            expr("CAST(round(value * 100.0) AS BIGINT)")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view",
            expr("CAST(round(value * 100.0) AS BIGINT)")).otherwise(0L)).as("y"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("n", count(lit(1)).over(w).cast("long"))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sy", sum(col("y")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("syy", sum(col("y") * col("y")).over(w))
        .selectExpr("day", "n", s"$corrSql AS corr7")
        .orderBy("day")
    },
    Some(
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN event_type = 'view'
         |      THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
         |  FROM events WHERE event_type IN ('purchase', 'view')
         |  GROUP BY 1),
         |framed AS (SELECT day,
         |    CAST(count(*) OVER w AS BIGINT) AS n,
         |    CAST(sum(x) OVER w AS BIGINT) AS sx,
         |    CAST(sum(y) OVER w AS BIGINT) AS sy,
         |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
         |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         |    CAST(sum(y * y) OVER w AS BIGINT) AS syy
         |  FROM daily
         |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT day, n, $corrSql AS corr7
         |FROM framed ORDER BY day""".stripMargin))

  val all: Seq[QueryDef] = Seq(qRollingCorr)
}
