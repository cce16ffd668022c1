package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Sixty-third wave — median-absolute-deviation outliers.
  *
  * `q_mad_outliers`: the ROBUST outlier screen beside q_zscore_outliers
  * (a mean/σ rule is dragged by the very outliers it hunts; median/MAD
  * is 50%-breakdown-proof). Everything is integer-exact on the cent
  * lattice: the median is a rank selection over the per-value count
  * aggregate (cum·2 ≥ n), the MAD is the same selection over
  * |x−median| counts, and the flag cross-multiplies the 3·1.4826
  * Gaussian consistency constant to integers
  * (|x−med|·10000 > 44478·MAD) — the outlier SET is bit-stable across
  * engines and partitionings. Windows ride &#124;distinct
  * values&#124;-sized aggregates; the corpus is never globally sorted.
  */
object R63Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val qMadOutliers = QueryDef("q_mad_outliers",
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = t(s, dir, "events")
        .select(col("event_id"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      val g = ev.groupBy("cents").agg(count(lit(1)).cast("long").as("c"))
      val wCum = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(lit(1))
      val med = g.withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll).cast("long"))
        .agg(min(when(col("cum") * 2 >= col("n"), col("cents"))).as("med"))
      val dev = ev.crossJoin(broadcast(med))
        .selectExpr("event_id", "cents", "med", "abs(cents - med) AS d")
      val gd = dev.groupBy("d").agg(count(lit(1)).cast("long").as("c"))
      val mad = gd.withColumn("cum", sum(col("c")).over(Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum(col("c")).over(wAll).cast("long"))
        .agg(min(when(col("cum") * 2 >= col("n"), col("d"))).as("mad"))
      dev.crossJoin(broadcast(mad))
        .where(expr("d * 10000 > 44478 * mad"))
        .selectExpr("event_id", "cents", "med", "mad", "d")
        .orderBy("event_id")
    },
    Some(
      """WITH ev AS (SELECT event_id, CAST(round(value * 100.0) AS BIGINT) AS cents
        |            FROM events),
        |g AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        |cum AS (SELECT cents, c,
        |    CAST(sum(c) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM g),
        |med AS (SELECT min(CASE WHEN cum * 2 >= n THEN cents END) AS med FROM cum),
        |dev AS (SELECT event_id, cents, med, abs(cents - med) AS d
        |        FROM ev CROSS JOIN med),
        |gd AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM dev GROUP BY 1),
        |cumd AS (SELECT d, c,
        |    CAST(sum(c) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM gd),
        |mad AS (SELECT min(CASE WHEN cum * 2 >= n THEN d END) AS mad FROM cumd)
        |SELECT event_id, cents, med, mad, d
        |FROM dev CROSS JOIN mad
        |WHERE d * 10000 > 44478 * mad
        |ORDER BY event_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMadOutliers)
}
