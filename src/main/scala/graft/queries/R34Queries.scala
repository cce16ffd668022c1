package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Thirty-fourth wave — time-weighted aggregation.
  *
  * `q_twap`: time-weighted average of `value` per user — each
  * observation weighted by how LONG it held (interval to the next
  * event), the irregular-time-series mean every row-weighted average
  * gets wrong (a value that held for an hour must count 3600× one that
  * held a second). Numerator and denominator accumulate as exact
  * DECIMAL(38,0) on the cent×microsecond lattice (value·Δt terms
  * overflow BIGINT on long spans); the final ratio is one per-row IEEE
  * division. One window pass + one aggregate — shuffle is per-user
  * keys. */
object R34Queries {

  val qTwap = QueryDef("q_twap",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val iv = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), floor(col("value") * 100).cast("long").as("c"))
        .withColumn("dt", lead("us", 1).over(w) - col("us"))
        .where(col("dt").isNotNull)
      iv.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_intervals"),
          sum(col("dt")).as("span_us"),
          sum(col("c").cast(d38) * col("dt").cast(d38)).as("num"),
          sum(col("dt").cast(d38)).as("den"))
        .select(col("user_id"), col("n_intervals"), col("span_us"),
          (col("num").cast("double") / col("den").cast("double"))
            .as("twap_cents"))
        .orderBy("user_id")
    },
    Some(
      """WITH iv AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS c,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dt
        |  FROM events
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  CAST(sum(CAST(c AS DECIMAL(38,0)) * CAST(dt AS DECIMAL(38,0)))
        |       AS DOUBLE)
        |    / CAST(sum(CAST(dt AS DECIMAL(38,0))) AS DOUBLE) AS twap_cents
        |FROM iv WHERE dt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qTwap)
}
