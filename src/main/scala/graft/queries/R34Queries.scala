package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Thirty-fourth wave — time-weighted aggregation.
  *
  * `q_twap`: time-weighted average of `value` per user — each
  * observation weighted by how LONG it held (interval to the next
  * event), the irregular-time-series mean every row-weighted average
  * gets wrong (a value that held for an hour must count 3600× one that
  * held a second). The cent×microsecond numerator accumulates in two
  * BIGINT limbs split at 10⁶ (Σc·Δt = 10⁶·Σc·Δt_s + Σc·Δt_r): the
  * seconds limb is bounded by c_max × the user's span in SECONDS
  * (~5.6e12 at sf0.1) and the residual limb by c_max·10⁶ × intervals
  * per user (~5.6e15) — both far inside BIGINT, and decimal-free (the
  * r8 house rule: no width-38 multiplicands, no decimal arithmetic
  * near hashed output — DECIMAL(38,0)×DECIMAL(38,0) rides the engine's
  * width ceiling where promotion rules have moved across releases).
  * The final ratio recombines the limbs in IEEE double with the same
  * expression shape on both engines. One window pass + one aggregate —
  * shuffle is per-user keys. */
object R34Queries {

  val qTwap = QueryDef("q_twap",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val iv = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), floor(col("value") * 100).cast("long").as("c"))
        .withColumn("dt", lead("us", 1).over(w) - col("us"))
        .where(col("dt").isNotNull)
        .withColumn("dt_s", expr("CAST((dt - dt % 1000000) / 1000000 AS BIGINT)"))
        .withColumn("dt_r", expr("CAST(dt % 1000000 AS BIGINT)"))
      iv.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_intervals"),
          sum(col("dt")).as("span_us"),
          sum(col("c") * col("dt_s")).as("num_hi"),
          sum(col("c") * col("dt_r")).as("num_lo"))
        .select(col("user_id"), col("n_intervals"), col("span_us"),
          ((col("num_hi").cast("double") * lit(1e6)
            + col("num_lo").cast("double"))
            / col("span_us").cast("double")).as("twap_cents"))
        .orderBy("user_id")
    },
    Some(
      """WITH iv AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS c,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dt
        |  FROM events
        |),
        |limbs AS (
        |  SELECT user_id, c, dt,
        |    CAST((dt - dt % 1000000) / 1000000 AS BIGINT) AS dt_s,
        |    CAST(dt % 1000000 AS BIGINT) AS dt_r
        |  FROM iv WHERE dt IS NOT NULL
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  (CAST(sum(c * dt_s) AS DOUBLE) * 1e6 + CAST(sum(c * dt_r) AS DOUBLE))
        |    / CAST(sum(dt) AS DOUBLE) AS twap_cents
        |FROM limbs
        |GROUP BY user_id ORDER BY user_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qTwap)
}
