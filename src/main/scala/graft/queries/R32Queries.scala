package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Thirty-second wave — behavioral models and exact anomaly detection.
  *
  *  - `q_markov_transitions`: first-order Markov transition matrix over
  *    per-user event sequences — the behavioral model behind "what
  *    happens after a view"; transition probabilities are per-row
  *    single divisions (deterministic), counts are exact.
  *  - `q_zscore_outliers`: 3σ outlier detection with ZERO floating
  *    point at the decision boundary — the test (x−μ)² > 9σ² is
  *    cross-multiplied to exact DECIMAL arithmetic (n²·(x−μ)² compares
  *    against 9·n·(nΣx²−(Σx)²)), so the outlier SET is bit-stable
  *    across engines and partitionings. A double-valued σ threshold
  *    flips boundary rows between runs; an exact one cannot.
  *  - `q_benford`: first-significant-digit distribution vs Benford's
  *    law in exact basis points — the classic fabricated-data audit,
  *    run per digit with integer-only arithmetic.
  */
object R32Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_markov_transitions ----------

  /** Per-user consecutive event-type pairs → transition counts and
    * row-normalized probabilities. One window pass (per-user,
    * (ts, event_id)-ordered) and one |states|²-sized aggregate. */
  val qMarkovTransitions = QueryDef("q_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .where(col("next_type").isNotNull)
        .select(col("event_type").as("from_state"),
          col("next_type").as("to_state"))
      val counts = pairs.groupBy("from_state", "to_state")
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("from_state")
        .agg(sum(col("n")).as("n_from"))
      counts.join(totals, "from_state")
        .select(col("from_state"), col("to_state"), col("n"),
          (col("n").cast("double") / col("n_from").cast("double")).as("p"))
        .orderBy("from_state", "to_state")
    },
    Some(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events
        |), pairs AS (
        |  SELECT event_type AS from_state, next_type AS to_state
        |  FROM seq WHERE next_type IS NOT NULL
        |), c AS (
        |  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_state, sum(n) AS n_from FROM c GROUP BY 1
        |)
        |SELECT c.from_state, c.to_state, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM c JOIN tot t ON c.from_state = t.from_state
        |ORDER BY c.from_state, c.to_state""".stripMargin))

  // ---------- q_zscore_outliers ----------

  /** Exact 3σ outliers per event_type over `value` quantized to cents.
    * With S = Σx, Q = Σx², n rows (all BIGINT after the cent lattice):
    * (x−μ)² > 9σ²  ⇔  (n·x − S)² > 9·(n·Q − S²)  — both sides exact
    * DECIMAL(38,0); no division, no sqrt, no boundary jitter.
    * Map-side-combined (n, S, Q) per group, broadcast back: two scans,
    * one |groups|-row exchange. */
  val qZscoreOutliers = QueryDef("q_zscore_outliers",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val cents = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("c"))
      val stats = cents.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(col("c") * col("c")).as("q"))
      val dev = col("n").cast(d38) * col("c").cast(d38) - col("sx").cast(d38)
      cents.join(broadcast(stats), "event_type")
        .withColumn("is_outlier",
          dev * dev > lit(9).cast(d38) *
            (col("n").cast(d38) * col("q").cast(d38) -
              col("sx").cast(d38) * col("sx").cast(d38)))
        .where(col("is_outlier"))
        .select(col("event_type"), col("event_id"), col("c").as("cents"))
        .orderBy("event_type", "event_id")
    },
    Some(
      """WITH cents AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS c
        |  FROM events
        |), stats AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(c) AS sx, sum(c * c) AS q
        |  FROM cents GROUP BY event_type
        |)
        |SELECT c.event_type, c.event_id, c.c AS cents
        |FROM cents c JOIN stats s ON c.event_type = s.event_type
        |WHERE CAST(s.n * c.c - s.sx AS DECIMAL(38,0))
        |      * CAST(s.n * c.c - s.sx AS DECIMAL(38,0))
        |    > 9 * (CAST(s.n AS DECIMAL(38,0)) * CAST(s.q AS DECIMAL(38,0))
        |           - CAST(s.sx AS DECIMAL(38,0)) * CAST(s.sx AS DECIMAL(38,0)))
        |ORDER BY c.event_type, c.event_id""".stripMargin))

  // ---------- q_benford ----------

  /** Benford audit of o_totalprice: observed first-significant-digit
    * share vs the law's log10(1+1/d) expectation, both in basis points
    * (expected values precomputed as integer constants — the only
    * doubles die at build time). Deviation > 150 bp flags the digit.
    * One map-side digit extraction + a 9-row aggregate. */
  val qBenford = QueryDef("q_benford",
    (s, dir) => {
      val expectBp: Map[Int, Long] = (1 to 9).map(d =>
        d -> math.round(math.log10(1.0 + 1.0 / d) * 10000)).toMap
      val expectCol = (1 to 9).foldLeft(lit(0L)) { case (acc, d) =>
        when(col("digit") === d, lit(expectBp(d))).otherwise(acc)
      }
      val digits = t(s, dir, "orders")
        .select(substring(col("o_totalprice").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .where(col("digit").between(1, 9))
      val p = col("n") * 10000L
      digits.groupBy("digit")
        .agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n"))
          .over(Window.partitionBy(lit(1))))
        .withColumn("obs_bp",
          ((p - ((p % col("total")) + col("total")) % col("total"))
            / col("total")).cast("long"))
        .withColumn("exp_bp", expectCol)
        .withColumn("flagged",
          abs(col("obs_bp") - col("exp_bp")) > 150)
        .select(col("digit"), col("n"), col("obs_bp"), col("exp_bp"),
          col("flagged"))
        .orderBy("digit")
    },
    Some {
      val expectCase = (1 to 9).map(d =>
        s"WHEN $d THEN ${math.round(math.log10(1.0 + 1.0 / d) * 10000)}")
        .mkString("CASE digit ", " ", " END")
      s"""WITH digits AS (
         |  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER)
         |    AS digit
         |  FROM orders
         |), d AS (SELECT digit FROM digits WHERE digit BETWEEN 1 AND 9),
         |c AS (
         |  SELECT digit, CAST(count(*) AS BIGINT) AS n,
         |    sum(count(*)) OVER () AS total
         |  FROM d GROUP BY digit
         |)
         |SELECT digit, n,
         |  CAST((n * 10000 - ((n * 10000 % total) + total) % total) / total
         |    AS BIGINT) AS obs_bp,
         |  CAST($expectCase AS BIGINT) AS exp_bp,
         |  abs(CAST((n * 10000 - ((n * 10000 % total) + total) % total)
         |    / total AS BIGINT) - $expectCase) > 150 AS flagged
         |FROM c ORDER BY digit""".stripMargin
    })

  val all: Seq[QueryDef] =
    Seq(qMarkovTransitions, qZscoreOutliers, qBenford)
}
