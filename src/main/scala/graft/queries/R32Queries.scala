package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Thirty-second wave — behavioral models and exact anomaly detection.
  *
  *  - `q_markov_transitions`: first-order Markov transition matrix over
  *    per-user event sequences — the behavioral model behind "what
  *    happens after a view"; transition probabilities are per-row
  *    single divisions (deterministic), counts are exact.
  *  - `q_zscore_outliers`: 3σ outlier detection with ZERO floating
  *    point at the decision boundary — the test (x−μ)² > 9σ² is
  *    cross-multiplied to (n·x−Σx)² > 9·(nΣx²−(Σx)²) and evaluated in
  *    pure BIGINT limb arithmetic (base 10⁶), so the outlier SET is
  *    bit-stable across engines, engine RELEASES, and partitionings.
  *    A double-valued σ threshold flips boundary rows between runs; a
  *    decimal one drifts with the engine's width-promotion rules
  *    (the r6/r7 q_acf failure class); 64-bit integers cannot.
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
    * (x−μ)² > 9σ²  ⇔  (n·x − S)² > 9·(n·Q − S²), decided in pure
    * BIGINT limb arithmetic (the r8 q_acf recipe — no decimal anywhere,
    * so no engine-release width-promotion surface; r9 rewrite of the
    * DECIMAL(38,0) predicate the fragility guard's R2b flags).
    *
    * Limb layout (base B = 10⁶): a = |n·x − S| = a_hi·B + a_lo;
    * Q = q2·B² + q1·B + q0; S = s_hi·B + s_lo. Then
    *   LHS − 9·RHS = d2·B² + d1·B + d0 with
    *   d2 = a_hi² − 9(n·q2 − s_hi²),
    *   d1 = 2·a_hi·a_lo − 9(n·q1 − 2·s_hi·s_lo),
    *   d0 = a_lo² − 9(n·q0 − s_lo²).
    * Two carry-normalization steps (the version-invariant trunc-div
    * idiom `(x − x % B)/B`, identical truncated `%` semantics on both
    * engines) reduce to e2·B² + u1·B + u0 with |u1|,|u0| < B, so the
    * sign is e2's sign, falling to u1·B + u0 when e2 = 0.
    *
    * Bounds (design ceiling n ≤ 2·10⁸ rows/group ≈ sf1000, cents
    * ≤ 5.7·10⁴): S ≤ 1.2·10¹³, Q ≤ 6.4·10¹⁷, a ≤ 1.2·10¹³, every limb
    * product ≤ 2·10¹⁴ and every d/e term ≤ 2.5·10¹⁵ — all far inside
    * BIGINT, and inside 2⁵³ so the post-remainder divisions are exact
    * through the intermediate double on both engines (q2's 6.4·10¹⁷
    * numerator exceeds 2⁵³ but is a multiple of 10¹² = 2¹²·5¹², so its
    * mantissa needs only q2·5¹² ≤ 1.6·10¹⁴ < 2⁵³ — still exact).
    *
    * Map-side-combined (n, S, Q) per group, broadcast back: two scans,
    * one |groups|-row exchange; all predicate math is codegen'd
    * 64-bit integer ops. */
  val qZscoreOutliers = QueryDef("q_zscore_outliers",
    (s, dir) => {
      val cents = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("c"))
      val stats = cents.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(col("c") * col("c")).as("q"))
        .selectExpr("event_type", "n", "sx",
          "CAST((q - q % 1000000000000) / 1000000000000 AS BIGINT) AS q2",
          "CAST(((q % 1000000000000) - (q % 1000000000000) % 1000000) / 1000000 AS BIGINT) AS q1",
          "CAST(q % 1000000 AS BIGINT) AS q0",
          "CAST((sx - sx % 1000000) / 1000000 AS BIGINT) AS s_hi",
          "CAST(sx % 1000000 AS BIGINT) AS s_lo")
      cents.join(broadcast(stats), "event_type")
        .selectExpr("event_type", "event_id", "c",
          "abs(n * c - sx) AS a", "n", "q2", "q1", "q0", "s_hi", "s_lo")
        .selectExpr("event_type", "event_id", "c",
          "CAST((a - a % 1000000) / 1000000 AS BIGINT) AS a_hi",
          "CAST(a % 1000000 AS BIGINT) AS a_lo",
          "n", "q2", "q1", "q0", "s_hi", "s_lo")
        .selectExpr("event_type", "event_id", "c",
          "a_hi * a_hi - 9 * (n * q2 - s_hi * s_hi) AS d2",
          "2 * a_hi * a_lo - 9 * (n * q1 - 2 * s_hi * s_lo) AS d1",
          "a_lo * a_lo - 9 * (n * q0 - s_lo * s_lo) AS d0")
        .selectExpr("event_type", "event_id", "c", "d2",
          "d1 + CAST((d0 - d0 % 1000000) / 1000000 AS BIGINT) AS e1",
          "CAST(d0 % 1000000 AS BIGINT) AS u0")
        .selectExpr("event_type", "event_id", "c",
          "d2 + CAST((e1 - e1 % 1000000) / 1000000 AS BIGINT) AS e2",
          "CAST(e1 % 1000000 AS BIGINT) AS u1", "u0")
        .where(expr("e2 > 0 OR (e2 = 0 AND u1 * 1000000 + u0 > 0)"))
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
        |    CAST(sum(c) AS BIGINT) AS sx, CAST(sum(c * c) AS BIGINT) AS q
        |  FROM cents GROUP BY event_type
        |), limbs AS (
        |  SELECT event_type, n, sx,
        |    CAST((q - q % 1000000000000) / 1000000000000 AS BIGINT) AS q2,
        |    CAST(((q % 1000000000000) - (q % 1000000000000) % 1000000) / 1000000 AS BIGINT) AS q1,
        |    CAST(q % 1000000 AS BIGINT) AS q0,
        |    CAST((sx - sx % 1000000) / 1000000 AS BIGINT) AS s_hi,
        |    CAST(sx % 1000000 AS BIGINT) AS s_lo
        |  FROM stats
        |), dev AS (
        |  SELECT c.event_type, c.event_id, c.c,
        |    abs(l.n * c.c - l.sx) AS a,
        |    l.n, l.q2, l.q1, l.q0, l.s_hi, l.s_lo
        |  FROM cents c JOIN limbs l ON c.event_type = l.event_type
        |), sq AS (
        |  SELECT event_type, event_id, c,
        |    CAST((a - a % 1000000) / 1000000 AS BIGINT) AS a_hi,
        |    CAST(a % 1000000 AS BIGINT) AS a_lo,
        |    n, q2, q1, q0, s_hi, s_lo
        |  FROM dev
        |), dd AS (
        |  SELECT event_type, event_id, c,
        |    a_hi * a_hi - 9 * (n * q2 - s_hi * s_hi) AS d2,
        |    2 * a_hi * a_lo - 9 * (n * q1 - 2 * s_hi * s_lo) AS d1,
        |    a_lo * a_lo - 9 * (n * q0 - s_lo * s_lo) AS d0
        |  FROM sq
        |), n1 AS (
        |  SELECT event_type, event_id, c, d2,
        |    d1 + CAST((d0 - d0 % 1000000) / 1000000 AS BIGINT) AS e1,
        |    CAST(d0 % 1000000 AS BIGINT) AS u0
        |  FROM dd
        |), n2 AS (
        |  SELECT event_type, event_id, c,
        |    d2 + CAST((e1 - e1 % 1000000) / 1000000 AS BIGINT) AS e2,
        |    CAST(e1 % 1000000 AS BIGINT) AS u1, u0
        |  FROM n1
        |)
        |SELECT event_type, event_id, c AS cents
        |FROM n2
        |WHERE e2 > 0 OR (e2 = 0 AND u1 * 1000000 + u0 > 0)
        |ORDER BY event_type, event_id""".stripMargin))

  // ---------- q_benford ----------

  /** Benford audit of o_totalprice: observed first-significant-digit
    * share vs the law's log10(1+1/d) expectation, both in basis points
    * (expected values precomputed as integer constants — the only
    * doubles die at build time). Deviation > 150 bp flags the digit.
    * One map-side digit extraction + a 9-row aggregate. */
  val qBenford = QueryDef("q_benford",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
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
