package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Seventy-fourth wave — sequential testing, random projection, and
  * Wilson-interval rate screening.
  *
  *  - `q_sprt`: Wald's sequential probability ratio test replayed over
  *    the daily conversion stream of the B arm (odd user ids):
  *    Bernoulli log-likelihood ratio for H1: p = 0.28 vs H0: p = 0.12,
  *    α = β = 0.05 thresholds ±ln 19. Per-day LLR increments quantize
  *    to DECIMAL(18,9) (the q_psi discipline) and accumulate over the
  *    |days|-sized sweep; the emitted row is the FIRST threshold
  *    crossing — or the final 'continue' state if the walk never
  *    crosses, so the query is total at any scale. The streaming twin
  *    of the fixed-horizon q_ab_test.
  *  - `q_random_projection`: Johnson-Lindenstrauss sign projection of
  *    the embedding corpus to 16 dimensions — Rademacher ±1 signs from
  *    a shared integer mixer (bit 8: the quadratic mix's bit 0 is
  *    constant, since x²C + Dx ≡ x(x+1) ≡ 0 mod 2 for odd C/D — a
  *    measured trap), exact integer dot products on the ×10⁶ lattice.
  *    The sign matrix is 64×16 and broadcast; the corpus never
  *    shuffles wider than (vec, j) partial sums.
  *  - `q_wilson_flags`: per-source long-document rate with Wilson
  *    score intervals at z = 2 (z² = 4 keeps every coefficient
  *    integral; √ is IEEE-exact) — sources whose interval excludes the
  *    global rate get flagged. The small-sample-safe screen that
  *    replaces naive rate comparisons on skewed source sizes.
  */
object R74Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_sprt ----------

  val qSprt = QueryDef("q_sprt",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = Tables.events(s, dir).where(col("user_id") % 2 === 1)
        .select(((unix_micros(col("ts")) -
          ((unix_micros(col("ts")) % usPerDay) + usPerDay) % usPerDay) /
          usPerDay).cast("long").as("day"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"))
      val daily = ev.groupBy("day")
        .agg(sum(col("conv")).cast("long").as("k"),
          count(lit(1)).cast("long").as("n"))
      val terms = daily.withColumn("t", expr(
        "CAST(k AS DECIMAL(18,9)) * CAST(ln(CAST(0.28 AS DOUBLE) / CAST(0.12 AS DOUBLE)) AS DECIMAL(18,9))" +
        " + CAST(n - k AS DECIMAL(18,9)) * CAST(ln(CAST(0.72 AS DOUBLE) / CAST(0.88 AS DOUBLE)) AS DECIMAL(18,9))"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sweep = terms.withColumn("llr", sum(col("t")).over(w))
        .withColumn("nobs", count(lit(1)).over(w).cast("long"))
      val crossed = sweep.withColumn("state",
        when(col("llr").cast("double") >= math.log(19.0), "accept_h1")
          .when(col("llr").cast("double") <= -math.log(19.0), "accept_h0")
          .otherwise("continue"))
      val firstCross = crossed.where(col("state") =!= "continue")
        .agg(min(col("day")).as("d1"))
      val lastDay = crossed.agg(max(col("day")).as("d2"))
      val pick = firstCross.crossJoin(lastDay)
        .select(coalesce(col("d1"), col("d2")).as("d"))
      crossed.join(broadcast(pick), col("day") === col("d"))
        .select(col("day").as("decision_day"), col("state").as("decision"),
          col("llr").cast("double").as("llr_at_decision"),
          col("nobs").as("n_days_observed"))
    },
    Some(
      """WITH ev AS (
        |  SELECT CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM events WHERE user_id % 2 = 1),
        |daily AS (
        |  SELECT day, CAST(sum(conv) AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY day),
        |terms AS (
        |  SELECT day, k, n,
        |    CAST(k AS DECIMAL(18,9)) * CAST(ln(CAST(0.28 AS DOUBLE) / CAST(0.12 AS DOUBLE)) AS DECIMAL(18,9))
        |    + CAST(n - k AS DECIMAL(18,9)) * CAST(ln(CAST(0.72 AS DOUBLE) / CAST(0.88 AS DOUBLE)) AS DECIMAL(18,9)) AS t
        |  FROM daily),
        |sweep AS (
        |  SELECT day, k, n,
        |    sum(t) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
        |  FROM terms),
        |crossed AS (
        |  SELECT day, llr,
        |    CASE WHEN CAST(llr AS DOUBLE) >= ln(19.0) THEN 'accept_h1'
        |         WHEN CAST(llr AS DOUBLE) <= -ln(19.0) THEN 'accept_h0'
        |         ELSE 'continue' END AS state
        |  FROM sweep),
        |pick AS (
        |  SELECT coalesce((SELECT min(day) FROM crossed WHERE state <> 'continue'),
        |                  (SELECT max(day) FROM crossed)) AS d)
        |SELECT c.day AS decision_day, c.state AS decision,
        |  CAST(c.llr AS DOUBLE) AS llr_at_decision,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sweep s WHERE s.day <= c.day) AS n_days_observed
        |FROM crossed c JOIN pick p ON c.day = p.d""".stripMargin))

  // ---------- q_random_projection ----------

  val qRandomProjection = QueryDef("q_random_projection",
    (s, dir) => {
      val pts = t(s, dir, "embeddings").where(col("vec_id") < 300)
        .select(col("vec_id"),
          posexplode(expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
            .as(Seq("d", "v")))
        .select(col("vec_id"), col("d").cast("long").as("d"), col("v"))
      val signs = s.range(64L * 16L).select(
          expr("id div 16").as("d"), (col("id") % 16).as("j"))
        .withColumn("x", col("d") * 31L + col("j") * 17L)
        // bit 8 of the mix: bit 0 is constant (x²C + Dx is always even)
        .withColumn("sgn",
          when(((col("x") * col("x") * 2654435761L + col("x") * 40503L) %
            4294967296L).divide(256).cast("long") % 2 === 0, 1L)
            .otherwise(-1L))
        .select("d", "j", "sgn")
      pts.join(broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(sum(col("v") * col("sgn")).cast("long").as("proj"))
        .orderBy("vec_id", "j")
    },
    Some(
      """WITH pts AS (
        |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(1, 65) t(i) WHERE vec_id < 300),
        |signs AS (
        |  SELECT CAST(d.g AS BIGINT) AS d, CAST(j.g AS BIGINT) AS j,
        |    CASE WHEN ((d.g * 31 + j.g * 17) * (d.g * 31 + j.g * 17) * 2654435761
        |               + (d.g * 31 + j.g * 17) * 40503) % 4294967296 // 256 % 2 = 0
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM generate_series(0, 63) d(g), generate_series(0, 15) j(g))
        |SELECT p.vec_id, s.j, CAST(sum(p.v * s.sgn) AS BIGINT) AS proj
        |FROM pts p JOIN signs s ON p.d = s.d
        |GROUP BY p.vec_id, s.j
        |ORDER BY p.vec_id, s.j""".stripMargin))

  // ---------- q_wilson_flags ----------

  val qWilsonFlags = QueryDef("q_wilson_flags",
    (s, dir) => {
      val src = t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("n_chars") >= 400, 1L).otherwise(0L)).cast("long")
            .as("k"))
      val gtot = src.agg(sum(col("k")).cast("long").as("gk"),
        sum(col("n")).cast("long").as("gn"))
      val b = src
        .withColumn("rate_bp",
          ((col("k") * 10000L - ((col("k") * 10000L % col("n")) + col("n"))
            % col("n")) / col("n")).cast("long"))
        .withColumn("lo", expr(
          "CAST((CAST(k AS DOUBLE) + 2.0" +
          " - 2.0 * sqrt(CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE) / CAST(n AS DOUBLE) + 1.0))" +
          " / (CAST(n AS DOUBLE) + 4.0) AS DECIMAL(18,9))"))
        .withColumn("hi", expr(
          "CAST((CAST(k AS DOUBLE) + 2.0" +
          " + 2.0 * sqrt(CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE) / CAST(n AS DOUBLE) + 1.0))" +
          " / (CAST(n AS DOUBLE) + 4.0) AS DECIMAL(18,9))"))
      b.crossJoin(broadcast(gtot))
        .withColumn("grate", col("gk").cast("double") / col("gn").cast("double"))
        .select(col("source"), col("n"), col("k"), col("rate_bp"),
          col("lo").cast("double").as("lo"), col("hi").cast("double").as("hi"),
          when(col("grate") < col("lo").cast("double") ||
            col("grate") > col("hi").cast("double"), 1L).otherwise(0L)
            .as("flagged"))
        .orderBy("source")
    },
    Some(
      """WITH src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM documents GROUP BY source),
        |gtot AS (
        |  SELECT CAST(sum(k) AS BIGINT) AS gk, CAST(sum(n) AS BIGINT) AS gn FROM src),
        |b AS (
        |  SELECT source, n, k,
        |    CAST((k * 10000 - ((k * 10000 % n) + n) % n) / n AS BIGINT) AS rate_bp,
        |    CAST((CAST(k AS DOUBLE) + 2.0
        |          - 2.0 * sqrt(CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE) / CAST(n AS DOUBLE) + 1.0))
        |         / (CAST(n AS DOUBLE) + 4.0) AS DECIMAL(18,9)) AS lo,
        |    CAST((CAST(k AS DOUBLE) + 2.0
        |          + 2.0 * sqrt(CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE) / CAST(n AS DOUBLE) + 1.0))
        |         / (CAST(n AS DOUBLE) + 4.0) AS DECIMAL(18,9)) AS hi
        |  FROM src)
        |SELECT b.source, b.n, b.k, b.rate_bp,
        |  CAST(b.lo AS DOUBLE) AS lo, CAST(b.hi AS DOUBLE) AS hi,
        |  CAST(CASE WHEN CAST(g.gk AS DOUBLE) / CAST(g.gn AS DOUBLE) < CAST(b.lo AS DOUBLE)
        |         OR CAST(g.gk AS DOUBLE) / CAST(g.gn AS DOUBLE) > CAST(b.hi AS DOUBLE)
        |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM b CROSS JOIN gtot g ORDER BY b.source""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSprt, qRandomProjection, qWilsonFlags)
}
