package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fifty-second wave — probability calibration and vocabulary coverage.
  *
  *  - `q_ece_calibration`: reliability diagram + expected calibration
  *    error for a pseudo-probability classifier (value rescaled to
  *    [0,1), purchase as the positive class) — the third leg of the
  *    classifier-eval tripod (q_auc_exact ranks, q_lang_confusion
  *    classifies, this calibrates). Bin ids are exact integer
  *    arithmetic on the cent lattice; per-bin gaps quantize to
  *    DECIMAL(18,9) before the n-weighted ECE sum, so the total is
  *    order-independent and engine-exact.
  *  - `q_vocab_coverage`: the token-coverage curve that sizes a
  *    vocabulary — the smallest frequency-rank prefix covering
  *    50/90/99% of token occurrences, with thresholds evaluated as
  *    cross-multiplied integers (100·cum ≥ pct·total — no floating
  *    CDF); the rank window rides the &#124;vocabulary&#124;-sized
  *    frequency aggregate.
  */
object R52Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_ece_calibration ----------

  /** Pseudo-probability scale: cents / 50000 (max value 490.02 ⇒
    * p < 1). One Scala constant feeds both engines. */
  private val PScale = 50000L

  val qEceCalibration = QueryDef("q_ece_calibration",
    (s, dir) => {
      val ev = t(s, dir, "events").select(
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("label"))
      val binned = ev
        .withColumn("bin", expr(s"least((cents * 10) div $PScale, 9)"))
        .groupBy("bin")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("cents")).as("sc"), sum(col("label")).as("pos"))
        .selectExpr("bin", "n",
          s"CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * $PScale.0) AS avg_p",
          "CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate",
          s"CAST(round(abs(CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * $PScale.0)" +
            " - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS gap")
      val tot = binned.agg(sum(col("n")).as("nt"))
      binned.crossJoin(broadcast(tot))
        .selectExpr("bin", "n", "avg_p", "rate",
          "CAST(gap AS DOUBLE) AS gap",
          "round(CAST(gap AS DOUBLE) * CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 9) AS ece_term")
        .orderBy("bin")
    },
    Some(
      s"""WITH ev AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS cents,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
         |  FROM events),
         |binned AS (SELECT least((cents * 10) // $PScale, 9) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cents) AS BIGINT) AS sc,
         |    CAST(sum(label) AS BIGINT) AS pos
         |  FROM ev GROUP BY 1),
         |g AS (SELECT bin, n,
         |    CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * $PScale.0) AS avg_p,
         |    CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
         |    CAST(round(abs(CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * $PScale.0)
         |      - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS gap
         |  FROM binned),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
         |SELECT bin, n, avg_p, rate, CAST(gap AS DOUBLE) AS gap,
         |  round(CAST(gap AS DOUBLE) * CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 9) AS ece_term
         |FROM g CROSS JOIN tot ORDER BY bin""".stripMargin))

  // ---------- q_vocab_coverage ----------

  val qVocabCoverage = QueryDef("q_vocab_coverage",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val freq = t(s, dir, "documents").where(col("doc_id") < 400)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).cast("long").as("c"))
      val w = Window.orderBy(col("c").desc, col("w"))
      val cum = freq
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("c").desc, col("w"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("total", sum(col("c")).over(
          Window.partitionBy(lit(1))).cast("long"))
      cum.agg(
          max(col("total")).as("total_tokens"),
          max(col("rk")).as("vocab_size"),
          min(when(col("cum") * 100 >= col("total") * 50, col("rk")))
            .as("ranks_50"),
          min(when(col("cum") * 100 >= col("total") * 90, col("rk")))
            .as("ranks_90"),
          min(when(col("cum") * 100 >= col("total") * 99, col("rk")))
            .as("ranks_99"))
        .selectExpr("CAST(total_tokens AS BIGINT) AS total_tokens",
          "CAST(vocab_size AS BIGINT) AS vocab_size",
          "ranks_50", "ranks_90", "ranks_99")
    },
    Some(
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |             FROM documents WHERE doc_id < 400),
        |freq AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
        |         WHERE len(w) > 0 GROUP BY 1),
        |cum AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
        |    CAST(sum(c) OVER (ORDER BY c DESC, w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS total
        |  FROM freq)
        |SELECT max(total) AS total_tokens, max(rk) AS vocab_size,
        |  min(CASE WHEN cum * 100 >= total * 50 THEN rk END) AS ranks_50,
        |  min(CASE WHEN cum * 100 >= total * 90 THEN rk END) AS ranks_90,
        |  min(CASE WHEN cum * 100 >= total * 99 THEN rk END) AS ranks_99
        |FROM cum""".stripMargin))

  val all: Seq[QueryDef] = Seq(qEceCalibration, qVocabCoverage)
}
