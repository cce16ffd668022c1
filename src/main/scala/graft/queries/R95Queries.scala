package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.TextOps
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninety-fifth wave — forecast scoring, annotator agreement, and
  * incremental top-k maintenance.
  *
  *  - `q_mase`: the MASE forecast score (Hyndman & Koehler 2006) for
  *    the seasonal-naive lag-7 forecaster of daily revenue, scaled by
  *    the lag-1 naive — both mean absolute errors are exact integer
  *    (Σ|Δ|, count) pairs from per-lag windows over the day series,
  *    the ratio one shared IEEE tree. MASE < 1 means weekly
  *    seasonality genuinely predicts; the scale-free score that lets
  *    forecast errors compare across series.
  *  - `q_kappa`: Cohen's κ (Cohen 1960) between the corpus's declared
  *    language labels and the stopword-profile LANG-ID rater
  *    (TextOps.langId, the exact q_lang_id machinery) — observed
  *    agreement, chance agreement from the exact marginal products,
  *    and κ = (p_o − p_e)/(1 − p_e). The annotator-QA statistic every
  *    labeling pipeline reports before labels become training data.
  *    Confusion-matrix-sized aggregates.
  *  - `q_ivm_topk`: incremental TOP-K maintenance under an
  *    increase-only delta (clone orders add spend): the new top-10 is
  *    provably contained in (old top-10 ∪ touched customers), so
  *    maintenance re-ranks a candidate set sized by the CHANGE, never
  *    rescanning the base — the monotone case where top-k IVM is
  *    exact (deletions would need the refill scan; documented). The
  *    oracle recomputes the top-10 from the mutated table outright.
  */
object R95Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_mase ----------

  val qMase = QueryDef("q_mase",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val days = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
          expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
            "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
            .as("usd"))
        .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
        .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))
      val w = Window.orderBy("day")
      val lagged = days
        .withColumn("l1", lag(col("v"), 1).over(w))
        .withColumn("l7", lag(col("v"), 7).over(w))
        .where(col("l7").isNotNull) // common support for both scales
      lagged.agg(count(lit(1)).cast("long").as("n"),
          sum(abs(col("v") - col("l7"))).cast("long").as("ae7"),
          sum(abs(col("v") - col("l1"))).cast("long").as("ae1"))
        .select(col("n"), col("ae7"), col("ae1"),
          round(expr("CAST(ae7 AS DOUBLE) / CAST(ae1 AS DOUBLE)"), 6).as("mase"))
    },
    Some(
      s"""WITH days AS (
         |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
         |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % $usPerDay)
         |      / $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
         |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |lagged AS (
         |  SELECT day, v,
         |    lag(v, 1) OVER (ORDER BY day) AS l1,
         |    lag(v, 7) OVER (ORDER BY day) AS l7
         |  FROM days)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(abs(v - l7)) AS BIGINT) AS ae7,
         |  CAST(sum(abs(v - l1)) AS BIGINT) AS ae1,
         |  round(CAST(sum(abs(v - l7)) AS DOUBLE)
         |    / CAST(sum(abs(v - l1)) AS DOUBLE), 6) AS mase
         |FROM lagged WHERE l7 IS NOT NULL""".stripMargin))

  // ---------- q_kappa ----------

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  val qKappa = QueryDef("q_kappa",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val conf = t(s, dir, "documents")
        .select(col("lang").as("a"), TextOps.langId(col("text")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).cast("long").as("c"))
      val tot = Window.partitionBy(lit(1))
      val agg = conf
        .withColumn("n", sum(col("c")).over(tot).cast("long"))
        .withColumn("po_num",
          sum(when(col("a") === col("b"), col("c")).otherwise(0L)).over(tot)
            .cast("long"))
      val margA = conf.groupBy("a").agg(sum(col("c")).cast("long").as("ra"))
      val margB = conf.groupBy(col("b").as("a"))
        .agg(sum(col("c")).cast("long").as("rb"))
      val pe = margA.join(margB, Seq("a"), "inner")
        .agg(sum(col("ra") * col("rb")).cast("long").as("pe_num"))
      agg.select(col("n"), col("po_num")).distinct()
        .crossJoin(broadcast(pe))
        .select(col("n"), col("po_num"), col("pe_num"),
          round(expr(
            "(CAST(po_num AS DOUBLE) / CAST(n AS DOUBLE)" +
              " - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))" +
              " / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"), 6)
            .as("kappa"))
    },
    Some {
      val h = TextOps.stopwords.map { case (l, ws) =>
        l -> s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(ws)}))) AS BIGINT)"
      }
      s"""WITH scored AS (
         |  SELECT lang AS a,
         |    ${h("en")} AS en_hits, ${h("de")} AS de_hits,
         |    ${h("fr")} AS fr_hits, ${h("es")} AS es_hits
         |  FROM documents),
         |pred AS (
         |  SELECT a,
         |    CASE WHEN en_hits = best AND best > 0 THEN 'en'
         |         WHEN de_hits = best AND best > 0 THEN 'de'
         |         WHEN fr_hits = best AND best > 0 THEN 'fr'
         |         WHEN es_hits = best AND best > 0 THEN 'es'
         |         ELSE 'und' END AS b
         |  FROM (SELECT *, greatest(en_hits, de_hits, fr_hits, es_hits) AS best
         |        FROM scored)),
         |conf AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM pred GROUP BY 1, 2),
         |tot AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS po_num
         |  FROM conf),
         |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM conf GROUP BY a),
         |mb AS (SELECT b AS a, CAST(sum(c) AS BIGINT) AS rb FROM conf GROUP BY b),
         |pe AS (
         |  SELECT CAST(sum(ra * rb) AS BIGINT) AS pe_num
         |  FROM ma JOIN mb ON ma.a = mb.a)
         |SELECT n, po_num, pe_num,
         |  round((CAST(po_num AS DOUBLE) / CAST(n AS DOUBLE)
         |    - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         |    / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
         |    AS kappa
         |FROM tot CROSS JOIN pe""".stripMargin
    })

  // ---------- q_ivm_topk ----------

  private val topK = 10

  val qIvmTopk = QueryDef("q_ivm_topk",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val base = t(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"),
          col("o_orderkey").as("k"))
      val old = base.groupBy("ck").agg(sum(col("cents")).cast("long").as("spend"))
      val oldTop = old.orderBy(col("spend").desc, col("ck")).limit(topK)
      // increase-only delta: clones of k ≡ 0 (mod 19) add their cents
      val delta = base.where(col("k") % 19 === 0)
        .groupBy("ck").agg(sum(col("cents") + 500L).cast("long").as("add"))
      val touched = old.join(delta, "ck")
        .select(col("ck"), (col("spend") + col("add")).as("spend"))
      // candidates = old top-k ∪ touched — sufficient under increases
      val cands = oldTop.join(delta, Seq("ck"), "left_anti")
        .unionAll(touched)
      cands.orderBy(col("spend").desc, col("ck")).limit(topK)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("spend").desc, col("ck"))).cast("long"))
        .select(col("rk"), col("ck"), col("spend"))
        .orderBy("rk")
    },
    Some(
      s"""WITH base AS (
         |  SELECT o_custkey AS ck, CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
         |    o_orderkey AS k
         |  FROM orders),
         |mutated AS (
         |  SELECT ck, cents FROM base
         |  UNION ALL
         |  SELECT ck, cents + 500 FROM base WHERE k % 19 = 0),
         |spend AS (
         |  SELECT ck, CAST(sum(cents) AS BIGINT) AS spend FROM mutated GROUP BY ck),
         |ranked AS (
         |  SELECT ck, spend,
         |    CAST(row_number() OVER (ORDER BY spend DESC, ck) AS BIGINT) AS rk
         |  FROM spend)
         |SELECT rk, ck, spend FROM ranked WHERE rk <= $topK
         |ORDER BY rk""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMase, qKappa, qIvmTopk)
}
