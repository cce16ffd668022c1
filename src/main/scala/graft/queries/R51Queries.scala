package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.TextOps
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fifty-first wave — classifier evaluation, skew diagnostics, and the
  * dataset card.
  *
  *  - `q_lang_confusion`: the confusion matrix for the language-ID
  *    classifier (q_lang_id's argmax) against gold labels, with
  *    per-class share in exact basis points — the CLASSIFICATION eval
  *    beside q_auc_exact's ranking eval; matrix is
  *    |langs|²-bounded after one map-side pass.
  *  - `q_skew_audit`: the pre-shuffle key-skew report that decides
  *    between a plain join, AQE skew split, and SkewOps salting:
  *    top-1/top-10 key shares and the exact Gini coefficient of the
  *    key distribution (Σ(2i−k−1)·c_i over the ASC-sorted per-key
  *    counts — integer-exact in basis points); all windows ride the
  *    |keys|-sized aggregate.
  *  - `q_dataset_card`: the one-row corpus summary a dataset card
  *    leads with — doc/token/language/source counts, exact-dup rate in
  *    basis points, mean length — ONE pass over the corpus plus
  *    model-sized aggregates.
  */
object R51Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_lang_confusion ----------

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  val qLangConfusion = QueryDef("q_lang_confusion",
    (s, dir) => {
      val pred = t(s, dir, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("pred_lang"))
      val m = pred.groupBy("lang", "pred_lang")
        .agg(count(lit(1)).cast("long").as("n"))
      val tot = m.groupBy("lang").agg(sum(col("n")).as("lang_total"))
      m.join(tot, "lang")
        .selectExpr("lang", "pred_lang", "n",
          "CAST(lang_total AS BIGINT) AS lang_total",
          "(n * 10000) div lang_total AS share_bp")
        .orderBy("lang", "pred_lang")
    },
    Some {
      val h = TextOps.stopwords.map { case (l, ws) =>
        l -> s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(ws)}))) AS BIGINT)"
      }
      s"""WITH scored AS (SELECT lang,
         |    ${h("en")} AS en_hits, ${h("de")} AS de_hits,
         |    ${h("fr")} AS fr_hits, ${h("es")} AS es_hits
         |  FROM documents),
         |best AS (SELECT *, greatest(en_hits, de_hits, fr_hits, es_hits) AS best
         |         FROM scored),
         |pred AS (SELECT lang,
         |    CASE WHEN en_hits = best AND best > 0 THEN 'en'
         |         WHEN de_hits = best AND best > 0 THEN 'de'
         |         WHEN fr_hits = best AND best > 0 THEN 'fr'
         |         WHEN es_hits = best AND best > 0 THEN 'es'
         |         ELSE 'und' END AS pred_lang
         |  FROM best),
         |m AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
         |      FROM pred GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_total
         |        FROM m GROUP BY 1)
         |SELECT m.lang, pred_lang, n, lang_total,
         |  (n * 10000) // lang_total AS share_bp
         |FROM m JOIN tot ON m.lang = tot.lang
         |ORDER BY m.lang, pred_lang""".stripMargin
    })

  // ---------- q_skew_audit ----------

  val qSkewAudit = QueryDef("q_skew_audit",
    (s, dir) => {
      val g = t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("c"))
      // r13 (VERDICT r12 task 1): both global row_numbers (one per
      // ORDER BY direction) route through GlobalRank and the total key
      // count through zero-shuffle GlobalFrameAgg, retiring the ENTITY
      // whitelist entry — the skew AUDIT itself no longer funnels.
      // row_number is tie-exact here (both orders end on user_id).
      val ranked = RewriteGlobalRankWindows.force(g
        .withColumn("i",
          row_number().over(Window.orderBy(col("c"), col("user_id")))
            .cast("long"))
        .withColumn("rd",
          row_number().over(Window.orderBy(col("c").desc, col("user_id")))
            .cast("long"))
        .withColumn("k", count(lit(1)).over().cast("long")))
      ranked.agg(
          sum(col("c")).as("n"), max(col("k")).as("k"),
          max(when(col("rd") === 1, col("c"))).as("top1"),
          sum(when(col("rd") <= 10, col("c")).otherwise(0L)).as("top10"),
          sum((col("i") * 2 - col("k") - 1) * col("c")).as("gnum"))
        .selectExpr("CAST(n AS BIGINT) AS n", "CAST(k AS BIGINT) AS k",
          "top1", "CAST(top10 AS BIGINT) AS top10",
          "(top1 * 10000) div n AS top1_bp",
          "(top10 * 10000) div n AS top10_bp",
          "(gnum * 10000) div (k * n) AS gini_bp")
    },
    Some(
      """WITH g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1),
        |ranked AS (SELECT c,
        |    CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS i,
        |    CAST(row_number() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rd,
        |    CAST(count(*) OVER () AS BIGINT) AS k
        |  FROM g),
        |agg AS (SELECT CAST(sum(c) AS BIGINT) AS n, max(k) AS k,
        |    max(CASE WHEN rd = 1 THEN c END) AS top1,
        |    CAST(sum(CASE WHEN rd <= 10 THEN c ELSE 0 END) AS BIGINT) AS top10,
        |    CAST(sum((i * 2 - k - 1) * c) AS BIGINT) AS gnum
        |  FROM ranked)
        |SELECT n, k, top1, top10,
        |  (top1 * 10000) // n AS top1_bp,
        |  (top10 * 10000) // n AS top10_bp,
        |  (gnum * 10000) // (k * n) AS gini_bp
        |FROM agg""".stripMargin))

  // ---------- q_dataset_card ----------

  val qDatasetCard = QueryDef("q_dataset_card",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          TextOps.tokenCount(col("text")).as("toks"), md5(col("text")).as("h"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          countDistinct(col("lang")).cast("long").as("n_langs"),
          countDistinct(col("source")).cast("long").as("n_sources"),
          countDistinct(col("h")).cast("long").as("n_distinct"),
          sum(col("n_chars")).as("sum_chars"))
        .selectExpr("n_docs", "CAST(n_tokens AS BIGINT) AS n_tokens",
          "n_langs", "n_sources", "n_distinct",
          "((n_docs - n_distinct) * 10000) div n_docs AS dup_bp",
          "CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_chars")
    },
    Some(
      """WITH base AS (SELECT doc_id, lang, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    md5(text) AS h
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
        |  ((count(*) - count(DISTINCT h)) * 10000) // count(*) AS dup_bp,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars
        |FROM base""".stripMargin))

  val all: Seq[QueryDef] = Seq(qLangConfusion, qSkewAudit, qDatasetCard)
}
