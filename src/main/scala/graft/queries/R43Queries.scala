package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.JaroWinkler
import graft.queries.Queries.QueryDef

/** Forty-third wave — anchor-text aggregation and graded string
  * similarity.
  *
  *  - `q_anchor_text`: per-target anchor-text rollup over the link
  *    graph — the classic web-graph relevance signal (what OTHER pages
  *    call a target describes it better than the target itself; the
  *    reference stores bare hrefs, `web_spider_oo.py:341-353`, this is
  *    the enrichment a search/RAG index builds on top). (href, anchor)
  *    pairs come from TWO group extractions of the same regex zipped
  *    positionally — identical scan order on both engines.
  *  - `q_jaro_rank`: Jaro-Winkler similarity as a native codegen'd
  *    expression ([[graft.functions.JaroWinkler]]) scored over name
  *    pairs — the graded ER verifier beside the exact levenshtein gate.
  *    The oracle runs DuckDB's INDEPENDENT built-in implementation:
  *    two implementations agreeing at round(4) on every pair is the
  *    q_unicode_norm discipline.
  *
  * Scale design: anchor extraction is map-side (regex per page, no
  * shuffle until the per-target aggregation, which is map-side
  * combined and |targets|-sized); the similarity query scores a
  * bounded verification sample pairwise — in production the pair list
  * comes from blocking (q_fuzzy_join's deletion neighborhoods), and
  * Jaro-Winkler is the per-candidate VERIFY step, never an all-pairs
  * scan.
  */
object R43Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_anchor_text ----------

  /** Anchor regex — group 1 = href, group 2 = anchor text. */
  private val AnchorRe = "<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>([^<]*)</a>"

  val qAnchorText = QueryDef("q_anchor_text",
    (s, dir) => {
      val html = t(s, dir, "documents").select(concat(
        lit("<html><body><a href=\"/doc/"),
        (col("doc_id") % 50).cast("string"), lit("\">"),
        expr("split_part(text, ' ', 1)"), lit("</a>"),
        when(col("doc_id") % 3 === 0,
          concat(lit("<a href=\"/cat/"), col("lang"), lit("\">"),
            col("lang"), lit(" docs</a>"))).otherwise(lit("")),
        lit("</body></html>")).as("html"))
      // two group-extractions of the SAME regex zip positionally —
      // identical scan order guarantees index i pairs href_i/anchor_i
      val pairs = html.select(
          regexp_extract_all(col("html"), lit(AnchorRe), lit(1)).as("hs"),
          regexp_extract_all(col("html"), lit(AnchorRe), lit(2)).as("ts"))
        .select(col("ts"), posexplode(col("hs")).as(Seq("i", "href")))
        .select(col("href"), element_at(col("ts"), col("i") + 1).as("anchor"))
      pairs.groupBy("href")
        .agg(count(lit(1)).cast("long").as("n_links"),
          countDistinct(col("anchor")).cast("long").as("n_anchors"),
          array_join(sort_array(collect_set(col("anchor"))), "|")
            .as("anchors"))
        .orderBy("href")
    },
    Some(
      s"""WITH h AS (SELECT '<html><body><a href="/doc/'
         |    || CAST(doc_id % 50 AS VARCHAR) || '">'
         |    || split_part(text, ' ', 1) || '</a>'
         |    || CASE WHEN doc_id % 3 = 0
         |         THEN '<a href="/cat/' || lang || '">' || lang || ' docs</a>'
         |         ELSE '' END
         |    || '</body></html>' AS html FROM documents),
         |z AS (SELECT regexp_extract_all(html, '$AnchorRe', 1) AS hs,
         |        regexp_extract_all(html, '$AnchorRe', 2) AS ts
         |      FROM h),
         |idx AS (SELECT hs, ts, unnest(generate_series(1, len(hs))) AS i FROM z),
         |pairs AS (SELECT hs[i] AS href, ts[i] AS anchor FROM idx)
         |SELECT href, CAST(count(*) AS BIGINT) AS n_links,
         |  CAST(count(DISTINCT anchor) AS BIGINT) AS n_anchors,
         |  list_aggregate(list_sort(list_distinct(list(anchor))), 'string_agg', '|')
         |    AS anchors
         |FROM pairs GROUP BY href ORDER BY href""".stripMargin))

  // ---------- q_jaro_rank ----------

  val qJaroRank = QueryDef("q_jaro_rank",
    (s, dir) => {
      val names = t(s, dir, "part").where(col("p_partkey") < 80)
        .select(col("p_partkey").as("ida"), col("p_name").as("na"))
      val b = names.select(col("ida").as("idb"), col("na").as("nb"))
      names.crossJoin(b).where(col("ida") < col("idb"))
        .withColumn("jw", round(JaroWinkler(col("na"), col("nb")), 4))
        .where(col("jw") >= 0.8)
        .select("ida", "idb", "na", "nb", "jw")
        .orderBy(col("jw").desc, col("ida"), col("idb"))
    },
    Some(
      """WITH names AS (SELECT p_partkey AS id, p_name AS name
        |               FROM part WHERE p_partkey < 80)
        |SELECT a.id AS ida, b.id AS idb, a.name AS na, b.name AS nb,
        |  round(jaro_winkler_similarity(a.name, b.name), 4) AS jw
        |FROM names a JOIN names b ON a.id < b.id
        |WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.8
        |ORDER BY jw DESC, ida, idb""".stripMargin))

  val all: Seq[QueryDef] = Seq(qAnchorText, qJaroRank)
}
