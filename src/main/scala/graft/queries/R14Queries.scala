package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Robots, Tables}
import graft.queries.Queries.QueryDef

/** Fourteenth wave — crawler-politeness and corpus-curation operators:
  *
  *  - `q_robots_filter`: RFC 9309 longest-prefix-match robots.txt
  *    admission (Allow beats Disallow on ties) as ONE map-side literal
  *    array expression — no join/shuffle/window over the frontier;
  *  - `q_sitemap_urls`: XML sitemap entries through Spark 4's native
  *    `from_xml` schema-on-read (the crawler's other URL source beside
  *    link mining); oracle extracts the same fields with regexes;
  *  - `q_quota_sample`: per-language quota sampling by deterministic
  *    md5 order — the corpus-mixing step that caps any one slice of a
  *    training set; one window per group, reproducible across engines.
  */
object R14Queries {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  // ---------- q_robots_filter ----------

  /** Rule set shared (as one Scala constant) between the Spark plan and
    * the generated oracle VALUES table. */
  private val robotsRules: Seq[(String, Boolean)] = Seq(
    "/private" -> false,
    "/private/data" -> true, // longest match overrides the /private deny
    "/tmp" -> false,
    "/fr" -> false)

  private def docPath: Column = {
    val id = col("doc_id").cast("string")
    when(col("doc_id") % 5 === 0, concat(lit("/public/"), id))
      .when(col("doc_id") % 5 === 1, concat(lit("/private/"), id))
      .when(col("doc_id") % 5 === 2, concat(lit("/private/data/"), id))
      .when(col("doc_id") % 5 === 3, concat(lit("/tmp/"), id))
      .otherwise(concat(lit("/"), col("lang"), lit("/"), id))
  }

  private val docPathSql: String =
    """CASE
      | WHEN doc_id % 5 = 0 THEN '/public/' || CAST(doc_id AS VARCHAR)
      | WHEN doc_id % 5 = 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
      | WHEN doc_id % 5 = 2 THEN '/private/data/' || CAST(doc_id AS VARCHAR)
      | WHEN doc_id % 5 = 3 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
      | ELSE '/' || lang || '/' || CAST(doc_id AS VARCHAR) END""".stripMargin

  private val robotsValuesSql: String = robotsRules
    .map { case (p, a) => s"('$p', $a)" }.mkString(", ")

  val qRobotsFilter = QueryDef("q_robots_filter",
    (s, dir) => Robots.allowed(
      t(s, dir, "documents").select(docPath.as("url")), robotsRules)
      .orderBy("url"),
    Some(
      s"""WITH u AS (SELECT $docPathSql AS url FROM documents),
         |m AS (SELECT u.url, r.allow, length(r.p) AS l
         |      FROM u LEFT JOIN (VALUES $robotsValuesSql) r(p, allow)
         |        ON starts_with(u.url, r.p)),
         |best AS (SELECT url, allow,
         |           row_number() OVER (PARTITION BY url
         |             ORDER BY l DESC NULLS LAST, allow DESC) AS rn
         |         FROM m)
         |SELECT url FROM best WHERE rn = 1 AND (allow IS NULL OR allow)
         |ORDER BY url""".stripMargin))

  // ---------- q_sitemap_urls ----------

  /** Deterministic sitemap <url> entry per document. */
  private def sitemapXml: Column = concat(
    lit("<url><loc>https://x.test/doc/"), col("doc_id").cast("string"),
    lit("</loc><lastmod>2025-06-"),
    lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
    lit("</lastmod><src>"), col("source"), lit("</src></url>"))

  private val sitemapXmlSql: String =
    """'<url><loc>https://x.test/doc/' || CAST(doc_id AS VARCHAR) ||
      |  '</loc><lastmod>2025-06-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
      |  '</lastmod><src>' || source || '</src></url>'""".stripMargin

  val qSitemapUrls = QueryDef("q_sitemap_urls",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), sitemapXml.as("xml"))
      .select(col("doc_id"),
        from_xml(col("xml"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "loc STRING, lastmod STRING, src STRING")).as("p"))
      .select(col("doc_id"), col("p.loc").as("loc"),
        col("p.lastmod").as("lastmod"), col("p.src").as("src"))
      .orderBy("doc_id"),
    Some(
      s"""WITH x AS (SELECT doc_id, $sitemapXmlSql AS xml FROM documents)
         |SELECT doc_id,
         |  regexp_extract(xml, '<loc>([^<]*)</loc>', 1) AS loc,
         |  regexp_extract(xml, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod,
         |  regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src
         |FROM x ORDER BY doc_id""".stripMargin))

  // ---------- q_quota_sample ----------

  /** Per-language cap of 10 docs, picked by deterministic md5 order —
    * reproducible corpus mixing (no RNG, same winners on any engine or
    * cluster layout). */
  val qQuotaSample = QueryDef("q_quota_sample",
    (s, dir) => {
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w).cast("int"))
        .where(col("rk") <= 10)
        .orderBy("lang", "rk")
    },
    Some(
      """WITH r AS (SELECT lang, doc_id,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
        |  FROM documents)
        |SELECT lang, doc_id, rk FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin))

  // ---------- q_ann_pq ----------

  /** Product-quantization ANN (16 subspaces × 16 codes = 16-byte codes)
    * with ADC shortlist + exact re-rank by id. Rows-only (approximate
    * by construction); recall@5 ≥ 0.8 and bit-for-bit determinism
    * contracts live in RowsOnlyContractSpec. */
  val qAnnPq = QueryDef("q_ann_pq",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val codebooks = graft.ext.PqAnn.trainCodebooks(emb, m = 16, k = 16,
        iters = 5)
      graft.ext.PqAnn.pqTopK(emb.where(col("vec_id") < 5), emb,
        codebooks, k = 5, shortlist = 50)
        .orderBy("query_id", "rn")
    },
    None)

  val all: Seq[QueryDef] =
    Seq(qRobotsFilter, qSitemapUrls, qQuotaSample, qAnnPq)
}
