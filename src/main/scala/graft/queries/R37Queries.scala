package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.SimilarityOps
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Thirty-seventh wave — the retrieval stack over the crawled corpus.
  *
  * The reference ends at "store the page text" (its `raw.indexing`
  * table is literally named for retrieval —
  * `web_spider_oo.py:229-250`); these queries are the retrieval layer
  * a production corpus serves: Okapi BM25 lexical scoring and
  * reciprocal-rank fusion of the lexical ranking with the embedding
  * ranking (the standard hybrid-search topology in front of RAG).
  *
  *  - `q_bm25`: Okapi BM25 (k1=1.2, b=0.75, the Robertson/Spärck Jones
  *    formulation with the +1 idf smoothing Lucene uses) for a fixed
  *    query term set. Per-term contributions are round(4)-quantized to
  *    DECIMAL before the per-doc sum, so the score is order-independent
  *    and engine-exact.
  *  - `q_rrf_fusion`: RRF (Cormack/Clarke/Buettcher SIGIR'09,
  *    score = Σ 1/(60+rank)) over the BM25 ranking and the
  *    cosine-to-query-vector ranking — rank arithmetic on INTEGER
  *    ranks, each 1/(60+r) quantized to DECIMAL(18,9) before the sum.
  *
  * Scale design: tokenization explodes map-side; tf is one
  * (doc, term)-keyed map-side-combined aggregation over ONLY the rows
  * matching the query terms (the term filter pushes below the
  * shuffle); df and avgdl are query-terms- and 1-row-sized broadcasts;
  * nothing corpus×corpus. The global rank windows order the MATCHED
  * result lists — in production the per-query shortlist (top-k), here
  * the fixture slice; the corpus itself is never globally sorted.
  */
object R37Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Doc-slice size — literal on both sides (the q_tfidf_top
    * discipline). */
  private val N = 300

  /** Query term set — one Scala constant generates both engines'
    * predicate. */
  private val QueryTerms = Seq("scan", "merge", "window")

  /** BM25 per-(doc, term) contribution — ONE SQL fragment both engines
    * run verbatim over columns (tf, df, dl, avgdl): idf with +1
    * smoothing times the k1/b length-normalized tf saturation.
    * round(4) absorbs libm ln() divergence; the DECIMAL cast makes the
    * later per-doc sum order-independent. */
  private val contribSql: String =
    s"""CAST(round(
       |  ln(1.0 + (($N.0 - CAST(df AS DOUBLE)) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |  * (CAST(tf AS DOUBLE) * 2.2)
       |  / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))),
       |4) AS DECIMAL(18,4))""".stripMargin

  /** RRF pair contribution — verbatim-shared; a doc absent from the
    * lexical ranking contributes 0 from that ranker. */
  private val rrfSql: String =
    """CAST(coalesce(round(1.0 / (60.0 + CAST(r_lex AS DOUBLE)), 9), 0.0) AS DECIMAL(18,9))
      | + CAST(round(1.0 / (60.0 + CAST(r_sem AS DOUBLE)), 9) AS DECIMAL(18,9))""".stripMargin

  private def tok(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").where(col("doc_id") < N)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)

  /** Scored BM25 table (doc_id, n_terms, score DECIMAL) — shared by
    * both queries. */
  private[queries] def bm25(s: SparkSession, dir: String): DataFrame = {
    val tk = tok(s, dir)
    val dl = tk.groupBy("doc_id").agg(count(lit(1)).cast("long").as("dl"))
    val avg = dl.agg(sum(col("dl")).as("sdl"))
      .selectExpr(s"CAST(sdl AS DOUBLE) / $N.0 AS avgdl")
    val tf = tk.where(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    tf.join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(avg))
      .withColumn("contrib", expr(contribSql))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("contrib")).as("score"))
  }

  /** Shared oracle CTE chain ending in bm25(doc_id, n_terms, score). */
  private[queries] val bm25Sql: String = {
    val inList = QueryTerms.map(w => s"'$w'").mkString(", ")
    s"""docs AS (SELECT doc_id, string_split(text, ' ') AS arr
       |          FROM documents WHERE doc_id < $N),
       |idx AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
       |        FROM docs),
       |tok AS (SELECT doc_id, arr[i] AS term FROM idx WHERE len(arr[i]) > 0),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
       |avgd AS (SELECT CAST(sum(dl) AS DOUBLE) / $N.0 AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok WHERE term IN ($inList) GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |contrib AS (SELECT doc_id, $contribSql AS contrib
       |            FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
       |            CROSS JOIN avgd),
       |bm25 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |           sum(contrib) AS score
       |         FROM contrib GROUP BY 1)""".stripMargin
  }

  // ---------- q_bm25 ----------

  val qBm25 = QueryDef("q_bm25",
    (s, dir) => bm25(s, dir)
      .select(col("doc_id"), col("n_terms"),
        col("score").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(25),
    Some(
      s"""WITH $bm25Sql
         |SELECT doc_id, n_terms, CAST(score AS DOUBLE) AS score
         |FROM bm25 ORDER BY score DESC, doc_id LIMIT 25""".stripMargin))

  // ---------- q_rrf_fusion ----------

  /** Hybrid retrieval: BM25 rank fused with the cosine rank against
    * the query vector (vec_id 0) over the same id slice; embedding
    * ranking covers every doc, lexical only term-matched docs — the
    * left join + coalesce-0 is exactly how production RRF handles a
    * doc one ranker never surfaced. */
  val qRrfFusion = QueryDef("q_rrf_fusion",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val lex = bm25(s, dir)
        .withColumn("r_lex",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("r_lex"))
      val emb = t(s, dir, "embeddings")
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val sem = emb.where(col("vec_id") < N)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
          round(SimilarityOps.cosine(col("q_emb"), col("embedding")), 4)
            .as("cos_sim"))
        .withColumn("r_sem",
          row_number().over(Window.orderBy(col("cos_sim").desc, col("vec_id"))))
      sem.join(lex, sem("vec_id") === lex("doc_id"), "left")
        .select(sem("vec_id").as("id"), col("r_sem"), col("r_lex"),
          expr(rrfSql).as("rrf"))
        .select(col("id"), col("r_sem"), col("r_lex"),
          col("rrf").cast("double").as("rrf"))
        .orderBy(col("rrf").desc, col("id"))
        .limit(20)
    },
    Some(
      s"""WITH $bm25Sql,
         |lex AS (SELECT doc_id,
         |          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS r_lex
         |        FROM bm25),
         |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |dots AS (SELECT v.vec_id,
         |    sum(CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS dot,
         |    sum(CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)) AS qq,
         |    sum(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)) AS vv
         |  FROM qv q, embeddings v, generate_series(1, 64) t(i)
         |  WHERE v.vec_id < $N
         |  GROUP BY v.vec_id),
         |sem AS (SELECT vec_id,
         |          CAST(row_number() OVER (
         |            ORDER BY round(dot / (sqrt(qq) * sqrt(vv)), 4) DESC, vec_id) AS INTEGER) AS r_sem
         |        FROM dots),
         |fused AS (SELECT s.vec_id AS id, s.r_sem, l.r_lex, $rrfSql AS rrf
         |          FROM sem s LEFT JOIN lex l ON l.doc_id = s.vec_id)
         |SELECT id, r_sem, r_lex, CAST(rrf AS DOUBLE) AS rrf
         |FROM fused ORDER BY rrf DESC, id LIMIT 20""".stripMargin))

  val all: Seq[QueryDef] = Seq(qBm25, qRrfFusion)
}
