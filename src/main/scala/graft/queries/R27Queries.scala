package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.ext.TextOps
import graft.queries.Queries.QueryDef

/** Twenty-seventh wave — embedding-matrix statistics and deeper LM
  * scoring.
  *
  *  - `q_gram_matrix`: exact Gram matrix XᵀX (plus per-dimension sums)
  *    over the embedding corpus — the covariance/whitening/PCA input of
  *    every embedding-drift check. Integer-lattice quantization (the
  *    [[graft.ext.ClusterOps]] discipline) makes the d×d accumulation
  *    order-independent, so two engines agree exactly.
  *  - `q_token_fertility`: tokens-per-word by language — the tokenizer
  *    fertility stat that decides per-language token budgets in a
  *    training mix (a fertility-2 language consumes twice the tokens
  *    per word); exact basis points, no rounded doubles.
  *  - `q_trigram_backoff`: stupid-backoff trigram scoring (λ=0.4) of
  *    held-out docs against a corpus LM — the production fluency filter
  *    one order above the bigram family; every conditional probability
  *    backs off trigram → bigram → unigram → uniform, and each factor
  *    is DECIMAL-quantized ln so document sums stay order-independent.
  */
object R27Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_gram_matrix ----------

  /** Exact XᵀX upper triangle + per-dim sums on the 1e-6 lattice.
    *
    * Scale shape: the pair explode is PER-ROW (2080 (di,dj) products per
    * 64-dim vector, generated map-side by one nested transform), and the
    * groupBy is map-side combined — the shuffle carries ≤ partitions×d²
    * partial sums, never corpus rows, which is the distributed Gram
    * recipe (each worker accumulates its local XᵀX block; the driver-
    * side d×d result is model-sized). No self-join: a join-on-vec_id
    * formulation would shuffle 64× the corpus instead.
    *
    * Overflow: |v| ≤ 5e5 ⇒ |v·v| ≤ 2.5e11; ×500 rows ≤ 1.25e14 ≪ 2⁶³.
    * At true 100 TB row counts the per-pair sums would move to
    * DECIMAL(38,0) — same plan, wider accumulator. */
  val qGramMatrix = QueryDef("q_gram_matrix",
    (s, dir) => {
      val q = t(s, dir, "embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("v"))
      // custom Generator streams the d(d+1)/2 pair products per row —
      // the composed flatten(transform(...)) twin evaluates interpreted
      // and materializes every pair struct first (PropertiesSpec pins
      // row-for-row equivalence)
      val pairs = q.select(graft.functions.PairProducts(col("v"))
          .as(Seq("di", "dj", "p")))
        .groupBy("di", "dj").agg(sum("p").as("sxy"))
      val dims = q.select(posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("d").agg(sum("x").as("sd"), count(lit(1)).as("n"))
      pairs
        .join(dims.select(col("d").as("di"), col("sd").as("si"), col("n")),
          "di")
        .join(dims.select(col("d").as("dj"), col("sd").as("sj")), "dj")
        .select(col("di").cast("long").as("di"),
          col("dj").cast("long").as("dj"),
          col("sxy"), col("si"), col("sj"), col("n"))
        .orderBy("di", "dj")
    },
    Some(
      """WITH pts AS (
        |  SELECT vec_id, i - 1 AS d,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(1, 65) t(i)
        |), pairs AS (
        |  SELECT a.d AS di, b.d AS dj, CAST(sum(a.v * b.v) AS BIGINT) AS sxy
        |  FROM pts a JOIN pts b ON a.vec_id = b.vec_id AND a.d <= b.d
        |  GROUP BY a.d, b.d
        |), dims AS (
        |  SELECT d, CAST(sum(v) AS BIGINT) AS sd, CAST(count(*) AS BIGINT) AS n
        |  FROM pts GROUP BY d
        |)
        |SELECT p.di, p.dj, p.sxy, a.sd AS si, b.sd AS sj, a.n
        |FROM pairs p JOIN dims a ON p.di = a.d JOIN dims b ON p.dj = b.d
        |ORDER BY p.di, p.dj""".stripMargin))

  // ---------- q_token_fertility ----------

  /** Tokenizer fertility per language: BPE-ish subword count over
    * whitespace word count, in exact basis points (10000 = fertility 1).
    * One map-side pass computes both counts per doc; the aggregate is
    * |languages|-sized. */
  val qTokenFertility = QueryDef("q_token_fertility",
    (s, dir) => {
      val p = col("bpe") * 10000L
      t(s, dir, "documents")
        .select(col("lang"),
          TextOps.tokenCount(col("text")).as("ws"),
          TextOps.bpeishTokenCount(col("text")).as("bpe"))
        .groupBy("lang")
        .agg(sum(col("ws")).as("ws"), sum(col("bpe")).as("bpe"))
        .withColumn("fertility_bp",
          ((p - ((p % col("ws")) + col("ws")) % col("ws")) / col("ws"))
            .cast("long"))
        .select(col("lang"), col("ws"), col("bpe"), col("fertility_bp"))
        .orderBy("lang")
    },
    Some(
      s"""WITH c AS (
         |  SELECT lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
         |    CAST(len(regexp_extract_all(text, '${TextOps.bpeishPattern}'))
         |      AS BIGINT) AS bpe
         |  FROM documents
         |), a AS (
         |  SELECT lang, CAST(sum(ws) AS BIGINT) AS ws,
         |    CAST(sum(bpe) AS BIGINT) AS bpe FROM c GROUP BY lang
         |)
         |SELECT lang, ws, bpe,
         |  CAST((bpe * 10000 - ((bpe * 10000 % ws) + ws) % ws) / ws
         |    AS BIGINT) AS fertility_bp
         |FROM a ORDER BY lang""".stripMargin))

  // ---------- q_trigram_backoff ----------

  private val tbTrainMax = 100  // LM trained on doc_id < 100
  private val tbScoreMax = 150  // docs 100..149 scored (held-out)

  /** Stupid-backoff (Brants et al.) trigram doc scoring: for each
    * held-out trigram, P ≈ c123/c12, backing off to 0.4·c23/c2, then
    * 0.4²·c3/N, then 0.4³/N for fully-unseen words. Each factor's ln is
    * quantized to DECIMAL(18,9) BEFORE the per-doc sum (the house
    * libm-divergence absorber, q_lm_doc_score's discipline), so the
    * document total is order-independent and engine-exact.
    *
    * Scale shape: count tables are vocabulary-sized and join against
    * the held-out trigram stream by key (broadcastable); nothing joins
    * corpus×corpus. */
  val qTrigramBackoff = QueryDef("q_trigram_backoff",
    (s, dir) => {
      def toks(lo: Int, hi: Int) = t(s, dir, "documents")
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      def grams(df: DataFrame) = df
        .withColumn("w2", lead("w", 1).over(w))
        .withColumn("w3", lead("w", 2).over(w))
        .where(col("w3").isNotNull)
        .select(col("doc_id"), col("w").as("w1"), col("w2"), col("w3"))
      val train = grams(toks(0, tbTrainMax))
      val c123 = train.groupBy("w1", "w2", "w3")
        .agg(count(lit(1)).as("c123"))
      val c12 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c23 = train.select(col("w2").as("b1"), col("w3").as("b2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("c23"))
      val c2 = train.select(col("w2").as("u1"))
        .groupBy("u1").agg(count(lit(1)).as("c2"))
      val c3 = train.select(col("w3").as("v1"))
        .groupBy("v1").agg(count(lit(1)).as("c3"))
      val nTok = train.count().toDouble
      val held = grams(toks(tbTrainMax, tbScoreMax))
      val p = held
        .join(c123, Seq("w1", "w2", "w3"), "left")
        .join(c12, Seq("w1", "w2"), "left")
        .join(c23, held("w2") === c23("b1") && held("w3") === c23("b2"),
          "left")
        .join(c2, held("w2") === c2("u1"), "left")
        .join(c3, held("w3") === c3("v1"), "left")
        .withColumn("prob",
          when(col("c123").isNotNull,
            col("c123").cast("double") / col("c12").cast("double"))
          .when(col("c23").isNotNull,
            lit(0.4) * col("c23").cast("double") / col("c2").cast("double"))
          .when(col("c3").isNotNull,
            lit(0.4 * 0.4) * col("c3").cast("double") / lit(nTok))
          .otherwise(lit(0.4 * 0.4 * 0.4) / lit(nTok)))
        .select(col("doc_id"),
          log(col("prob")).cast(DecimalType(18, 9)).as("lp"))
      p.groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tri"),
          sum(col("lp")).cast("double").as("logscore"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
         |), idx AS (
         |  SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
         |  FROM docs
         |), tok AS (
         |  SELECT doc_id, i AS pos, arr[i] AS w FROM idx
         |), g AS (
         |  SELECT doc_id, w AS w1,
         |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
         |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
         |  FROM tok
         |), train AS (
         |  SELECT w1, w2, w3 FROM g
         |  WHERE doc_id < $tbTrainMax AND w3 IS NOT NULL
         |), held AS (
         |  SELECT doc_id, w1, w2, w3 FROM g
         |  WHERE doc_id >= $tbTrainMax AND doc_id < $tbScoreMax
         |    AND w3 IS NOT NULL
         |), c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM train
         |            GROUP BY 1, 2, 3),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY 1, 2),
         |c23 AS (SELECT w2 AS b1, w3 AS b2, count(*) AS c23 FROM train
         |        GROUP BY 1, 2),
         |c2 AS (SELECT w2 AS u1, count(*) AS c2 FROM train GROUP BY 1),
         |c3 AS (SELECT w3 AS v1, count(*) AS c3 FROM train GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM train),
         |p AS (
         |  SELECT h.doc_id,
         |    CAST(ln(CASE
         |      WHEN c123.c123 IS NOT NULL
         |        THEN CAST(c123.c123 AS DOUBLE) / CAST(c12.c12 AS DOUBLE)
         |      WHEN c23.c23 IS NOT NULL
         |        THEN 0.4 * CAST(c23.c23 AS DOUBLE) / CAST(c2.c2 AS DOUBLE)
         |      WHEN c3.c3 IS NOT NULL
         |        THEN 0.4 * 0.4 * CAST(c3.c3 AS DOUBLE) / n.nt
         |      ELSE 0.4 * 0.4 * 0.4 / n.nt END) AS DECIMAL(18,9)) AS lp
         |  FROM held h
         |  LEFT JOIN c123 ON h.w1 = c123.w1 AND h.w2 = c123.w2
         |    AND h.w3 = c123.w3
         |  LEFT JOIN c12 ON h.w1 = c12.w1 AND h.w2 = c12.w2
         |  LEFT JOIN c23 ON h.w2 = c23.b1 AND h.w3 = c23.b2
         |  LEFT JOIN c2 ON h.w2 = c2.u1
         |  LEFT JOIN c3 ON h.w3 = c3.v1
         |  CROSS JOIN n
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
         |  CAST(sum(lp) AS DOUBLE) AS logscore
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qGramMatrix, qTokenFertility, qTrigramBackoff)
}
